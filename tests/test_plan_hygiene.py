"""Plan-hygiene gate over EVERY registered query: the physical plan must
not contain the operators that kill 100 TB runs — cartesian products
(unless the query's design is an intentional broadcast cross score) and
row-at-a-time Python UDF evaluation (BatchEvalPython; Arrow-batched
pandas forms are the sanctioned Python surface)."""

from __future__ import annotations

import contextlib
import io

import pytest

from kinesis_stream_consumer_spark.plans import QUERIES
from tests.conftest import SF_SMOKE

# Queries whose plan INTENTIONALLY contains a cross join: the brute-force
# scorer broadcasts a tiny query set against corpus partitions (the
# documented baseline), and IVF assigns cells by broadcast-scoring against
# the centroid set. Everything else must be equi-driven.
CROSS_JOIN_OK = {"sim_topk_bruteforce", "sim_ann_ivf"}

# State-writing queries excluded from the cheap explain pass (they create
# tables/write state as a side effect of building the DataFrame).
SKIP = {"join_bucketed_colocated"}


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", [n for n in QUERIES if n not in SKIP])
def test_plan_has_no_scale_killers(spark, name):
    df = QUERIES[name].fn(spark, SF_SMOKE)
    plan = _plan(df)
    if name not in CROSS_JOIN_OK:
        assert "CartesianProduct" not in plan, f"{name}: cartesian product"
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: nested-loop join — add an equi key or broadcast+"
            "window instead"
        )
    # row-at-a-time Python UDFs are banned everywhere; Arrow-batched
    # pandas evaluation (ArrowEvalPython / mapInPandas / FlatMapGroups*)
    # is the sanctioned Python surface
    assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF"
