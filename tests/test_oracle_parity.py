"""Mirror of the driver's correctness gate: run every registered query on
Spark at sf0.01 and its oracle on DuckDB over the same parquet, then compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import pytest

from kinesis_stream_consumer_spark.plans import QUERIES
from tests.conftest import SF_CORRECT


def _normalize(rows, cols):
    """Sort columns by name, render every value to a canonical string, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def render(v):
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return str(v).lower()
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # driver-style canonicalization: repr of float is stable
            return repr(round(v, 9))
        return str(v)

    return sorted(tuple(render(r[i]) for i in order) for r in rows)


ORACLED = [n for n, s in QUERIES.items() if s.oracle is not None]
ROWS_ONLY = [n for n, s in QUERIES.items() if s.oracle is None]


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    # Dtype gate: the str()-rendered value compare below is blind to DuckDB
    # result dtypes, but the driver's value-hash is not — a SUM(BIGINT*BIGINT)
    # silently widens to HUGEINT and defeats the hash even when every rendered
    # value matches (r3's sim_kmeans_cells red row). Ban HUGEINT/DECIMAL
    # output columns outright: cast to BIGINT / DOUBLE in the oracle.
    desc = duck.execute("DESCRIBE " + spec.oracle).fetchall()
    danger = [(c, t) for c, t, *_ in desc if "HUGEINT" in t or "DECIMAL" in t]
    assert not danger, (
        f"{name}: oracle output columns with hash-hostile DuckDB types "
        f"{danger}; CAST them to BIGINT/DOUBLE in the oracle SQL"
    )
    sdf = spec.fn(spark, SF_CORRECT)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(spec.oracle)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns = _normalize(spark_rows, spark_cols)
    nd = _normalize(duck_rows, duck_cols)
    if ns != nd:
        diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_no_rows_only_queries():
    """Every registered query carries a full SQL oracle: the rows-only
    (weaker, count-only) driver check path should stay unused. If a future
    operator genuinely can't be SQL-expressed, drop this and add a
    parametrized count-only runner for it."""
    assert ROWS_ONLY == []
