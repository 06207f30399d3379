from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.hookimpl(trylast=True)
def pytest_collection_modifyitems(config, items):
    """Record which oracle-parity names this run selected so the parity
    batch runner (tests/test_oracle_parity.py) computes exactly those —
    the full 309 on a gate run, one on `pytest -k <name>`. trylast: the
    -k/-m deselection is itself a modifyitems hook (and conftest hooks
    run first by LIFO registration), so without it this would record the
    PRE-deselection list and `-k one_query` would compute all 309."""
    selected = {
        it.callspec.params["name"]
        for it in items
        if getattr(it, "callspec", None) is not None
        and it.function.__name__ == "test_query_matches_oracle"
        and "name" in it.callspec.params
    }
    config._parity_selected = selected


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    # Task fns defined in test modules ship to executors via cloudpickle;
    # workers need the tests dir importable to unpickle them.
    os.environ["PYTHONPATH"] = ":".join(
        [str(REPO), str(REPO / "tests"), os.environ.get("PYTHONPATH", "")]
    )
    from kinesis_stream_consumer_spark.session import get_spark

    spark = get_spark("ksc-spark-tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for sf, prefix in ((SF_SMOKE, "sf0001"), (SF_CORRECT, "sf001")):
        pass
    # register sf0.01 tables as views matching the driver's naming
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        path = f"{SF_CORRECT}/{name}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{path}'")
    yield con
    con.close()
