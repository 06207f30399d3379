from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


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
