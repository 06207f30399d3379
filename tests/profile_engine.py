"""Profiling harness for the single-batch engine path (bench.py's engine
section). Run:  env -u PYTHONPATH SPARK_GRAFT_ENGINE_TIMING=1 \
    python tests/profile_engine.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)


def main() -> None:
    from pyspark.sql import functions as F

    from kinesis_stream_consumer_spark.config import EngineConfig
    from kinesis_stream_consumer_spark.plans.queries import _t
    from kinesis_stream_consumer_spark.session import get_spark
    from kinesis_stream_consumer_spark.sources import events_as_kinesis_records
    from kinesis_stream_consumer_spark.streaming import Engine, TaskDef
    from kinesis_stream_consumer_spark.streaming.tasks import TaskRejectedError

    spark = get_spark("ksc-profile-engine")
    spark.sparkContext.setLogLevel("ERROR")

    def validate(message, task):
        if message["k2"] == "error":
            raise TaskRejectedError("error events rejected")

    ev = _t(spark, SF_DIR, "events", rebalance=True).where(
        F.col("event_id") < 20000
    )
    recs = events_as_kinesis_records(ev).localCheckpoint(eager=True)
    n = recs.count()

    cfg = EngineConfig(
        sequencing_per_key=True,
        key_property_names=["k1", "k2"],
        id_property_names=["id1"],
        seq_no_property_names=["n1", "n2"],
    )
    warm_tmp = tempfile.mkdtemp(prefix="ksc-prof-warm-")
    Engine(
        spark, cfg, f"{warm_tmp}/state", f"{warm_tmp}/drq", f"{warm_tmp}/dmq",
        [TaskDef("validate", validate)],
    ).process_batch(recs.limit(200).localCheckpoint(eager=True), 0)

    tmp = tempfile.mkdtemp(prefix="ksc-prof-")
    eng = Engine(
        spark, cfg, f"{tmp}/state", f"{tmp}/drq", f"{tmp}/dmq",
        [TaskDef("validate", validate)],
    )
    for b in range(1, 4):
        t0 = time.perf_counter()
        eng.process_batch(recs, b)
        sec = time.perf_counter() - t0
        print(
            f"ENGINE batch={b} messages={n} sec={sec:.3f} "
            f"msgs_per_sec={n / sec:.1f}"
        )


if __name__ == "__main__":
    main()
