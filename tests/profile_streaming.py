"""Profiling harness for the sustained-streaming micro-batch cadence.

Mirrors bench.py's streaming section (4×5k availableNow micro-batches)
with SPARK_GRAFT_ENGINE_TIMING=1 so each batch prints per-section wall
times. Not a test — run directly:

    env -u PYTHONPATH SPARK_GRAFT_ENGINE_TIMING=1 \
        python tests/profile_streaming.py [sf_dir]
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
    from kinesis_stream_consumer_spark.sources import (
        events_as_kinesis_records,
        stream_records,
    )
    from kinesis_stream_consumer_spark.streaming import Engine, TaskDef
    from kinesis_stream_consumer_spark.streaming.tasks import TaskRejectedError

    spark = get_spark("ksc-profile-streaming")
    spark.sparkContext.setLogLevel("ERROR")

    def validate(message, task):
        if message["k2"] == "error":
            raise TaskRejectedError("error events rejected")

    ev = _t(spark, SF_DIR, "events", rebalance=True).where(
        F.col("event_id") < 20000
    )
    recs = events_as_kinesis_records(ev).localCheckpoint(eager=True)
    n_msgs = recs.count()

    cfg = EngineConfig(
        sequencing_per_key=True,
        key_property_names=["k1", "k2"],
        id_property_names=["id1"],
        seq_no_property_names=["n1", "n2"],
    )

    sdir = tempfile.mkdtemp(prefix="ksc-prof-stream-")
    for i in range(4):
        recs.where(
            (F.col("eventID").isNotNull())
            & (F.crc32(F.col("eventID").cast("binary")) % 4 == i)
        ).coalesce(1).write.mode("append").json(f"{sdir}/in")

    # warm-up stream (spin-up costs excluded, same as bench.py)
    wdir = tempfile.mkdtemp(prefix="ksc-prof-warm-")
    recs.limit(5000).coalesce(1).write.mode("append").json(f"{wdir}/in")
    weng = Engine(
        spark, cfg, f"{wdir}/state", f"{wdir}/drq", f"{wdir}/dmq",
        [TaskDef("validate", validate)],
    )
    wq = weng.attach(stream_records(spark, f"{wdir}/in"), f"{wdir}/ckpt").start()
    wq.awaitTermination(120)

    seng = Engine(
        spark, cfg, f"{sdir}/state", f"{sdir}/drq", f"{sdir}/dmq",
        [TaskDef("validate", validate)],
    )
    t0 = time.perf_counter()
    q = seng.attach(stream_records(spark, f"{sdir}/in"), f"{sdir}/ckpt").start()
    q.awaitTermination(600)
    sec = time.perf_counter() - t0
    print(
        f"STREAMING messages={n_msgs} sec={sec:.3f} "
        f"msgs_per_sec={n_msgs / sec:.1f}"
    )


if __name__ == "__main__":
    main()
