"""Engine + sustained-streaming throughput only — the bench.py section,
extracted for fast A/B during engine work (full bench takes ~6 min; this
~90 s). Same warm-up policy as bench.py. Prints one JSON line."""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from kinesis_stream_consumer_spark.session import get_spark

    spark = get_spark("bench-engine")
    from kinesis_stream_consumer_spark.config import EngineConfig
    from kinesis_stream_consumer_spark.plans.queries import _t
    from kinesis_stream_consumer_spark.sources import (
        events_as_kinesis_records,
        stream_records,
    )
    from kinesis_stream_consumer_spark.streaming import Engine, TaskDef
    from kinesis_stream_consumer_spark.streaming.tasks import TaskRejectedError

    def validate(message, task):
        if message["k2"] == "error":
            raise TaskRejectedError("error events rejected")

    ev = _t(spark, SF_DIR, "events", rebalance=True).where(
        F.col("event_id") < 20000
    )
    recs = events_as_kinesis_records(ev).localCheckpoint(eager=True)
    n_msgs = recs.count()
    tmp = tempfile.mkdtemp(prefix="ksc-bench-")
    cfg = EngineConfig(
        sequencing_per_key=True,
        key_property_names=["k1", "k2"],
        id_property_names=["id1"],
        seq_no_property_names=["n1", "n2"],
    )
    eng = Engine(
        spark, cfg, f"{tmp}/state", f"{tmp}/drq", f"{tmp}/dmq",
        [TaskDef("validate", validate)],
    )
    warm_tmp = tempfile.mkdtemp(prefix="ksc-bench-warm-")
    Engine(
        spark, cfg, f"{warm_tmp}/state", f"{warm_tmp}/drq", f"{warm_tmp}/dmq",
        [TaskDef("validate", validate)],
    ).process_batch(recs, 0)

    t0 = time.perf_counter()
    eng.process_batch(recs, 1)
    engine_sec = round(time.perf_counter() - t0, 3)

    sdir = tempfile.mkdtemp(prefix="ksc-bench-stream-")
    for i in range(4):
        recs.where(
            (F.col("eventID").isNotNull())
            & (F.crc32(F.col("eventID").cast("binary")) % 4 == i)
        ).coalesce(1).write.mode("append").json(f"{sdir}/in")
    wdir = tempfile.mkdtemp(prefix="ksc-bench-stream-warm-")
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
    stream_sec = round(time.perf_counter() - t0, 3)

    print(
        json.dumps(
            {
                "engine": {
                    "sec": engine_sec,
                    "msgs_per_sec": round(n_msgs / engine_sec, 1),
                },
                "streaming": {
                    "sec": stream_sec,
                    "msgs_per_sec": round(n_msgs / stream_sec, 1),
                },
                "loadavg": round(os.getloadavg()[0], 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
