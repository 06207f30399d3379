"""Diagnostic: per-job/stage wall breakdown of steady-state micro-batches."""
import json
import sys
import tempfile
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.config import EngineConfig
from kinesis_stream_consumer_spark.plans.queries import _t
from kinesis_stream_consumer_spark.session import get_spark
from kinesis_stream_consumer_spark.sources import events_as_kinesis_records
from kinesis_stream_consumer_spark.streaming import Engine, TaskDef
from kinesis_stream_consumer_spark.streaming.tasks import TaskRejectedError

SF_DIR = "/root/testdata/sf0.1"

import os

os.environ.setdefault("SPARK_GRAFT_UI", "1")
from pyspark.sql import SparkSession

SparkSession.builder.config("spark.ui.enabled", "true")  # no-op placeholder
# clone get_spark but with UI on
_builder = (
    SparkSession.builder.master("local[*]")
    .appName("ksc-diag-jobs")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
    .config("spark.sql.session.timeZone", "UTC")
    .config(
        "spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
    )
    .config("spark.driver.memory", "8g")
    .config("spark.ui.enabled", "true")
)
spark = _builder.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")


def validate(message, task):
    if message["k2"] == "error":
        raise TaskRejectedError("error events rejected")


ev = _t(spark, SF_DIR, "events", rebalance=True).where(F.col("event_id") < 5000)
recs = events_as_kinesis_records(ev).localCheckpoint(eager=True)
print("rows:", recs.count())

tmp = tempfile.mkdtemp(prefix="diagjobs-")
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
for i in range(6):
    t0 = time.perf_counter()
    eng.process_batch(recs, i)
    print(f"batch {i}: {time.perf_counter()-t0:.3f}s")

app_id = spark.sparkContext.applicationId
base = f"http://localhost:4040/api/v1/applications/{app_id}"
jobs = json.load(urllib.request.urlopen(f"{base}/jobs"))
jobs.sort(key=lambda j: j["jobId"])
from datetime import datetime


def ts(s):
    return datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f").timestamp()


for j in jobs[-12:]:
    dur = ts(j["completionTime"]) - ts(j["submissionTime"])
    print(f"job {j['jobId']:3d} {dur*1000:7.0f}ms stages={j['stageIds']} {j['name'][:80]}")

stages = json.load(urllib.request.urlopen(f"{base}/stages?status=complete"))
stages.sort(key=lambda s: s["stageId"])
for s in stages[-25:]:
    dur = ts(s["completionTime"]) - ts(s["firstTaskLaunchedTime"])
    print(
        f"stage {s['stageId']:3d} {dur*1000:6.0f}ms tasks={s['numCompleteTasks']:3d} "
        f"{s['name'][:70]}"
    )
