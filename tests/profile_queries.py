"""Per-query profiling harness for the optimization rounds.

Usage:
    python tests/profile_queries.py [--plans-dir plans/r14 --suffix before]
        [--trials 3] [--sf-dir /root/testdata/sf0.1] name1 name2 ...

For each named registry query: one warm invocation (plan compile +
model-cache fill), then ``--trials`` timed invocations using the SAME
timed action as bench.py (``df.count()``), plus one noop-sink timing for
comparison (guide §1.4). Optionally writes ``explain("formatted")`` to
``<plans-dir>/<name>_<suffix>.txt`` for the plan-evidence deliverable.

Job-level attribution: each timed run is wrapped in a job-group whose
jobs/stages are read back from the status tracker, so the output shows
how many Spark jobs a query launches and where wall time concentrates
(driver-side gaps = planning/collect phases; see guide §7.3).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--sf-dir", default=SF_DIR)
    ap.add_argument("--noop", action="store_true", help="also time a noop-sink write")
    args = ap.parse_args()

    from kinesis_stream_consumer_spark.plans import QUERIES
    from kinesis_stream_consumer_spark.session import get_spark

    spark = get_spark("ksc-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    # warm the JVM once like bench.py does
    QUERIES["q1_pricing_summary"].fn(spark, args.sf_dir).count()

    out: dict[str, dict] = {}
    for name in args.names:
        spec = QUERIES[name]
        sc.setJobDescription(f"warm:{name}")
        t0 = time.perf_counter()
        df = spec.fn(spark, args.sf_dir)
        df.count()
        cold = time.perf_counter() - t0

        trials = []
        jobs_per_trial = []
        for i in range(args.trials):
            sc.setJobGroup(f"prof-{name}-{i}", f"timed:{name}:{i}")
            t0 = time.perf_counter()
            spec.fn(spark, args.sf_dir).count()
            trials.append(round(time.perf_counter() - t0, 3))
            tracker = sc.statusTracker()
            jobs = tracker.getJobIdsForGroup(f"prof-{name}-{i}")
            jobs_per_trial.append(len(jobs))
            sc.setJobGroup("", "")
        noop_sec = None
        if args.noop:
            t0 = time.perf_counter()
            spec.fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            noop_sec = round(time.perf_counter() - t0, 3)
        out[name] = {
            "cold": round(cold, 3),
            "trials": trials,
            "n_jobs": jobs_per_trial,
            "noop": noop_sec,
        }
        print(f"{name}: cold={cold:.3f} trials={trials} jobs={jobs_per_trial}"
              + (f" noop={noop_sec}" if noop_sec is not None else ""),
              flush=True)

        if args.plans_dir:
            Path(args.plans_dir).mkdir(parents=True, exist_ok=True)
            # capture the formatted plan of a fresh invocation
            fresh = spec.fn(spark, args.sf_dir)
            txt = fresh._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (Path(args.plans_dir) / f"{name}_{args.suffix}.txt").write_text(txt)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
