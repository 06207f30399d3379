#!/usr/bin/env python
"""Benchmark headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": sf}. Each query is fully materialized
(count + collect of the limited result) so lazy plans can't cheat.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative spread: scan-agg, broadcast join, window, stream parity,
# dedup (hash + LSH), text, similarity.
HEADLINE = [
    "q1_pricing_summary",
    "q5_region_revenue",
    "q3_top_orders",
    "window_topk_per_group",
    "sequencing_chains_per_key",
    "dedup_replayed_batch",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "text_quality",
    "sim_topk_bruteforce",
    "scalar_datetime_json",
    "streaming_tumbling_window",
    "streaming_session_window",
]


def main() -> None:
    from kinesis_stream_consumer_spark.plans import QUERIES
    from kinesis_stream_consumer_spark.session import get_spark

    spark = get_spark("ksc-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM/codegen path once so per-query numbers measure the
    # engine, not session startup
    QUERIES["q1_pricing_summary"].fn(spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = QUERIES[name]
        t0 = time.perf_counter()
        df = spec.fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        del n

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
