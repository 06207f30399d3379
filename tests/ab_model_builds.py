"""Interleaved A/B of the model-build assign/encode passes vs the
rebalance decision (OPTIMIZATION_r14 'Not yet optimized' #2).

Each arm is a fresh subprocess (fresh JVM, cold plans — the exact
conditions bench.py charges to the index entries' train marks). Arms
alternate never/always so host drift can't masquerade as a code delta.

Usage: python tests/ab_model_builds.py [--passes 3]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
from pathlib import Path

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from kinesis_stream_consumer_spark.session import get_spark
from kinesis_stream_consumer_spark.plans import QUERIES  # registers
from kinesis_stream_consumer_spark.plans import llm_pipeline as L

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ksc-ab-model")
spark.sparkContext.setLogLevel("ERROR")
# same JVM warm-up as bench.py
QUERIES["q1_pricing_summary"].fn(spark, sf_dir).count()

t0 = time.perf_counter()
L._coarse_model(spark, sf_dir)          # k8 train + assign ckpt
k8 = time.perf_counter() - t0
t0 = time.perf_counter()
L._pq_model(spark, sf_dir)              # PQ train + fused encode+pack ckpt
pq = time.perf_counter() - t0
t0 = time.perf_counter()
L._coarse_model(spark, sf_dir, k=32, n_iter=2)   # dedup_semantic's k32
k32 = time.perf_counter() - t0
print("MARKS " + json.dumps({
    "k8_total": round(k8, 3), "pq_total": round(pq, 3),
    "k32_total": round(k32, 3),
    "k8_assign_ckpt": L.BUILD_MARKS.get("kmeans_train_k8_assign_ckpt"),
    "pq_encode_ckpt": L.BUILD_MARKS.get("pq_train_encode_pack_ckpt"),
    "k32_assign_ckpt": L.BUILD_MARKS.get("kmeans_train_k32_assign_ckpt"),
}))
spark.stop()
"""


def run_arm(mode: str, repo: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_REBALANCE"] = mode
    r = subprocess.run(
        [sys.executable, "-c", CHILD.replace("{repo!r}", repr(repo))],
        capture_output=True, text=True, env=env, timeout=600,
    )
    for ln in r.stdout.splitlines():
        if ln.startswith("MARKS "):
            return json.loads(ln[6:])
    raise RuntimeError(f"arm {mode} failed:\n{r.stdout[-2000:]}\n{r.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()
    repo = str(Path(__file__).resolve().parent.parent)
    out: dict[str, list[dict]] = {"never": [], "always": []}
    for i in range(args.passes):
        for mode in ("never", "always"):
            marks = run_arm(mode, repo)
            out[mode].append(marks)
            print(f"pass {i} {mode}: {json.dumps(marks)}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
