"""Interleaved cold-JVM A/B of registry queries between two code trees.

VERDICT r14 #3: three touched paths (dedup_minhash_lsh,
graph_triangle_counts, sim_ivfpq_topk) regressed in the driver's record
while every interleaved warm-profiler trial said wash-or-win. The
driver's conditions are a COLD JVM and a COLD plan cache — this harness
replicates them: each trial is a fresh subprocess (fresh JVM) that warms
q1 exactly like bench.py, then times each named query's `.count()` once.
Arms alternate NEW (this tree) / OLD (a git worktree at ``--old-ref``)
so host drift cannot masquerade as a code delta.

Usage:
    python tests/ab_cold_queries.py --old-ref <sha> [--passes 3]
        [--sf-dir /root/testdata/sf0.1] name1 name2 ...
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys
import tempfile
from pathlib import Path

REPO = str(Path(__file__).resolve().parent.parent)

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, sys.argv[1])
names = json.loads(sys.argv[2])
sf_dir = sys.argv[3]
from kinesis_stream_consumer_spark.session import get_spark
from kinesis_stream_consumer_spark.plans import QUERIES  # registers

spark = get_spark("ksc-ab-cold")
spark.sparkContext.setLogLevel("ERROR")
QUERIES["q1_pricing_summary"].fn(spark, sf_dir).count()  # bench's warm-up

out = {}
for name in names:
    t0 = time.perf_counter()
    QUERIES[name].fn(spark, sf_dir).count()
    out[name] = round(time.perf_counter() - t0, 3)
print("MARKS " + json.dumps(out))
spark.stop()
"""


def run_arm(tree: str, names: list[str], sf_dir: str) -> dict:
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [sys.executable, "-c", CHILD, tree, json.dumps(names), sf_dir],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    for ln in r.stdout.splitlines():
        if ln.startswith("MARKS "):
            return json.loads(ln[len("MARKS "):])
    raise RuntimeError(f"arm in {tree} produced no MARKS:\n{r.stdout}\n{r.stderr}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--old-ref", required=True)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    tmp = tempfile.mkdtemp(prefix="ksc_ab_old_")
    old_tree = os.path.join(tmp, "old")
    subprocess.run(
        ["git", "worktree", "add", "--detach", old_tree, args.old_ref],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    try:
        new_runs: list[dict] = []
        old_runs: list[dict] = []
        for p in range(args.passes):
            # NEW/OLD within each pass, order flipped on odd passes so
            # neither arm systematically rides a cooler host.
            order = [("new", REPO), ("old", old_tree)]
            if p % 2:
                order.reverse()
            for label, tree in order:
                marks = run_arm(tree, args.names, args.sf_dir)
                (new_runs if label == "new" else old_runs).append(marks)
                print(f"pass {p} {label}: {json.dumps(marks)}", flush=True)
        print()
        for name in args.names:
            new_v = sorted(r[name] for r in new_runs)
            old_v = sorted(r[name] for r in old_runs)
            ratio = statistics.median(old_v) / statistics.median(new_v)
            overlap = not (new_v[-1] < old_v[0] or old_v[-1] < new_v[0])
            print(
                json.dumps(
                    {
                        "query": name,
                        "new": new_v,
                        "old": old_v,
                        "ratio_old_over_new": round(ratio, 3),
                        "unresolved": overlap,
                    }
                )
            )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", old_tree],
            cwd=REPO,
            capture_output=True,
        )


if __name__ == "__main__":
    main()
