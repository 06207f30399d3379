"""Structural pin for the r14 lazy shingle-set checkpoint fusion (ADVICE r14).

The three shingle pipelines (``minhash_lsh_candidate_pairs``,
``minhash_lsh_incremental_pairs``, ``prefix_filter_jaccard_pairs``) hold a
LAZY ``localCheckpoint`` on the shared shingle sets; the single EAGER
band/prefix checkpoint immediately downstream is, by construction, the
FIRST action touching them, so tokenization runs fused in that one job.
That ordering is load-bearing (CLAUDE.md): an edit that runs another
action first re-runs tokenization (2 jobs), and an edit that makes the
band/prefix checkpoint lazy defers materialization into the consumer,
re-arming the concurrent first-touch double-execution trap (0 jobs at
build time). Both drifts change the BUILD-TIME job count away from
exactly 1 — which is what this test pins, per operator, via a job group.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators.dedup import (
    minhash_lsh_candidate_pairs,
    minhash_lsh_incremental_pairs,
    prefix_filter_jaccard_pairs,
)


def _docs_frame(spark):
    rows = []
    words = [f"w{i}" for i in range(30)]
    for d in range(10):
        rows.append((f"d{d:02d}", " ".join(words[d * 2 : d * 2 + 12])))
    return spark.createDataFrame(rows, "doc_id string, body string")


def _jobs_during(spark, fn):
    """Run fn under a fresh job group; return (result, jobs it triggered)."""
    group = f"fuse-pin-{uuid.uuid4().hex[:8]}"
    sc = spark.sparkContext
    sc.setJobGroup(group, "dedup fuse jobs pin")
    try:
        out = fn()
    finally:
        sc.setJobGroup(f"{group}-done", "cleared")
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    return out, len(jobs)


def test_candidate_pairs_build_is_one_fused_job(spark):
    df = _docs_frame(spark)
    pairs, n_jobs = _jobs_during(
        spark, lambda: minhash_lsh_candidate_pairs(df, "body", "doc_id")
    )
    assert n_jobs == 1, (
        f"build ran {n_jobs} jobs, expected exactly 1: the eager band "
        "checkpoint must be the sole build action and must materialize "
        "the lazy shingle sets as its side effect"
    )
    # the returned frame is consumable (sets really did materialize)
    assert pairs.count() >= 0


def test_incremental_pairs_build_is_one_fused_job(spark):
    df = _docs_frame(spark).withColumn(
        "is_new", F.col("doc_id") >= F.lit("d05")
    )
    pairs, n_jobs = _jobs_during(
        spark,
        lambda: minhash_lsh_incremental_pairs(df, "body", "doc_id", "is_new"),
    )
    assert n_jobs == 1, (
        f"build ran {n_jobs} jobs, expected exactly 1 (fused band+flags "
        "checkpoint materializing the lazy shingle sets)"
    )
    assert pairs.count() >= 0


def test_prefix_filter_build_is_one_fused_job(spark):
    df = _docs_frame(spark)
    pairs, n_jobs = _jobs_during(
        spark, lambda: prefix_filter_jaccard_pairs(df, "body", "doc_id")
    )
    assert n_jobs == 1, (
        f"build ran {n_jobs} jobs, expected exactly 1 (eager prefix "
        "checkpoint materializing the lazy shingle sets)"
    )
    assert pairs.count() >= 0
