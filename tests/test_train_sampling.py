"""Sample-based index training parity: the Lloyd iterations train on a
deterministic id-modulus sample (the 100 TB practice — training cost is
bounded by points-per-centroid, not corpus size) while the final
assignment/encode pass covers every vector. The driver's sf0.01 corpus is
small enough that the production sizing yields s=1 (no sampling), so this
suite forces s=2 via a smaller per-centroid budget and checks the Spark
dataflow against the SQL oracle CTEs on the SAMPLED path — the code that
actually runs at scale."""

from __future__ import annotations

import duckdb
import pytest

from kinesis_stream_consumer_spark.operators import similarity as S
from kinesis_stream_consumer_spark.plans.llm_pipeline import (
    _kmeans_ctes,
    _pq_ctes,
)
from tests.conftest import SF_CORRECT

N_EMB = 500  # sf0.01 embeddings rows


def _duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_CORRECT}/embeddings.parquet')"
    )
    return con


def test_modulus_formula_matches_oracle_expression():
    # Spark side computes s from table stats; the oracle from COUNT(*).
    # Same formula, same floor semantics.
    for n, k, per in [(500, 8, 31), (500, 16, 15), (5000, 8, 64),
                      (100, 8, 64), (10_000_000, 32, 64)]:
        assert S.train_sample_modulus(n, k, per) == max(1, n // (per * k))


def test_kmeans_sampled_training_matches_oracle(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    per = 31  # 500 // (31*8) = 2 — forces the sampled path
    mod = S.train_sample_modulus(N_EMB, 8, per)
    assert mod == 2
    fit = S.kmeans_fit_quantized(emb, 8, 2, sample_mod=mod)
    got = {
        (r["vec_id"], r["cell_id"], r["dist"])
        for r in fit.collect()
    }
    assert len(got) == N_EMB  # final assignment covers the FULL corpus
    con = _duck()
    want = {
        tuple(r)
        for r in con.execute(
            f"WITH {_kmeans_ctes(8, 2, per_cent=per)} "
            "SELECT vid, cell, CAST(dist AS BIGINT) FROM fa"
        ).fetchall()
    }
    assert got == want


def test_kmeans_sampled_differs_from_full_fit(spark):
    """The sample genuinely changes the trained model (otherwise the knob
    is dead code): centroids from 250 training points differ from
    centroids trained on all 500."""
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    _, c_full = S.kmeans_fit_quantized(emb, 8, 2, return_model=True)
    _, c_samp = S.kmeans_fit_quantized(
        emb, 8, 2, return_model=True, sample_mod=2
    )
    full = {(r["cell"], r["pos"]): r["qc"] for r in c_full.collect()}
    samp = {(r["cell"], r["pos"]): r["qc"] for r in c_samp.collect()}
    assert full != samp


def test_pq_sampled_training_matches_oracle(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    per = 15  # 500 // (15*16) = 2
    mod = S.train_sample_modulus(N_EMB, 16, per)
    assert mod == 2
    codes, _ = S.pq_fit(emb, 8, 16, 2, sample_mod=mod)
    got = {(r["vid"], r["sub"], r["code"]) for r in codes.collect()}
    assert len(got) == N_EMB * 8  # every vector × every subspace encoded
    con = _duck()
    want = {
        tuple(r)
        for r in con.execute(
            f"WITH {_pq_ctes(8, 16, 2, per_cent=per)} "
            "SELECT vid, sub, cell FROM fa"
        ).fetchall()
    }
    assert got == want
