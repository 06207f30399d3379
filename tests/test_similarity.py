"""IVF approximate-NN quality gate: recall@5 against the brute-force
exact top-k, plus bucket-structure sanity for the embedding near-dup LSH."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators import similarity as S
from tests.conftest import SF_CORRECT


def _emb(spark):
    from kinesis_stream_consumer_spark.plans.queries import _t

    return _t(spark, SF_CORRECT, "embeddings")


def test_ivf_recall_vs_brute_force(spark):
    """Recall grows monotonically with nprobe and reaches 1.0 when every
    cell is probed (exhaustive == brute force). On random embeddings the
    single-probe recall is ≈ nprobe/n_cells by construction, so the gates
    are structural, not tuned."""
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 25)
    cents = S.label_centroids(emb)
    n_cells = cents.count()

    def pairs(df):
        return {
            (r["query_id"], r["match_id"]) for r in df.select("query_id", "match_id").collect()
        }

    e = pairs(S.brute_force_topk(emb, queries, k=5))
    recalls = {}
    for nprobe in (1, 3, n_cells):
        a = pairs(S.ivf_topk(emb, queries, cents, k=5, nprobe=nprobe))
        recalls[nprobe] = len(e & a) / len(e)
    assert recalls[1] <= recalls[3] <= recalls[n_cells]
    assert recalls[n_cells] == 1.0, recalls  # all cells probed == exact
    assert recalls[3] > recalls[1], recalls  # multi-probe actually helps

    # every match must come from one of the query's probed cells
    corpus_cell = {
        r["vec_id"]: r["cell_id"]
        for r in S.ivf_assign(emb, cents).select("vec_id", "cell_id").collect()
    }
    probed = {}
    for r in S.ivf_assign(queries, cents, nprobe=3).collect():
        probed.setdefault(r["vec_id"], set()).add(r["cell_id"])
    a3 = pairs(S.ivf_topk(emb, queries, cents, k=5, nprobe=3))
    for q, m in a3:
        assert corpus_cell[m] in probed[q]


def test_banded_lsh_scales_with_corpus(spark):
    """The banded scheme's scale contract: bits (⇒ bucket count) grow with
    corpus size, each vector lands in every table, and tables are
    independent hyperplane families (different bucketings)."""
    # sizing: bucket count tracks n / target_bucket_size, clamped
    assert S.sign_bits_for(500) == 6
    assert S.sign_bits_for(5_000) < S.sign_bits_for(5_000_000)
    assert S.sign_bits_for(10) == S.LSH_MIN_BITS
    assert S.sign_bits_for(10**12) == S.LSH_MAX_BITS

    emb = _emb(spark)
    n = emb.count()
    rows = S.banded_sign_projection_rows(emb, n_tables=3, bits_per_table=6)
    assert rows.count() == 3 * n  # one slim row per (vector, table)
    per_table = {
        r["tbl"]: r["nb"]
        for r in rows.groupBy("tbl").agg(
            F.countDistinct("bucket").alias("nb")
        ).collect()
    }
    assert set(per_table) == {0, 1, 2}
    assert all(nb > 10 for nb in per_table.values())  # buckets actually used
    # different tables bucket differently (independent families)
    t01 = (
        rows.where(F.col("tbl") == 0)
        .alias("a")
        .join(rows.where(F.col("tbl") == 1).alias("b"), F.col("a.vid") == F.col("b.vid"))
        .where(F.col("a.bucket") == F.col("b.bucket"))
        .count()
    )
    assert t01 < n  # not the same partitioning


def test_sign_projection_buckets_balanced(spark):
    """Bucket histogram sanity: the 8-bit sign projection should spread
    500 vectors over many buckets with no catastrophic hot bucket (the
    property that keeps the near-dup self-join shuffle uniform)."""
    emb = _emb(spark)
    hist = (
        emb.select(S.sign_projection_bucket(F.col("embedding")).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    n_buckets = len(hist)
    biggest = max(r["count"] for r in hist)
    total = sum(r["count"] for r in hist)
    assert n_buckets > 50
    assert biggest / total < 0.10, f"hot bucket: {biggest}/{total}"


def test_near_dup_with_stats_issues_no_count_job(spark, monkeypatch):
    """When the caller supplies the corpus-size statistic (catalog/footer
    stats), the banded LSH must not pay a count() job to size its bucket
    space — and the stats-sized result is identical to the counted one."""
    from pyspark.sql import DataFrame

    from kinesis_stream_consumer_spark.plans.queries import _table_row_count

    emb = _emb(spark)
    n = emb.count()
    assert _table_row_count(SF_CORRECT, "embeddings") == n

    counted = sorted(
        map(tuple, S.embedding_near_dup_pairs(emb, threshold=0.35).collect())
    )

    def boom(self):
        raise AssertionError("count() despite caller-provided n_rows")

    monkeypatch.setattr(DataFrame, "count", boom)
    with_stats = sorted(
        map(tuple, S.embedding_near_dup_pairs(emb, threshold=0.35, n_rows=n).collect())
    )
    assert with_stats == counted


def test_kmeans_trained_centroids_power_ivf(spark):
    """The quantized Lloyd fit is a usable trained coarse quantizer:
    training reduces inertia vs its own init, the dequantized centroids
    slot into ivf_topk, and exhaustive probing still equals brute force
    (the IVF contract is independent of how centroids were trained)."""
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 25)

    fit = S.kmeans_fit_quantized(emb, k=8, n_iter=2)
    inertia_trained = fit.agg(F.sum("dist")).first()[0]
    inertia_init = S.kmeans_fit_quantized(emb, k=8, n_iter=0).agg(
        F.sum("dist")
    ).first()[0]
    assert inertia_trained < inertia_init, (inertia_trained, inertia_init)

    # every vector is assigned to exactly one of the k cells
    n = emb.count()
    assert fit.count() == n
    assert fit.select("cell_id").distinct().count() <= 8

    cents = S.kmeans_centroids_quantized(emb, k=8, n_iter=2)
    n_cells = cents.count()

    def pairs(df):
        return {
            (r["query_id"], r["match_id"])
            for r in df.select("query_id", "match_id").collect()
        }

    e = pairs(S.brute_force_topk(emb, queries, k=5))
    a_all = pairs(S.ivf_topk(emb, queries, cents, k=5, nprobe=n_cells))
    assert len(e & a_all) / len(e) == 1.0  # all cells probed == exact
    a1 = pairs(S.ivf_topk(emb, queries, cents, k=5, nprobe=1))
    assert len(e & a1) / len(e) > 0  # single probe finds something


def test_semantic_dedup_keep_first_rule(spark):
    """dedup_semantic semantics on a hand-built corpus: vectors 0/1/2 are
    near-identical (one cluster), 3 is orthogonal. The keep-first rule must
    mark 1 and 2 as duplicates of 0 (the smallest cell-mate above τ), never
    0 itself, and never the orthogonal vector."""
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),
        (2, [0.998, 0.02, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: (r["dup_of"], r["cosine_sim"])
        for r in S.semantic_dedup(df, k=2, n_iter=1, threshold=0.9).collect()
    }
    assert set(out) == {1, 2}
    assert out[1][0] == 0 and out[2][0] == 0
    assert out[1][1] >= 0.99 and out[2][1] >= 0.99


def test_pq_adc_recall_vs_brute_force(spark):
    """PQ-ADC top-5 must overlap substantially with the exact top-5: with
    m=8 subspaces × 16 centroids on 500 random vectors the quantization
    error is small relative to neighbor gaps. Gate is structural (>40%
    recall@5 averaged over 10 queries), not tuned."""
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["match_id"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    # pure ADC on random vectors (PQ's worst case) sits around 0.25;
    # the exact re-rank of the ADC top-40 recovers most of it
    adc_only = {
        (r["query_id"], r["match_id"])
        for r in S.pq_adc_topk(emb, queries, m=8, k=16, n_iter=2, topk=5).collect()
    }
    reranked = {
        (r["query_id"], r["match_id"])
        for r in S.pq_adc_topk(
            emb, queries, m=8, k=16, n_iter=2, topk=5, rerank=40
        ).collect()
    }
    r_adc = len(exact & adc_only) / len(exact)
    r_rr = len(exact & reranked) / len(exact)
    assert r_rr > 0.6, f"PQ+rerank recall@5 too low: {r_rr}"
    assert r_rr > r_adc, (r_rr, r_adc)  # the refine step actually helps


def test_pq_codes_are_slim(spark):
    """The encoded corpus is m rows per vector with small-int codes — the
    32× compression the ADC scan rides on."""
    emb = _emb(spark)
    codes, cents = S.pq_fit(emb, m=8, k=16, n_iter=1)
    n = emb.count()
    assert codes.count() == 8 * n
    mx = codes.agg(F.max("code")).first()[0]
    assert 0 <= mx < 16
    # codebooks: m · k · sub_dim rows at most (empty cells may drop)
    assert cents.count() <= 8 * 16 * 8


def test_pq_fused_pack_equals_argmin_then_pack(spark):
    """pq_fit(pack=True) — the fused vid-keyed conditional-min encode —
    must produce EXACTLY the frame pack_pq_codes builds from the
    per-(vid, sub) argmin codes: same vids, same code array per vid.
    Pins the r7 fusion (one exchange on vid replacing the argmin + pack
    pair) as a pure plan change, not a semantic one."""
    emb = _emb(spark)
    codes, cents_a = S.pq_fit(emb, m=8, k=16, n_iter=2)
    packed_ref = {
        r.vid: list(r.carr) for r in S.pack_pq_codes(codes).collect()
    }
    packed_fused, cents_b = S.pq_fit(emb, m=8, k=16, n_iter=2, pack=True)
    got = {r.vid: list(r.carr) for r in packed_fused.collect()}
    assert got == packed_ref
    # same training recurrence → identical codebooks
    assert sorted(map(tuple, cents_a.collect())) == sorted(
        map(tuple, cents_b.collect())
    )


def test_ivfpq_exhaustive_probe_equals_full_pq_scan(spark):
    """With nprobe = every coarse cell the inverted-list restriction is a
    no-op, so IVF-PQ must reproduce the full-scan PQ result EXACTLY (same
    codebooks, same ADC table, same re-rank) — pins the composition
    without tuned thresholds. A partial probe returns a subset-or-equal
    quality result over ~nprobe/k of the corpus."""
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 10)
    full = S.pq_adc_topk(
        emb, queries, m=8, k=16, n_iter=2, topk=5, rerank=40
    )
    every = S.ivfpq_topk(
        emb, queries, coarse_k=8, nprobe=8, m=8, k=16, n_iter=2, topk=5,
        rerank=40,
    )

    def rows(df):
        return sorted(
            (r["query_id"], r["match_id"], r["rnk"]) for r in df.collect()
        )

    # Results ordered identically; qdist vs qdist — both integer metrics
    # over the same quantized vectors, so the ranked ids must coincide
    assert rows(every) == rows(full)
    partial = S.ivfpq_topk(
        emb, queries, coarse_k=8, nprobe=3, m=8, k=16, n_iter=2, topk=5,
        rerank=40,
    )
    assert partial.count() == 50  # 10 queries × top-5, cells never empty


def test_mips_augmentation_preserves_inner_product_order(spark):
    """The MIPS→cosine augmentation (mips_augment): ranking by cosine
    over AUGMENTED vectors reproduces the exact inner-product top-k ids
    and order — the property that lets every cosine ANN index serve MIPS
    unchanged. M is the corpus max norm (one scalar aggregate)."""
    emb = _emb(spark)
    queries = emb.where(F.col("vec_id") < 10)
    m_norm = float(
        emb.select(
            F.sqrt(
                F.aggregate(
                    F.transform(F.col("embedding"), lambda x: x.cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x * x,
                )
            ).alias("n")
        )
        .agg(F.max("n"))
        .first()[0]
    )
    exact = S.mips_topk(emb, queries, k=5)
    aug_v = S.mips_augment(emb, m_norm)
    aug_q = S.mips_augment(queries, m_norm, is_query=True)
    via_cosine = S.brute_force_topk(aug_v, aug_q, k=5)

    def rows(df):
        return sorted(
            (r["query_id"], r["rnk"], r["match_id"]) for r in df.collect()
        )

    assert rows(exact) == rows(via_cosine)
