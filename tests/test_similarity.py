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
