"""Corpus-curation queries: deterministic splits, stratified sampling,
per-source quotas, context-window packing, contamination checks, PII
scrubbing (SURVEY §2.3 extensions over the documents table).

Every oracle replicates the Spark computation arithmetically — the same
md5-bucket assignment (DuckDB ``md5_number_upper`` ≡ dedup.md5_u64_le), the
same window frames, the same regexes — so the driver's value-hash compare
is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators import curation as C
from kinesis_stream_consumer_spark.operators import text as T
from kinesis_stream_consumer_spark.plans.llm_pipeline import _SHINGLE_ROWS
from kinesis_stream_consumer_spark.plans.queries import _t, register

# DuckDB mirror of curation.hash_bucket (md5_number_upper ≡ md5_u64_le,
# proven by the minhash parity suite).
_HB = (
    "CAST(md5_number_upper(CAST({col} AS VARCHAR))::HUGEINT"
    f" % {C.HASH_BUCKETS} AS INT)"
)

_BPE_TOKS = r"len(regexp_extract_all(text, '[A-Za-z]+|\d+|[^\w\s]'))"


@register(
    "curation_contamination",
    f"""
    WITH {_SHINGLE_ROWS},
    hb AS (
      SELECT doc_id, {_HB.format(col='doc_id')} AS _hb FROM documents
    ),
    rows0 AS (
      SELECT sh.doc_id, shingle, _hb FROM sh JOIN hb USING (doc_id)
    ),
    informative AS (
      SELECT shingle FROM rows0 GROUP BY shingle HAVING COUNT(*) <= 100
    ),
    rows1 AS (
      SELECT rows0.doc_id, rows0.shingle, rows0._hb
      FROM rows0 JOIN informative USING (shingle)
    ),
    eval_sh AS (
      SELECT DISTINCT shingle FROM rows1 WHERE _hb < 500
    ),
    hits AS (
      SELECT DISTINCT doc_id, rows1.shingle
      FROM rows1 JOIN eval_sh USING (shingle)
      WHERE _hb >= 500
    )
    SELECT doc_id, COUNT(*) AS n_shared_shingles
    FROM hits GROUP BY doc_id ORDER BY doc_id
    """,
    doc="Train/eval contamination check: train docs sharing any informative "
    "3-shingle with the (deterministic 5%) eval slice. Shingles with "
    "document frequency > 100 are dropped first — boilerplate is "
    "uninformative AND the skew killer for the shingle equi-join; the "
    "match is then an equi-join on a bounded-fanout key. The standard "
    "pre-training hygiene pass at 100 TB.",
)
def curation_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    # rebalance: shingle materialization dominates and fuses onto the scan
    # stage (measured +19% without it at sf0.1/local[32]).
    docs = _t(spark, sf_dir, "documents", rebalance=True)
    return (
        C.ngram_contamination(docs, "text", "doc_id", 500, 3, 100)
        .withColumnRenamed("doc", "doc_id")
        .orderBy("doc_id")
    )


_MIX_WEIGHTS = {"src0": 4, "src1": 2}  # every other source: weight 1


@register(
    "curation_mixture_sample",
    f"""
    WITH hb AS (
      SELECT doc_id, source, {_HB.format(col='doc_id')} AS _hb FROM documents
    ),
    counts AS (
      SELECT source, COUNT(*) AS n,
             CASE WHEN source = 'src0' THEN 4
                  WHEN source = 'src1' THEN 2
                  ELSE 1 END AS w
      FROM documents GROUP BY source
    ),
    tot AS (SELECT SUM(n) AS n_total, SUM(w) AS sumw FROM counts),
    tgt AS (
      SELECT source, n,
             LEAST(n, CAST(FLOOR(w / sumw * (n_total // 5) + 0.5) AS INT))
               AS target
      FROM counts CROSS JOIN tot
    ),
    th AS (
      SELECT source, target,
             LEAST({C.HASH_BUCKETS},
                   CAST(CEIL({C.HASH_BUCKETS} * (CAST(1.5 AS DOUBLE) * target / n
                          + CAST(32 AS DOUBLE) / n)) AS INT)) AS thresh
      FROM tgt
    ),
    r AS (
      SELECT hb.doc_id, hb.source, th.target,
             ROW_NUMBER() OVER (PARTITION BY hb.source
                                ORDER BY _hb, hb.doc_id) AS rnk
      FROM hb JOIN th USING (source)
      WHERE _hb < th.thresh
    )
    SELECT doc_id, source FROM r WHERE rnk <= target
    ORDER BY source, doc_id
    """,
    doc="Domain-mixture sampling: 20%-of-corpus sample whose composition "
    "follows integer mixture weights (src0 4×, src1 2×, rest 1×), each "
    "source capped at its own size — the 'upsample wiki, downsample crawl' "
    "pretraining-mix primitive. Deterministic smallest-hash-first "
    "selection; targets are a model-sized (source, target, thresh) table "
    "computed from a count-only aggregate and broadcast back; the "
    "stratified two-phase prefilter keeps the rank window off the full "
    "corpus. Integer weights make the normalizer exact cross-engine.",
)
def curation_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        C.mixture_sample(docs, "source", "doc_id", _MIX_WEIGHTS)
        .select("doc_id", "source")
        .orderBy("source", "doc_id")
    )


@register(
    "curation_length_filter",
    f"""
    WITH s AS (
      SELECT doc_id, lang, {_BPE_TOKS} AS n_tok FROM documents
    ),
    r AS (
      SELECT lang, n_tok,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_tok, doc_id) AS rnk,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM s
    ),
    kept AS (SELECT * FROM r WHERE 20 * rnk > n AND 20 * rnk <= 19 * n)
    SELECT lang,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST((2 * 10000 * COUNT(*) + MAX(n)) // (2 * MAX(n))
                AS BIGINT) AS kept_bp,
           CAST(MIN(n_tok) AS BIGINT) AS min_tok_kept,
           CAST(MAX(n_tok) AS BIGINT) AS max_tok_kept
    FROM kept GROUP BY lang ORDER BY lang
    """,
    doc="Adaptive per-language length filtering — the standard curation "
    "gate that drops each language's shortest and longest 5% of "
    "documents by token count, with thresholds DERIVED from that "
    "language's own distribution rather than one global cutoff (a "
    "fixed cutoff tuned on English over-prunes languages with different "
    "tokenization density). The percentile band is EXACT rank "
    "arithmetic (keep iff 20*rank > n and 20*rank <= 19*n, ties broken "
    "by doc_id) — no approx-percentile sketch whose error bounds differ "
    "cross-engine. Reports the kept fraction (half-up bp) and the "
    "induced per-language token bounds. Scale shape: ONE shuffle on "
    "lang serves the rank window, the partition count and the rollup; "
    "token counting is codegen'd regex on the scan.",
)
def curation_length_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = _t(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id", "lang", T.bpe_ish_token_count(F.col("text")).alias("n_tok")
    )
    r = s.select(
        "lang",
        "n_tok",
        F.row_number()
        .over(W.partitionBy("lang").orderBy("n_tok", "doc_id"))
        .alias("rnk"),
        F.count(F.lit(1)).over(W.partitionBy("lang")).alias("n"),
    )
    kept = r.where(
        (20 * F.col("rnk") > F.col("n")) & (20 * F.col("rnk") <= 19 * F.col("n"))
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.max("n").cast("long").alias("n_docs"),
            F.count(F.lit(1)).cast("long").alias("n_kept"),
            F.expr(
                "cast((2 * 10000 * count(*) + max(n)) div (2 * max(n)) as bigint)"
            ).alias("kept_bp"),
            F.min("n_tok").cast("long").alias("min_tok_kept"),
            F.max("n_tok").cast("long").alias("max_tok_kept"),
        )
        .orderBy("lang")
    )
