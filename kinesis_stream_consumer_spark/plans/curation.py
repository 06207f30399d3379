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




# --- Bloom-filter membership probe (the membership sketch) -----------------

_BLOOM_M = 1024  # bits
_BLOOM_K = 4     # salted hash functions


_PRUNE_TAUS_BP = (2000, 4000, 6000, 8000)


@register(
    "curation_quality_prune_sweep",
    f"""
    WITH feats AS (
      SELECT doc_id,
             LENGTH(text) AS n_chars,
             len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
             len(list_filter(
               regexp_split_to_array(trim(lower(text)), '\\s+'),
               t -> t IN ('the','and','of','to','in','is','that','for',
                          'with','as'))) AS n_stop
      FROM documents
    ),
    scored AS (
      SELECT doc_id, n_tokens,
             FLOOR((0.5 * LEAST(n_tokens / 20.0, 1.0)
                  + 0.5 * LEAST(FLOOR((n_stop / GREATEST(n_tokens, 1))
                                      * 10000.0 + 0.5) / 10000.0 * 5.0, 1.0)
                  - 0.25 * LEAST(FLOOR((n_punct / GREATEST(n_chars, 1))
                                       * 10000.0 + 0.5) / 10000.0 * 5.0,
                                 1.0)) * 10000.0 + 0.5) / 10000.0 AS q
      FROM feats
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS td,
                   CAST(SUM(n_tokens) AS BIGINT) AS tt FROM scored),
    sweep AS (
      SELECT tau_bp,
             CAST(COUNT(*) FILTER
                  (WHERE q >= CAST(tau_bp AS DOUBLE) / 10000.0)
                  AS BIGINT) AS n_docs_kept,
             CAST(COALESCE(SUM(n_tokens) FILTER
                  (WHERE q >= CAST(tau_bp AS DOUBLE) / 10000.0), 0)
                  AS BIGINT) AS n_tokens_kept
      FROM scored, (SELECT unnest({list(_PRUNE_TAUS_BP)}) AS tau_bp)
      GROUP BY 1
    )
    SELECT CAST(tau_bp AS BIGINT) AS tau_bp, n_docs_kept, n_tokens_kept,
           CAST((2 * 10000 * n_docs_kept + tot.td) // (2 * tot.td)
                AS BIGINT) AS doc_share_bp,
           CAST((2 * 10000 * n_tokens_kept + tot.tt) // (2 * tot.tt)
                AS BIGINT) AS token_share_bp
    FROM sweep CROSS JOIN tot ORDER BY tau_bp
    """,
    doc="Quality-threshold operating curve — the tuning sweep a curation "
    "pipeline runs before fixing its prune level (the analogue of the "
    "IVF nprobe sweep for the cleaning stage): docs and tokens retained "
    f"at quality ≥ τ for τ ∈ {_PRUNE_TAUS_BP} bp, from ONE scoring pass "
    "(the corpus is scored once, checkpointed, and the 4-way sweep is a "
    "literal-array explode over the slim (doc, tokens, score) frame — "
    "never four scans). Thresholds compare as CAST(bp AS DOUBLE)/1e4 on "
    "both engines (the documented decimal-vs-double literal trap); "
    "shares are exact half-up basis points against driver-scalar "
    "totals.",
)
def curation_quality_prune_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        F.size(T.tokens(F.col("text"))).cast("long").alias("n_tokens"),
        T.quality_score(F.col("text")).alias("q"),
    ).localCheckpoint(eager=True)
    td, tt = scored.agg(
        F.count(F.lit(1)), F.sum("n_tokens")
    ).collect()[0]
    sweep = (
        scored.select(
            "n_tokens",
            "q",
            F.explode(
                F.array(*[F.lit(t) for t in _PRUNE_TAUS_BP])
            ).alias("tau_bp"),
        )
        .groupBy("tau_bp")
        .agg(
            F.sum(
                F.expr(
                    "CASE WHEN q >= CAST(tau_bp AS DOUBLE) / 10000.0"
                    " THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("n_docs_kept"),
            F.sum(
                F.expr(
                    "CASE WHEN q >= CAST(tau_bp AS DOUBLE) / 10000.0"
                    " THEN n_tokens ELSE 0 END"
                )
            )
            .cast("long")
            .alias("n_tokens_kept"),
        )
    )
    return sweep.select(
        F.col("tau_bp").cast("long").alias("tau_bp"),
        "n_docs_kept",
        "n_tokens_kept",
        F.expr(
            f"CAST((2 * 10000 * n_docs_kept + {td}) div (2 * {td})"
            " AS BIGINT)"
        ).alias("doc_share_bp"),
        F.expr(
            f"CAST((2 * 10000 * n_tokens_kept + {tt}) div (2 * {tt})"
            " AS BIGINT)"
        ).alias("token_share_bp"),
    ).orderBy("tau_bp")


# --- Deterministic round-robin source interleave (curriculum ordering) ------

_ILV_TOP = 60


# --- Token-budget mixture apportionment (largest remainder) -----------------

_BUDGET_TOKENS = 50_000


# --- Quality-filter funnel audit ---------------------------------------------

_FUNNEL_MIN_CHARS = 100
_FUNNEL_MIN_WORDS = 20
_FUNNEL_MAX_AVG_WLEN = 5  # avg word length (chars) upper bound
_EN_STOP_SQL = (
    "('the','and','of','to','in','is','that','for','with','as')"
)


_CURRICULUM_PHASES = ((1, 0, 220), (2, 220, 380), (3, 380, 1 << 30))
_CUR_BPE = r"len(regexp_extract_all(text, '[A-Za-z]+|\d+|[^\w\s]'))"


@register(
    "curation_curriculum_schedule",
    f"""
    WITH d AS (
      SELECT source, {_CUR_BPE} AS n_tok,
             CASE {' '.join(f"WHEN n_chars >= {lo} AND n_chars < {hi} THEN {p}" for p, lo, hi in _CURRICULUM_PHASES)}
             END AS phase
      FROM documents
    ),
    g AS (
      SELECT phase, source, COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens
      FROM d GROUP BY 1, 2
    ),
    pt AS (SELECT phase, SUM(n_tokens) AS phase_tokens FROM g GROUP BY 1)
    SELECT g.phase, g.source,
           CAST(g.n_docs AS BIGINT) AS n_docs,
           CAST(g.n_tokens AS BIGINT) AS n_tokens,
           CAST((20000 * g.n_tokens + pt.phase_tokens)
                // (2 * pt.phase_tokens) AS BIGINT) AS phase_share_bp
    FROM g JOIN pt USING (phase)
    ORDER BY phase, source
    """,
    doc="Length-curriculum training schedule: documents are binned into "
    "three phases by length (short-first warmup -> mid -> long-context "
    "polish, the standard sequence-length curriculum) and each phase "
    "reports its per-source token mass and mixture share in basis "
    "points — the manifest a trainer's data loader consumes per phase. "
    "Pure map-side phase/token projection, one (phase, source) counting "
    "aggregate, and a #phases-bounded rollup joined back — shuffles "
    "carry counts only, #sources x #phases rows. Complements "
    "curation_temperature_mixture (which reweights one phase) and "
    "curation_epoch_shuffle (which orders within one).",
)
def curation_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    expr = "CASE " + " ".join(
        f"WHEN n_chars >= {lo} AND n_chars < {hi} THEN {p}"
        for p, lo, hi in _CURRICULUM_PHASES
    ) + " END"
    d = docs.select(
        "source",
        T.bpe_ish_token_count(F.col("text")).cast("long").alias("n_tok"),
        F.expr(expr).alias("phase"),
    )
    g = d.groupBy("phase", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
    )
    pht = g.groupBy("phase").agg(F.sum("n_tokens").alias("phase_tokens"))
    return (
        g.join(F.broadcast(pht), "phase")
        .select(
            "phase",
            "source",
            "n_docs",
            "n_tokens",
            F.expr(
                "(20000 * n_tokens + phase_tokens) div (2 * phase_tokens)"
            )
            .cast("long")
            .alias("phase_share_bp"),
        )
        .orderBy("phase", "source")
    )
