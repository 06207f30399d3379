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


@register(
    "curation_temperature_mixture",
    """
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1
    ),
    w AS (
      SELECT source, n_docs,
             CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT) AS weight
      FROM counts
    ),
    tot AS (SELECT CAST(SUM(weight) AS BIGINT) AS total_w,
                   CAST(SUM(n_docs) AS BIGINT) AS total_n FROM w)
    SELECT w.source AS source, w.n_docs, w.weight,
           CAST((2 * 10000 * w.n_docs + tot.total_n)
                  // (2 * tot.total_n) AS BIGINT) AS natural_bp,
           CAST((2 * 10000 * w.weight + tot.total_w)
                  // (2 * tot.total_w) AS BIGINT) AS temp_bp
    FROM w CROSS JOIN tot
    ORDER BY w.source
    """,
    doc="Temperature-scaled source-mixture weights (T5/PaLM-style α = 0.5 "
    "upsampling): target share ∝ n_source^0.5, flattening the natural "
    "distribution so head sources stop drowning the tail. Exactness "
    "trick: n^0.5 is taken as FLOOR(SQRT(n)) — IEEE sqrt is correctly "
    "rounded, so the integer floor is bit-identical cross-engine, and "
    "every share is then an exact half-up integer basis point (no float "
    "accumulation; contrast log-space temperatures which drift). Output "
    "pairs the natural share with the temperature share per source — the "
    "curation table a mixture sampler consumes. Scale shape: ONE corpus "
    "aggregate (map-side combine) to #sources rows; the total rides as a "
    "second #sources-bounded aggregate joined back (AQE broadcasts).",
)
def curation_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    w = counts.withColumn(
        "weight",
        F.expr("CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT)"),
    ).localCheckpoint(eager=True)
    total_w, total_n = w.agg(F.sum("weight"), F.sum("n_docs")).collect()[0]
    return w.select(
        "source",
        "n_docs",
        "weight",
        F.expr(
            f"CAST((2 * 10000 * n_docs + {total_n})"
            f" div (2 * {total_n}) AS BIGINT)"
        ).alias("natural_bp"),
        F.expr(
            f"CAST((2 * 10000 * weight + {total_w})"
            f" div (2 * {total_w}) AS BIGINT)"
        ).alias("temp_bp"),
    ).orderBy("source")


@register(
    "curation_bloom_novelty",
    f"""
    WITH dg AS (SELECT doc_id, md5(text) AS dg FROM documents),
    ref AS (SELECT doc_id, dg FROM dg WHERE doc_id % 2 = 0),
    cand AS (SELECT doc_id, dg FROM dg WHERE doc_id % 2 = 1),
    js AS (SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS j),
    bits AS (
      SELECT DISTINCT
             CAST((md5_number_upper(CAST(j AS VARCHAR) || '|' || dg) >> 8)
                  % {_BLOOM_M} AS BIGINT) AS pos
      FROM ref CROSS JOIN js
    ),
    probe AS (
      SELECT c.doc_id, c.dg,
             CAST((md5_number_upper(CAST(j AS VARCHAR) || '|' || c.dg) >> 8)
                  % {_BLOOM_M} AS BIGINT) AS pos
      FROM cand c CROSS JOIN js
    ),
    hits AS (
      SELECT doc_id, dg, COUNT(b.pos) AS n_set
      FROM probe p LEFT JOIN bits b USING (pos)
      GROUP BY 1, 2
    ),
    rd AS (SELECT DISTINCT dg FROM ref)
    SELECT h.doc_id,
           (h.n_set = {_BLOOM_K}) AS bloom_hit,
           (rd.dg IS NOT NULL) AS exact_dup
    FROM hits h LEFT JOIN rd ON rd.dg = h.dg
    ORDER BY h.doc_id
    """,
    doc="Bloom-filter novelty probe (Bloom 1970) — the MEMBERSHIP sketch "
    "closing the sketch family (CMS frequency / HLL cardinality / "
    "histogram distribution / Bloom membership): a reference half of the "
    f"corpus sets {_BLOOM_K} md5-salted bits in an {_BLOOM_M}-bit filter; "
    "every candidate doc reports whether ALL its probe bits are set "
    "(bloom_hit) next to ground truth (exact_dup), so false positives — "
    "the sketch's one error mode; false negatives are impossible — are "
    "visible row by row (37 FPs at sf0.01's 62% fill). The incremental-"
    "corpus use: yesterday's filter is m BITS regardless of corpus size, "
    "and novelty-checking today's batch is a map-side hash + one join "
    "against the ≤m-row bit table — where the exact check (the baseline "
    "alongside) shuffles every reference digest. Filter size is fixed "
    "small ON PURPOSE so the FP mode actually fires and gets checked "
    "(the CMS width-32 precedent); production sizes m ≈ 10·n_ref bits "
    "from table stats and nothing structural changes. All equi-joins on "
    "uniform md5 positions/digests; bit construction combines map-side "
    "(partial distinct), so the shuffle is bounded by m, not n_ref.",
)
def curation_bloom_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators import dedup as D

    docs = _t(spark, sf_dir, "documents")
    dg = docs.select("doc_id", D.exact_digest(F.col("text")).alias("dg"))
    ref = dg.where(F.col("doc_id") % 2 == 0)
    cand = dg.where(F.col("doc_id") % 2 == 1)
    js = F.array(*[F.lit(j) for j in range(_BLOOM_K)])
    pos = (
        D.md5_u56_le(F.concat(F.col("j").cast("string"), F.lit("|"), F.col("dg")))
        % _BLOOM_M
    ).alias("pos")
    bits = (
        ref.select(F.explode(js).alias("j"), "dg").select(pos).distinct()
    )
    probe = cand.select("doc_id", "dg", F.explode(js).alias("j")).select(
        "doc_id", "dg", pos
    )
    hits = (
        probe.join(bits.withColumnRenamed("pos", "bpos"),
                   F.col("pos") == F.col("bpos"), "left")
        .groupBy("doc_id", "dg")
        .agg(F.count("bpos").alias("n_set"))
    )
    # exact-baseline join is UNHINTED: the reference digest set is
    # row-scaled (corpus/2), so AQE picks broadcast locally and falls
    # back to shuffle join at scale (the stats-gated-broadcast rule)
    rd = ref.select("dg").distinct().withColumnRenamed("dg", "rdg")
    return (
        hits.join(rd, F.col("dg") == F.col("rdg"), "left")
        .select(
            "doc_id",
            (F.col("n_set") == _BLOOM_K).alias("bloom_hit"),
            F.col("rdg").isNotNull().alias("exact_dup"),
        )
        .orderBy("doc_id")
    )


# --- Deterministic round-robin source interleave (curriculum ordering) ------

_ILV_TOP = 60


# --- Token-budget mixture apportionment (largest remainder) -----------------

_BUDGET_TOKENS = 50_000


@register(
    "curation_token_budget_mix",
    f"""
    WITH avail AS (
      SELECT source,
             CAST(1 + CAST(regexp_extract(source, '[0-9]+') AS BIGINT) % 5
                  AS BIGINT) AS w,
             CAST(SUM({_BPE_TOKS}) AS BIGINT) AS avail_tokens
      FROM documents GROUP BY 1
    ),
    sh AS (
      SELECT *, CAST(SUM(w) OVER () AS BIGINT) AS w_tot FROM avail
    ),
    fl AS (
      SELECT *,
             CAST(({_BUDGET_TOKENS}*w) // w_tot AS BIGINT) AS floor_alloc,
             CAST(({_BUDGET_TOKENS}*w) % w_tot AS BIGINT) AS rem
      FROM sh
    ),
    rk AS (
      SELECT *,
             CAST({_BUDGET_TOKENS} - SUM(floor_alloc) OVER () AS BIGINT)
               AS leftover,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rrank
      FROM fl
    )
    SELECT source, w, avail_tokens,
           CAST(floor_alloc + CASE WHEN rrank <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens,
           CAST(LEAST(floor_alloc
                        + CASE WHEN rrank <= leftover THEN 1 ELSE 0 END,
                      avail_tokens) AS BIGINT) AS capped_tokens,
           CAST(GREATEST(floor_alloc
                           + CASE WHEN rrank <= leftover THEN 1 ELSE 0 END
                           - avail_tokens, 0) AS BIGINT) AS shortfall_tokens
    FROM rk ORDER BY source
    """,
    doc="Token-budget apportionment across sources by largest-remainder "
    "(Hamilton) method — the planning query behind 'fill a 50k-token "
    "training budget at these mixture weights': integer weights derived "
    "from the source id, exact floor quotas, and the leftover "
    "B − Σfloor distributed to the largest remainders (ties to source "
    "name), so allocations sum EXACTLY to the budget with no float "
    "drift — then capped at per-source availability with the shortfall "
    "made visible (feed it to mixture_sample's strict mode). Per-doc "
    "token counts are the BPE-ish regex count computed map-side (no "
    "explode); everything after the one source groupBy runs on a "
    "#sources-bounded frame, where the unpartitioned windows are safe "
    "at any corpus size.",
)
def curation_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = _t(spark, sf_dir, "documents")
    avail = (
        docs.select(
            "source",
            F.size(
                F.expr(r"regexp_extract_all(text, '[A-Za-z]+|\\d+|[^\\w\\s]', 0)")
            ).cast("long").alias("toks"),
        )
        .groupBy("source")
        .agg(F.sum("toks").cast("long").alias("avail_tokens"))
        .withColumn(
            "w",
            (1 + F.regexp_extract("source", "[0-9]+", 0).cast("long") % 5)
            .cast("long"),
        )
    )
    wall = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    fl = (
        avail.withColumn("w_tot", F.sum("w").over(wall).cast("long"))
        .withColumn(
            "floor_alloc",
            F.expr(f"({_BUDGET_TOKENS}*w) div w_tot"),
        )
        .withColumn("rem", F.expr(f"({_BUDGET_TOKENS}*w) % w_tot"))
    )
    rk = fl.withColumn(
        "leftover",
        (F.lit(_BUDGET_TOKENS) - F.sum("floor_alloc").over(wall)).cast("long"),
    ).withColumn(
        "rrank",
        F.row_number().over(W.orderBy(F.col("rem").desc(), "source")),
    )
    bonus = F.when(F.col("rrank") <= F.col("leftover"), 1).otherwise(0)
    return rk.select(
        "source",
        "w",
        "avail_tokens",
        (F.col("floor_alloc") + bonus).cast("long").alias("alloc_tokens"),
        F.least(
            (F.col("floor_alloc") + bonus).cast("long"), F.col("avail_tokens")
        ).alias("capped_tokens"),
        F.greatest(
            (F.col("floor_alloc") + bonus - F.col("avail_tokens")).cast("long"),
            F.lit(0).cast("long"),
        ).alias("shortfall_tokens"),
    ).orderBy("source")


# --- Quality-filter funnel audit ---------------------------------------------

_FUNNEL_MIN_CHARS = 100
_FUNNEL_MIN_WORDS = 20
_FUNNEL_MAX_AVG_WLEN = 5  # avg word length (chars) upper bound
_EN_STOP_SQL = (
    "('the','and','of','to','in','is','that','for','with','as')"
)
