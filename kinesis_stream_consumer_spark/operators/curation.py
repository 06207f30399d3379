"""Dataset-curation operators for training-data pipelines: deterministic
splits, stratified sampling, per-source quotas, context-window packing,
train/eval contamination checks, PII scrubbing.

These extend the engine beyond the reference's streaming surface (SURVEY
§2.3): the corpus-management operations a 100 TB pretraining pipeline runs
after ingest and dedup. Scale discipline throughout: hashing is md5-based
column expressions (cross-engine deterministic — DuckDB ``md5_number_upper``
parity via dedup.md5_u64_le), assignment/filter stages are map-side only,
and every shuffle is on a high-cardinality key (source, shingle) with
map-side combine — never on a low-cardinality stratum alone.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_stream_consumer_spark.operators.dedup import md5_u64_le, shingle_rows

# Bucket granularity for hash-based assignment. 10k buckets = 0.01%
# resolution, plenty for split fractions while keeping the modulus tiny.
HASH_BUCKETS = 10_000


def hash_bucket(col: Column, n_buckets: int = HASH_BUCKETS) -> Column:
    """Uniform deterministic bucket in [0, n_buckets) from the md5 of the
    value.

    The right primitive for split/sample assignment at scale: stable across
    runs, engines, partitionings, and cluster sizes (``rand(seed)`` is not —
    it depends on row order within partitions), and stable under corpus
    growth: a document's bucket never changes when other documents are
    added or removed."""
    return F.pmod(md5_u64_le(col.cast("string")), F.lit(n_buckets)).cast("int")


def train_val_test_split(
    df: DataFrame, id_col: str, val_pct: int = 10, test_pct: int = 10
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'val' | 'test') by hash bucket.

    Map-side only — no shuffle, no driver state; the split is a pure
    function of the id, so re-running over a grown corpus keeps every
    existing document in its original split (the property that keeps eval
    sets eval)."""
    b = hash_bucket(F.col(id_col))
    val_lo = HASH_BUCKETS - (val_pct + test_pct) * HASH_BUCKETS // 100
    test_lo = HASH_BUCKETS - test_pct * HASH_BUCKETS // 100
    return df.withColumn(
        "split",
        F.when(b < val_lo, F.lit("train"))
        .when(b < test_lo, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    fraction: float,
    margin: float = 1.5,
    slack_rows: int = 32,
) -> DataFrame:
    """Proportional stratified sample (ceil(fraction·n) rows per stratum,
    smallest-hash-first), two-phase for scale:

    1. map-side hash-threshold prefilter with a PER-STRATUM threshold of
       margin·fraction + slack_rows/n — at 100 TB (n large) this discards
       ~(1 − margin·fraction) of the corpus before anything shuffles,
       while tiny strata keep (nearly) all rows, so the absolute
       slack_rows headroom makes a phase-1 shortfall vanishingly unlikely
       at every stratum size (Chernoff: the kept count concentrates
       around margin·target + slack_rows);
    2. exact per-stratum rank over the survivors. Ranking is BY the hash,
       so the smallest-hash rows always survive phase 1 and the result
       equals the rank over the full stratum whenever phase 1 kept
       ≥ target rows.

    Stratum sizes/targets come from a count-only aggregate (map-side
    partial counts; only (stratum, count) rows move) broadcast back in.
    The rank window partitions by stratum — with few strata that stage
    serializes, but it runs over the prefiltered ~fraction-sized survivor
    set, not the corpus."""
    targets = df.groupBy(strata_col).agg(
        F.ceil(F.count(F.lit(1)) * fraction).cast("int").alias("_target"),
        F.least(
            F.lit(HASH_BUCKETS),
            F.ceil(
                HASH_BUCKETS
                * (fraction * margin + slack_rows / F.count(F.lit(1)))
            ).cast("int"),
        ).alias("_thresh"),
    )
    pre = (
        df.withColumn("_hb", hash_bucket(F.col(id_col)))
        .join(F.broadcast(targets), strata_col)
        .where(F.col("_hb") < F.col("_thresh"))
    )
    w = Window.partitionBy(strata_col).orderBy("_hb", id_col)
    return (
        pre.withColumn("_rnk", F.row_number().over(w))
        .where(F.col("_rnk") <= F.col("_target"))
        .drop("_hb", "_target", "_thresh", "_rnk")
    )


def cap_per_group(
    df: DataFrame, group_col: str, order_cols: list[Column], k: int
) -> DataFrame:
    """Keep at most ``k`` rows per group (domain/source quota enforcement —
    stops any one domain dominating the corpus). One shuffle on the group
    key; at 100 TB that key is a domain/source with millions of values, so
    the window parallelizes. ``order_cols`` decides WHICH k survive (e.g.
    quality descending, id ascending for determinism)."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("_rnk", F.row_number().over(w))
        .where(F.col("_rnk") <= k)
        .drop("_rnk")
    )


def pack_context_windows(
    df: DataFrame,
    group_col: str,
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Assign each document to a token-budget bin: ``bin_id`` = the
    context-window chunk its cumulative start offset falls into, packing
    documents sequentially per group in ``order_col`` order.

    Sequential chunking (not first-fit bin packing) on purpose: it is
    deterministic, order-stable, window-expressible (one running sum per
    group — linear, map-side-combining), and what streaming tokenizer
    pipelines actually do. A true first-fit repack is order-unstable across
    engines and O(n·bins) — wrong trade at 100 TB."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start_offset = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn("bin_id", F.floor(start_offset / budget).cast("int"))


def ngram_contamination(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    eval_bucket_lt: int = 500,
    k: int = 3,
    max_df: int = 100,
) -> DataFrame:
    """Train/eval contamination check: which train documents share a k-word
    shingle with ANY eval document (eval = hash bucket < ``eval_bucket_lt``
    of HASH_BUCKETS — the same deterministic split train_val_test_split
    uses). Returns (doc_id, n_shared_shingles) for contaminated train docs.

    Scale shape: shingles with document frequency > ``max_df`` are dropped
    first — they are uninformative boilerplate AND the join-skew killers
    (a stop-shingle appearing in 1M docs would otherwise fan the shingle
    equi-join quadratically). DF comes from one count aggregate on the
    shingle key (map-side combine); the train⋈eval match is then an
    equi-join on the (high-cardinality, bounded-fanout) shingle."""
    # One shared shingle pass: the (doc, shingle, _hb) rows feed the DF
    # aggregate, the eval-shingle set AND the train side — without the
    # checkpoint the regexp-split explode re-runs once per consumer
    # (the same multiply-referenced-frame rule as the dedup shingle pass).
    rows = (
        shingle_rows(docs, text_col, id_col, k)
        .withColumn("_hb", hash_bucket(F.col("doc")))
        .localCheckpoint(eager=True)
    )
    # ONE shingle-keyed aggregate derives both pruning predicates (df and
    # appears-in-eval) — the former informative-join-back + separate
    # eval-distinct shape re-ran the shingle join once per branch and
    # paid a vacuous (doc, shingle) distinct before the final count
    # (shingle_rows explodes array_distinct shingle sets, so every
    # (doc, shingle) row is already unique): 3 exchanges removed, same
    # rows into the per-doc count.
    eval_informative = (
        rows.groupBy("shingle")
        .agg(
            F.count(F.lit(1)).alias("_df"),
            F.max((F.col("_hb") < eval_bucket_lt).cast("int")).alias("_ev"),
        )
        .where((F.col("_df") <= max_df) & (F.col("_ev") == 1))
        .select("shingle")
    )
    return (
        rows.where(F.col("_hb") >= eval_bucket_lt)
        .join(eval_informative, "shingle")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
    )


# PII scrubbing: deliberately simple, engine-portable regexes (identical
# semantics under Java regex and RE2 — char classes, bounded quantifiers,
# ASCII \b only). Applied in a fixed order; counts are measured on the
# ORIGINAL text so patterns don't interact.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-pattern match counts on the raw text (pure regexp columns)."""
    return {
        name: F.size(F.regexp_extract_all(text, F.lit(pat), 0))
        for name, pat in PII_PATTERNS.items()
    }


def scrub_pii(text: Column) -> Column:
    """Replace every PII match with a typed redaction token. Order matters
    (ssn before phone: an SSN's tail must not be half-eaten by the phone
    pattern first), so the application order is pinned: email, ssn, phone."""
    out = F.regexp_replace(text, PII_PATTERNS["email"], "<EMAIL>")
    out = F.regexp_replace(out, PII_PATTERNS["ssn"], "<SSN>")
    out = F.regexp_replace(out, PII_PATTERNS["phone"], "<PHONE>")
    return out


def mixture_sample(
    df: DataFrame,
    source_col: str,
    id_col: str,
    weights: dict[str, int],
    default_weight: int = 1,
    total_denom: int = 5,
    margin: float = 1.5,
    slack_rows: int = 32,
    strict: bool = False,
) -> DataFrame:
    """Domain-mixture sampling: draw a deterministic sample whose
    per-source composition follows INTEGER mixture weights (a source with
    weight 4 contributes 4× the share of a weight-1 source), total size
    ≈ corpus/``total_denom``, each source capped at its own row count.

    The pretraining-mix primitive: "upsample wikipedia 4×, downsample
    common-crawl" expressed as relative weights, realized as
    smallest-hash-first selection so the sample is reproducible, stable
    under corpus growth, and engine-portable.

    Scale shape: per-source counts are a map-side count aggregate — only
    (source, n) rows move, and the source domain is small by construction
    (a mixture spec is written by hand), so the target table is
    model-sized: it crosses the driver like any trained model and
    broadcasts back. Selection reuses the stratified_sample two-phase
    discipline: a map-side hash-threshold prefilter (margin·share +
    slack) discards most of the corpus before the exact per-source rank
    runs over the ~target-sized survivor set. Weights are integers so the
    normalizer Σw is exact in any summation order — the one float op
    (w/Σw·T) is a single division+multiply, bit-identical cross-engine.

    The prefilter is only STATISTICALLY sufficient: survivors per source
    are ~Binomial(n, thresh/HASH_BUCKETS) with mean ≥ margin·target +
    slack_rows, so by Chernoff the shortfall probability is ≤
    exp(−(1−1/margin)²·mean/2) — at the defaults (margin 1.5, slack 32)
    that is < e⁻³ for target 1 and < e⁻⁸ by target 100, but it is not
    zero: a source whose ids happen to hash high can under-fill its
    share while oracle parity still holds (the SQL mirrors the
    prefilter). ``strict=True`` buys the exact contract: one cheap count
    over the ~target-sized survivor set detects shortfall sources, and
    only those re-rank over their unfiltered partition.
    """
    import math

    counts = {
        r["src"]: r["n"]
        for r in df.groupBy(F.col(source_col).alias("src"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = sum(counts.values())
    t_total = n_total // total_denom
    sumw = sum(weights.get(s, default_weight) for s in counts)
    rows = []
    for s, n in sorted(counts.items()):
        w = weights.get(s, default_weight)
        tgt = min(n, math.floor(w / sumw * t_total + 0.5))
        thresh = min(
            HASH_BUCKETS,
            math.ceil(HASH_BUCKETS * (margin * tgt / n + slack_rows / n)),
        )
        rows.append((s, tgt, thresh))
    targets = df.sparkSession.createDataFrame(
        rows, f"{source_col} string, _target int, _thresh int"
    )
    pre = (
        df.withColumn("_hb", hash_bucket(F.col(id_col)))
        .join(F.broadcast(targets), source_col)
        .where(F.col("_hb") < F.col("_thresh"))
    )
    if strict:
        surv = {
            r["src"]: r["n"]
            for r in pre.groupBy(F.col(source_col).alias("src"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        short = [s for s, t, _ in rows if surv.get(s, 0) < t]
        if short:
            pre = (
                df.withColumn("_hb", hash_bucket(F.col(id_col)))
                .join(F.broadcast(targets), source_col)
                .where(
                    (F.col("_hb") < F.col("_thresh"))
                    | F.col(source_col).isin(short)
                )
            )
    w = Window.partitionBy(source_col).orderBy("_hb", id_col)
    return (
        pre.withColumn("_rnk", F.row_number().over(w))
        .where(F.col("_rnk") <= F.col("_target"))
        .drop("_hb", "_target", "_thresh", "_rnk")
    )
