"""Bounded-memory sketch operators: HyperLogLog cardinality and
fixed-width-histogram quantiles.

Together with the Count-Min sketch (operators/text.cms_token_estimates)
these complete the classic streaming-sketch trio — frequency (CMS),
cardinality (HLL), distribution (histogram) — each trading exactness for
an aggregate whose size is a CONSTANT independent of the data, which is
the only shape that survives 100 TB: the sketch pass is one map-side-
combined groupBy whose shuffle carries registers/bins, not values.

Everything is integer-exact and md5-deterministic so a DuckDB oracle
reproduces the results bit-for-bit (no floating log/pow, no randomness,
no Python in the hot path — pure JVM column expressions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators.dedup import md5_u56_le

# --- HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007) -----------------

# Register-count exponent: m = 2**HLL_P registers per group. 32 registers
# keeps the raw estimator (valid for n > 2.5·m) in range at the driver's
# sf0.01 cardinalities (~150 distinct per group); production uses p=14
# (16384 registers, ~0.8% error) — nothing structural changes, the sketch
# stays m rows per group.
#
# KNOWN BIAS (ADVICE r5, documented limitation): this is the RAW
# Flajolet-Fusy-Gandouet-Meunier estimator with no small-range
# (linear-counting) correction, so groups with fewer than ~2.5·m distinct
# values are systematically OVER-estimated. Oracle parity is unaffected —
# both engines share the formula bit-for-bit — and every register/merge
# property holds regardless. If small groups matter, apply the standard
# branch when empty registers are plentiful: V = # empty registers > 0 ⇒
# estimate = m·ln(m/V), which for m=32 is a 32-entry integer lookup table
# on V (the only float step is the table build). Deliberately not wired
# into the queries: the driver-gated outputs would then exercise two
# estimator branches while the 100 TB-relevant path (big groups) is the
# raw one these tests pin.
HLL_P = 5
HLL_M = 1 << HLL_P
# rho cap: registers saturate at RMAX so the harmonic sum becomes the
# EXACT integer  S = Σ 2^(RMAX - rho)  with no floating 2^-rho terms.
# P(rho > 20) = 2^-20 per value — statistically invisible, and both
# engines apply the identical cap so parity is unconditional.
HLL_RMAX = 20
# bias constant alpha_m for m=32, in parts-per-million (integer so the
# estimate arithmetic is exact and cross-engine stable)
HLL_ALPHA_PPM = 697000
# 56-bit md5 hash splits into HLL_P bucket bits + rank bits; rho is the
# 1-based position of the first set bit in the rank field.
_RANK_BITS = 56 - HLL_P
# half-up numerator 2·alpha_m·m²·2^RMAX (≈1.5e15, well inside long range)
_HLL_NUM2 = 2 * HLL_ALPHA_PPM * HLL_M * HLL_M * (1 << HLL_RMAX)


def hll_registers(df: DataFrame, group_col: str, value: Column) -> DataFrame:
    """(g, bucket, r) HLL registers: r = max rho per md5 bucket.

    The register aggregate is the scale story: max() combines map-side, so
    the shuffle carries at most m rows per group no matter how many values
    stream through — where COUNT(DISTINCT) shuffles every distinct value.
    Registers are also MERGEABLE (elementwise max), which is what makes
    the sketch compose across partitions / micro-batches / days for free
    (pinned by test_hll_register_merge_linearity).
    """
    h = md5_u56_le(value)
    w = F.shiftright(h, HLL_P)
    # length(bin(w)) == bit-length of w; bin() strips leading zeros in
    # both Spark and DuckDB, and the w=0 edge case lands above the RMAX
    # cap on both engines identically.
    rho = F.least(
        F.lit(_RANK_BITS + 1) - F.length(F.bin(w)), F.lit(HLL_RMAX)
    ).cast("long")
    return (
        df.select(
            F.col(group_col).alias("g"),
            (h % HLL_M).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("r"))
    )


def hll_estimate_grouped(registers: DataFrame, group_cols) -> DataFrame:
    """(*group_cols, hll_estimate) from a register frame with column ``r``,
    integer-exact half-up:

        estimate = alpha_m · m² / Z,   Z = Σ_buckets 2^-rho

    computed as the scaled integer S = Σ 2^(RMAX-rho) with empty registers
    contributing rho=0 (the 2^RMAX term), then ONE integer division —
    `div`, not floor(double), so the quotient can't pick up a ulp at an
    integer boundary. Works for any grouping — per-key sketches, or pair
    keys over max-merged registers (the set-algebra path).
    """
    cols = list(group_cols)
    return (
        registers.groupBy(*cols)
        .agg(
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), CAST({HLL_RMAX} - r AS INT))"
                )
            ).alias("s_ne"),
            F.count(F.lit(1)).alias("nb"),
        )
        .select(
            *cols,
            (
                F.col("s_ne")
                + (F.lit(HLL_M) - F.col("nb")) * F.lit(1 << HLL_RMAX)
            ).alias("s"),
        )
        .select(
            *cols,
            F.expr(
                f"CAST(({_HLL_NUM2} + s * 1000000) div (2 * s * 1000000) "
                "AS BIGINT)"
            ).alias("hll_estimate"),
        )
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """(g, hll_estimate) — the single-key form of hll_estimate_grouped."""
    return hll_estimate_grouped(registers, ["g"])


def hll_oracle_cte(source_sql: str, group_expr: str, value_expr: str) -> str:
    """DuckDB CTE block (names hll_*) computing the identical estimate.

    ``source_sql`` is a FROM-able relation; ``value_expr`` must be a
    VARCHAR expression (md5 hashes its bytes on both engines). The final
    CTE ``hll_est`` yields (g, hll_estimate).
    """
    return f"""
    hll_h AS (
      SELECT {group_expr} AS g,
             CAST(md5_number_upper({value_expr}) >> 8 AS BIGINT) AS h
      FROM {source_sql}
    ),
    hll_rb AS (
      SELECT g, h % {HLL_M} AS bucket,
             LEAST({_RANK_BITS + 1}
                     - length(bin(CAST(h >> {HLL_P} AS BIGINT))),
                   {HLL_RMAX}) AS rho
      FROM hll_h
    ),
    hll_reg AS (
      SELECT g, bucket, MAX(rho) AS r FROM hll_rb GROUP BY 1, 2
    ),
    hll_s AS (
      SELECT g,
             CAST(SUM(CAST(1 AS BIGINT) << CAST({HLL_RMAX} - r AS INT))
                  AS BIGINT)
               + ({HLL_M} - COUNT(*)) * {1 << HLL_RMAX} AS s
      FROM hll_reg GROUP BY 1
    ),
    hll_est AS (
      SELECT g,
             ({_HLL_NUM2} + s * 1000000) // (2 * s * 1000000)
               AS hll_estimate
      FROM hll_s
    )"""


# --- Count-Min counters (engine-resident frequency sketch) ----------------

# d hash rows × w buckets flattened to idx = row·w + bucket. Small on
# purpose (the driver's sf0.01 shards see ~hundreds of distinct keys);
# production uses w in the thousands — the sketch stays d·w counters per
# group regardless of volume, and every formula below is parameter-free.
CMS_D = 2
CMS_W = 64


def cms_counters(df: DataFrame, group_col: str, value: Column) -> DataFrame:
    """(g, idx, cnt) Count-Min counters for one batch of values.

    The row hashes are md5 over a row-salted value ('0|v', '1|v'), so both
    engines derive them from the same md5_number_upper arithmetic. One
    explode + map-side-combined groupBy: the shuffle carries at most
    d·w rows per group however many values stream through. Counters are
    MERGEABLE BY ADDITION — the linearity that lets them compose across
    partitions and micro-batches, and exactly the property that breaks
    under at-least-once replay (a re-added delta double-counts, unlike
    the HLL max-merge). The engine therefore keys each batch's delta by
    batch_id and subtracts it before re-merging on a same-batch replay
    (streaming/engine.py, track_frequency_sketch).
    """
    idxs = F.array(
        *[
            F.lit(r * CMS_W)
            + md5_u56_le(F.concat(F.lit(f"{r}|"), value)) % CMS_W
            for r in range(CMS_D)
        ]
    )
    return (
        df.select(F.col(group_col).alias("g"), F.explode(idxs).alias("idx"))
        .groupBy("g", "idx")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(counters: DataFrame, probes: DataFrame) -> DataFrame:
    """(g, probe_key, cms_estimate) point-frequency estimates.

    ``probes`` is a tiny (g, probe_key) frame; the estimate is the MIN
    over the d row counters the key hashes to (missing counter ⇒ 0 —
    the key never hashed there). The probe side is broadcast; the
    counter side is d·w rows per group."""
    keyed = probes.select(
        "g",
        "probe_key",
        F.explode(
            F.array(
                *[
                    F.lit(r * CMS_W)
                    + md5_u56_le(F.concat(F.lit(f"{r}|"), F.col("probe_key")))
                    % CMS_W
                    for r in range(CMS_D)
                ]
            )
        ).alias("idx"),
    )
    return (
        keyed.join(counters, ["g", "idx"], "left")
        .groupBy("g", "probe_key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


def cms_oracle_cte(source_sql: str, group_expr: str, value_expr: str) -> str:
    """DuckDB CTE block (names cms_*) computing identical counters.

    Final CTE ``cms_cnt`` yields (g, idx, cnt) — same flattened layout
    and md5 row-salting as :func:`cms_counters`."""
    return f"""
    cms_rows AS (SELECT 0 AS r UNION ALL SELECT 1),
    cms_i AS (
      SELECT {group_expr} AS g,
             r.r * {CMS_W}
               + CAST((md5_number_upper(CAST(r.r AS VARCHAR) || '|' || {value_expr}) >> 8)
                      % {CMS_W} AS BIGINT) AS idx
      FROM {source_sql}, cms_rows r
    ),
    cms_cnt AS (
      SELECT g, idx, CAST(COUNT(*) AS BIGINT) AS cnt FROM cms_i GROUP BY 1, 2
    )"""


# --- Bloom-filter join pruning (runtime-filter pushdown) -------------------

# The classic 100 TB selective-join accelerator: build an m-bit Bloom
# filter from the SMALL/FILTERED join side, evaluate it on the fact scan
# BEFORE the join's exchange, and let only probable matches shuffle.
# Spark's own optimizer grows the same mechanism as an injected
# BloomFilterMightContain subquery (runtime.bloomFilter.* confs); this is
# that operator made explicit, sized, and oracle-checkable. Filter is m
# bits ⇒ the driver-side collect is ≤ m set positions — the same bounded
# model-literal pattern as the k-means codebooks, NEVER row-scaled.
BLOOM_JOIN_K = 4
# each probe position is one 14-bit field of the 56-bit md5 — ONE digest
# per key yields all K positions (the Kirsch-Mitzenmacher derived-hash
# construction), so the fact-scan probe costs a single md5 per row, not K
_BLOOM_FIELD_BITS = 14
BLOOM_JOIN_M_MIN = 1 << 10
BLOOM_JOIN_M_MAX = 1 << _BLOOM_FIELD_BITS


def bloom_join_m(n_build: int) -> int:
    """Filter size from build-side stats: the next power of two ≥
    10·n_build (≈2% FP at k=4), clamped to [2^10, 2^14] so every position
    fits one md5 bit field. Integer-exact (bit_length, no float log) so
    the oracle derives the SAME m as ``1 << length(bin(10·n−1))``. A
    fixed m saturates as the build side grows with scale — at sf0.1 the
    r7-initial 1024-bit filter hit 100% fill and pruned nothing."""
    return min(
        BLOOM_JOIN_M_MAX,
        max(BLOOM_JOIN_M_MIN, 1 << max(10 * n_build - 1, 1).bit_length()),
    )


def bloom_join_positions(key: Column, m: int) -> list:
    """The K bit positions of one key: disjoint 14-bit fields of
    md5_number_upper(key) >> 8, each % m."""
    h = md5_u56_le(key)
    return [
        F.shiftright(h, _BLOOM_FIELD_BITS * j) % m
        for j in range(BLOOM_JOIN_K)
    ]


def bloom_join_build(build: DataFrame, key: Column) -> tuple:
    """(sorted set-bit positions, m): m is sized from the build-side
    count, positions collect driver-side — bounded at m entries
    regardless of build rows (the distinct runs map-side-combined before
    the ≤m-row collect)."""
    # checkpoint the slim build keys once: n_build and the positions are
    # two actions over the same filtered scan
    keys = build.select(key.alias("_bk")).localCheckpoint(eager=True)
    n_build = keys.count()
    m = bloom_join_m(n_build)
    rows = (
        keys.select(
            F.explode(
                F.array(*bloom_join_positions(F.col("_bk"), m))
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    return sorted(r["pos"] for r in rows), m


def bloom_join_prune(
    df: DataFrame, key: Column, set_positions: list, m: int
) -> DataFrame:
    """Fact-side pre-join pruning: keep rows whose K probe bits are ALL
    set. The filter is packed into m/64 64-bit words embedded as ONE
    literal array inside ONE F.expr string — per row it costs one md5
    plus K shift/mask word lookups, pure JVM on the scan side of the
    exchange, which is the entire point: rows the filter rejects never
    shuffle. False positives pass through to the real join (and only
    cost their shuffle); false negatives are impossible.

    NOT isin(set_positions): at m=16k/48% fill that is ~8k literals per
    probe — ~32k py4j expression nodes measured at 40 s of driver-side
    plan construction plus unstable optimizer passes (the same lesson as
    the per-bit literal-array HOFs: ship ONE parsed string, never a
    literal per element). Callers putting this on a cold
    single-row-group scan pair it with rebalance=True (the
    heavy-CPU-fused-on-scan criterion)."""
    n_words = m // 64
    words = [0] * n_words
    for p in set_positions:
        words[p // 64] |= 1 << (p % 64)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    arr_sql = (
        "array(" + ",".join(f"CAST({w} AS BIGINT)" for w in words) + ")"
    )
    conds = []
    for j in range(BLOOM_JOIN_K):
        pos = f"(shiftright(_bjh, {_BLOOM_FIELD_BITS * j}) % {m})"
        conds.append(
            f"(shiftright(element_at({arr_sql}, CAST({pos} div 64 AS INT) + 1),"
            f" CAST({pos} % 64 AS INT)) & 1) = 1"
        )
    # lazy checkpoint between the hash projection and the filter:
    # PushDownPredicate would otherwise substitute _bjh's md5 back into
    # the filter and push the whole thing below the caller's rebalance
    # exchange onto the single-task scan (the engine phase-1 lesson —
    # measured 16 s for 600k rows single-task vs ~2 s wide). The frame is
    # slim (key + 8-byte hash); the caller's first action materializes it
    # on the rebalanced layout.
    tagged = df.withColumn("_bjh", md5_u56_le(key)).localCheckpoint(
        eager=False
    )
    return tagged.where(F.expr(" AND ".join(conds))).drop("_bjh")


# --- Log-linear mergeable quantile sketch ----------------------------------

# Two-level bucket id for a non-negative integer value v:
#   coarse  b = bit_length(v)  (octave — log2 bucket, domain-FREE: any
#               int64 lands in one of 63 octaves, no range parameter)
#   fine    f = ((v − 2^(b−1)) · K) div 2^(b−1)   ∈ [0, K)
#   qid     = (b−1)·K + f + 1        (v = 0 → qid 0)
# Counts per qid merge by ADDITION across partitions / micro-batches —
# same linearity as the CMS counters — and the register frame is at most
# 63·K + 1 rows per group NO MATTER the data size or value domain, which
# is what the fixed-width histogram (bins = range/width, a domain
# parameter) cannot promise on unbounded/skewed domains at 100 TB.
# Quantile recovery returns the bucket's exact-integer LOWER bound, so
# the estimate err is one fine-bucket width: est ≤ v_rank and
# (v_rank − est) · K ≤ v_rank — a ≤ 1/K RELATIVE error at any scale
# (octaves narrower than K, i.e. 2^(b−1) < K, resolve exactly). This is
# the guarantee family of DDSketch (Masson, Rim, Lee — VLDB 2019) /
# KLL-by-buckets, restated in integer-exact arithmetic so a DuckDB
# oracle reproduces every register and estimate bit-for-bit.
#
# int64 envelope: values must lie in [0, 2^58) so the fine-bucket
# numerator (v − 2^(b−1))·K stays under 2^63 for K ≤ 16 — 2.9e17 cents
# (~2.9 quadrillion dollars) of headroom on money domains.
QSK_K = 16
QSK_MAX = 1 << 58


def _qsk_lo2(b: str = "b") -> str:
    return f"shiftleft(CAST(1 AS BIGINT), CAST({b} - 1 AS INT))"


def qsketch_buckets(df: DataFrame, group_col: str, value: Column) -> DataFrame:
    """(g, qid, cnt) quantile-sketch registers — one map-side-combined
    groupBy; the shuffle carries ≤ 63·K+1 rows per group."""
    sel = df.select(
        F.col(group_col).alias("g"), value.cast("long").alias("v")
    ).select("g", "v", F.length(F.bin(F.col("v"))).cast("long").alias("b"))
    qid = F.when(F.col("v") == 0, F.lit(0).cast("long")).otherwise(
        (F.col("b") - 1) * QSK_K
        + F.expr(f"((v - {_qsk_lo2()}) * {QSK_K}) div {_qsk_lo2()}")
        + 1
    )
    return (
        sel.select("g", qid.alias("qid"))
        .groupBy("g", "qid")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def qsketch_lower_bound(qid_name: str) -> Column:
    """Exact-integer lower bound of bucket column ``qid_name`` — the
    smallest v that maps there: 2^(b−1) + ceil(f·2^(b−1)/K)."""
    lo2 = (
        f"shiftleft(CAST(1 AS BIGINT), "
        f"CAST(({qid_name} - 1) div {QSK_K} AS INT))"
    )
    return F.expr(
        f"CASE WHEN {qid_name} = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE {lo2} + ((({qid_name} - 1) % {QSK_K}) * {lo2}"
        f" + {QSK_K - 1}) div {QSK_K} END"
    )


# (numerator, denominator, alias) — rank k = ceil(q·n), 1-based
QSK_DEFAULT_FRACTIONS = ((1, 2, "p50"), (9, 10, "p90"), (99, 100, "p99"))


def qsketch_quantiles(
    buckets: DataFrame, fractions=QSK_DEFAULT_FRACTIONS
) -> DataFrame:
    """(g, n, <alias>…) quantile estimates from a register frame.

    Windowed cumulative count over the BUCKET frame (≤ 63·K+1 rows per
    group — the unpartitioned-window-on-bounded-frame pattern), then one
    aggregate picking min(qid) with cum ≥ ceil(q·n) per fraction, decoded
    to the bucket lower bound. Driver-free and integer-exact end to end."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("g")
        .orderBy("qid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = Window.partitionBy("g")
    cum = buckets.select(
        "g",
        "qid",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(wn).alias("n"),
    )
    aggs = [F.max("n").alias("n")]
    for num, den, alias in fractions:
        rank = F.expr(f"({num} * n + {den} - 1) div {den}")
        aggs.append(
            F.min(F.when(F.col("cum") >= rank, F.col("qid"))).alias(
                f"_q_{alias}"
            )
        )
    picked = cum.groupBy("g").agg(*aggs)
    cols = [F.col("g"), F.col("n")]
    for _, _, alias in fractions:
        cols.append(qsketch_lower_bound(f"_q_{alias}").alias(alias))
    return picked.select(*cols)


def qsketch_oracle_cte(source_sql: str, group_expr: str, value_expr: str) -> str:
    """DuckDB CTE block (names qsk_*): ``qsk_cnt`` yields (g, qid, cnt)
    with identical bucket arithmetic (bin()/shift/div are exact on both
    engines)."""
    return f"""
    qsk_v AS (
      SELECT {group_expr} AS g, CAST({value_expr} AS BIGINT) AS v
      FROM {source_sql}
    ),
    qsk_b AS (
      SELECT g, v, CAST(length(bin(v)) AS BIGINT) AS b FROM qsk_v
    ),
    qsk_id AS (
      SELECT g,
             CASE WHEN v = 0 THEN CAST(0 AS BIGINT)
                  ELSE (b - 1) * {QSK_K}
                       + ((v - (CAST(1 AS BIGINT) << CAST(b - 1 AS INT))) * {QSK_K})
                         // (CAST(1 AS BIGINT) << CAST(b - 1 AS INT))
                       + 1
             END AS qid
      FROM qsk_b
    ),
    qsk_cnt AS (
      SELECT g, qid, CAST(COUNT(*) AS BIGINT) AS cnt FROM qsk_id GROUP BY 1, 2
    )"""


def qsk_lower_sql(qid: str) -> str:
    """DuckDB expression: exact-integer bucket lower bound of ``qid``."""
    lo2 = f"(CAST(1 AS BIGINT) << CAST(({qid} - 1) // {QSK_K} AS INT))"
    return (
        f"CASE WHEN {qid} = 0 THEN CAST(0 AS BIGINT) "
        f"ELSE {lo2} + ((({qid} - 1) % {QSK_K}) * {lo2} + {QSK_K - 1}) // {QSK_K} "
        f"END"
    )


# --- Fixed-width histogram quantiles --------------------------------------


def histogram_bins(values: DataFrame, cents_col: str, width: int) -> DataFrame:
    """(bin, cnt) fixed-width histogram over an integer column.

    One map-side-combined groupBy whose row count is bounded by the VALUE
    DOMAIN (range/width bins), not the data size — the histogram is the
    distribution sketch: at 100 TB the shuffle still carries ~hundreds of
    bins. Quantile recovery from the bins is driver-free (window cumsum
    over the bin frame + one aggregate, see the agg_histogram_quantiles
    query).
    """
    # integer `div`, not double-divide-then-cast: a double quotient can
    # misround exactly at a bin boundary (the agg_time_decay lesson)
    return (
        values.select(F.expr(f"{cents_col} div {width}").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# SQL fragments for oracles that work with merged registers directly:
# the per-group scaled harmonic sum (aggregate context, register col r)
# and the estimate from a named S column — identical arithmetic to
# hll_estimate_grouped.
HLL_S_AGG_SQL = (
    f"CAST(SUM(CAST(1 AS BIGINT) << CAST({HLL_RMAX} - r AS INT)) AS BIGINT)"
    f" + ({HLL_M} - COUNT(*)) * {1 << HLL_RMAX}"
)


def hll_est_sql(s_col: str) -> str:
    return f"(({_HLL_NUM2} + {s_col} * 1000000) // (2 * {s_col} * 1000000))"


# --- Mergeable weighted-reservoir (priority) sampling sketch ---------------

# The sampling member of the sketch family (VERDICT r7 #5): a per-group
# BOUNDED-SIZE weight-proportional sample whose registers merge across
# partitions / micro-batches, in the priority-sampling formulation of
# Duffield, Lund, Thorup ("Priority sampling for estimation of arbitrary
# subset sums", JACM 2007): draw u_i uniform, give item i priority
# q_i = w_i / u_i, keep the n largest-priority items, and estimate any
# subset-sum unbiasedly with w_hat_i = max(w_i, tau) where tau is the
# (n+1)-st priority. Here every step is DETERMINISTIC and integer-exact
# so a DuckDB oracle reproduces the selected set and every estimate
# bit-for-bit:
#
#   u_i  = md5_u56_le(id)               (56-bit md5 integer, u_i/2^56 is
#                                        the uniform draw)
#   pri_i = u_i div max(w_i, 1)         (ascending (pri, id) order ==
#                                        descending-priority order up to
#                                        the integer floor; id tiebreak)
#   register = the n+1 smallest (pri, id) rows per group — the sample
#              PLUS the threshold row the estimator needs
#   tau_w = 2^56 div max(pri_(n+1), 1)  (the (n+1)-st priority mapped
#                                        back to weight units)
#   w_est = max(w, tau_w); a group with <= n items has no threshold row
#           and is EXACT (w_est = w, the sample is the whole group).
#
# Merge rule: union register frames and re-take the n+1 smallest — a
# MIN-merge like the HLL registers, hence IDEMPOTENT: merging a partial
# sketch twice (at-least-once replay) changes nothing, which additive
# sketches (CMS) cannot promise. Uniform sampling is the w = 1 special
# case. At 100 TB the shuffle carries at most (n+1) rows per group per
# map partition (the rank-filtered row_number window plans as
# WindowGroupLimit, pushing a partial top-(n+1) below the exchange);
# the corpus itself never re-shuffles.
RSV_SCALE = 1 << 56


def reservoir_rows(
    df: DataFrame, group_col: str, id_col: str, weight: Column
) -> DataFrame:
    """(g, id, w, pri) keyed rows: the deterministic priority key per
    item. ``id`` is hashed via its STRING form so DuckDB's
    ``md5_number_upper(CAST(id AS VARCHAR)) >> 8`` reproduces u_i."""
    return df.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id"),
        weight.cast("long").alias("w"),
    ).select(
        "g",
        "id",
        "w",
        md5_u56_le(F.col("id").cast("string")).alias("u"),
    )


def _rank_registers(rows: DataFrame, n: int) -> DataFrame:
    from pyspark.sql.window import Window

    w_rank = Window.partitionBy("g").orderBy("pri", "id")
    return rows.withColumn("rank", F.row_number().over(w_rank)).where(
        F.col("rank") <= n + 1
    )


def reservoir_keys(
    df: DataFrame, group_col: str, id_col: str, weight: Column
) -> DataFrame:
    """(g, id, w, pri) — every item with its deterministic priority key.
    Works on streams too (pure column expressions); the streaming twin
    feeds this into the stateful register keeper."""
    return reservoir_rows(df, group_col, id_col, weight).select(
        "g",
        "id",
        "w",
        F.expr("u div GREATEST(w, CAST(1 AS BIGINT))").alias("pri"),
    )


def reservoir_registers(
    df: DataFrame, group_col: str, id_col: str, weight: Column, n: int
) -> DataFrame:
    """(g, id, w, pri, rank) — the n+1 smallest-key rows per group (the
    sample plus the estimator's threshold row)."""
    return _rank_registers(reservoir_keys(df, group_col, id_col, weight), n)


def reservoir_merge(parts: DataFrame, n: int) -> DataFrame:
    """Merge partial register frames (a union of reservoir_registers
    outputs): re-take the n+1 smallest (pri, id) per group. Min-merge —
    idempotent under replay and associative across partitions /
    micro-batches."""
    return _rank_registers(
        parts.select("g", "id", "w", "pri").dropDuplicates(["g", "id"]),
        n,
    )


def reservoir_sample(registers: DataFrame, n: int) -> DataFrame:
    """(g, rank, id, w, w_est) — the final sample with the
    Duffield-Lund-Thorup subset-sum estimator attached.

    SUM(w_est) over any subset of the sample estimates that subset's
    true total weight; for a group the register holds entirely
    (<= n items) the estimate is exact. The per-group threshold is an
    aggregate over the <= n+1 register rows — driver-free."""
    thr = registers.groupBy("g").agg(
        F.max(
            F.when(F.col("rank") == n + 1, F.col("pri"))
        ).alias("_tpri")
    )
    return (
        registers.where(F.col("rank") <= n)
        .join(thr, "g")
        .select(
            "g",
            "rank",
            "id",
            "w",
            F.expr(
                f"CASE WHEN _tpri IS NULL THEN w "
                f"ELSE GREATEST(w, {RSV_SCALE} div "
                f"GREATEST(_tpri, CAST(1 AS BIGINT))) END"
            ).alias("w_est"),
        )
    )


def reservoir_oracle_cte(
    source_sql: str, group_expr: str, id_expr: str, weight_expr: str, n: int
) -> str:
    """DuckDB CTE block (names rsv_*): ``rsv_reg`` yields
    (g, id, w, pri, rank) and ``rsv_out`` yields (g, rank, id, w, w_est)
    with identical integer arithmetic (md5_number_upper >> 8 ==
    md5_u56_le; // on non-negative operands == div)."""
    return f"""
    rsv_v AS (
      SELECT {group_expr} AS g, {id_expr} AS id,
             CAST({weight_expr} AS BIGINT) AS w
      FROM {source_sql}
    ),
    rsv_p AS (
      SELECT g, id, w,
             CAST((md5_number_upper(CAST(id AS VARCHAR)) >> 8) AS BIGINT)
               // GREATEST(w, CAST(1 AS BIGINT)) AS pri
      FROM rsv_v
    ),
    rsv_reg AS (
      SELECT * FROM (
        SELECT g, id, w, pri,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY pri, id) AS rank
        FROM rsv_p)
      WHERE rank <= {n + 1}
    ),
    rsv_thr AS (
      SELECT g, MAX(CASE WHEN rank = {n + 1} THEN pri END) AS tpri
      FROM rsv_reg GROUP BY g
    ),
    rsv_out AS (
      SELECT r.g, r.rank, r.id, r.w,
             CASE WHEN t.tpri IS NULL THEN r.w
                  ELSE GREATEST(r.w, CAST({RSV_SCALE} AS BIGINT)
                       // GREATEST(t.tpri, CAST(1 AS BIGINT))) END AS w_est
      FROM rsv_reg r JOIN rsv_thr t USING (g)
      WHERE r.rank <= {n}
    )"""


# --- K-minimum-values (KMV) distinct sketch with set algebra ---------------

# The SET-ALGEBRA member of the sketch family: where HLL registers only
# union (max-merge) and intersections fall back to inclusion-exclusion
# (error compounds), the KMV synopsis (Bar-Yossef et al. 2002; Beyer,
# Haas, Reinwald, Sismanis, Gemulla — "On synopses for distinct value
# estimation", SIGMOD 2007) supports union AND intersection natively:
# keep the k smallest distinct md5 hash values per group; with
# U_(k) the k-th smallest (the threshold), the basic estimator is
#
#   D_hat = (k-1) · 2^56 div U_(k)
#
# and for two sets, L = the k smallest of (A_reg ∪ B_reg) is exactly the
# KMV of A ∪ B, while |{h ∈ L : h ∈ A_reg AND h ∈ B_reg}| / k is an
# unbiased estimate of the Jaccard-weighted intersection share:
#
#   D_hat(A ∩ B) = (n_both · D_hat(A ∪ B)) div k.
#
# Registers MIN-merge (idempotent — same replay story as the reservoir
# sketch, whose machinery this reuses: a KMV register IS a uniform
# reservoir over DISTINCT values with w=1). Everything is md5-integer
# deterministic, so a DuckDB oracle reproduces every register and
# estimate bit-for-bit. At 100 TB: k rows per group cross the wire,
# never values; the distinct-dedup combines map-side first.


def kmv_registers(df: DataFrame, group_col: str, value: Column, k: int) -> DataFrame:
    """(g, h, rank) — the k smallest distinct 56-bit md5 hash values per
    group (rank 1..k). The rank filter plans as WindowGroupLimit (partial
    top-k below the exchange); the inner distinct combines map-side."""
    from pyspark.sql.window import Window

    hashes = (
        df.select(F.col(group_col).alias("g"), value.alias("v"))
        .select("g", md5_u56_le(F.col("v")).alias("h"))
        .groupBy("g", "h")
        .agg(F.lit(1))
        .select("g", "h")
    )
    w = Window.partitionBy("g").orderBy("h")
    return (
        hashes.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def kmv_estimate(registers: DataFrame, k: int) -> DataFrame:
    """(g, n_seen, dv_estimate): basic KMV estimator off a register frame.
    Groups with fewer than k distinct values are EXACT (n_seen < k ⇒
    estimate = n_seen)."""
    return registers.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_seen"),
        F.expr(
            f"CASE WHEN count(1) < {k} THEN count(1) "
            f"ELSE ({k - 1} * CAST({RSV_SCALE} AS BIGINT))"
            f" div GREATEST(MAX(CASE WHEN rank = {k} THEN h END), 1) END"
        ).cast("long").alias("dv_estimate"),
    )


def kmv_set_ops(reg_a: DataFrame, reg_b: DataFrame, k: int) -> DataFrame:
    """(g, union_estimate, intersection_estimate, n_both) from two
    register frames sharing group keys: L = k smallest of the merged
    registers (the KMV of A ∪ B), n_both = members of L present in both
    input registers, intersection = n_both · D_hat(union) div k. All
    integer arithmetic on the bounded register frames — no data pass."""
    from pyspark.sql.window import Window

    merged = (
        reg_a.select("g", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
        .unionByName(
            reg_b.select("g", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
        )
        .groupBy("g", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("g").orderBy("h")
    top = merged.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )
    return top.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_union_seen"),
        F.expr(
            f"CASE WHEN count(1) < {k} THEN count(1) "
            f"ELSE ({k - 1} * CAST({RSV_SCALE} AS BIGINT))"
            f" div GREATEST(MAX(CASE WHEN rank = {k} THEN h END), 1) END"
        ).cast("long").alias("union_estimate"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_both"),
        F.sum(F.col("in_a") * (1 - F.col("in_b")))
        .cast("long")
        .alias("n_only_a"),
    ).select(
        "g",
        "n_union_seen",
        "union_estimate",
        "n_both",
        F.expr(
            "CASE WHEN n_union_seen < "
            f"{k} THEN n_both "
            "ELSE (n_both * union_estimate) div "
            f"{k} END"
        ).cast("long").alias("intersection_estimate"),
        "n_only_a",
        # same share-scaling: members of the union's KMV seen only in A
        # estimate |A \ B| — the DIFFERENCE the inclusion-exclusion route
        # can't give without compounding two estimates
        F.expr(
            "CASE WHEN n_union_seen < "
            f"{k} THEN n_only_a "
            "ELSE (n_only_a * union_estimate) div "
            f"{k} END"
        ).cast("long").alias("difference_estimate"),
    )


def kmv_oracle_cte(source_sql: str, group_expr: str, value_expr: str, k: int,
                   p: str = "kmv") -> str:
    """DuckDB CTE block (names {p}_*): ``{p}_reg`` yields (g, h, rank)
    with identical hash/selection arithmetic."""
    return f"""
    {p}_v AS (
      SELECT DISTINCT {group_expr} AS g,
             CAST((md5_number_upper({value_expr}) >> 8) AS BIGINT) AS h
      FROM {source_sql}
    ),
    {p}_reg AS (
      SELECT * FROM (
        SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rank
        FROM {p}_v)
      WHERE rank <= {k}
    )"""


# --- Misra-Gries / SpaceSaving frequent-items summary -----------------------

# The DETERMINISTIC frequent-items member of the sketch family (VERDICT
# r8 #5): where the Count-Min sketch's over-count guarantee is
# probabilistic (per-row md5-salted collisions), the Misra-Gries summary
# (Misra & Gries 1982; SpaceSaving is the same summary in Metwally et
# al.'s 2005 formulation) keeps k counters per group with a DETERMINISTIC
# error bound: every key's stored weight undercounts its true count by at
# most N/(k+1), N the group's total weight, and any key with true count
# > N/(k+1) is guaranteed PRESENT. The canonical offset form (Agarwal,
# Cormode, Huang, Phillips, Wei, Yi — "Mergeable summaries", PODS 2012,
# §3.1) computes it straight from exact counts: keep the k largest
# (count DESC, key ASC) and subtract the (k+1)-st count from each — the
# undercount is then EXACTLY c_(k+1) <= N/(k+1), the same summary a
# sequential MG pass can only bound.
#
# Merge rule (same paper): sum matching counters, re-truncate to k,
# subtract the merged (k+1)-st weight. Truncation composes: after ANY
# merge tree over partial summaries the bound still holds (each
# truncation's decrement is charged against the weight it removed), but
# unlike the min-merge registers (HLL/KMV/reservoir) the RESULT is
# merge-tree-dependent — two splits of the same corpus can yield
# different (all bound-respecting) summaries, and a replayed partial
# double-counts. That contrast is the point of carrying both families:
# additive summaries (CMS deltas, MG counters) need replay bookkeeping,
# min-merge registers don't — documented where the engine's CMS delta
# mechanism makes the same trade (streaming/engine.py).
#
# Everything is integer-exact (BIGINT counts, one subtraction), so the
# DuckDB oracle reproduces the full-data summary bit-for-bit. At 100 TB:
# the exact-counts exchange carries one row per distinct (group, key)
# per map partition (partial combine — counts, never occurrences), and
# the truncation's rank-filtered row_number window plans as
# WindowGroupLimit, shipping at most k+1 rows per group per map
# partition into its exchange (gate-asserted in test_shuffle_volume).


def mg_truncate(counts: DataFrame, k: int, cnt_col: str = "cnt") -> DataFrame:
    """Offset-form truncation of exact per-key weights to a k-counter
    summary: (g, key, cnt, w_mg, dec) — the k largest keys per group by
    (weight DESC, key ASC), each stored as w_mg = cnt - dec where dec is
    the (k+1)-st largest weight (0 when the group has <= k keys; rows
    whose weight hits 0 drop, exactly like MG's freed counters)."""
    from pyspark.sql.window import Window

    w_rank = Window.partitionBy("g").orderBy(
        F.col(cnt_col).desc(), F.col("key")
    )
    ranked = counts.withColumn(
        "rank", F.row_number().over(w_rank)
    ).where(F.col("rank") <= k + 1)
    thr = ranked.groupBy("g").agg(
        F.coalesce(
            F.max(F.when(F.col("rank") == k + 1, F.col(cnt_col))),
            F.lit(0),
        )
        .cast("long")
        .alias("dec")
    )
    return (
        ranked.where(F.col("rank") <= k)
        .join(thr, "g")
        .select(
            "g",
            "key",
            F.col(cnt_col).cast("long").alias("cnt"),
            (F.col(cnt_col) - F.col("dec")).cast("long").alias("w_mg"),
            "dec",
        )
        .where(F.col("w_mg") > 0)
    )


def mg_summary(
    df: DataFrame, group_col: str, key_col: str, weight: Column, k: int
) -> DataFrame:
    """(g, key, cnt, w_mg, dec) — the deterministic k-counter Misra-Gries
    summary of the full input (offset form over exact weighted counts).
    ``cnt`` is the key's true total weight (the baseline the bound is
    stated against); ``w_mg`` is what a k-counter summary retains."""
    counts = (
        df.select(
            F.col(group_col).alias("g"),
            F.col(key_col).alias("key"),
            weight.cast("long").alias("w"),
        )
        .groupBy("g", "key")
        .agg(F.sum("w").alias("cnt"))
    )
    return mg_truncate(counts, k)


def mg_merge(parts: DataFrame, k: int) -> DataFrame:
    """Merge partial summaries (union of frames carrying g, key, w_mg):
    counter-sum then re-truncate — the standard mergeable-summaries rule.
    NOTE: additive, not idempotent — at-least-once replay of a partial
    double-counts it (the engine's CMS delta bookkeeping exists for
    exactly this class; the min-merge registers don't need it)."""
    summed = parts.groupBy("g", "key").agg(
        F.sum("w_mg").cast("long").alias("cnt")
    )
    out = mg_truncate(summed, k)
    # a merged summary's "cnt" is the summed partial weights, not a true
    # count — expose only the summary columns to keep the contract clear
    return out.select("g", "key", "w_mg", "dec")


def mg_oracle_cte(
    source_sql: str, group_expr: str, key_expr: str, weight_expr: str, k: int
) -> str:
    """DuckDB CTE block (names mg_*): ``mg_out`` yields
    (g, key, cnt, w_mg, dec) with identical integer arithmetic; ``mg_tot``
    yields (g, n_tot) for stating the N/(k+1) bound."""
    return f"""
    mg_v AS (
      SELECT {group_expr} AS g, {key_expr} AS key,
             CAST({weight_expr} AS BIGINT) AS w
      FROM {source_sql}
    ),
    mg_cnt AS (SELECT g, key, SUM(w) AS cnt FROM mg_v GROUP BY 1, 2),
    mg_rk AS (
      SELECT * FROM (
        SELECT g, key, cnt,
               ROW_NUMBER() OVER (PARTITION BY g
                                  ORDER BY cnt DESC, key) AS rank
        FROM mg_cnt)
      WHERE rank <= {k + 1}
    ),
    mg_thr AS (
      SELECT g,
             COALESCE(MAX(CASE WHEN rank = {k + 1} THEN cnt END), 0) AS dec
      FROM mg_rk GROUP BY g
    ),
    mg_tot AS (SELECT g, SUM(w) AS n_tot FROM mg_v GROUP BY g),
    mg_out AS (
      SELECT r.g, r.key, CAST(r.cnt AS BIGINT) AS cnt,
             CAST(r.cnt - t.dec AS BIGINT) AS w_mg,
             CAST(t.dec AS BIGINT) AS dec
      FROM mg_rk r JOIN mg_thr t USING (g)
      WHERE r.rank <= {k} AND r.cnt - t.dec > 0
    )"""
