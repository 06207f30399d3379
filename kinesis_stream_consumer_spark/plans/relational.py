"""Relational operator queries (SURVEY §2.2) — Spark-first implementations.

The reference engine has no relational operators (verified: its only exports
are config/extract/identify/discard — reference kinesis-consumer.js:32-37,
kinesis-processing.js:54-114). This module exposes the classic categories
over the driver's star schema, expressed so Catalyst gets full freedom:
filters before joins (pushdown), explicit ``broadcast()`` for dimension
tables, aggregate aliases stable for the oracle compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_stream_consumer_spark.operators import similarity as S
from kinesis_stream_consumer_spark.operators import sketches as SK
from kinesis_stream_consumer_spark.plans.queries import (
    _bcast_if_small,
    _scan_meta,
    _t,
    register,
)

# PAA-profile LSH parameters. Signature width scales with the PROFILED
# entity population via the same corpus-scaled rule as the embedding LSH
# (sign_bits_for: target bucket size 8). The population is min(structural
# user cap from the query's filter, events-table row count from parquet
# footer stats) — the stats term is the dedup_embedding_cosine n_rows
# pattern, so with the cap lifted the banding keeps scaling instead of
# freezing at a constant (VERDICT r4 #6). The oracle SQL is built at
# import with the cap-bound value; every real sf has events rows >> cap,
# so the two agree wherever the oracle runs (asserted in the Spark fn).
_PAA_USER_CAP = 40
_PAA_BITS = S.sign_bits_for(_PAA_USER_CAP)
_PAA_TABLES = 3
_PAA_NG = _PAA_BITS * _PAA_TABLES


def _paa_bits(sf_dir: str) -> int:
    """Entity-count-scaled signature width from table stats (no job)."""
    from kinesis_stream_consumer_spark.plans.queries import _table_row_count

    n_entities = min(_PAA_USER_CAP, _table_row_count(sf_dir, "events"))
    return S.sign_bits_for(n_entities)


def _paa_weight(g: int) -> str:
    """±small integer projection weight for (hr, hyperplane g) — the same
    arithmetic family as banded_sign_projection_rows (w(i,g) =
    ((i·31 + g·17) mod 7) − 3, i 1-based), valid SQL in both engines and
    integer-exact on the integer profile bins."""
    return f"((((hr+1)*31 + {g * 17}) % 7) - 3)"


def _paa_candidates(prof: DataFrame, bits: int = _PAA_BITS) -> DataFrame:
    """Banded candidate pairs over (user_id, hr, p) profiles: multi-table
    sign-projection signatures (integer-exact), a pair is a candidate iff
    it collides in ANY table — bounded by bucket occupancy, never
    all-pairs. The shuffle-volume gate pins this bound. ``bits`` is the
    per-table signature width, derived from entity-population stats by
    the caller (_paa_bits)."""
    ng = bits * _PAA_TABLES
    sig = prof.groupBy("user_id").agg(
        *[F.expr(f"sum(p * {_paa_weight(g)}) as s{g}") for g in range(ng)]
    )
    tables = ", ".join(
        "struct({t} as tbl, cast({terms} as long) as bucket)".format(
            t=t,
            terms=" + ".join(
                f"if(s{t * bits + k} >= 0, {1 << k}, 0)"
                for k in range(bits)
            ),
        )
        for t in range(_PAA_TABLES)
    )
    bands = sig.select(
        "user_id", F.explode(F.expr(f"array({tables})")).alias("tb")
    ).select("user_id", F.col("tb.tbl").alias("tbl"), F.col("tb.bucket").alias("bucket"))
    return (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("user_a"), F.col("b.user_id").alias("user_b")
        )
        .distinct()
    )


def _paa_bucket_sql(t: int) -> str:
    terms = " + ".join(
        f"(CASE WHEN s{t * _PAA_BITS + k} >= 0 THEN {1 << k} ELSE 0 END)"
        for k in range(_PAA_BITS)
    )
    return f"SELECT user_id, {t} AS tbl, {terms} AS bucket FROM sig"


_RSV_N = 8
_RSV_TOKS = r"len(regexp_extract_all(text, '[A-Za-z]+|\d+|[^\w\s]'))"


_MG_K = 8


@register(
    "agg_topk_misra_gries",
    f"""
    WITH src AS (
      SELECT lang, unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
      FROM documents
    ),
    {{MG_CTE}}
    SELECT o.g AS lang, o.key AS token, o.cnt AS exact_count,
           o.w_mg AS mg_weight, o.dec AS undercount,
           CAST(t.n_tot // {_MG_K + 1} AS BIGINT) AS err_bound
    FROM mg_out o JOIN mg_tot t USING (g)
    ORDER BY 1, 4 DESC, 2
    """.replace(
        "{MG_CTE}",
        SK.mg_oracle_cte("src", "lang", "tok", "1", _MG_K).lstrip().rstrip(),
    ),
    doc="Misra-Gries / SpaceSaving frequent items — the DETERMINISTIC "
    "bounded-memory frequency summary next to the probabilistic CMS "
    f"(VERDICT r8 #5): {_MG_K} counters per language over token "
    "occurrences, in the offset form (Agarwal et al., Mergeable "
    "Summaries, PODS 2012) — keep the k largest counts, subtract the "
    "(k+1)-st — so the undercount is EXACTLY c_(k+1) <= N/(k+1) and any "
    "token with true count > N/(k+1) is guaranteed present, a guarantee "
    "CMS can only give probabilistically. Output pairs each kept token's "
    "summary weight with its exact count, the realized undercount, and "
    "the N div (k+1) bound the guarantee promises (undercount <= "
    "err_bound by construction, visible per row). Integer-exact end to "
    "end. At 100 TB: the exact-count exchange ships counts (map-side "
    "combine), never occurrences, and the truncation's rank filter plans "
    "as WindowGroupLimit — <= k+1 rows per group per map partition "
    "(gate-asserted); counters merge by sum-then-re-truncate "
    "(sketches.mg_merge) with the additive-vs-min-merge replay contrast "
    "documented on the operator.",
)
def agg_topk_misra_gries(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators import text as T

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        F.col("lang").alias("g"),
        F.explode(T.tokens(F.col("text"))).alias("key"),
    )
    # the truncation window, the threshold aggregate and the group totals
    # all read the counts frame; checkpoint it once — it is vocabulary-
    # sized (one row per distinct (lang, token)), not corpus-sized
    counts = (
        toks.groupBy("g", "key")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=True)
    )
    langt = counts.groupBy("g").agg(
        F.sum("cnt").cast("long").alias("n_tot")
    )
    return (
        SK.mg_truncate(counts, _MG_K)
        .join(F.broadcast(langt), "g")
        .select(
            F.col("g").alias("lang"),
            F.col("key").alias("token"),
            F.col("cnt").alias("exact_count"),
            F.col("w_mg").alias("mg_weight"),
            F.col("dec").alias("undercount"),
            F.expr(f"n_tot div {_MG_K + 1}").cast("long").alias("err_bound"),
        )
        .orderBy("lang", F.col("mg_weight").desc(), "token")
    )


@register(
    "window_drawdown",
    """
    WITH e AS (
      SELECT user_id, event_id, ts,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    c AS (
      SELECT user_id, ts, event_id,
             SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS equity
      FROM e
    ),
    d AS (
      SELECT user_id, equity,
             MAX(equity) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS peak
      FROM c
    )
    SELECT user_id,
           CAST(MAX(peak - equity) AS BIGINT) AS max_drawdown_cents,
           CAST(MAX(peak) AS BIGINT) AS peak_equity_cents,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM d
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Maximum drawdown per user — the running-peak mirror of the CUSUM "
    "window identity (events_cusum_drift): cumulative cents form the "
    "equity curve, a second stacked running-max window over the SAME sort "
    "gives the peak, and the drawdown is peak − equity, all integer-exact "
    "(half-up cents). The monitoring primitive every balance/inventory "
    "stream wants. One per-user sort carries both windows (Spark plans "
    "the two frames over a single exchange+sort); the final per-user "
    "aggregate combines map-side. At 100 TB this is one keyed shuffle of "
    "(user, cents) rows — no self-joins, no driver state.",
)
def window_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cur = ev.select("user_id", "ts", "event_id", cents.alias("cents")).select(
        "user_id", F.sum("cents").over(w).alias("equity"), "ts", "event_id"
    )
    peaked = cur.select(
        "user_id", "equity", F.max("equity").over(w).alias("peak")
    )
    return (
        peaked.groupBy("user_id")
        .agg(
            F.max(F.col("peak") - F.col("equity"))
            .cast("long")
            .alias("max_drawdown_cents"),
            F.max("peak").cast("long").alias("peak_equity_cents"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "window_streak_lengths",
    """
    WITH e AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    dy AS (SELECT user_id, day, SUM(cents) AS tot FROM e GROUP BY 1, 2),
    f AS (
      SELECT user_id, day, tot,
             CASE WHEN tot > LAG(tot) OVER (PARTITION BY user_id
                                            ORDER BY day)
                  THEN 1 ELSE 0 END AS up
      FROM dy
    ),
    g AS (
      SELECT user_id, day, up,
             SUM(1 - up) OVER (PARTITION BY user_id ORDER BY day
                               ROWS UNBOUNDED PRECEDING) AS island
      FROM f
    ),
    s AS (SELECT user_id, island, COUNT(*) AS len
          FROM g GROUP BY user_id, island)
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS longest_up_streak,
           CAST(SUM(len) AS BIGINT) AS n_days
    FROM s GROUP BY user_id ORDER BY user_id
    """,
    doc="Longest strictly-increasing daily-total streak per user — the "
    "gaps-and-islands pattern: an up/down flag from LAG, island ids from "
    "a running sum of streak breaks, then a per-island count. Everything "
    "rides ONE per-user day sort (both windows share it) plus two "
    "map-side-combining aggregates; integer cents end to end. The "
    "classic sessionize-adjacent window idiom the registry was missing.",
)
def window_streak_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    dy = (
        ev.select(
            "user_id", F.col("ts").cast("date").alias("day"), cents.alias("c")
        )
        .groupBy("user_id", "day")
        .agg(F.sum("c").alias("tot"))
    )
    wo = Window.partitionBy("user_id").orderBy("day")
    wr = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    f = dy.select(
        "user_id",
        "day",
        F.when(F.col("tot") > F.lag("tot").over(wo), 1)
        .otherwise(0)
        .alias("up"),
    )
    g = f.select(
        "user_id", (F.lit(1) - F.col("up")).alias("brk"), "day"
    ).select("user_id", F.sum("brk").over(wr).alias("island"))
    s = g.groupBy("user_id", "island").agg(F.count(F.lit(1)).alias("len"))
    return (
        s.groupBy("user_id")
        .agg(
            F.max("len").cast("long").alias("longest_up_streak"),
            F.sum("len").cast("long").alias("n_days"),
        )
        .orderBy("user_id")
    )


@register(
    "events_burstiness",
    """
    WITH h AS (
      SELECT user_id, date_trunc('hour', ts) AS hr, COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT user_id, COUNT(*) AS n, SUM(c) AS sc, SUM(c * c) AS sc2
      FROM h GROUP BY user_id
    )
    SELECT user_id,
           CAST(n AS BIGINT) AS n_hours,
           CAST(sc AS BIGINT) AS n_events,
           CAST((20000 * (n * sc2 - sc * sc) + n * sc) // (2 * n * sc)
                AS BIGINT) AS fano_bp
    FROM s ORDER BY user_id
    """,
    doc="Per-user burstiness via the Fano factor (variance-to-mean ratio "
    "of hourly event counts over the user's active hours, in basis "
    "points): fano_bp = 10000·var_pop/mean, computed as the exact "
    "rational (n·Σc² − (Σc)²)/(n·Σc) with half-up integer rounding — the "
    "numerator is non-negative so // and div agree. ≈10000 means "
    "Poisson-like traffic; ≫10000 flags bursty users (bot/batch "
    "signatures). Two map-side-combining aggregates, counts only — at "
    "100 TB the shuffle carries one row per (user, hour) then one per "
    "user.",
)
def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    h = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.count(F.lit(1)).alias("c"))
    s = h.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("sc2"),
    )
    return s.select(
        "user_id",
        F.col("n").cast("long").alias("n_hours"),
        F.col("sc").cast("long").alias("n_events"),
        F.expr(
            "(20000 * (n * sc2 - sc * sc) + n * sc) div (2 * n * sc)"
        )
        .cast("long")
        .alias("fano_bp"),
    ).orderBy("user_id")


@register(
    "audit_null_profile",
    """
    WITH u AS (
      SELECT 'event_id' AS col_name, CAST(event_id AS VARCHAR) AS val
      FROM events
      UNION ALL SELECT 'ts', CAST(ts AS VARCHAR) FROM events
      UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
      UNION ALL SELECT 'event_type', event_type FROM events
      UNION ALL SELECT 'value', CAST(value AS VARCHAR) FROM events
      UNION ALL SELECT 'props', props FROM events
    )
    SELECT col_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_null,
           CAST(COUNT(DISTINCT val) AS BIGINT) AS n_distinct,
           CAST((20000 * SUM(CASE WHEN val IS NULL THEN 1 ELSE 0 END)
                 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS null_rate_bp
    FROM u GROUP BY col_name ORDER BY col_name
    """,
    doc="Per-column data-quality profile of the events table (null count/"
    "rate, exact distinct count) — the schema-audit every ingestion "
    "pipeline runs before trusting a new drop. Spark side unpivots via "
    "stack() into (col_name, val) rows and aggregates once; the oracle "
    "unions per-column selects. Values are compared only through COUNTs "
    "of per-engine-injective string casts, so engine-specific rendering "
    "(timestamps) can never flip the result. At 100 TB the shuffle "
    "carries one row per distinct (column, value) with map-side combine "
    "— the exact tier; the HLL/KMV registers are the sketch tier for "
    "the same question.",
)
def audit_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = ev.select(
        F.expr(
            "stack(6,"
            " 'event_id', CAST(event_id AS STRING),"
            " 'ts', CAST(ts AS STRING),"
            " 'user_id', CAST(user_id AS STRING),"
            " 'event_type', event_type,"
            " 'value', CAST(value AS STRING),"
            " 'props', props) AS (col_name, val)"
        )
    )
    return (
        u.groupBy("col_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.when(F.col("val").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null"),
            F.countDistinct("val").cast("long").alias("n_distinct"),
        )
        .select(
            "col_name",
            "n_rows",
            "n_null",
            "n_distinct",
            F.expr("(20000 * n_null + n_rows) div (2 * n_rows)")
            .cast("long")
            .alias("null_rate_bp"),
        )
        .orderBy("col_name")
    )


@register(
    "audit_outlier_iqr",
    """
    WITH e AS (
      SELECT event_type, event_id,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    n AS (SELECT event_type, COUNT(*) AS n FROM e GROUP BY 1),
    r AS (
      SELECT event_type, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cents, event_id) AS rn
      FROM e
    ),
    q AS (
      SELECT r.event_type,
             MAX(CASE WHEN rn = (n.n + 3) // 4 THEN cents END) AS q1,
             MAX(CASE WHEN rn = (3 * n.n + 3) // 4 THEN cents END) AS q3
      FROM r JOIN n USING (event_type) GROUP BY r.event_type
    )
    SELECT e.event_type,
           CAST(q.q1 AS BIGINT) AS q1_cents,
           CAST(q.q3 AS BIGINT) AS q3_cents,
           CAST(q.q3 - q.q1 AS BIGINT) AS iqr_cents,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN 2 * e.cents < 2 * q.q1 - 3 * (q.q3 - q.q1)
                           OR 2 * e.cents > 2 * q.q3 + 3 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM e JOIN q USING (event_type)
    GROUP BY 1, 2, 3, 4
    ORDER BY event_type
    """,
    doc="Tukey-fence outlier audit per event type with EXACT nearest-rank "
    "quartiles: q1/q3 are the values at ROW_NUMBER positions "
    "ceil(n/4) = (n+3) div 4 and ceil(3n/4) (deterministic total order "
    "by (cents, event_id) — no interpolation, so both engines agree "
    "bit-for-bit where percentile functions would diverge), and the "
    "1.5·IQR fences are tested in doubled-integer space "
    "(2c < 2q1 − 3·IQR) so no fraction ever appears. Exact quantiles "
    "cost one per-group sort — this is the audit tier; qsketch is the "
    "mergeable approximation for the same question at stream scale. The "
    "fence count re-joins the #groups-bounded quartile frame broadcast.",
)
def audit_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    ).localCheckpoint(eager=True)  # read twice: rank pass + fence count
    etn = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    r = e.select("event_type", "event_id", "cents").withColumn(
        "rn", F.row_number().over(w)
    )
    etq = (
        r.join(F.broadcast(etn), "event_type")
        .groupBy("event_type")
        .agg(
            F.max(
                F.when(F.col("rn") == F.expr("(n + 3) div 4"), F.col("cents"))
            ).alias("q1"),
            F.max(
                F.when(
                    F.col("rn") == F.expr("(3 * n + 3) div 4"), F.col("cents")
                )
            ).alias("q3"),
        )
    )
    return (
        e.join(F.broadcast(etq), "event_type")
        .groupBy(
            "event_type",
            F.col("q1").cast("long").alias("q1_cents"),
            F.col("q3").cast("long").alias("q3_cents"),
            (F.col("q3") - F.col("q1")).cast("long").alias("iqr_cents"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(
                F.when(
                    (
                        2 * F.col("cents")
                        < 2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1"))
                    )
                    | (
                        2 * F.col("cents")
                        > 2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1"))
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_mad_robust_z",
    """
    WITH e AS (
      SELECT l_returnflag AS flag, l_orderkey, l_linenumber,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
      FROM lineitem
    ),
    n AS (SELECT flag, COUNT(*) AS n FROM e GROUP BY 1),
    r AS (
      SELECT flag, cents,
             ROW_NUMBER() OVER (PARTITION BY flag
                                ORDER BY cents, l_orderkey, l_linenumber)
               AS rn
      FROM e
    ),
    med AS (
      SELECT r.flag,
             MAX(CASE WHEN rn = (n.n + 1) // 2 THEN cents END) AS med
      FROM r JOIN n USING (flag) GROUP BY r.flag
    ),
    dv AS (
      SELECT e.flag, ABS(e.cents - m.med) AS dev,
             e.l_orderkey, e.l_linenumber, m.med
      FROM e JOIN med m USING (flag)
    ),
    dr AS (
      SELECT flag, dev, med,
             ROW_NUMBER() OVER (PARTITION BY flag
                                ORDER BY dev, l_orderkey, l_linenumber)
               AS rn
      FROM dv
    ),
    mad AS (
      SELECT dr.flag, MAX(dr.med) AS med,
             MAX(CASE WHEN rn = (n.n + 1) // 2 THEN dev END) AS mad
      FROM dr JOIN n USING (flag) GROUP BY dr.flag
    )
    SELECT e.flag AS l_returnflag,
           CAST(m.med AS BIGINT) AS median_cents,
           CAST(m.mad AS BIGINT) AS mad_cents,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN 10000 * ABS(e.cents - m.med) > 44478 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_robust_outliers
    FROM e JOIN mad m USING (flag)
    GROUP BY 1, 2, 3
    ORDER BY l_returnflag
    """,
    doc="Median / MAD / robust-z outlier audit per return flag — the "
    "robust-statistics twin of the IQR fence: the LOWER median at "
    "ROW_NUMBER position (n+1) div 2 under a deterministic total order "
    "(no interpolation → bit-exact cross-engine), the MAD as the lower "
    "median of absolute deviations (second ranked pass), and the robust "
    "z-score cut |x−med| > 3·MAD/0.6745 tested as the integer inequality "
    "10000·|x−med| > 44478·MAD. Two per-group sorts buy the exactness "
    "(the audit tier; the engine's qsketch is the mergeable tier); the "
    "#groups-bounded median/MAD frames broadcast back for the fence "
    "count.",
)
def agg_mad_robust_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_returnflag").alias("flag"),
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    ).localCheckpoint(eager=True)  # read 3x: two rank passes + fence count
    fln = e.groupBy("flag").agg(F.count(F.lit(1)).alias("n"))
    w1 = Window.partitionBy("flag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    )
    flmed = (
        e.withColumn("rn", F.row_number().over(w1))
        .join(F.broadcast(fln), "flag")
        .groupBy("flag")
        .agg(
            F.max(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("cents"))
            ).alias("med")
        )
    )
    dv = e.join(F.broadcast(flmed), "flag").select(
        "flag",
        "l_orderkey",
        "l_linenumber",
        "med",
        F.abs(F.col("cents") - F.col("med")).alias("dev"),
    )
    w2 = Window.partitionBy("flag").orderBy(
        "dev", "l_orderkey", "l_linenumber"
    )
    flmad = (
        dv.withColumn("rn", F.row_number().over(w2))
        .join(F.broadcast(fln), "flag")
        .groupBy("flag")
        .agg(
            F.max("med").alias("med"),
            F.max(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("dev"))
            ).alias("mad"),
        )
    )
    return (
        e.join(F.broadcast(flmad), "flag")
        .groupBy(
            F.col("flag").alias("l_returnflag"),
            F.col("med").cast("long").alias("median_cents"),
            F.col("mad").cast("long").alias("mad_cents"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(
                F.when(
                    10000 * F.abs(F.col("cents") - F.col("med"))
                    > 44478 * F.col("mad"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_robust_outliers"),
        )
        .orderBy("l_returnflag")
    )


# Shared co-purchase graph (same construction as graph_triangle_counts /
# graph_bfs_levels, hash-held r8 blocks left untouched): parts are linked
# when they co-occur in >= 2 orders.
from kinesis_stream_consumer_spark.plans.graph_shared import (  # noqa: F401
    _COEDGES_SQL,
    _EDGE_CACHE,
    _co_edges,
)


@register(
    "graph_degree_assortativity",
    f"""
    WITH {_COEDGES_SQL},
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM edges UNION ALL SELECT v FROM edges
      ) GROUP BY node
    ),
    pairs AS (
      SELECT du.d AS x, dv.d AS y FROM edges e
      JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
      UNION ALL
      SELECT dv.d, du.d FROM edges e
      JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    ),
    s AS (
      SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(x * x) AS sxx,
             SUM(x * y) AS sxy
      FROM pairs
    )
    SELECT CAST(n / 2 AS BIGINT) AS n_edges,
           CAST(FLOOR(10000.0 * CAST(n * sxy - sx * sx AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE) + 0.5)
                AS BIGINT) AS assortativity_bp
    FROM s
    """,
    doc="Degree assortativity of the co-purchase graph (Newman 2002) — do "
    "hub parts link to hubs or to leaves? Over the SYMMETRIZED edge "
    "list the Pearson correlation of endpoint degrees is EXACTLY "
    "rational: symmetry makes Σx = Σy and Σx² = Σy², so "
    "r = (n·Σxy − (Σx)²)/(n·Σx² − (Σx)²) needs no square root — integer "
    "sums end to end, one double division for the half-up basis-point "
    "rounding (identical IEEE both engines, sign-safe via FLOOR(x+0.5)). "
    "Plan: degree aggregate + two vertex-keyed joins + one scalar "
    "aggregate; the only driver row is the final scalar. Negative bp = "
    "disassortative (hub-leaf) — the typical retail co-purchase shape.",
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _co_edges(spark, sf_dir)  # session-cached checkpoint
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
        .localCheckpoint(eager=True)  # joined twice
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("x"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("y"))
    one_dir = edges.join(du, "u").join(dv, "v").select("x", "y")
    pairs = one_dir.unionAll(one_dir.select(F.col("y").alias("x"), F.col("x").alias("y")))
    s = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return s.select(
        F.expr("n div 2").cast("long").alias("n_edges"),
        F.floor(
            F.lit(10000.0)
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
                "double"
            )
            + F.lit(0.5)
        )
        .cast("long")
        .alias("assortativity_bp"),
    )


# _LPA_ROUNDS / _lpa_round_sql live in plans/graph_shared.py (helper-only
# module) so plans modules that register BEFORE this one can reuse the
# unrolled-LPA oracle fragment without tripping the import-order trap; the
# rendered SQL is byte-identical, so certified hashes are unchanged.
from kinesis_stream_consumer_spark.plans.graph_shared import (  # noqa: E402
    _LPA_ROUNDS,
    _lpa_round_sql,
)


@register(
    "graph_label_propagation",
    f"""
    WITH {_COEDGES_SQL},
    bidir AS (
      SELECT u AS s, v AS d FROM edges
      UNION ALL SELECT v, u FROM edges
    ),
    l0 AS (SELECT DISTINCT s AS node, s AS label FROM bidir),
    {",".join(_lpa_round_sql(i).lstrip() for i in range(1, _LPA_ROUNDS + 1))}
    SELECT label AS community, CAST(COUNT(*) AS BIGINT) AS n_members
    FROM l{_LPA_ROUNDS}
    GROUP BY label ORDER BY n_members DESC, community
    """,
    doc="Community detection by synchronous label propagation (Raghavan "
    f"et al. 2007) over the co-purchase graph, {_LPA_ROUNDS} rounds, made "
    "DETERMINISTIC: every vertex adopts its neighbours' most frequent "
    "label, ties to the smallest — no random visit order, so the "
    "unrolled DuckDB CTE chain reproduces the labels bit-for-bit. Each "
    "round is one vertex-keyed join + a counting aggregate (map-side "
    "combine) + a top-1 rank that plans as WindowGroupLimit (<= 1 row "
    "per vertex per map partition crosses the exchange); per-round "
    "checkpoints keep lineage flat — the same unrolled-iteration "
    "discipline as BFS/components. Output is the community size "
    "histogram.",
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators.graph import (
        label_propagation,
    )

    edges = _co_edges(spark, sf_dir)
    labels = label_propagation(edges, rounds=_LPA_ROUNDS)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_members"))
        .orderBy(F.col("n_members").desc(), "community")
    )


_KCORE_K = 2
_KCORE_ROUNDS = 4


# MATERIALIZED is load-bearing on every CTE of this chain: DuckDB inlines
# CTE references by default, and each round references its predecessor 3x
# (twice in the degree union, once in the edge join), so the inlined plan
# re-evaluates the whole chain ~7^rounds times — measured 150+ s at sf0.01
# vs 0.15 s materialized, identical rows (r15). The hint changes execution
# only, never results.
def _kcore_round_sql(i: int) -> str:
    prev = f"e{i - 1}" if i > 1 else "e0"
    return f"""
    d{i} AS MATERIALIZED (
      SELECT node, COUNT(*) AS dg FROM (
        SELECT u AS node FROM {prev} UNION ALL SELECT v FROM {prev}
      ) GROUP BY node HAVING COUNT(*) >= {_KCORE_K}
    ),
    e{i} AS MATERIALIZED (
      SELECT p.u, p.v FROM {prev} p
      JOIN d{i} a ON a.node = p.u
      JOIN d{i} b ON b.node = p.v
    )"""


@register(
    "graph_kcore_peel",
    f"""
    WITH {_COEDGES_SQL},
    e0 AS MATERIALIZED (SELECT u, v FROM edges),
    {",".join(_kcore_round_sql(i).lstrip() for i in range(1, _KCORE_ROUNDS + 1))}
    SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
    FROM (SELECT u AS node FROM e{_KCORE_ROUNDS}
          UNION ALL SELECT v FROM e{_KCORE_ROUNDS})
    GROUP BY node ORDER BY node
    """,
    doc=f"Bounded {_KCORE_K}-core peeling of the co-purchase graph: "
    f"{_KCORE_ROUNDS} synchronous rounds of dropping every vertex with "
    f"degree < {_KCORE_K} and its edges — the textbook k-core peel "
    "unrolled to a fixed depth (each round strictly shrinks the edge "
    "set; the oracle's unrolled CTE chain matches round for round). "
    "Each round is a degree aggregate with map-side combine plus two "
    "vertex-keyed semi-joins, surviving edges checkpointed so lineage "
    "stays flat. The dense-core extraction every recommender/fraud "
    "pipeline runs before expensive pairwise work.",
)
def graph_kcore_peel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators.graph import kcore_peel

    edges = _co_edges(spark, sf_dir)
    return kcore_peel(
        edges, k=_KCORE_K, rounds=_KCORE_ROUNDS
    ).orderBy("node")


@register(
    "agg_gini_concentration",
    """
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ),
    cust AS (
      SELECT n.n_name AS nation, r.cents, r.o_custkey
      FROM rev r
      JOIN customer c ON c.c_custkey = r.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    rk AS (
      SELECT nation, cents,
             ROW_NUMBER() OVER (PARTITION BY nation
                                ORDER BY cents, o_custkey) AS i
      FROM cust
    ),
    s AS (
      SELECT nation, COUNT(*) AS n, SUM(cents) AS sx,
             SUM(i * cents) AS six
      FROM rk GROUP BY nation
    )
    SELECT nation,
           CAST(n AS BIGINT) AS n_customers,
           CAST(sx AS BIGINT) AS revenue_cents,
           CAST(FLOOR(10000.0 * CAST(2 * six - (n + 1) * sx AS DOUBLE)
                      / CAST(n * sx AS DOUBLE) + 0.5) AS BIGINT)
             AS gini_bp
    FROM s ORDER BY nation
    """,
    doc="Gini coefficient of customer revenue per nation (basis points) — "
    "the concentration/inequality audit (is one nation's revenue carried "
    "by a handful of accounts?). Uses the exact rank identity "
    "G = (2·Σ i·x_(i) − (n+1)·Σx)/(n·Σx) over an ascending "
    "(cents, custkey) ROW_NUMBER — integer sums end to end, one "
    "deterministic IEEE division for the half-up bp (numerator "
    "non-negative by Chebyshev's sum inequality). One per-nation rank "
    "sort over customer-grain rows (already aggregated from orders "
    "map-side) + slim dim joins; shuffles carry customer aggregates, "
    "never order rows.",
)
def agg_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    cust = (
        rev.join(
            _bcast_if_small(
                _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
                sf_dir,
                "customer",
            ),
            rev.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("n_name").alias("nation"), "cents", "o_custkey")
    )
    w = Window.partitionBy("nation").orderBy("cents", "o_custkey")
    s = (
        cust.withColumn("i", F.row_number().over(w))
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sx"),
            F.sum(F.col("i") * F.col("cents")).alias("six"),
        )
    )
    return s.select(
        "nation",
        F.col("n").cast("long").alias("n_customers"),
        F.col("sx").cast("long").alias("revenue_cents"),
        F.floor(
            F.lit(10000.0)
            * (2 * F.col("six") - (F.col("n") + 1) * F.col("sx")).cast("double")
            / (F.col("n") * F.col("sx")).cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("gini_bp"),
    ).orderBy("nation")


@register(
    "ts_dow_seasonality",
    """
    WITH e AS (
      SELECT dayofweek(ts) + 1 AS dow,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    d AS (SELECT dow, COUNT(*) AS n_d, SUM(cents) AS s_d FROM e GROUP BY 1),
    t AS (SELECT COUNT(*) AS n, SUM(cents) AS s FROM e)
    SELECT dow,
           CAST(n_d AS BIGINT) AS n_events,
           CAST(s_d AS BIGINT) AS revenue_cents,
           CAST((20000 * s_d * t.n + n_d * t.s) // (2 * n_d * t.s)
                AS BIGINT) AS index_bp
    FROM d CROSS JOIN t ORDER BY dow
    """,
    doc="Day-of-week seasonality index of event revenue: per-dow mean "
    "value versus the overall mean, as the exact rational "
    "(S_d·n)/(n_d·S) in half-up basis points (10000 = average day) — "
    "all-integer, the classic retail/traffic weekly profile. Day "
    "numbering pinned to Spark's dayofweek (1 = Sunday) with the oracle "
    "shifted to match DuckDB's 0-based convention. One counting "
    "aggregate + a 7-row frame joined against a scalar — at any scale "
    "the shuffle carries 7 rows plus the scalar.",
)
def ts_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        F.dayofweek("ts").alias("dow"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("cents"),
    )
    d = e.groupBy("dow").agg(
        F.count(F.lit(1)).alias("n_d"), F.sum("cents").alias("s_d")
    ).localCheckpoint(eager=True)  # 7-row frame; scalar derives from it
    tot = d.agg(F.sum("n_d").alias("n"), F.sum("s_d").alias("s")).first()
    n, s = int(tot["n"]), int(tot["s"])
    return d.select(
        "dow",
        F.col("n_d").cast("long").alias("n_events"),
        F.col("s_d").cast("long").alias("revenue_cents"),
        F.expr(f"(20000 * s_d * {n}L + n_d * {s}L) div (2 * n_d * {s}L)")
        .cast("long")
        .alias("index_bp"),
    ).orderBy("dow")


@register(
    "agg_weighted_median",
    """
    WITH e AS (
      SELECT l_returnflag AS flag, l_orderkey, l_linenumber,
             CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(l_quantity AS BIGINT) AS qty
      FROM lineitem
    ),
    c AS (
      SELECT flag, cents, qty,
             SUM(qty) OVER (PARTITION BY flag
                            ORDER BY cents, l_orderkey, l_linenumber
                            ROWS UNBOUNDED PRECEDING) AS cumw
      FROM e
    ),
    t AS (SELECT flag, SUM(qty) AS w FROM e GROUP BY flag)
    SELECT c.flag AS l_returnflag,
           CAST(MIN(CASE WHEN 2 * c.cumw >= t.w THEN c.cents END)
                AS BIGINT) AS weighted_median_cents,
           CAST(t.w AS BIGINT) AS total_quantity
    FROM c JOIN t USING (flag)
    GROUP BY c.flag, t.w
    ORDER BY l_returnflag
    """,
    doc="Quantity-weighted median price per return flag — the lower "
    "weighted median: first price (in the deterministic "
    "(cents, orderkey, linenumber) total order) whose running quantity "
    "mass reaches half the group total, tested as the integer "
    "inequality 2·cumw >= W. The aggregation-aware median every pricing "
    "dashboard wants (a plain median over line items overweights "
    "single-unit lines). One per-group sort carries the cumulative "
    "window; the #groups-bounded totals broadcast back; integer-exact "
    "so both engines agree bit-for-bit where interpolating percentile "
    "functions would not.",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.col("l_returnflag").alias("flag"),
        "l_orderkey",
        "l_linenumber",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
        F.col("l_quantity").cast("long").alias("qty"),
    )
    w = Window.partitionBy("flag").orderBy(
        "cents", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = e.select("flag", "cents", "qty", F.sum("qty").over(w).alias("cumw"))
    flw = e.groupBy("flag").agg(F.sum("qty").alias("w"))
    return (
        c.join(F.broadcast(flw), "flag")
        .groupBy(F.col("flag").alias("l_returnflag"), "w")
        .agg(
            F.min(
                F.when(2 * F.col("cumw") >= F.col("w"), F.col("cents"))
            )
            .cast("long")
            .alias("weighted_median_cents")
        )
        .select(
            "l_returnflag",
            "weighted_median_cents",
            F.col("w").cast("long").alias("total_quantity"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "events_interarrival_median",
    """
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS us FROM events
    ),
    g AS (
      SELECT user_id, event_id,
             us - LAG(us) OVER (PARTITION BY user_id
                                ORDER BY us, event_id) AS gap_us
      FROM e
    ),
    gg AS (SELECT * FROM g WHERE gap_us IS NOT NULL),
    n AS (SELECT user_id, COUNT(*) AS n FROM gg GROUP BY 1),
    r AS (
      SELECT user_id, gap_us,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY gap_us, event_id) AS rn
      FROM gg
    )
    SELECT r.user_id,
           CAST(n.n AS BIGINT) AS n_gaps,
           CAST(MAX(CASE WHEN rn = (n.n + 1) // 2 THEN gap_us END)
                AS BIGINT) AS median_interarrival_us
    FROM r JOIN n USING (user_id)
    GROUP BY r.user_id, n.n
    ORDER BY user_id
    """,
    doc="Median inter-arrival time per user (microseconds, exact lower "
    "median) — the time-domain activity signature next to the "
    "Fano-factor burstiness: LAG over the per-user event order gives the "
    "gaps, a second deterministic rank pass picks the median with no "
    "interpolation (bit-exact cross-engine). Timestamps compare as "
    "epoch microseconds on both engines (the events table's native "
    "precision). Two per-user sorts; gap rows only ever shuffle keyed "
    "on user.",
)
def events_interarrival_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    wo = Window.partitionBy("user_id").orderBy("us", "event_id")
    g = e.select(
        "user_id",
        "event_id",
        (F.col("us") - F.lag("us").over(wo)).alias("gap_us"),
    ).where(F.col("gap_us").isNotNull())
    n = g.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    wr = Window.partitionBy("user_id").orderBy("gap_us", "event_id")
    r = g.withColumn("rn", F.row_number().over(wr))
    # n is per-USER — row-scaled at 100 TB, so no forced broadcast: the
    # join is user-keyed like the rank window, AQE picks the strategy
    return (
        r.join(n, "user_id")
        .groupBy("user_id", "n")
        .agg(
            F.max(
                F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("gap_us"))
            )
            .cast("long")
            .alias("median_interarrival_us")
        )
        .select(
            "user_id",
            F.col("n").cast("long").alias("n_gaps"),
            "median_interarrival_us",
        )
        .orderBy("user_id")
    )


_CN_CAP = 32


@register(
    "graph_link_prediction",
    f"""
    WITH {_COEDGES_SQL},
    bidir AS (
      SELECT u AS s, v AS d FROM edges
      UNION ALL SELECT v, u FROM edges
    ),
    adj AS (
      SELECT s, d FROM (
        SELECT s, d, ROW_NUMBER() OVER (PARTITION BY s ORDER BY d) AS rn
        FROM bidir) WHERE rn <= {_CN_CAP}
    ),
    wedges AS (
      SELECT e1.d AS a, e2.d AS b
      FROM adj e1 JOIN adj e2 ON e1.s = e2.s AND e1.d < e2.d
    ),
    cn AS (SELECT a, b, COUNT(*) AS n_common FROM wedges GROUP BY 1, 2),
    nonadj AS (
      SELECT cn.a, cn.b, cn.n_common FROM cn
      LEFT JOIN edges x ON x.u = cn.a AND x.v = cn.b
      WHERE x.u IS NULL
    )
    SELECT a, b, CAST(n_common AS BIGINT) AS n_common, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n_common DESC, a, b) AS rnk
      FROM nonadj
    ) WHERE rnk <= 20
    ORDER BY rnk
    """,
    doc="Common-neighbour link prediction on the co-purchase graph: the "
    "top-20 NON-adjacent part pairs by shared-neighbour count — the "
    "classic recommend-an-edge score. Adjacency is degree-capped at "
    f"{_CN_CAP} neighbours per apex (deterministic by neighbour id, the "
    "rank filter plans as WindowGroupLimit), the industrial bound that "
    "keeps the apex-keyed wedge join under Σ min(d, cap)² whatever the "
    "hub skew — an uncapped wedge join is Σ d², the quadratic the "
    "triangle operator avoids by orientation, unavailable here because "
    "every common neighbour of a pair must count, not just lower-ordered "
    "ones (both sides apply the identical cap, so parity is exact on "
    "the capped graph; gate-asserted in test_shuffle_volume). Candidate "
    "pairs anti-join the edge table; the global top-20 plans as "
    "TakeOrderedAndProject.",
)
def graph_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators.graph import (
        common_neighbor_pairs,
    )
    from pyspark.sql.window import Window

    edges = _co_edges(spark, sf_dir)  # session-cached checkpoint
    cn = common_neighbor_pairs(edges, cap=_CN_CAP)
    top = cn.orderBy(F.col("n_common").desc(), "a", "b").limit(20)
    w = Window.orderBy(F.col("n_common").desc(), "a", "b")
    return top.withColumn("rnk", F.row_number().over(w)).select(
        "a", "b", "n_common", "rnk"
    ).orderBy("rnk")


# Partitioned-layout cache: one write per (session, sf) — the query is
# about the pruned READ; rewriting the layout on every invocation would
# measure the sink, and repeated driver/test calls reuse the layout
# exactly like a real lake table.
_PART_LAYOUT_CACHE: dict = {}


@register(
    "scan_partitioned_prune",
    """
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM events
    WHERE event_type IN ('purchase', 'signup')
    GROUP BY event_type
    ORDER BY event_type
    """,
    doc="Partition-pruned scan roundtrip — THE 100 TB scan primitive made "
    "checkable: events are written out hive-partitioned by event_type "
    "(the lake layout every real deployment uses), read back with a "
    "partition-column predicate, and aggregated; the oracle runs the "
    "same filter on the flat table, so parity proves the partitioned "
    "write/read loses nothing. The pruning itself is pinned in "
    "tests/test_scan_sources.py: the scan's PartitionFilters carry the "
    "predicate and only the 2 matching partition directories of 5 are "
    "listed — the plan never touches the other three. Layout written "
    "once per session (cached), read is a 2-directory scan + one "
    "map-side-combined aggregate.",
)
def scan_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    key = (spark.sparkContext.applicationId, sf_dir)
    path = _PART_LAYOUT_CACHE.get(key)
    if path is None:
        path = tempfile.mkdtemp(prefix="ksc-partitioned-")
        _t(spark, sf_dir, "events").write.partitionBy("event_type").mode(
            "overwrite"
        ).parquet(path)
        _PART_LAYOUT_CACHE[key] = path
    back = spark.read.parquet(path).where(
        F.col("event_type").isin("purchase", "signup")
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            )
            .cast("long")
            .alias("revenue_cents"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_pareto_share",
    """
    WITH rev AS (
      SELECT o_custkey,
             SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
      FROM orders GROUP BY o_custkey
    ),
    cust AS (
      SELECT n.n_name AS nation, r.cents, r.o_custkey
      FROM rev r
      JOIN customer c ON c.c_custkey = r.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
    ),
    rk AS (
      SELECT nation, cents,
             ROW_NUMBER() OVER (PARTITION BY nation
                                ORDER BY cents DESC, o_custkey) AS i
      FROM cust
    ),
    s AS (SELECT nation, COUNT(*) AS n, SUM(cents) AS sx FROM rk GROUP BY 1),
    top AS (
      SELECT rk.nation, SUM(rk.cents) AS top_cents,
             MAX((s.n + 9) // 10) AS k
      FROM rk JOIN s USING (nation)
      WHERE rk.i <= (s.n + 9) // 10
      GROUP BY rk.nation
    )
    SELECT s.nation,
           CAST(s.n AS BIGINT) AS n_customers,
           CAST(t.k AS BIGINT) AS top_decile_customers,
           CAST((20000 * t.top_cents + s.sx) // (2 * s.sx) AS BIGINT)
             AS top_decile_share_bp
    FROM s JOIN top t USING (nation)
    ORDER BY nation
    """,
    doc="Pareto (80/20) audit per nation: revenue share held by the top "
    "decile of customers, in exact half-up basis points — the curve-point "
    "companion to the Gini coefficient (same customer-grain frame, "
    "descending rank this time; top-decile size = ceil(n/10) = (n+9) div "
    "10, integer on both engines). One per-nation rank sort over "
    "customer aggregates + two #nations-bounded frames joined back; "
    "shuffles carry customer aggregates, never order rows.",
)
def agg_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = _t(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ).alias("cents")
    )
    cust = (
        rev.join(
            _bcast_if_small(
                _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey"),
                sf_dir,
                "customer",
            ),
            rev.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("n_name").alias("nation"), "cents", "o_custkey")
    )
    w = Window.partitionBy("nation").orderBy(F.col("cents").desc(), "o_custkey")
    rk = cust.withColumn("i", F.row_number().over(w)).localCheckpoint(
        eager=False  # read twice (totals + top slice); lineage flattens
    )
    natt = rk.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("sx")
    )
    nattop = (
        rk.join(F.broadcast(natt), "nation")
        .where(F.col("i") <= F.expr("(n + 9) div 10"))
        .groupBy("nation")
        .agg(
            F.sum("cents").alias("top_cents"),
            F.max(F.expr("(n + 9) div 10")).alias("k"),
        )
    )
    return (
        natt.join(F.broadcast(nattop), "nation")
        .select(
            "nation",
            F.col("n").cast("long").alias("n_customers"),
            F.col("k").cast("long").alias("top_decile_customers"),
            F.expr("(20000 * top_cents + sx) div (2 * sx)")
            .cast("long")
            .alias("top_decile_share_bp"),
        )
        .orderBy("nation")
    )


@register(
    "skyline_pareto_parts",
    """
    SELECT p_partkey, p_retailprice, p_size
    FROM part t
    WHERE NOT EXISTS (
      SELECT 1 FROM part u
      WHERE u.p_retailprice <= t.p_retailprice
        AND u.p_size >= t.p_size
        AND (u.p_retailprice < t.p_retailprice OR u.p_size > t.p_size)
    )
    ORDER BY p_retailprice, p_size, p_partkey
    """,
    doc="2-D Pareto frontier (skyline): parts no other part beats on both "
    "price (minimize) and size (maximize), ties all kept. The oracle is "
    "the textbook NOT-EXISTS dominance anti-join — which on Spark would "
    "plan as the banned O(n²) BroadcastNestedLoopJoin. The Spark plan is "
    "the banded sweep instead: one hash aggregate per distinct price "
    "(map-side combine), equi-width price bands from a 2-scalar min/max "
    "(driver-literal model pattern), a running-max window PARTITIONED BY "
    "band (parallel), a cross-band sweep over the #bands-bounded frame, "
    "and an equi-join back to recover surviving rows. One keyed shuffle + "
    "one parallel window at any scale; the only single-partition window "
    "runs over ≤ n_bands rows (a driver constant).",
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators.frontier import skyline_2d

    part = _t(spark, sf_dir, "part")
    return (
        skyline_2d(part, "p_retailprice", "p_size", n_bands=32)
        .select("p_partkey", "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_size", "p_partkey")
    )


_EWMA_K = 8  # trailing half-life-1 window: weights 2^(k-1-i), exact in int64

_EWMA_NUM_SQL = " + ".join(
    f"COALESCE(l{i} * {1 << (_EWMA_K - 1 - i)}, 0)" for i in range(_EWMA_K)
)
_EWMA_DEN_SQL = " + ".join(
    f"CASE WHEN l{i} IS NOT NULL THEN {1 << (_EWMA_K - 1 - i)} ELSE 0 END"
    for i in range(_EWMA_K)
)


@register(
    "window_ewma_smoothing",
    f"""
    WITH e AS (
      SELECT user_id, event_id, ts,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    lagged AS (
      SELECT user_id, event_id, cents,
             {", ".join(
                 ("cents AS l0" if i == 0 else
                  f"LAG(cents, {i}) OVER (PARTITION BY user_id"
                  f" ORDER BY ts, event_id) AS l{i}")
                 for i in range(_EWMA_K)
             )}
      FROM e
    )
    SELECT user_id, event_id, cents,
           CAST((2 * ({_EWMA_NUM_SQL}) + ({_EWMA_DEN_SQL}))
                  // (2 * ({_EWMA_DEN_SQL})) AS BIGINT) AS ewma_cents
    FROM lagged ORDER BY user_id, event_id
    """,
    doc="Exponentially-weighted moving average per user — the classic "
    f"stream smoother, made integer-EXACT: α = 1/2 over a trailing "
    f"{_EWMA_K}-event window gives weights 2^(k-1-i), so the weighted "
    "sum is pure int64 arithmetic and the normalization (which adapts at "
    "sequence start where fewer lags exist) is one half-up integer "
    "division — no float accumulation to drift cross-engine. Scale "
    "shape: ONE user_id shuffle + one sort serves all k lag columns "
    "(a single Window node); everything after is per-row projection "
    "inside whole-stage codegen.",
)
def window_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    lagged = base.select(
        "user_id",
        "event_id",
        "cents",
        *[
            (
                F.col("cents").alias("l0")
                if i == 0
                else F.lag("cents", i).over(w).alias(f"l{i}")
            )
            for i in range(_EWMA_K)
        ],
    )
    return lagged.select(
        "user_id",
        "event_id",
        "cents",
        F.expr(
            f"CAST((2 * ({_EWMA_NUM_SQL}) + ({_EWMA_DEN_SQL}))"
            f" div (2 * ({_EWMA_DEN_SQL})) AS BIGINT)"
        ).alias("ewma_cents"),
    ).orderBy("user_id", "event_id")


@register(
    "join_asof_nearest",
    """
    WITH e AS (
      SELECT user_id, event_id, event_type,
             epoch_us(ts) AS us,
             CASE WHEN event_type = 'click'
                  THEN {'us': epoch_us(ts), 'id': event_id} END AS click
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    marked AS (
      SELECT user_id, event_id, event_type, us,
             LAST_VALUE(click IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev,
             FIRST_VALUE(click IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nxt
      FROM e
    )
    SELECT event_id, user_id,
           CAST(us - prev.us AS BIGINT) AS prev_gap_us,
           CAST(nxt.us - us AS BIGINT) AS next_gap_us,
           CAST(CASE
             WHEN prev.id IS NULL THEN nxt.id
             WHEN nxt.id IS NULL THEN prev.id
             WHEN us - prev.us <= nxt.us - us THEN prev.id
             ELSE nxt.id END AS BIGINT) AS nearest_click_id
    FROM marked WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
    doc="NEAREST-neighbor temporal join (the symmetric extension of "
    "merge-as-of, which only looks backward): each purchase enriched "
    "with the click minimizing |Δt| within the same user, ties to the "
    "earlier side — the sensor-alignment/enrichment primitive. Same "
    "union–window trick as merge_asof (operators/joins.py): both event "
    "kinds ride ONE user_id shuffle and one sort; a strictly-backward "
    "last(ignoreNulls) carries the latest prior click and a forward "
    "first(ignoreNulls) the next one — no range join, no candidate "
    "pairs, linear per partition at any scale. Purchases with no click "
    "neighbor keep NULL gaps (left semantics, documented).",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _t(spark, sf_dir, "events")
    e = ev.where(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
        F.expr(
            "CASE WHEN event_type = 'click'"
            " THEN struct(unix_micros(ts) AS us, event_id AS id) END"
        ).alias("click"),
    )
    w_prev = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    w_next = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(0, W.unboundedFollowing)
    )
    marked = e.select(
        "user_id",
        "event_id",
        "event_type",
        "us",
        F.last("click", ignorenulls=True).over(w_prev).alias("prev"),
        F.first("click", ignorenulls=True).over(w_next).alias("nxt"),
    )
    return (
        marked.where("event_type = 'purchase'")
        .select(
            "event_id",
            "user_id",
            F.expr("CAST(us - prev.us AS BIGINT)").alias("prev_gap_us"),
            F.expr("CAST(nxt.us - us AS BIGINT)").alias("next_gap_us"),
            F.expr(
                "CAST(CASE"
                " WHEN prev.id IS NULL THEN nxt.id"
                " WHEN nxt.id IS NULL THEN prev.id"
                " WHEN us - prev.us <= nxt.us - us THEN prev.id"
                " ELSE nxt.id END AS BIGINT)"
            ).alias("nearest_click_id"),
        )
        .orderBy("event_id")
    )


_BENFORD_BP = (3010, 1761, 1249, 969, 792, 669, 580, 512, 458)
_BENFORD_CASE = " ".join(
    f"WHEN {d} THEN {bp}" for d, bp in enumerate(_BENFORD_BP, start=1)
)


@register(
    "audit_benford_digits",
    f"""
    WITH o AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    c AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_orders FROM o GROUP BY 1
    ),
    t AS (SELECT CAST(SUM(n_orders) AS BIGINT) AS total FROM c)
    SELECT digit, n_orders,
           CAST((2 * 10000 * n_orders + t.total) // (2 * t.total)
                AS BIGINT) AS observed_bp,
           CAST(CASE digit {_BENFORD_CASE} END AS BIGINT) AS expected_bp,
           ROUND((CAST(n_orders AS DOUBLE)
                    - CAST(t.total AS DOUBLE)
                      * (CASE digit {_BENFORD_CASE} END) / 10000.0)
                 * (CAST(n_orders AS DOUBLE)
                    - CAST(t.total AS DOUBLE)
                      * (CASE digit {_BENFORD_CASE} END) / 10000.0)
                 / (CAST(t.total AS DOUBLE)
                      * (CASE digit {_BENFORD_CASE} END) / 10000.0),
                 4) AS chi2_term
    FROM c CROSS JOIN t ORDER BY digit
    """,
    doc="Benford first-digit audit over order totals — the classic "
    "fabricated-data / pipeline-corruption screen: observed first-digit "
    "shares vs Benford's log10(1+1/d) expectation with per-digit χ² "
    "contributions. Engine-exactness: the first digit comes from the "
    "integer's decimal string (no log10 call), Benford expectations are "
    "EMBEDDED as integer basis-point literals (log10 evaluated once at "
    "authoring time, not per-engine at runtime — libm vs JVM log differ "
    "in the last ulp), shares are half-up integer bp, and χ² uses "
    "multiply/divide-only IEEE ops on exact integers. Scale shape: one "
    "9-bucket aggregate with map-side combine; the total rides a "
    "#digits-bounded second aggregate.",
)
def audit_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = _t(spark, sf_dir, "orders")
    c = (
        ords.where("o_totalprice >= 1")
        .select(
            F.expr(
                "CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)"
                " AS STRING), 1, 1) AS BIGINT)"
            ).alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .localCheckpoint(eager=True)
    )
    total = c.agg(F.sum("n_orders")).collect()[0][0]
    e = f"(CAST({total} AS DOUBLE) * (CASE digit {_BENFORD_CASE} END) / 10000.0)"
    return c.select(
        "digit",
        "n_orders",
        F.expr(
            f"CAST((2 * 10000 * n_orders + {total}) div (2 * {total})"
            " AS BIGINT)"
        ).alias("observed_bp"),
        F.expr(f"CAST(CASE digit {_BENFORD_CASE} END AS BIGINT)").alias(
            "expected_bp"
        ),
        F.expr(
            f"ROUND((CAST(n_orders AS DOUBLE) - {e})"
            f" * (CAST(n_orders AS DOUBLE) - {e}) / {e}, 4)"
        ).alias("chi2_term"),
    ).orderBy("digit")


@register(
    "audit_referential_integrity",
    """
    WITH edges AS (
      SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
             CAST(COUNT(*) AS BIGINT) AS n_child_keys,
             CAST(COUNT(*) FILTER (WHERE o.o_orderkey IS NULL) AS BIGINT)
               AS n_orphans
      FROM (SELECT DISTINCT l_orderkey FROM lineitem) c
      LEFT JOIN orders o ON o.o_orderkey = c.l_orderkey
      UNION ALL
      SELECT 'lineitem.l_partkey->part',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE p.p_partkey IS NULL) AS BIGINT)
      FROM (SELECT DISTINCT l_partkey FROM lineitem) c
      LEFT JOIN part p ON p.p_partkey = c.l_partkey
      UNION ALL
      SELECT 'lineitem.l_suppkey->supplier',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE s.s_suppkey IS NULL) AS BIGINT)
      FROM (SELECT DISTINCT l_suppkey FROM lineitem) c
      LEFT JOIN supplier s ON s.s_suppkey = c.l_suppkey
      UNION ALL
      SELECT 'orders.o_custkey->customer',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE cu.c_custkey IS NULL) AS BIGINT)
      FROM (SELECT DISTINCT o_custkey FROM orders) c
      LEFT JOIN customer cu ON cu.c_custkey = c.o_custkey
      UNION ALL
      SELECT 'customer.c_nationkey->nation',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
      FROM (SELECT DISTINCT c_nationkey FROM customer) c
      LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
      UNION ALL
      SELECT 'supplier.s_nationkey->nation',
             CAST(COUNT(*) AS BIGINT),
             CAST(COUNT(*) FILTER (WHERE n.n_nationkey IS NULL) AS BIGINT)
      FROM (SELECT DISTINCT s_nationkey FROM supplier) c
      LEFT JOIN nation n ON n.n_nationkey = c.s_nationkey
    )
    SELECT fk_edge, n_child_keys, n_orphans,
           CAST((2 * 10000 * (n_child_keys - n_orphans) + n_child_keys)
                  // (2 * n_child_keys) AS BIGINT) AS coverage_bp
    FROM edges ORDER BY fk_edge
    """,
    doc="Referential-integrity audit across every FK edge of the star "
    "schema: distinct child keys, orphan keys (no parent row), and "
    "coverage in exact basis points — the data-quality sweep a pipeline "
    "runs after every load. Scale shape per edge: DISTINCT collapses the "
    "child side to its key set map-side BEFORE the join (the shuffle "
    "carries keys, never fact rows), the parent side joins on its "
    "primary key, dimension parents broadcast under AQE; six bounded "
    "audit rows come out. The orphan probe is a LEFT join + null filter "
    "rather than anti-join so ONE pass yields both the total and the "
    "orphan count.",
)
def audit_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    ords = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    na = _t(spark, sf_dir, "nation")

    def edge(name, child, ckey, parent, pkey):
        c = child.select(F.col(ckey).alias("k")).distinct()
        p = parent.select(F.col(pkey).alias("pk"))
        j = c.join(p, c.k == p.pk, "left")
        return j.agg(
            F.lit(name).alias("fk_edge"),
            F.count(F.lit(1)).cast("long").alias("n_child_keys"),
            F.sum(F.when(F.col("pk").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_orphans"),
        )

    edges = (
        edge("lineitem.l_orderkey->orders", li, "l_orderkey", ords, "o_orderkey")
        .unionAll(edge("lineitem.l_partkey->part", li, "l_partkey", part, "p_partkey"))
        .unionAll(
            edge("lineitem.l_suppkey->supplier", li, "l_suppkey", supp, "s_suppkey")
        )
        .unionAll(
            edge("orders.o_custkey->customer", ords, "o_custkey", cust, "c_custkey")
        )
        .unionAll(
            edge("customer.c_nationkey->nation", cust, "c_nationkey", na, "n_nationkey")
        )
        .unionAll(
            edge("supplier.s_nationkey->nation", supp, "s_nationkey", na, "n_nationkey")
        )
    )
    return edges.select(
        "fk_edge",
        "n_child_keys",
        "n_orphans",
        F.expr(
            "CAST((2 * 10000 * (n_child_keys - n_orphans) + n_child_keys)"
            " div (2 * n_child_keys) AS BIGINT)"
        ).alias("coverage_bp"),
    ).orderBy("fk_edge")


@register(
    "scan_orc_roundtrip",
    """
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           CAST(SUM(epoch_us(ts)) AS BIGINT) AS sum_ts_us,
           CAST(SUM(user_id) AS BIGINT) AS sum_user
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="ORC source coverage, completing the columnar-format matrix next "
    "to parquet/CSV/JSONL: the events table is written as ORC and read "
    "back with an EXPLICIT schema (no inference pass), then aggregated; "
    "equality with the parquet oracle proves lossless decode of doubles, "
    "timestamps (as epoch micros) and longs through the ORC writer/ "
    "reader. ORC is Spark-native columnar — predicate pushdown and "
    "column pruning apply exactly as for parquet, so every scan-side "
    "claim in this repo carries over.",
)
def scan_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from kinesis_stream_consumer_spark.sources import formats as FMT

    flat = _t(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    base = tempfile.mkdtemp(prefix="ksc-orc-")
    flat.write.mode("overwrite").orc(f"{base}/orc")
    back = FMT.read_orc(spark, f"{base}/orc", FMT.EVENTS_FLAT_SCHEMA)
    return (
        back.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.sum("ts_us").cast("long").alias("sum_ts_us"),
            F.sum("user_id").cast("long").alias("sum_user"),
        )
        .orderBy("event_type")
    )


@register(
    "events_cusum_drift",
    """
    WITH e AS (
      SELECT user_id, event_id, ts,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    k AS (
      SELECT user_id, event_id, cents,
             (2 * SUM(cents) OVER (PARTITION BY user_id)
                + COUNT(*) OVER (PARTITION BY user_id))
               // (2 * COUNT(*) OVER (PARTITION BY user_id)) AS ku,
             ts
      FROM e
    ),
    p AS (
      SELECT user_id, event_id, cents, ku, ts,
             SUM(cents - ku) OVER w AS pfx
      FROM k
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    s AS (
      SELECT user_id, event_id, cents, ku,
             pfx - LEAST(MIN(pfx) OVER w, 0) AS cusum
      FROM p
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, event_id,
           CAST(cents AS BIGINT) AS cents,
           CAST(cusum AS BIGINT) AS cusum_cents
    FROM s WHERE cusum >= 8 * ku
    ORDER BY user_id, event_id
    """,
    doc="CUSUM drift detection per user (Page 1954): alarm when the "
    "one-sided cumulative sum of (spend − personal mean) exceeds 8× the "
    "mean — the classic sequential change-point monitor. The Spark-first "
    "trick: CUSUM's textbook form is the RECURSION "
    "S_t = max(0, S_{t-1} + x_t − k), which no window function computes — "
    "but it equals P_t − min(0, min_{i≤t} P_i) for the plain prefix sum "
    "P of (x − k), so TWO stacked windows over the SAME (user, time) "
    "sort express it exactly: one running sum, one running min. One "
    "user_id shuffle, linear per partition, no recursion, no UDF. All "
    "arithmetic in exact half-up cents (the per-user reference k is one "
    "half-up division over window aggregates — no second scan).",
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    w_u = W.partitionBy("user_id")
    k = e.select(
        "user_id",
        "event_id",
        "cents",
        "ts",
        F.expr(
            "(2 * SUM(cents) OVER (PARTITION BY user_id)"
            " + COUNT(*) OVER (PARTITION BY user_id))"
            " div (2 * COUNT(*) OVER (PARTITION BY user_id))"
        ).alias("ku"),
    )
    w_run = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    p = k.withColumn(
        "pfx", F.sum(F.col("cents") - F.col("ku")).over(w_run)
    )
    s = p.withColumn(
        "cusum",
        F.col("pfx") - F.least(F.min("pfx").over(w_run), F.lit(0)),
    )
    return (
        s.where(F.col("cusum") >= 8 * F.col("ku"))
        .select(
            "user_id",
            "event_id",
            F.col("cents").cast("long").alias("cents"),
            F.col("cusum").cast("long").alias("cusum_cents"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "agg_hll_rollup",
    f"""
    WITH {SK.hll_oracle_cte(
        "events",
        "event_type || '#' || strftime(ts, '%Y-%m-%d')",
        "CAST(user_id AS VARCHAR)",
    )},
    leaf AS (
      SELECT split_part(g, '#', 1) AS event_type,
             split_part(g, '#', 2) AS day,
             hll_estimate
      FROM hll_est
    ),
    tregs AS (
      SELECT split_part(g, '#', 1) AS event_type, bucket, MAX(r) AS r
      FROM hll_reg GROUP BY 1, 2
    ),
    tsum AS (SELECT event_type, {SK.HLL_S_AGG_SQL} AS s
             FROM tregs GROUP BY 1),
    tlevel AS (SELECT event_type, 'ALL' AS day,
                      {SK.hll_est_sql('s')} AS hll_estimate FROM tsum),
    aregs AS (SELECT bucket, MAX(r) AS r FROM tregs GROUP BY 1),
    asum AS (SELECT {SK.HLL_S_AGG_SQL} AS s FROM aregs),
    alevel AS (SELECT 'ALL' AS event_type, 'ALL' AS day,
                      {SK.hll_est_sql('s')} AS hll_estimate FROM asum),
    est AS (SELECT * FROM leaf UNION ALL SELECT * FROM tlevel
            UNION ALL SELECT * FROM alevel),
    ex AS (
      SELECT COALESCE(event_type, 'ALL') AS event_type,
             COALESCE(day, 'ALL') AS day,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, user_id
            FROM events)
      GROUP BY ROLLUP (event_type, day)
    )
    SELECT ex.event_type AS event_type, ex.day AS day, ex.exact_distinct,
           CAST(est.hll_estimate AS BIGINT) AS hll_estimate
    FROM ex JOIN est ON est.event_type = ex.event_type
                    AND est.day = ex.day
    ORDER BY event_type, day
    """,
    doc="HLL sketch ROLLUP — reaggregability through the OLAP hierarchy: "
    "registers are built ONCE at the (event_type, day) leaf grain, then "
    "the day→type and type→grand-total levels come from elementwise "
    "register max-merge — never a second corpus scan, the property that "
    "makes sketch-backed cubes cheap at 100 TB (a COUNT(DISTINCT) cube "
    "re-shuffles every distinct value at every level; the sketch "
    "re-shuffles m=32 register rows per group). Exact counts ride along "
    "from ONE rollup aggregate as the error baseline at every level. "
    "All estimate arithmetic is the integer-exact scaled-harmonic form "
    "shared with agg_hll_distinct, so the DuckDB oracle matches "
    "bit-for-bit.",
)
def agg_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    evd = ev.select(
        "event_type",
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.col("user_id").cast("string").alias("uid"),
    )
    regs = SK.hll_registers(
        evd.withColumn("g", F.concat_ws("#", "event_type", "day")),
        "g",
        F.col("uid"),
    ).localCheckpoint(eager=True)  # leaf registers feed all three levels
    leaf = SK.hll_estimate(regs).select(
        F.expr("split_part(g, '#', 1)").alias("event_type"),
        F.expr("split_part(g, '#', 2)").alias("day"),
        "hll_estimate",
    )
    tregs = (
        regs.select(
            F.expr("split_part(g, '#', 1)").alias("event_type"), "bucket", "r"
        )
        .groupBy("event_type", "bucket")
        .agg(F.max("r").alias("r"))
        .localCheckpoint(eager=True)  # type registers feed type + global
    )
    tlevel = SK.hll_estimate_grouped(tregs, ["event_type"]).select(
        "event_type", F.lit("ALL").alias("day"), "hll_estimate"
    )
    aregs = tregs.groupBy("bucket").agg(F.max("r").alias("r"))
    alevel = SK.hll_estimate_grouped(aregs, []).select(
        F.lit("ALL").alias("event_type"),
        F.lit("ALL").alias("day"),
        "hll_estimate",
    )
    est = leaf.unionAll(tlevel).unionAll(alevel)
    ex = (
        evd.rollup("event_type", "day")
        .agg(F.count_distinct("uid").cast("long").alias("exact_distinct"))
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("day", F.lit("ALL")).alias("day"),
            "exact_distinct",
        )
    )
    return (
        ex.join(est, ["event_type", "day"])
        .select("event_type", "day", "exact_distinct", "hll_estimate")
        .orderBy("event_type", "day")
    )


@register(
    "agg_winsorized_mean",
    """
    WITH e AS (
      SELECT event_type, event_id,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    ranked AS (
      SELECT event_type, cents,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY cents, event_id) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM e
    ),
    bounds AS (
      SELECT event_type, n AS n_events,
             MAX(CASE WHEN rn = GREATEST((5 * n + 99) // 100, 1)
                      THEN cents END) AS lo_cents,
             MAX(CASE WHEN rn = (95 * n + 99) // 100
                      THEN cents END) AS hi_cents
      FROM ranked GROUP BY 1, 2
    )
    SELECT r.event_type AS event_type, b.n_events,
           CAST(b.lo_cents AS BIGINT) AS lo_cents,
           CAST(b.hi_cents AS BIGINT) AS hi_cents,
           CAST((2 * SUM(r.cents) + b.n_events)
                  // (2 * b.n_events) AS BIGINT) AS mean_cents,
           CAST((2 * SUM(LEAST(GREATEST(r.cents, b.lo_cents), b.hi_cents))
                  + b.n_events)
                  // (2 * b.n_events) AS BIGINT) AS winsorized_mean_cents
    FROM ranked r JOIN bounds b USING (event_type)
    GROUP BY 1, 2, 3, 4
    ORDER BY event_type
    """,
    doc="Winsorized (robust) mean per event type: values clamped to the "
    "exact p5/p95 before averaging — the outlier-resistant center a "
    "monitoring pipeline wants when a few huge values would drag the "
    "plain mean. Exactness: the percentile is SELECTED BY RANK "
    "(row_number over (cents, event_id), cut at the integer ceil "
    "(5n+99) div 100) rather than interpolated — Spark's percentile() "
    "interpolates in doubles and DuckDB's quantile_disc breaks ties "
    "differently, but a rank formula is one deterministic row on both "
    "engines; clamp + mean then stay in exact half-up cents. Scale "
    "shape: ONE event_type shuffle serves the rank window and the count; "
    "bounds reduce to #types rows and broadcast back (AQE); the clamped "
    "sum combines map-side.",
)
def agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "event_type",
        "event_id",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    w_rn = W.partitionBy("event_type").orderBy("cents", "event_id")
    w_n = W.partitionBy("event_type")
    ranked = e.select(
        "event_type",
        "cents",
        F.row_number().over(w_rn).alias("rn"),
        F.count(F.lit(1)).over(w_n).cast("long").alias("n"),
    )
    bounds = ranked.groupBy("event_type", F.col("n").alias("n_events")).agg(
        F.max(
            F.expr(
                "CASE WHEN rn = GREATEST((5 * n + 99) div 100, 1)"
                " THEN cents END"
            )
        ).alias("lo_cents"),
        F.max(
            F.expr("CASE WHEN rn = (95 * n + 99) div 100 THEN cents END")
        ).alias("hi_cents"),
    )
    return (
        ranked.join(bounds, "event_type")
        .groupBy("event_type", "n_events", "lo_cents", "hi_cents")
        .agg(
            F.expr(
                "CAST((2 * SUM(cents) + n_events)"
                " div (2 * n_events) AS BIGINT)"
            ).alias("mean_cents"),
            F.expr(
                "CAST((2 * SUM(LEAST(GREATEST(cents, lo_cents), hi_cents))"
                " + n_events) div (2 * n_events) AS BIGINT)"
            ).alias("winsorized_mean_cents"),
        )
        .select(
            "event_type",
            "n_events",
            F.col("lo_cents").cast("long").alias("lo_cents"),
            F.col("hi_cents").cast("long").alias("hi_cents"),
            "mean_cents",
            "winsorized_mean_cents",
        )
        .orderBy("event_type")
    )


@register(
    "join_pit_multi_feature",
    """
    WITH e AS (
      SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    marked AS (
      SELECT user_id, event_id, event_type, us,
             LAST_VALUE(CASE WHEN event_type = 'click' THEN cents END
                        IGNORE NULLS) OVER w AS prev_click_cents,
             LAST_VALUE(CASE WHEN event_type = 'view' THEN cents END
                        IGNORE NULLS) OVER w AS prev_view_cents,
             LAST_VALUE(CASE WHEN event_type = 'signup' THEN us END
                        IGNORE NULLS) OVER w AS prev_signup_us
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id,
           CAST(prev_click_cents AS BIGINT) AS prev_click_cents,
           CAST(prev_view_cents AS BIGINT) AS prev_view_cents,
           CAST(us - prev_signup_us AS BIGINT) AS signup_gap_us
    FROM marked WHERE event_type = 'purchase'
    ORDER BY event_id
    """,
    doc="Point-in-time (PIT) multi-feature enrichment — the feature-store "
    "join: each purchase decorated with the latest STRICTLY-PRIOR value "
    "of several feature streams at once (last click spend, last view "
    "spend, time since signup), leak-free by construction (the window "
    "frame ends at 1 PRECEDING, so a feature written at the same "
    "timestamp as the label row is never visible). The Spark-first move: "
    "N feature streams ride ONE user_id shuffle and one sort — one "
    "last(ignoreNulls) per feature over the same Window node — where the "
    "naive form is N separate as-of joins, each with its own shuffle. "
    "NULL features where no prior event exists (left semantics).",
)
def join_pit_multi_feature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _t(spark, sf_dir, "events")
    e = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("unix_micros(ts)").alias("us"),
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    marked = e.select(
        "user_id",
        "event_id",
        "event_type",
        "us",
        F.last(
            F.expr("CASE WHEN event_type = 'click' THEN cents END"),
            ignorenulls=True,
        )
        .over(w)
        .alias("prev_click_cents"),
        F.last(
            F.expr("CASE WHEN event_type = 'view' THEN cents END"),
            ignorenulls=True,
        )
        .over(w)
        .alias("prev_view_cents"),
        F.last(
            F.expr("CASE WHEN event_type = 'signup' THEN us END"),
            ignorenulls=True,
        )
        .over(w)
        .alias("prev_signup_us"),
    )
    return (
        marked.where("event_type = 'purchase'")
        .select(
            "event_id",
            "user_id",
            F.col("prev_click_cents").cast("long").alias("prev_click_cents"),
            F.col("prev_view_cents").cast("long").alias("prev_view_cents"),
            F.expr("CAST(us - prev_signup_us AS BIGINT)").alias(
                "signup_gap_us"
            ),
        )
        .orderBy("event_id")
    )


@register(
    "graph_bfs_levels",
    """
    WITH RECURSIVE li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    ),
    bidir AS (
      SELECT u AS s, v AS d FROM edges
      UNION ALL SELECT v, u FROM edges
    ),
    deg AS (SELECT s AS node, COUNT(*) AS dg FROM bidir GROUP BY 1),
    seed AS (SELECT node FROM deg ORDER BY dg DESC, node LIMIT 1),
    bfs(node, lvl) AS (
      SELECT node, 0 FROM seed
      UNION
      SELECT b.d, bfs.lvl + 1
      FROM bfs JOIN bidir b ON b.s = bfs.node
      WHERE bfs.lvl < 3
    )
    SELECT node, CAST(MIN(lvl) AS BIGINT) AS level
    FROM bfs GROUP BY 1 ORDER BY level, node
    """,
    doc="Multi-hop BFS (levels 0-3) over the co-purchase graph from its "
    "highest-degree part — the neighborhood-expansion primitive behind "
    "related-item exploration and fraud-ring tracing, and the graph "
    "family's iterative member next to components/PageRank/triangles. "
    "The fixed depth unrolls into three frontier-expansion equi-joins "
    "(frontier ⋈ checkpointed bidirectional edges, anti-join against "
    "visited — each hop ONE vertex-keyed shuffle, lineage kept flat by "
    "per-hop checkpoints); the oracle's WITH RECURSIVE proves the "
    "unrolled plan computes the same minimum hop counts. Seed selection "
    "is a driver literal from the degree aggregate (scalar-model "
    "pattern, deterministic ties).",
)
def graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators.graph import bfs_levels

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct()
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v")
    )
    edges = (
        a.join(b, "ok")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("dg"))
    )
    seed_node = (
        deg.orderBy(F.col("dg").desc(), "node").limit(1).collect()[0][0]
    )
    seed = spark.createDataFrame([(int(seed_node),)], "node bigint")
    return (
        bfs_levels(edges, seed, max_depth=3)
        .select("node", F.col("level").cast("long").alias("level"))
        .orderBy("level", "node")
    )


@register(
    "events_attribution",
    """
    WITH e AS (
      SELECT user_id, event_id, ts, event_type,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    j AS (
      SELECT *, COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1
                                  ELSE 0 END)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        AS journey
      FROM e
    ),
    t AS (
      SELECT user_id, journey, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, journey
                                ORDER BY ts, event_id) AS rn
      FROM j WHERE event_type <> 'purchase'
    ),
    p AS (SELECT user_id, journey, cents FROM j
          WHERE event_type = 'purchase'),
    js AS (
      SELECT user_id, journey, CAST(COUNT(*) AS BIGINT) AS n_touches,
             arg_min(event_type, rn) AS first_channel,
             arg_max(event_type, rn) AS last_channel
      FROM t GROUP BY 1, 2
    ),
    cc AS (
      SELECT user_id, journey, event_type AS channel,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM t GROUP BY 1, 2, 3
    ),
    cells AS (
      SELECT cc.channel, p.cents, js.n_touches, cc.cnt,
             js.first_channel, js.last_channel
      FROM p JOIN js USING (user_id, journey)
             JOIN cc USING (user_id, journey)
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_journeys,
           CAST(SUM(CASE WHEN channel = first_channel THEN cents
                         ELSE 0 END) AS BIGINT) AS first_touch_cents,
           CAST(SUM(CASE WHEN channel = last_channel THEN cents
                         ELSE 0 END) AS BIGINT) AS last_touch_cents,
           CAST(SUM((2 * cents * cnt + n_touches) // (2 * n_touches))
                AS BIGINT) AS linear_cents
    FROM cells GROUP BY 1 ORDER BY channel
    """,
    doc="Multi-touch conversion attribution over per-user event journeys: "
    "each purchase's revenue credited to the touch events (click / view / "
    "signup / error) since the previous purchase, under the three classic "
    "models at once — first-touch, last-touch, and linear (per-journey "
    "channel share via exact half-up integer division of cents, so "
    "fractional credit never drifts cross-engine). Journey segmentation "
    "is a running purchase count over a per-user window (strictly-prior "
    "frame, so the purchase row closes its own journey); first/last "
    "touch resolve via min_by/max_by on the NUMERIC within-journey row "
    "number (HashAggregate, never min(struct)'s SortAggregate). "
    "Unconverted tails and touch-less purchases drop out of the inner "
    "joins by construction (documented). Scale shape: one user_id "
    "shuffle feeds both window passes, then (user, journey)-keyed "
    "aggregates and a final #channels-bounded aggregate; nothing is "
    "ever keyed on a hot constant.",
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        "event_id",
        "ts",
        "event_type",
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    )
    w_j = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    j = base.withColumn(
        "journey",
        F.coalesce(
            F.sum(
                F.expr("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")
            ).over(w_j),
            F.lit(0),
        ),
    )
    w_rn = W.partitionBy("user_id", "journey").orderBy("ts", "event_id")
    touches = j.where("event_type <> 'purchase'").withColumn(
        "rn", F.row_number().over(w_rn)
    )
    purch = j.where("event_type = 'purchase'").select(
        "user_id", "journey", "cents"
    )
    jstats = touches.groupBy("user_id", "journey").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.expr("min_by(event_type, rn)").alias("first_channel"),
        F.expr("max_by(event_type, rn)").alias("last_channel"),
    )
    cc = touches.groupBy("user_id", "journey", "event_type").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    cells = purch.join(jstats, ["user_id", "journey"]).join(
        cc, ["user_id", "journey"]
    )
    return (
        cells.groupBy(F.col("event_type").alias("channel"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_journeys"),
            F.sum(
                F.expr(
                    "CASE WHEN event_type = first_channel THEN cents"
                    " ELSE 0 END"
                )
            )
            .cast("long")
            .alias("first_touch_cents"),
            F.sum(
                F.expr(
                    "CASE WHEN event_type = last_channel THEN cents"
                    " ELSE 0 END"
                )
            )
            .cast("long")
            .alias("last_touch_cents"),
            F.sum(
                F.expr("(2 * cents * cnt + n_touches) div (2 * n_touches)")
            )
            .cast("long")
            .alias("linear_cents"),
        )
        .orderBy("channel")
    )


_REG_SHIFT = 1_000_000_000  # positivity shift for signed half-up division


@register(
    "agg_regression_trend",
    f"""
    WITH monthly AS (
      SELECT n.n_name,
             (year(o.o_orderdate) - 1992) * 12
               + month(o.o_orderdate) - 1 AS m,
             CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS yc
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    ),
    md AS (SELECT n_name, m, yc, yc // 100 AS yd FROM monthly),
    s AS (
      SELECT n_name,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(m) AS BIGINT) AS sx,
             CAST(SUM(CAST(m AS BIGINT) * m) AS BIGINT) AS sxx,
             CAST(SUM(yc) AS BIGINT) AS sy,
             CAST(SUM(m * yc) AS BIGINT) AS sxy,
             CAST(SUM(yd) AS BIGINT) AS syd,
             CAST(SUM(m * yd) AS BIGINT) AS sxyd,
             CAST(SUM(yd * yd) AS BIGINT) AS sydd
      FROM md GROUP BY 1
    ),
    r AS (
      SELECT n_name, n,
             n * sxx - sx * sx AS den,
             n * sxy - sx * sy AS num_s,
             sy * sxx - sx * sxy AS num_i,
             n * sxyd - sx * syd AS num_d,
             n * sydd - syd * syd AS deny
      FROM s WHERE n >= 2 AND n * sxx - sx * sx <> 0
    )
    SELECT n_name,
           CAST(n AS BIGINT) AS n_months,
           CAST((2 * num_s + den + 2 * den * {_REG_SHIFT})
                  // (2 * den) - {_REG_SHIFT} AS BIGINT) AS slope_cents,
           CAST((2 * num_i + den + 2 * den * {_REG_SHIFT})
                  // (2 * den) - {_REG_SHIFT} AS BIGINT) AS intercept_cents,
           ROUND((CAST(num_d AS DOUBLE) * CAST(num_d AS DOUBLE))
                 / (CAST(den AS DOUBLE) * CAST(NULLIF(deny, 0) AS DOUBLE)),
                 4) AS r2
    FROM r ORDER BY n_name
    """,
    doc="Per-group OLS regression — monthly revenue trend per nation: "
    "slope (cents/month) and intercept (cents at the 1992-01 epoch) from "
    "the closed-form normal equations computed ENTIRELY in exact int64 "
    "sums (Σx, Σy, Σxy, Σx², money in half-up cents), so partial "
    "aggregation order can never flip a bit cross-engine — the built-in "
    "regr_slope/regr_intercept double aggregates are order-sensitive in "
    "their last ulp. Signed numerators use the positivity-shift half-up "
    "division idiom (DuckDB // floors, Spark div truncates; shifting by "
    f"{_REG_SHIFT} makes both identical). r² is computed over exact "
    "floor-dollar sums then ONE double division (identical IEEE ops both "
    "engines; NULL when y is constant). Scale shape: one (nation, month) "
    "pre-aggregate (map-side combine), then a nation-keyed aggregate over "
    "#months-bounded rows; dims broadcast (stats-gated). Int64 bounds: "
    "den is sf-independent (x = month index); numerators stay exact "
    "through ~sf1 (documented DECIMAL switch beyond).",
)
def agg_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ords = _t(spark, sf_dir, "orders")
    cust = _bcast_if_small(_t(spark, sf_dir, "customer"), sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    monthly = (
        ords.join(cust, ords.o_custkey == cust.c_custkey)
        .join(F.broadcast(na), cust.c_nationkey == na.n_nationkey)
        .select(
            "n_name",
            F.expr(
                "(year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1"
            ).alias("m"),
            F.expr(
                "CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"
            ).alias("cents"),
        )
        .groupBy("n_name", "m")
        .agg(F.sum("cents").alias("yc"))
        .withColumn("yd", F.expr("yc div 100"))
    )
    s = monthly.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("sum(cast(m as bigint))").alias("sx"),
        F.expr("sum(cast(m as bigint) * m)").alias("sxx"),
        F.expr("sum(yc)").alias("sy"),
        F.expr("sum(m * yc)").alias("sxy"),
        F.expr("sum(yd)").alias("syd"),
        F.expr("sum(m * yd)").alias("sxyd"),
        F.expr("sum(yd * yd)").alias("sydd"),
    )
    r = s.where("n >= 2 AND n * sxx - sx * sx <> 0").select(
        "n_name",
        "n",
        F.expr("n * sxx - sx * sx").alias("den"),
        F.expr("n * sxy - sx * sy").alias("num_s"),
        F.expr("sy * sxx - sx * sxy").alias("num_i"),
        F.expr("n * sxyd - sx * syd").alias("num_d"),
        F.expr("n * sydd - syd * syd").alias("deny"),
    )
    return r.select(
        "n_name",
        F.col("n").cast("long").alias("n_months"),
        F.expr(
            f"CAST((2 * num_s + den + 2 * den * {_REG_SHIFT})"
            f" div (2 * den) - {_REG_SHIFT} AS BIGINT)"
        ).alias("slope_cents"),
        F.expr(
            f"CAST((2 * num_i + den + 2 * den * {_REG_SHIFT})"
            f" div (2 * den) - {_REG_SHIFT} AS BIGINT)"
        ).alias("intercept_cents"),
        F.expr(
            "ROUND((CAST(num_d AS DOUBLE) * CAST(num_d AS DOUBLE))"
            " / (CAST(den AS DOUBLE) * CAST(NULLIF(deny, 0) AS DOUBLE)), 4)"
        ).alias("r2"),
    ).orderBy("n_name")


@register(
    "q18_large_orders",
    """
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)
             AS totalprice_cents,
           CAST(q.qty AS BIGINT) AS total_qty
    FROM (
      SELECT l_orderkey, SUM(CAST(l_quantity AS BIGINT)) AS qty
      FROM lineitem GROUP BY 1 HAVING SUM(CAST(l_quantity AS BIGINT)) > 150
    ) q
    JOIN orders o   ON o.o_orderkey = q.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY totalprice_cents DESC, o.o_orderdate, o.o_orderkey
    LIMIT 20
    """,
    doc="Large-volume orders (TPC-H q18 analogue): orders whose total "
    "line quantity exceeds a threshold, with their customer. The scale "
    "shape is aggregate-FIRST: lineitem collapses to (orderkey, qty) "
    "with map-side partial sums and the HAVING prunes to the rare large "
    "orders BEFORE any join — the surviving slice then broadcasts into "
    "orders/customer (stats-gated). Joining raw lineitem to orders "
    "first would shuffle the fact table for nothing. Integer cents and "
    "integer quantities end-to-end.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
        .where(F.col("qty") > 150)
    )
    return (
        od.join(
            _bcast_if_small(big, sf_dir, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            _bcast_if_small(cu, sf_dir, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.floor(F.col("o_totalprice") * 100 + 0.5)
            .cast("long")
            .alias("totalprice_cents"),
            F.col("qty").cast("long").alias("total_qty"),
        )
        .orderBy(
            F.col("totalprice_cents").desc(), "o_orderdate", "o_orderkey"
        )
        .limit(20)
    )


@register(
    "q22_global_sales_opportunity",
    """
    WITH avg_bal AS (
      SELECT CAST((2 * SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT))
                     + COUNT(*)) // (2 * COUNT(*)) AS BIGINT) AS ab_cents
      FROM customer WHERE c_acctbal > 0
    )
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS totacctbal_cents
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey, avg_bal
    WHERE CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) > avg_bal.ab_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      )
    GROUP BY 1 ORDER BY 1
    """,
    doc="Dormant high-balance customers (TPC-H q22 analogue): per nation, "
    "customers whose balance beats the positive-balance average but who "
    "have placed no order since 1998 (the testdata generator gives every "
    "customer at least one all-time order, so the classic never-ordered "
    "predicate is vacuous; recency-dormancy keeps the identical anti-join "
    "shape with a pushed date filter on the anti side and non-trivial "
    "output). Three classic pieces in one plan: an "
    "uncorrelated scalar subquery (the average rides as a one-row "
    "broadcast — Spark plans a scalar subquery, no driver round-trip in "
    "the SQL form; here the cents average is exact integer half-up so "
    "both engines agree), a LEFT ANTI join for NOT EXISTS (orders "
    "collapse to distinct custkeys — the anti side never carries "
    "payload), and a broadcast nation dim. AVG is computed over integer "
    "cents then half-up-rounded to one exact integer, sidestepping "
    "float-mean drift.",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    na = _t(spark, sf_dir, "nation")
    cents = F.floor(F.col("c_acctbal") * 100 + 0.5).cast("long")
    # exact integer half-up average of positive balances: floor(sum/n + .5)
    # = (2*sum + n) div (2*n) on integers
    s, n = (
        cu.where(F.col("c_acctbal") > 0)
        .agg(F.sum(cents), F.count(F.lit(1)))
        .collect()[0]
    )
    ab_cents = (2 * s + n) // (2 * n)
    return (
        cu.where(cents > F.lit(ab_cents))
        .join(
            od.where(
                F.col("o_orderdate")
                >= F.lit("1998-01-01").cast("timestamp")
            ).select("o_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .join(F.broadcast(na), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("numcust"),
            F.sum(cents).cast("long").alias("totacctbal_cents"),
        )
        .orderBy("n_name")
    )


@register(
    "q11_important_stock",
    """
    WITH nat_supp AS (
      SELECT s_suppkey FROM supplier s
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    ),
    per_part AS (
      SELECT l_partkey,
             SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS value_cents
      FROM lineitem l
      JOIN nat_supp s ON s.s_suppkey = l.l_suppkey
      GROUP BY 1
    ),
    total AS (SELECT SUM(value_cents) AS tv FROM per_part)
    SELECT l_partkey, CAST(value_cents AS BIGINT) AS value_cents
    FROM per_part, total
    WHERE value_cents * 1000 > tv
    ORDER BY value_cents DESC, l_partkey
    """,
    doc="Important stock identification (TPC-H q11 analogue; the schema "
    "has no partsupp, so lineitem is the observed supply book): per-part "
    "supply value from NATION_7's suppliers, keeping parts whose value "
    "exceeds 0.1% of that nation's total — the classic "
    "group-by-HAVING-over-global-scalar shape. The threshold compare is "
    "CROSS-MULTIPLIED (value·1000 > total) so no division ever happens — "
    "integer-exact on both engines. Scale shape: the nation's supplier "
    "list broadcasts as a semi-join filter, the fact aggregates ONCE "
    "map-side-partial on partkey, and the global total is ONE driver "
    "scalar off the checkpointed per-part frame (the q22 pattern) — no "
    "BroadcastNestedLoopJoin, no second fact pass.",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    qty = F.floor(F.col("l_quantity") + 0.5).cast("long")
    nat_supp = su.join(
        F.broadcast(na.where(F.col("n_name") == "NATION_7")),
        F.col("n_nationkey") == F.col("s_nationkey"),
    ).select("s_suppkey")
    per_part = (
        li.join(
            _bcast_if_small(nat_supp, sf_dir, "supplier"),
            F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(F.sum(cents * qty).alias("value_cents"))
        .localCheckpoint(eager=True)  # total + filter read it once each
    )
    tv = per_part.agg(F.sum("value_cents")).collect()[0][0]
    return (
        per_part.where(F.col("value_cents") * 1000 > F.lit(tv))
        .select("l_partkey", F.col("value_cents").cast("long").alias("value_cents"))
        .orderBy(F.col("value_cents").desc(), "l_partkey")
    )


@register(
    "q12_late_shipment_priority",
    """
    SELECT l.l_linestatus,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
    GROUP BY 1 ORDER BY 1
    """,
    doc="Late-shipment priority census (TPC-H q12 analogue; the schema "
    "has no shipmode/commitdate, so lateness = shipped 60+ days after "
    "the order date): per line status, how many late-shipped 1996 lines "
    "belong to high- vs low-priority orders — q12's signature "
    "conditional-aggregation (CASE WHEN IN) over a fact-fact equi-join. "
    "Scale shape: the date filter pushes to the lineitem scan, both "
    "sides shuffle once on orderkey (orders is row-scaled — no forced "
    "broadcast; AQE picks from runtime sizes), the lateness predicate is "
    "a post-join column compare, and the aggregate collapses to 2 rows "
    "map-side.",
)
def q12_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            _bcast_if_small(od, sf_dir, "orders"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAY"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q15_top_supplier",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)
                 * (10000 - CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT)))
               AS total_rev_micro
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_rev_micro AS BIGINT) AS total_rev_micro
    FROM supplier s
    JOIN revenue r ON r.supplier_no = s.s_suppkey
    WHERE r.total_rev_micro = (SELECT MAX(total_rev_micro) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    doc="Top supplier (TPC-H q15 analogue): 1996-Q1 discounted revenue "
    "per supplier (exact integer micro-cents — price cents × "
    "(10000 − discount bp), the q1 money discipline), returning the "
    "supplier(s) at the maximum — q15's create-view + scalar-MAX-over-"
    "aggregate shape. The oracle keeps the scalar subquery; the Spark "
    "plan decorrelates it: the per-supplier revenue frame (supplier-"
    "cardinality, bounded) is checkpointed once, its MAX comes back as "
    "ONE driver scalar embedded as a literal (the q22 pattern — no "
    "BroadcastNestedLoopJoin, no unpartitioned window over a row-scaled "
    "frame), and the winner filter plus the supplier dim join run off "
    "the same checkpoint. The fact table is read once, aggregated "
    "map-side-partial on suppkey.",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    su = _t(spark, sf_dir, "supplier")
    cents = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    db = F.floor(F.col("l_discount") * 10000 + 0.5).cast("long")
    revenue = (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(cents * (10000 - db)).alias("total_rev_micro"))
        .localCheckpoint(eager=True)  # max + winner filter + dim join
    )
    max_rev = revenue.agg(F.max("total_rev_micro")).collect()[0][0]
    return (
        revenue.where(F.col("total_rev_micro") == F.lit(max_rev))
        .join(
            _bcast_if_small(su, sf_dir, "supplier"),
            F.col("s_suppkey") == F.col("supplier_no"),
        )
        .select("s_suppkey", "s_name", "total_rev_micro")
        .orderBy("s_suppkey")
    )


@register(
    "q20_promotion_candidates",
    """
    WITH red_parts AS (
      SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ),
    sp AS (
      SELECT l_suppkey, l_partkey,
             SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                       AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
                      THEN CAST(FLOOR(l_quantity + 0.5) AS BIGINT)
                      ELSE 0 END) AS q96,
             SUM(CAST(FLOOR(l_quantity + 0.5) AS BIGINT)) AS qtot
      FROM lineitem l
      JOIN red_parts p ON p.p_partkey = l.l_partkey
      GROUP BY 1, 2
    ),
    cand_supp AS (
      SELECT DISTINCT l_suppkey FROM sp WHERE q96 > 0 AND 2 * q96 > qtot
    )
    SELECT s.s_name, n.n_name
    FROM supplier s
    JOIN cand_supp c ON c.l_suppkey = s.s_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    ORDER BY s.s_name
    """,
    doc="Promotion-candidate suppliers (TPC-H q20 analogue; no partsupp, "
    "so availability is read from shipping history): suppliers who "
    "shipped MORE of some red part in 1996 than in all other years "
    "combined (2·q96 > qtot ⇔ 1996 share > 50%) — q20's nested-IN "
    "chain (parts by name → per-(supplier,part) quantity threshold → "
    "supplier semi-join → nation decoration) DECORRELATED: the two "
    "quantity sums that q20 writes as a correlated scalar subquery "
    "compute in ONE conditional aggregate per (supplier, part), the "
    "threshold is cross-multiplied (no division), and the candidate "
    "supplier set reaches the supplier table as a semi-join. Scale "
    "shape: the name-filtered part list broadcasts into the fact scan, "
    "the fact aggregates once on (suppkey, partkey) map-side-partial, "
    "and everything after operates on bounded dimension-sized frames.",
)
def q20_promotion_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")
    su = _t(spark, sf_dir, "supplier")
    na = _t(spark, sf_dir, "nation")
    qty = F.floor(F.col("l_quantity") + 0.5).cast("long")
    in96 = (
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    red = pa.where(F.col("p_name").like("red%")).select("p_partkey")
    sp = (
        li.join(
            _bcast_if_small(red, sf_dir, "part"),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.when(in96, qty).otherwise(0)).alias("q96"),
            F.sum(qty).alias("qtot"),
        )
    )
    cand = (
        sp.where((F.col("q96") > 0) & (2 * F.col("q96") > F.col("qtot")))
        .select("l_suppkey")
        .distinct()
    )
    return (
        su.join(cand, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .join(F.broadcast(na), F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


_KMV_K = 64


@register(
    "agg_kmv_set_ops",
    f"""
    WITH src_a AS (
      SELECT CAST(user_id AS VARCHAR) AS u FROM events WHERE event_type = 'click'
    ),
    src_b AS (
      SELECT CAST(user_id AS VARCHAR) AS u FROM events WHERE event_type = 'purchase'
    ),
    {{A_CTE}},
    {{B_CTE}},
    merged AS (
      SELECT g, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b FROM (
        SELECT g, h, 1 AS in_a, 0 AS in_b FROM a_reg
        UNION ALL
        SELECT g, h, 0 AS in_a, 1 AS in_b FROM b_reg
      ) GROUP BY 1, 2
    ),
    top AS (
      SELECT * FROM (
        SELECT g, h, in_a, in_b,
               ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rank
        FROM merged)
      WHERE rank <= {_KMV_K}
    ),
    est AS (
      SELECT g,
             CAST(COUNT(*) AS BIGINT) AS n_union_seen,
             CAST(CASE WHEN COUNT(*) < {_KMV_K} THEN COUNT(*)
                  ELSE ({_KMV_K - 1} * CAST({SK.RSV_SCALE} AS BIGINT))
                       // GREATEST(MAX(CASE WHEN rank = {_KMV_K} THEN h END), 1)
                  END AS BIGINT) AS union_estimate,
             CAST(SUM(in_a * in_b) AS BIGINT) AS n_both,
             CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS n_only_a
      FROM top GROUP BY g
    ),
    ex AS (
      SELECT COUNT(DISTINCT a.u) AS exact_intersection
      FROM src_a a JOIN src_b b ON b.u = a.u
    )
    SELECT g, n_union_seen, union_estimate, n_both,
           CAST(CASE WHEN n_union_seen < {_KMV_K} THEN n_both
                ELSE (n_both * union_estimate) // {_KMV_K} END AS BIGINT)
             AS intersection_estimate,
           n_only_a,
           CAST(CASE WHEN n_union_seen < {_KMV_K} THEN n_only_a
                ELSE (n_only_a * union_estimate) // {_KMV_K} END AS BIGINT)
             AS difference_estimate,
           CAST(ex.exact_intersection AS BIGINT) AS exact_intersection
    FROM est, ex ORDER BY g
    """.replace(
        "{A_CTE}",
        SK.kmv_oracle_cte("src_a", "'users'", "u", 64, p="a").lstrip().rstrip(),
    ).replace(
        "{B_CTE}",
        SK.kmv_oracle_cte("src_b", "'users'", "u", 64, p="b").lstrip().rstrip(),
    ),
    doc="K-minimum-values distinct sketch with SET ALGEBRA (Bar-Yossef et "
    "al. 2002; Beyer et al. SIGMOD 2007) — the set-operation member of "
    "the sketch family: distinct clickers vs purchasers compared through "
    "two k=64 KMV registers. Where HLL registers only union (max-merge) "
    "and intersection falls back to inclusion-exclusion with compounding "
    "error (agg_hll_overlap), the k smallest distinct md5 hashes support "
    "union AND intersection natively: the merged registers' k smallest "
    "ARE the union's KMV, and the fraction of them present in both "
    "registers estimates the intersection share. MIN-merge registers — "
    "idempotent across partitions/micro-batches/replay, same machinery "
    "as the reservoir sketch (a KMV register IS a uniform reservoir over "
    "distinct values). Exact intersection rides along as the eval "
    "baseline. At 100 TB: the distinct-dedup combines map-side, k rows "
    "per group cross the wire, and the set algebra runs on register "
    "frames — no second data pass, ever.",
)
def agg_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    u = F.col("user_id").cast("string")
    a = ev.where(F.col("event_type") == "click").select(
        F.lit("users").alias("g"), u.alias("u")
    )
    b = ev.where(F.col("event_type") == "purchase").select(
        F.lit("users").alias("g"), u.alias("u")
    )
    reg_a = SK.kmv_registers(a, "g", F.col("u"), _KMV_K)
    reg_b = SK.kmv_registers(b, "g", F.col("u"), _KMV_K)
    # exact baseline as ONE driver scalar embedded as a literal (the q22
    # pattern — a crossJoin(broadcast(one_row)) would plan as the banned
    # BroadcastNestedLoopJoin)
    exact = (
        a.select("u").distinct()
        .join(b.select("u").distinct(), "u", "left_semi")
        .count()
    )
    return (
        SK.kmv_set_ops(reg_a, reg_b, _KMV_K)
        .withColumn(
            "exact_intersection", F.lit(exact).cast("long")
        )
        .orderBy("g")
    )


@register(
    "join_salted_skew",
    """
    WITH dim AS (
      SELECT event_type, LENGTH(event_type) AS type_weight
      FROM (SELECT DISTINCT event_type FROM events)
    )
    SELECT e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(d.type_weight) AS BIGINT) AS total_weight,
           CAST(SUM(CAST(FLOOR(e.value * 100 + 0.5) AS BIGINT)
                    * d.type_weight) AS BIGINT) AS weighted_cents
    FROM events e JOIN dim d ON d.event_type = e.event_type
    GROUP BY e.event_type ORDER BY e.event_type
    """,
    doc="Salted SHUFFLE join on a hot 5-value key: a sort-merge join on "
    "event_type parks the whole fact on <= 5 reducers regardless of "
    "cluster width, and AQE's skew splitting cannot split a single hot "
    "key's sort group — so the fact takes a deterministic hash salt, "
    "the dim replicates across all 16 salts, and the join keys on "
    "(event_type, salt), spreading each hot key over 16 sort groups "
    "(operators/skew.salted_join; the dim carries a MERGE hint so the "
    "demo exercises the shuffle path a broadcast would sidestep — at "
    "real scale the dim side may be too big or non-broadcastable). "
    "Row-for-row identical to the unsalted join the oracle runs; "
    "weighted sum in exact integer cents.",
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators.skew import salted_join

    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn("type_weight", F.length("event_type"))
    )
    joined = salted_join(ev, dim, "event_type", n_salts=16)
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    return (
        joined.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("type_weight").cast("long").alias("total_weight"),
            F.sum(cents * F.col("type_weight")).cast("long").alias(
                "weighted_cents"
            ),
        )
        .orderBy("event_type")
    )


# --- Ordered funnel analysis (event-sequence conversion) --------------------

@register(
    "events_funnel",
    """
    WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS tu FROM events),
    s1 AS (
      SELECT *, MIN(CASE WHEN event_type = 'view' THEN tu END)
                OVER (PARTITION BY user_id) AS t_view
      FROM e
    ),
    s2 AS (
      SELECT *, MIN(CASE WHEN event_type = 'click' AND tu > t_view THEN tu END)
                OVER (PARTITION BY user_id) AS t_click
      FROM s1
    ),
    s3 AS (
      SELECT *, MIN(CASE WHEN event_type = 'purchase' AND tu > t_click THEN tu END)
                OVER (PARTITION BY user_id) AS t_purchase
      FROM s2
    ),
    u AS (
      SELECT user_id, MAX(t_view) AS t_view, MAX(t_click) AS t_click,
             MAX(t_purchase) AS t_purchase
      FROM s3 GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(COUNT(t_view) AS BIGINT) AS n_view,
           CAST(COUNT(t_click) AS BIGINT) AS n_click_after_view,
           CAST(COUNT(t_purchase) AS BIGINT) AS n_purchase_after_click,
           CAST((2 * 10000 * COUNT(t_purchase) + COUNT(t_view))
                // (2 * COUNT(t_view)) AS BIGINT) AS conversion_bp
    FROM u
    """,
    doc="Ordered funnel conversion (view -> click -> purchase): each step "
    "must STRICTLY FOLLOW the previous user's step in event time, not "
    "merely co-occur — the sequential-pattern query behind every product "
    "funnel dashboard. Steps resolve as chained whole-partition window "
    "minima (first view, first click after it, first purchase after "
    "that); conversion lands in half-up integer basis points. Scale "
    "shape: ONE shuffle on user_id serves all three window passes (same "
    "partitioning, no ORDER BY so no sort) and the per-user rollup "
    "co-locates on the same exchange; the final global aggregate is one "
    "row. Timestamps ride as integer epoch-micros throughout.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id")
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("tu")
    )
    s1 = e.withColumn(
        "t_view",
        F.min(F.when(F.col("event_type") == "view", F.col("tu"))).over(w),
    )
    s2 = s1.withColumn(
        "t_click",
        F.min(
            F.when(
                (F.col("event_type") == "click") & (F.col("tu") > F.col("t_view")),
                F.col("tu"),
            )
        ).over(w),
    )
    s3 = s2.withColumn(
        "t_purchase",
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("tu") > F.col("t_click")),
                F.col("tu"),
            )
        ).over(w),
    )
    u = s3.groupBy("user_id").agg(
        F.max("t_view").alias("t_view"),
        F.max("t_click").alias("t_click"),
        F.max("t_purchase").alias("t_purchase"),
    )
    return u.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t_view").alias("n_view"),
        F.count("t_click").alias("n_click_after_view"),
        F.count("t_purchase").alias("n_purchase_after_click"),
    ).select(
        "n_users",
        "n_view",
        "n_click_after_view",
        "n_purchase_after_click",
        F.expr(
            "(2 * 10000 * n_purchase_after_click + n_view) div (2 * n_view)"
        ).alias("conversion_bp"),
    )


# --- Time-decayed aggregation (recency-weighted rollup) ---------------------

@register(
    "agg_time_decay",
    """
    WITH mx AS (SELECT MAX(epoch_us(ts)) AS m FROM events),
    t AS (
      SELECT user_id,
             CAST(FLOOR(value * 1000000 + 0.5) AS BIGINT) AS v6,
             CAST((m - epoch_us(ts)) // 604800000000 AS BIGINT) AS wk
      FROM events, mx
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(v6) AS BIGINT) AS raw_micro,
           CAST(SUM(CASE WHEN wk >= 63 THEN 0
                         ELSE v6 // (CAST(1 AS BIGINT) << wk) END)
                AS BIGINT) AS decayed_micro
    FROM t GROUP BY user_id ORDER BY user_id
    """,
    doc="Recency-weighted (half-life-decayed) per-user value rollup: each "
    "event's value decays by 2^-(age in whole weeks), the standard "
    "recency weighting for engagement/LTV scores. The decay is EXACT "
    "integer arithmetic — micro-unit value right-shifted by the week "
    "count (halving = shift) — so the sum is order-independent and "
    "hash-identical cross-engine, where a float pow()-based decay would "
    "drift by summation order and ulp differences. The reference "
    "timestamp is a scalar aggregate pulled through the driver and "
    "embedded as a literal (the k-means-model pattern — no "
    "broadcast-nested-loop from a one-row cross join). Scale shape: one "
    "groupBy shuffle on user_id with map-side partial aggregation; the "
    "scalar max is a column-pruned scan aggregate.",
)
def agg_time_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.unix_micros("ts"))).first()[0]
    v6 = F.floor(F.col("value") * 1000000 + 0.5).cast("long")
    # integer div, NOT double-divide-then-cast: a double quotient within
    # half an ulp below a whole week would round UP and disagree with the
    # oracle's exact // at the boundary (ages are non-negative so div ==
    # floor on both engines)
    wk = F.expr(f"({mx}L - unix_micros(ts)) div 604800000000L")
    # ages are non-negative so cast-truncation == floor here; the shift
    # guard mirrors the oracle (wk >= 63 would overflow the long shift)
    term = F.when(F.col("wk") >= 63, F.lit(0)).otherwise(
        F.expr("v6 div shiftleft(cast(1 as bigint), cast(wk as int))")
    )
    return (
        ev.select("user_id", v6.alias("v6"), wk.alias("wk"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("v6").cast("long").alias("raw_micro"),
            F.sum(term).cast("long").alias("decayed_micro"),
        )
        .orderBy("user_id")
    )


@register(
    "events_retention_cohorts",
    """
    WITH a AS (
      SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk FROM events
    ),
    f AS (SELECT user_id, MIN(wk) AS fw FROM a GROUP BY user_id),
    cs AS (SELECT fw, COUNT(*) AS cohort_size FROM f GROUP BY fw),
    m AS (
      SELECT f.fw AS cohort_week, a.wk - f.fw AS week_offset,
             COUNT(*) AS n_active
      FROM a JOIN f USING (user_id)
      GROUP BY 1, 2
    )
    SELECT CAST(m.cohort_week AS BIGINT) AS cohort_week,
           CAST(m.week_offset AS BIGINT) AS week_offset,
           CAST(cs.cohort_size AS BIGINT) AS cohort_size,
           CAST(m.n_active AS BIGINT) AS n_active,
           CAST((2 * 10000 * m.n_active + cs.cohort_size)
                // (2 * cs.cohort_size) AS BIGINT) AS retained_bp
    FROM m JOIN cs ON cs.fw = m.cohort_week
    ORDER BY cohort_week, week_offset
    """,
    doc="Cohort retention matrix — THE product-analytics workload: users "
    "grouped by first-active week (cohort), each later week reporting "
    "what fraction of the cohort came back. Weeks are integer "
    "epoch-micro divisions (no calendar/timezone rendering to disagree "
    "on), retention in half-up integer basis points. Scale shape: the "
    "distinct (user, week) reduction, the first-week aggregate and the "
    "cohort join all key on user_id — ONE shuffle family reused across "
    "stages — and the output matrix aggregate keys on (cohort, offset), "
    "bounded by weeks², not users. No window functions needed.",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.select(
        "user_id", F.expr("unix_micros(ts) div 604800000000").alias("wk")
    ).distinct()
    f = a.groupBy("user_id").agg(F.min("wk").alias("fw"))
    cs = f.groupBy("fw").agg(F.count(F.lit(1)).alias("cohort_size"))
    m = (
        a.join(f, "user_id")
        .groupBy(
            F.col("fw").alias("cohort_week"),
            (F.col("wk") - F.col("fw")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return (
        m.join(cs, m["cohort_week"] == cs["fw"])
        .select(
            F.col("cohort_week").cast("long").alias("cohort_week"),
            F.col("week_offset").cast("long").alias("week_offset"),
            F.col("cohort_size").cast("long").alias("cohort_size"),
            F.col("n_active").cast("long").alias("n_active"),
            F.expr(
                "cast((2 * 10000 * n_active + cohort_size)"
                " div (2 * cohort_size) as bigint)"
            ).alias("retained_bp"),
        )
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "events_anomaly_zscore",
    """
    WITH d AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS day,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ),
    s AS (
      SELECT event_type, COUNT(*) AS n, SUM(c) AS sc, SUM(c * c) AS scc
      FROM d GROUP BY event_type
    )
    SELECT d.event_type, CAST(d.day AS BIGINT) AS day,
           CAST(d.c AS BIGINT) AS n_events,
           ROUND((CAST(s.n AS DOUBLE) * d.c - s.sc)
                 / sqrt(CAST(s.n AS DOUBLE))
                 / sqrt(CAST(s.n * s.scc - s.sc * s.sc AS DOUBLE)
                        / CAST(s.n - 1 AS DOUBLE)), 4) AS zscore
    FROM d JOIN s ON s.event_type = d.event_type
    WHERE s.n > 1 AND s.n * s.scc > s.sc * s.sc
    ORDER BY d.event_type, day
    """,
    doc="Daily volume anomaly detection per event type: each day's event "
    "count scored as a z-score against that type's own daily "
    "distribution — the ops-monitoring query behind every traffic-spike "
    "alert. The moments (n, sum, sum-of-squares) are EXACT integer "
    "aggregates, so the z-score doubles are bit-identical cross-engine "
    "before the final correctly-rounded IEEE divisions (z = (n*c - S) / "
    "(sqrt(n) * sqrt((n*SS - S^2)/(n-1)))); zero-variance types drop "
    "out explicitly. Scale shape: one (type, day) hash aggregate with "
    "map-side combine, one type-keyed moment rollup, one slim join — "
    "output bounded by types x days, not events.",
)
def events_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    d = (
        ev.select(
            "event_type", F.expr("unix_micros(ts) div 86400000000").alias("day")
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    s = d.groupBy(F.col("event_type").alias("et")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c") * F.col("c")).alias("scc"),
    )
    return (
        d.join(s, d["event_type"] == s["et"])
        .where(
            (F.col("n") > 1)
            & (F.col("n") * F.col("scc") > F.col("sc") * F.col("sc"))
        )
        .select(
            "event_type",
            F.col("day").cast("long").alias("day"),
            F.col("c").cast("long").alias("n_events"),
            F.round(
                (F.col("n").cast("double") * F.col("c") - F.col("sc"))
                / F.sqrt(F.col("n").cast("double"))
                / F.sqrt(
                    (F.col("n") * F.col("scc") - F.col("sc") * F.col("sc"))
                    .cast("double")
                    / (F.col("n") - 1).cast("double")
                ),
                4,
            ).alias("zscore"),
        )
        .orderBy("event_type", "day")
    )


# --- Interval-overlap join (banded, never all-pairs) ------------------------

@register(
    "join_interval_overlap",
    """
    WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS tu FROM events),
    m AS (
      SELECT *, CASE WHEN LAG(tu) OVER w IS NULL
                       OR tu - LAG(tu) OVER w > 28800000000
                     THEN 1 ELSE 0 END AS is_new
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu, event_id)
    ),
    s AS (
      SELECT *, SUM(is_new) OVER (PARTITION BY user_id ORDER BY tu, event_id
                                  ROWS UNBOUNDED PRECEDING) AS sn
      FROM m
    ),
    sess AS (
      SELECT user_id, sn, MIN(tu) AS st, MAX(tu) AS en, COUNT(*) AS n
      FROM s GROUP BY user_id, sn
    ),
    big AS (SELECT * FROM sess WHERE n >= 8)
    SELECT a.user_id AS user_a, CAST(a.sn AS BIGINT) AS session_a,
           b.user_id AS user_b, CAST(b.sn AS BIGINT) AS session_b,
           CAST((LEAST(a.en, b.en) - GREATEST(a.st, b.st)) // 1000000
                AS BIGINT) AS overlap_s
    FROM big a JOIN big b
      ON a.user_id < b.user_id AND a.st <= b.en AND b.st <= a.en
    ORDER BY user_a, session_a, user_b, session_b
    """,
    doc="Interval-overlap join: which users' heavy activity sessions "
    "(gap-sessionized at 8h, >= 8 events) overlap IN TIME across users — "
    "the co-occurrence primitive behind concurrency analysis, abuse-ring "
    "detection and shared-incident correlation. A pure inequality join "
    "(st_a <= en_b AND st_b <= en_a) has no equi key, so the naive plan "
    "is a banned nested-loop cross product; the Spark plan BANDS it: "
    "each interval explodes into the day buckets it covers, candidates "
    "equi-join on the bucket, the exact overlap predicate filters, and "
    "DISTINCT collapses multi-bucket collisions — candidates are bounded "
    "by per-bucket occupancy, never |intervals|^2 (the same "
    "bucket-banding answer as the LSH dedups; the oracle states the "
    "equivalent inequality join declaratively). Session build reuses the "
    "events_sessionize shape (one user_id shuffle, both window passes + "
    "rollup), and the slim interval table is checkpointed so the "
    "pipeline runs once, not once per self-join side.",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    BUCKET = 86_400_000_000  # 1 day in micros
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("tu")
    )
    w = W.partitionBy("user_id").orderBy("tu", "event_id")
    gap = F.col("tu") - F.lag("tu").over(w)
    s = e.withColumn(
        "is_new",
        F.when(
            F.lag("tu").over(w).isNull() | (gap > 28_800_000_000), 1
        ).otherwise(0),
    ).withColumn(
        "sn",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    big = (
        s.groupBy("user_id", "sn")
        .agg(
            F.min("tu").alias("st"),
            F.max("tu").alias("en"),
            F.count(F.lit(1)).alias("n"),
        )
        .where(F.col("n") >= 8)
        .localCheckpoint(eager=True)  # slim (user, sn, st, en) intervals
    )
    banded = big.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.expr(f"st div {BUCKET}"), F.expr(f"en div {BUCKET}")
            )
        ),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.st") <= F.col("b.en"))
            & (F.col("b.st") <= F.col("a.en")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("a.sn").cast("long").alias("session_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("b.sn").cast("long").alias("session_b"),
            F.expr(
                "(least(a.en, b.en) - greatest(a.st, b.st)) div 1000000"
            ).alias("overlap_s"),
        )
        .distinct()
        .orderBy("user_a", "session_a", "user_b", "session_b")
    )


# --- Second-order behavior paths: event-type trigrams ------------------------

_TRI_TOP = 15


@register(
    "events_path_trigrams",
    f"""
    WITH seq AS (
      SELECT user_id, event_type AS t1,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS t2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS t3
      FROM events
    ),
    tri AS (
      SELECT t1 || '>' || t2 || '>' || t3 AS path,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_tot FROM tri)
    SELECT path, n,
           CAST((2*10000*n + tot.n_tot) // (2*tot.n_tot) AS BIGINT)
             AS share_bp
    FROM tri, tot
    ORDER BY n DESC, path LIMIT {_TRI_TOP}
    """,
    doc="Second-order behavior paths: the corpus-wide top event-type "
    "TRIGRAMS over per-user streams (ts, event_id ordering) with their "
    "share of all trigrams in half-up basis points — the step up from "
    "the first-order Markov matrix that surfaces whole journeys "
    "(browse>cart>buy vs browse>cart>abandon) rather than single hops. "
    "Scale shape: the same ONE user_id window shuffle as "
    "sessionize/markov computes both LEADs; trigram counts combine "
    "map-side into a |types|³-bounded frame, which is checkpointed and "
    "its total pulled through the driver as a scalar literal "
    "(the k-means-model pattern) so the share needs no one-row "
    "cross join; TakeOrderedAndProject caps the output.",
)
def events_path_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    tri = (
        seq.where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
        .select(
            F.concat_ws(">", "t1", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)  # |types|^3-bounded
    )
    n_tot = tri.agg(F.sum("n")).collect()[0][0]
    return (
        tri.select(
            "path",
            "n",
            F.expr(f"(2*10000*n + {n_tot}) div (2*{n_tot})").alias("share_bp"),
        )
        .orderBy(F.col("n").desc(), "path")
        .limit(_TRI_TOP)
    )


# --- Event-type Markov transition matrix -----------------------------------

@register(
    "events_markov_transitions",
    f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ),
    tr AS (
      SELECT prev_type AS from_type, event_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY 1, 2
    ),
    tot AS (
      SELECT from_type, CAST(SUM(n) AS BIGINT) AS n_out
      FROM tr GROUP BY 1
    )
    SELECT tr.from_type, tr.to_type, tr.n,
           CAST((2*10000*tr.n + tot.n_out) // (2*tot.n_out)
                AS BIGINT) AS share_bp
    FROM tr JOIN tot USING (from_type)
    ORDER BY from_type, to_type
    """,
    doc="First-order Markov transition matrix over per-user event "
    "streams: LAG pairs each event with its predecessor (ordered by "
    "ts, event_id within user), transition counts roll up per "
    "(from, to), and each row carries its outgoing-probability share in "
    "half-up basis points — the user-journey model behind funnel design "
    "and next-event prediction baselines. Scale shape: ONE user_id "
    "shuffle feeds the LAG window (the sessionize pattern), transition "
    "counts combine map-side into an event-type-vocabulary-bounded "
    "frame (|types|² rows at most), and the outgoing-total join runs "
    "over that tiny frame — at 100 TB the only data-scaled exchange is "
    "the per-user window partition.",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    tr = (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = tr.groupBy("from_type").agg(F.sum("n").alias("n_out"))
    return (
        tr.join(tot, "from_type")
        .select(
            "from_type",
            "to_type",
            F.col("n").cast("long").alias("n"),
            F.expr(
                "CAST((2*10000*n + n_out) div (2*n_out) AS BIGINT)"
            ).alias("share_bp"),
        )
        .orderBy("from_type", "to_type")
    )


# --- HLL set algebra: audience overlap from merged registers ----------------

@register(
    "agg_hll_overlap",
    f"""
    WITH {SK.hll_oracle_cte("orders", "EXTRACT(year FROM o_orderdate)",
                            "CAST(o_custkey AS VARCHAR)")},
    yrs AS (SELECT DISTINCT g FROM hll_reg),
    pr AS (
      SELECT a.g AS year_a, b.g AS year_b
      FROM yrs a JOIN yrs b ON a.g < b.g
    ),
    mm AS (
      SELECT pr.year_a, pr.year_b, r.bucket, MAX(r.r) AS r
      FROM pr JOIN hll_reg r ON r.g = pr.year_a OR r.g = pr.year_b
      GROUP BY 1, 2, 3
    ),
    us AS (
      SELECT year_a, year_b, {SK.HLL_S_AGG_SQL} AS s
      FROM mm GROUP BY 1, 2
    ),
    ue AS (
      SELECT year_a, year_b, {SK.hll_est_sql('s')} AS est_union FROM us
    ),
    xd AS (
      SELECT DISTINCT EXTRACT(year FROM o_orderdate) AS yr, o_custkey AS c
      FROM orders
    ),
    xi AS (
      SELECT a.yr AS year_a, b.yr AS year_b, COUNT(*) AS x
      FROM xd a JOIN xd b ON a.c = b.c AND a.yr < b.yr
      GROUP BY 1, 2
    )
    SELECT CAST(pr.year_a AS BIGINT) AS year_a,
           CAST(pr.year_b AS BIGINT) AS year_b,
           CAST(ea.hll_estimate AS BIGINT) AS est_a,
           CAST(eb.hll_estimate AS BIGINT) AS est_b,
           CAST(ue.est_union AS BIGINT) AS est_union,
           CAST(ea.hll_estimate + eb.hll_estimate - ue.est_union
                AS BIGINT) AS est_intersection,
           CAST(COALESCE(xi.x, 0) AS BIGINT) AS exact_intersection
    FROM pr
    JOIN hll_est ea ON ea.g = pr.year_a
    JOIN hll_est eb ON eb.g = pr.year_b
    JOIN ue USING (year_a, year_b)
    LEFT JOIN xi USING (year_a, year_b)
    ORDER BY year_a, year_b
    """,
    doc="HLL set algebra — repeat-customer audience overlap between order "
    "years: per-year registers max-MERGE into per-pair union sketches, "
    "|A∪B| comes from the merged estimate and |A∩B| by inclusion-"
    "exclusion, reported next to the exact distinct-join intersection. "
    "This is why mergeable sketches matter at 100 TB: every pairwise "
    "audience question is answered from the SAME m-row-per-group "
    "register frame — one scan of the fact table total — where the exact "
    "path pays a distinct + self-join per question over row-scaled keys "
    "(the baseline alongside, fan-out bounded by years² per key). "
    "Register merging is pure column max over a years·m-row frame; all "
    "estimate arithmetic is the integer-exact HLL formula, so the DuckDB "
    "oracle matches bit-for-bit. The inclusion-exclusion estimate "
    "inherits BOTH sketches' error (visible against exact_intersection; "
    "production uses p=14 registers for ~1% overlap error).",
)
def agg_hll_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    base = od.select(
        F.year("o_orderdate").alias("yr"), F.col("o_custkey").alias("c")
    )
    # registers: ≤ years×m rows; eager checkpoint — three consumers below
    # (per-year estimates + two pair-merge joins) must not rescan orders
    reg = SK.hll_registers(base, "yr", F.col("c").cast("string")).localCheckpoint(
        eager=True
    )
    years = sorted(r["g"] for r in reg.select("g").distinct().collect())
    pairs = spark.createDataFrame(
        [(a, b) for a in years for b in years if a < b], "year_a int, year_b int"
    )
    ra = pairs.join(reg, F.col("g") == F.col("year_a")).select(
        "year_a", "year_b", "bucket", "r"
    )
    rb = pairs.join(reg, F.col("g") == F.col("year_b")).select(
        "year_a", "year_b", "bucket", "r"
    )
    mm = (
        ra.unionByName(rb)
        .groupBy("year_a", "year_b", "bucket")
        .agg(F.max("r").alias("r"))
    )
    ue = SK.hll_estimate_grouped(mm, ["year_a", "year_b"]).withColumnRenamed(
        "hll_estimate", "est_union"
    )
    est = SK.hll_estimate(reg)
    ea = est.select(F.col("g").alias("year_a"), F.col("hll_estimate").alias("est_a"))
    eb = est.select(F.col("g").alias("year_b"), F.col("hll_estimate").alias("est_b"))
    xd = base.distinct()
    xi = (
        xd.alias("a")
        .join(xd.alias("b"), F.col("a.c") == F.col("b.c"))
        .where(F.col("a.yr") < F.col("b.yr"))
        .groupBy(
            F.col("a.yr").alias("year_a"), F.col("b.yr").alias("year_b")
        )
        .agg(F.count(F.lit(1)).alias("x"))
    )
    return (
        pairs.join(ea, "year_a")
        .join(eb, "year_b")
        .join(ue, ["year_a", "year_b"])
        .join(xi, ["year_a", "year_b"], "left")
        .select(
            F.col("year_a").cast("long").alias("year_a"),
            F.col("year_b").cast("long").alias("year_b"),
            "est_a",
            "est_b",
            "est_union",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "est_intersection"
            ),
            F.coalesce(F.col("x"), F.lit(0)).cast("long").alias(
                "exact_intersection"
            ),
        )
        .orderBy("year_a", "year_b")
    )


# --- RFM segmentation from histogram-sketch thresholds ----------------------

_RFM_W_M = 10_000        # $100 monetary histogram bins (cents)
_RFM_SHIFT_M = 10 ** 9   # positivity shift before binning: Spark `div`
#                          truncates, DuckDB `//` floors — they differ on
#                          negative dividends, so monetary sums are shifted
#                          into positive space before the bin division
#                          (the signed-division rule from CLAUDE.md)
_RFM_QS = (20, 40, 60, 80)
_DAY_US = 86_400_000_000


def _rfm_user_sql() -> str:
    return f"""
    nowv AS (SELECT MAX(epoch_us(ts)) AS now_us FROM events),
    u AS (
      SELECT user_id,
             CAST((nowv.now_us - MAX(epoch_us(ts))) // {_DAY_US}
                  AS BIGINT) AS rec,
             CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS mon
      FROM events, nowv GROUP BY user_id, nowv.now_us
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM u),
    ks AS (
      SELECT q, (n.n * q + 99) // 100 AS k
      FROM (VALUES (20), (40), (60), (80)) AS t(q), n
    )"""


def _rfm_thresh_sql(name: str, expr: str, width: int) -> str:
    """CTE chain computing the four quintile thresholds of ``expr`` over u
    via the fixed-width histogram (bin cumsum + within-bin interpolation —
    the agg_histogram_quantiles recovery)."""
    return f"""
    {name}h AS (
      SELECT ({expr}) // {width} AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM u GROUP BY 1
    ),
    {name}c AS (
      SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin) AS cum FROM {name}h
    ),
    {name}t AS (
      SELECT ks.q,
             MIN(CASE WHEN c.cum >= ks.k AND c.cum - c.cnt < ks.k
                      THEN c.bin * {width}
                           + ({width} * (ks.k - (c.cum - c.cnt))) // c.cnt
                 END) AS t
      FROM ks CROSS JOIN {name}c c GROUP BY 1
    )"""


@register(
    "events_rfm_segments",
    f"""
    WITH {_rfm_user_sql()},
    {_rfm_thresh_sql("r", "rec", 1)},
    {_rfm_thresh_sql("f", "freq", 1)},
    {_rfm_thresh_sql("m", f"mon + {_RFM_SHIFT_M}", _RFM_W_M)},
    sc AS (
      SELECT user_id, mon,
             5 - ((rec > (SELECT t FROM rt WHERE q = 20))::INT
                + (rec > (SELECT t FROM rt WHERE q = 40))::INT
                + (rec > (SELECT t FROM rt WHERE q = 60))::INT
                + (rec > (SELECT t FROM rt WHERE q = 80))::INT) AS r_score,
             1 + ((freq > (SELECT t FROM ft WHERE q = 20))::INT
                + (freq > (SELECT t FROM ft WHERE q = 40))::INT
                + (freq > (SELECT t FROM ft WHERE q = 60))::INT
                + (freq > (SELECT t FROM ft WHERE q = 80))::INT) AS f_score,
             1 + ((mon + {_RFM_SHIFT_M} > (SELECT t FROM mt WHERE q = 20))::INT
                + (mon + {_RFM_SHIFT_M} > (SELECT t FROM mt WHERE q = 40))::INT
                + (mon + {_RFM_SHIFT_M} > (SELECT t FROM mt WHERE q = 60))::INT
                + (mon + {_RFM_SHIFT_M} > (SELECT t FROM mt WHERE q = 80))::INT)
               AS m_score
      FROM u
    )
    SELECT CAST(r_score * 100 + f_score * 10 + m_score AS BIGINT)
             AS segment_code,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(mon) AS BIGINT) AS sum_monetary_cents
    FROM sc GROUP BY 1 ORDER BY segment_code
    """,
    doc="RFM customer segmentation (recency / frequency / monetary "
    "quintiles) — the classic lifecycle-marketing rollup, built the "
    "sketch-first way: quintile thresholds come from the fixed-width "
    "HISTOGRAM of each metric (domain-bounded bins, map-side combine — "
    "the agg_histogram_quantiles recovery), collected as 12 scalar "
    "literals (the k-means-model pattern), and every user is then "
    "scored MAP-SIDE against those literals — no global rank sort over "
    "the row-scaled user frame, which is what a naive ntile(5) would "
    "cost at 100 TB. One user_id shuffle builds the RFM frame (eagerly "
    "checkpointed: the three histogram jobs and the final rollup must "
    "not re-aggregate events), one tiny shuffle per histogram, one "
    "segment rollup. Monetary sums are positivity-shifted before bin "
    "division (Spark div truncates / DuckDB floors on negatives); all "
    "arithmetic integer-exact.",
)
def events_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    ev = _t(spark, sf_dir, "events")
    now_us = ev.agg(F.max(F.unix_micros("ts"))).collect()[0][0]
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    u = (
        ev.select("user_id", F.unix_micros("ts").alias("tu"), cents.alias("cents"))
        .groupBy("user_id")
        .agg(
            F.expr(f"({now_us} - max(tu)) div {_DAY_US}").alias("rec"),
            F.count(F.lit(1)).alias("freq"),
            F.sum("cents").alias("mon"),
        )
        .localCheckpoint(eager=True)
    )
    n, min_mon = u.agg(F.count(F.lit(1)), F.min("mon")).collect()[0]
    # signed-division guard (ADVICE r5): the positivity shift must actually
    # reach positive space — a user below -$10M would make Spark `div`
    # (truncate) and DuckDB `//` (floor) disagree on its histogram bin.
    # Fail loudly instead; the fix is a data-derived shift.
    assert min_mon + _RFM_SHIFT_M >= 0, (
        f"events_rfm_segments: min user monetary {min_mon} cents exceeds "
        f"the -{_RFM_SHIFT_M} positivity envelope — derive the shift from "
        "min(mon) instead of the fixed constant"
    )
    ks = {q: (n * q + 99) // 100 for q in _RFM_QS}
    cum_w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)

    def thresholds(expr: str, width: int) -> dict[int, int]:
        hist = (
            u.select(F.expr(f"({expr}) div {width}").alias("bin"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("cum", F.sum("cnt").over(cum_w))
        )
        row = hist.agg(
            *[
                F.min(
                    F.when(
                        (F.col("cum") >= k) & (F.col("cum") - F.col("cnt") < k),
                        F.col("bin") * width
                        + F.expr(f"({width} * ({k} - (cum - cnt))) div cnt"),
                    )
                ).alias(f"t{q}")
                for q, k in ks.items()
            ]
        ).collect()[0]
        return {q: row[f"t{q}"] for q in _RFM_QS}

    rt = thresholds("rec", 1)
    ft = thresholds("freq", 1)
    mt = thresholds(f"mon + {_RFM_SHIFT_M}", _RFM_W_M)
    r_score = 5 - sum(
        (F.col("rec") > rt[q]).cast("int") for q in _RFM_QS
    )
    f_score = 1 + sum(
        (F.col("freq") > ft[q]).cast("int") for q in _RFM_QS
    )
    m_score = 1 + sum(
        ((F.col("mon") + _RFM_SHIFT_M) > mt[q]).cast("int") for q in _RFM_QS
    )
    return (
        u.select(
            (r_score * 100 + f_score * 10 + m_score)
            .cast("long")
            .alias("segment_code"),
            "mon",
        )
        .groupBy("segment_code")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("mon").cast("long").alias("sum_monetary_cents"),
        )
        .select(
            "segment_code",
            F.col("n_users").cast("long").alias("n_users"),
            "sum_monetary_cents",
        )
        .orderBy("segment_code")
    )


# --- TPC-H q8 analogue: national market share ------------------------------

_Q8_REGION = "ASIA"
_Q8_NATION = "NATION_9"
_Q8_PTYPE = "PROMO"


@register(
    "q8_market_share",
    f"""
    WITH rev AS (
      SELECT EXTRACT(year FROM o.o_orderdate) AS yr,
             ns.n_name AS supp_nation,
             CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
               * (10000 - CAST(FLOOR(l.l_discount * 10000 + 0.5) AS BIGINT))
               AS rev
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation nc ON nc.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = nc.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation ns ON ns.n_nationkey = s.s_nationkey
      WHERE r.r_name = '{_Q8_REGION}' AND p.p_type = '{_Q8_PTYPE}'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    )
    SELECT CAST(yr AS BIGINT) AS yr,
           CAST(SUM(CASE WHEN supp_nation = '{_Q8_NATION}' THEN rev
                         ELSE 0 END) AS BIGINT) AS nation_revenue_micro,
           CAST(SUM(rev) AS BIGINT) AS total_revenue_micro,
           CAST((2*10000*SUM(CASE WHEN supp_nation = '{_Q8_NATION}'
                                  THEN rev ELSE 0 END)
                   + SUM(rev)) // (2*SUM(rev)) AS BIGINT) AS share_bp
    FROM rev GROUP BY yr ORDER BY yr
    """,
    doc="National market share (TPC-H q8 analogue) — the full star-join "
    f"orchestration closer: {_Q8_NATION}'s share of {_Q8_PTYPE}-part "
    f"revenue sold into {_Q8_REGION}-region customers, by order year. "
    "Eight tables join in one plan: the fact scans carry pushed "
    "date/type/region filters, every dimension reaches the fact through "
    "a STATS-GATED broadcast (_bcast_if_small — the fixed-size dims hint "
    "broadcast, the row-scaled part/supplier/customer sides stay "
    "unhinted so AQE chooses at scale; the r4 q10 lesson), and the only "
    "row-scaled exchange is the orders-orderkey shuffle joining the two "
    "facts. Revenue accumulates in exact integer micro-dollars "
    "(cents x (10000 - discount bp), the q14 convention) and the share "
    "uses half-up integer division, not a float multiply, so the "
    "single-row-per-year aggregate is hash-exact cross-engine.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    od = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("yr"))
    )
    pt = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_type") == _Q8_PTYPE)
        .select("p_partkey")
    )
    na = _t(spark, sf_dir, "nation")
    rg = _t(spark, sf_dir, "region").where(F.col("r_name") == _Q8_REGION)
    # region-filtered customer keys: nation/region are fixed-size (25/5
    # rows -> gated hint fires); customer itself is row-scaled -> unhinted
    cu = (
        _t(spark, sf_dir, "customer")
        .join(
            _bcast_if_small(
                na.join(
                    _bcast_if_small(rg, sf_dir, "region"),
                    na.n_regionkey == F.col("r_regionkey"),
                ).select("n_nationkey"),
                sf_dir,
                "nation",
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    su = (
        _t(spark, sf_dir, "supplier")
        .join(
            _bcast_if_small(
                na.select(
                    F.col("n_nationkey").alias("sn_key"),
                    F.col("n_name").alias("supp_nation"),
                ),
                sf_dir,
                "nation",
            ),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    pc = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    db = F.floor(F.col("l_discount") * 10000 + 0.5).cast("long")
    rev = (
        li.join(_bcast_if_small(pt, sf_dir, "part"), F.col("l_partkey") == F.col("p_partkey"))
        .join(_bcast_if_small(su, sf_dir, "supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(_bcast_if_small(cu, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .select("yr", "supp_nation", (pc * (10000 - db)).alias("rev"))
    )
    target = F.when(F.col("supp_nation") == _Q8_NATION, F.col("rev")).otherwise(
        F.lit(0)
    )
    return (
        rev.groupBy("yr")
        .agg(
            F.sum(target).cast("long").alias("nation_revenue_micro"),
            F.sum("rev").cast("long").alias("total_revenue_micro"),
        )
        .select(
            F.col("yr").cast("long").alias("yr"),
            "nation_revenue_micro",
            "total_revenue_micro",
            F.expr(
                "CAST((2*10000*nation_revenue_micro + total_revenue_micro)"
                " div (2*total_revenue_micro) AS BIGINT)"
            ).alias("share_bp"),
        )
        .orderBy("yr")
    )


# --- Market-basket affinity (association-rule lift) -------------------------

_BASKET_MIN_SUPPORT = 3
_BASKET_TOP = 20


@register(
    "agg_basket_affinity",
    f"""
    WITH bi AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    nb AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n FROM bi),
    pr AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS pair_count
      FROM bi a JOIN bi b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {_BASKET_MIN_SUPPORT}
    ),
    bf AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM bi GROUP BY 1
    )
    SELECT pr.part_a, pr.part_b, pr.pair_count,
           fa.c AS baskets_a, fb.c AS baskets_b,
           CAST((2*10000*pr.pair_count*nb.n + fa.c*fb.c)
                // (2*fa.c*fb.c) AS BIGINT) AS lift_bp
    FROM pr
    JOIN bf fa ON fa.l_partkey = pr.part_a
    JOIN bf fb ON fb.l_partkey = pr.part_b
    CROSS JOIN nb
    ORDER BY lift_bp DESC, part_a, part_b
    LIMIT {_BASKET_TOP}
    """,
    doc="Market-basket affinity (Agrawal association rules): parts "
    "co-ordered in the same order, ranked by lift "
    "P(ab)/(P(a)P(b)) = c_ab*n_baskets/(c_a*c_b) in half-up basis "
    f"points, with a support floor of {_BASKET_MIN_SUPPORT} baskets — "
    "the collocations shape transplanted from token adjacency to basket "
    "co-membership. Scale shape: the basket-item frame is ONE distinct "
    "shuffle of slim (orderkey, partkey) longs, eagerly checkpointed "
    "(three consumers: both sides of the pair join, part frequencies, "
    "the basket count); the within-basket self-join keys on orderkey so "
    "per-basket fan-out is items-per-order squared (bounded by basket "
    "size, NEVER catalog-squared); pair counts combine map-side; the "
    "part-frequency joins are UNHINTED (part vocabulary is row-scaled — "
    "AQE broadcasts locally, shuffles at scale); top-k is "
    "TakeOrderedAndProject. n_baskets rides as a driver literal (the "
    "sanctioned scalar-model pattern); all arithmetic exact int64 "
    "(2e4 * c_ab * n ~ 1.5e11 at sf0.1).",
)
def agg_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    bi = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_baskets = bi.select("l_orderkey").distinct().count()
    # int64 overflow guard (ADVICE r5): numerator 2·10⁴·pair_count·n with
    # pair_count ≤ n stays in int64 iff 2·10⁴·n² < 2⁶³ — fail loudly
    # instead of wrapping at larger scale factors.
    assert n_baskets <= 21_000_000, (
        f"agg_basket_affinity: {n_baskets} baskets would overflow the "
        "int64 basis-point lift — switch to DECIMAL or log-space lift"
    )
    a = bi.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = bi.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b")
    )
    pr = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .where(F.col("pair_count") >= _BASKET_MIN_SUPPORT)
    )
    bf = bi.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    fa = bf.select(F.col("l_partkey").alias("part_a"), F.col("c").alias("baskets_a"))
    fb = bf.select(F.col("l_partkey").alias("part_b"), F.col("c").alias("baskets_b"))
    lift = F.expr(
        f"CAST((2*10000*pair_count*{n_baskets} + baskets_a*baskets_b)"
        " div (2*baskets_a*baskets_b) AS BIGINT)"
    )
    return (
        pr.join(fa, "part_a")
        .join(fb, "part_b")
        .select(
            "part_a",
            "part_b",
            F.col("pair_count").cast("long").alias("pair_count"),
            "baskets_a",
            "baskets_b",
            lift.alias("lift_bp"),
        )
        .orderBy(F.col("lift_bp").desc(), "part_a", "part_b")
        .limit(_BASKET_TOP)
    )


# --- Sketch aggregates: HyperLogLog cardinality, histogram quantiles -------

_BP_SHIFT = 100_000  # positivity shift for signed half-up bp divisions


@register(
    "agg_hll_distinct",
    f"""
    WITH {SK.hll_oracle_cte("events", "event_type",
                            "CAST(user_id AS VARCHAR)")},
    ex AS (
      SELECT event_type AS g, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY 1
    )
    SELECT e.g AS event_type,
           CAST(e.hll_estimate AS BIGINT) AS hll_estimate,
           CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
           CAST((2*10000*(e.hll_estimate - ex.exact_distinct)
                   + ex.exact_distinct
                   + 2*ex.exact_distinct*{_BP_SHIFT})
                // (2*ex.exact_distinct) - {_BP_SHIFT}
                AS BIGINT) AS err_bp
    FROM hll_est e JOIN ex USING (g)
    ORDER BY event_type
    """,
    doc="HyperLogLog distinct-user estimate per event type (Flajolet et "
    "al. 2007), next to the exact COUNT(DISTINCT) with the signed error "
    "in basis points. The sketch pass shuffles at most m=32 register "
    "rows per group REGARDLESS of how many events stream through "
    "(max() combines map-side; registers are mergeable by elementwise "
    "max, so the same sketch composes across partitions, micro-batches "
    "or days) — where the exact side shuffles every distinct user. "
    "Everything is integer-exact: md5 bucketing, rho from the binary "
    "bit-length, and the harmonic mean as one scaled-integer division — "
    "no floating log/pow, so the DuckDB oracle matches bit-for-bit. "
    "The exact side rides along as the error baseline (CMS-estimate "
    "pattern); production keeps only the register frame. 32 registers "
    "suit the driver corpus's ~150-distinct groups; production p=14 "
    "(16384 registers, ~0.8 percent error) changes nothing structural.",
)
def agg_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    reg = SK.hll_registers(ev, "event_type", F.col("user_id").cast("string"))
    est = SK.hll_estimate(reg).withColumnRenamed("g", "event_type")
    ex = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    err = F.expr(
        f"CAST((2*10000*(hll_estimate - exact_distinct) + exact_distinct"
        f" + 2*exact_distinct*{_BP_SHIFT}) div (2*exact_distinct)"
        f" - {_BP_SHIFT} AS BIGINT)"
    )
    return (
        est.join(ex, "event_type")
        .select(
            "event_type",
            "hll_estimate",
            F.col("exact_distinct").cast("long").alias("exact_distinct"),
            err.alias("err_bp"),
        )
        .orderBy("event_type")
    )


_HIST_W = 100_000  # $1,000 histogram bins, in integer cents
_HIST_QS = (50, 90, 99)


@register(
    "agg_histogram_quantiles",
    f"""
    WITH v AS (
      SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
    ),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
    ks AS (
      SELECT q, (n.n * q + 99) // 100 AS k
      FROM (VALUES (50), (90), (99)) AS t(q), n
    ),
    hist AS (
      SELECT cents // {_HIST_W} AS bin, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM v GROUP BY 1
    ),
    hc AS (
      SELECT bin, cnt, SUM(cnt) OVER (ORDER BY bin) AS cum FROM hist
    ),
    est AS (
      SELECT ks.q AS quantile_pct,
             MIN(CASE WHEN hc.cum >= ks.k AND hc.cum - hc.cnt < ks.k
                      THEN hc.bin * {_HIST_W}
                           + ({_HIST_W} * (ks.k - (hc.cum - hc.cnt)))
                             // hc.cnt
                 END) AS est_cents
      FROM ks CROSS JOIN hc GROUP BY 1
    ),
    dv AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS c FROM v GROUP BY 1),
    dc AS (SELECT cents, SUM(c) OVER (ORDER BY cents) AS cumv FROM dv),
    ex AS (
      SELECT ks.q AS quantile_pct,
             MIN(CASE WHEN dc.cumv >= ks.k THEN dc.cents END) AS exact_cents
      FROM ks CROSS JOIN dc GROUP BY 1
    )
    SELECT est.quantile_pct,
           CAST(est.est_cents AS BIGINT) AS est_cents,
           CAST(ex.exact_cents AS BIGINT) AS exact_cents,
           CAST((2*10000*(est.est_cents - ex.exact_cents)
                   + ex.exact_cents + 2*ex.exact_cents*{_BP_SHIFT})
                // (2*ex.exact_cents) - {_BP_SHIFT} AS BIGINT) AS err_bp
    FROM est JOIN ex USING (quantile_pct)
    ORDER BY quantile_pct
    """,
    doc="Histogram-sketch quantiles (p50/p90/p99 of order value): a "
    f"fixed-width {_HIST_W}-cent histogram — the distribution sketch "
    "completing the CMS/HLL trio — recovers each quantile by cumulative "
    "bin counts + integer within-bin interpolation, reported next to the "
    "exact rank-k value with the signed error in basis points. Scale "
    "shape: the sketch side is ONE map-side-combined groupBy whose "
    "shuffle is bounded by the VALUE DOMAIN (range/width bins, ~500 "
    "here), then windows/aggregates over the bin frame only; the exact "
    "side (the error baseline, as in the CMS/HLL entries) pays the "
    "inherent global rank sort over distinct values — the cost gap the "
    "sketch exists to avoid. Rank k = ceil(n·q/100) with n from parquet "
    "footer stats (no job, the _scan_meta pattern); every step is "
    "integer `div` arithmetic, exact on both engines.",
)
def agg_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    n = _scan_meta(f"{sf_dir}/orders.parquet")[0]
    ks = {q: (n * q + 99) // 100 for q in _HIST_QS}
    od = _t(spark, sf_dir, "orders")
    v = od.select(
        F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long").alias("cents")
    )
    hist = SK.histogram_bins(v, "cents", _HIST_W)
    cum_w = W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.currentRow)
    hc = hist.withColumn("cum", F.sum("cnt").over(cum_w))
    est_wide = hc.agg(
        *[
            F.min(
                F.when(
                    (F.col("cum") >= k) & (F.col("cum") - F.col("cnt") < k),
                    F.col("bin") * _HIST_W
                    + F.expr(f"({_HIST_W} * ({k} - (cum - cnt))) div cnt"),
                )
            ).alias(f"e{q}")
            for q, k in ks.items()
        ]
    )
    est = est_wide.select(
        F.expr(
            "stack(3, "
            + ", ".join(f"{q}, e{q}" for q in _HIST_QS)
            + ") AS (quantile_pct, est_cents)"
        )
    )
    dv = v.groupBy("cents").agg(F.count(F.lit(1)).alias("c"))
    cumv_w = W.orderBy("cents").rowsBetween(W.unboundedPreceding, W.currentRow)
    dc = dv.withColumn("cumv", F.sum("c").over(cumv_w))
    ex_wide = dc.agg(
        *[
            F.min(F.when(F.col("cumv") >= k, F.col("cents"))).alias(f"x{q}")
            for q, k in ks.items()
        ]
    )
    ex = ex_wide.select(
        F.expr(
            "stack(3, "
            + ", ".join(f"{q}, x{q}" for q in _HIST_QS)
            + ") AS (quantile_pct, exact_cents)"
        )
    )
    err = F.expr(
        f"CAST((2*10000*(est_cents - exact_cents) + exact_cents"
        f" + 2*exact_cents*{_BP_SHIFT}) div (2*exact_cents)"
        f" - {_BP_SHIFT} AS BIGINT)"
    )
    return (
        est.join(ex, "quantile_pct")
        .select(
            F.col("quantile_pct").cast("long").alias("quantile_pct"),
            F.col("est_cents").cast("long").alias("est_cents"),
            F.col("exact_cents").cast("long").alias("exact_cents"),
            err.alias("err_bp"),
        )
        .orderBy("quantile_pct")
    )


@register(
    "q14_promo_revenue_share",
    """
    SELECT CAST(SUM(CASE WHEN p_type LIKE 'PROMO%' THEN rev ELSE 0 END)
                AS BIGINT) AS promo_revenue_micro,
           CAST(SUM(rev) AS BIGINT) AS total_revenue_micro,
           CAST(FLOOR(10000.0 * SUM(CASE WHEN p_type LIKE 'PROMO%' THEN rev
                                         ELSE 0 END)
                      / SUM(rev) + 0.5) AS BIGINT) AS promo_share_bp
    FROM (
      SELECT p.p_type,
             CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
             * (10000 - CAST(FLOOR(l.l_discount * 10000 + 0.5) AS BIGINT)) AS rev
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1996-07-01'
    )
    """,
    doc="Promotion revenue share (TPC-H q14 analogue): the filtered fact "
    "scan broadcast-joins the part dim, discounted revenue accumulates in "
    "exact integer micro-dollars, and the promo share lands in integer "
    "basis points — conditional aggregation with one broadcast join, no "
    "shuffle of the fact beyond the final single-row aggregate.",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    pa = _t(spark, sf_dir, "part")
    rev = (
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
        * (10000 - F.floor(F.col("l_discount") * 10000 + 0.5).cast("long"))
    )
    promo = F.when(F.col("p_type").startswith("PROMO"), F.col("rev")).otherwise(
        F.lit(0)
    )
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-07-01").cast("timestamp"))
        )
        # part is row-scaled (sf x 200k): stats-gated hint, AQE decides
        # above the ceiling
        .join(
            _bcast_if_small(pa, sf_dir, "part"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select("p_type", rev.alias("rev"))
        .agg(
            F.sum(promo).cast("long").alias("promo_revenue_micro"),
            F.sum("rev").cast("long").alias("total_revenue_micro"),
        )
        .select(
            "promo_revenue_micro",
            "total_revenue_micro",
            F.floor(
                10000.0 * F.col("promo_revenue_micro")
                / F.col("total_revenue_micro")
                + F.lit(0.5)
            )
            .cast("long")
            .alias("promo_share_bp"),
        )
    )


@register(
    "q10_returned_revenue_top",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)
                    * (10000 - CAST(FLOOR(l.l_discount * 10000 + 0.5) AS BIGINT)))
                AS BIGINT) AS lost_revenue_micro
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY 1, 2, 3
    ORDER BY lost_revenue_micro DESC, c_custkey
    LIMIT 20
    """,
    doc="Returned-item revenue report (TPC-H q10 analogue): which "
    "customers returned the most revenue. Fact filtered on returnflag, "
    "orders join resolves the customer, customer/nation dims broadcast, "
    "revenue in exact integer micro-dollars, distributed top-20 "
    "(TakeOrderedAndProject — no global sort of the aggregate). "
    "The one real shuffle is lineitem x orders on orderkey; everything "
    "smaller broadcasts.",
)
def q10_returned_revenue_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    od = _t(spark, sf_dir, "orders")
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    rev = (
        F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
        * (10000 - F.floor(F.col("l_discount") * 10000 + 0.5).cast("long"))
    )
    return (
        li.join(od, F.col("o_orderkey") == F.col("l_orderkey"))
        # customer is row-scaled (sf x 150k): hint only while catalog stats
        # say it fits; at scale AQE picks SMJ/shuffled-hash from runtime
        # sizes instead of a forced driver-OOM broadcast. nation is fixed
        # 25 rows at any sf — unconditional.
        .join(
            _bcast_if_small(cu, sf_dir, "customer"),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(F.broadcast(na), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(rev).cast("long").alias("lost_revenue_micro"))
        .orderBy(F.col("lost_revenue_micro").desc(), "c_custkey")
        .limit(20)
    )


# --- Aggregation: hash agg with partial (map-side) combine -----------------

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                               AS avg_price,
           ROUND(AVG(l_discount), 4)                                    AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1-style pricing summary: full-scan groupBy aggregate. "
    "Map-side partial aggregation + single shuffle on a low-cardinality key.",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "subquery_exists_late_ship",
    """
    SELECT o.o_orderpriority, COUNT(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= DATE '1995-01-01'
      AND o.o_orderdate < DATE '1995-07-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
    doc="Correlated EXISTS subquery (TPC-H Q4 shape, adapted to the "
    "available columns): orders in a window with at least one lineitem "
    "shipped after the order date, counted per priority. Catalyst rewrites "
    "the correlated EXISTS into a LEFT SEMI hash join on l_orderkey with "
    "the date comparison as the join residual — one shuffle keyed on "
    "orderkey, the date filter pushed into both scans; exactly the plan "
    "you'd hand-write, derived from the declarative form.",
)
def subquery_exists_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    return spark.sql(
        """
        SELECT o.o_orderpriority, COUNT(*) AS n_orders
        FROM v_orders o
        WHERE o.o_orderdate >= DATE '1995-01-01'
          AND o.o_orderdate < DATE '1995-07-01'
          AND EXISTS (
            SELECT 1 FROM v_lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
          )
        GROUP BY o.o_orderpriority
        ORDER BY o.o_orderpriority
        """
    )


@register(
    "subquery_scalar_small_qty",
    """
    SELECT p.p_brand,
           CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 2, 2) AS DOUBLE) AS avg_halfyear_revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#1', 'Brand#2')
      AND l.l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
    doc="Correlated SCALAR subquery (TPC-H Q17 shape): lineitems whose "
    "quantity is below half their part's average, revenue per brand. "
    "Catalyst de-correlates to a per-partkey average aggregate joined back "
    "on l_partkey — the subquery becomes one slim (partkey, avg) shuffle "
    "instead of a per-row re-scan, and the brand filter broadcasts the "
    "part side.",
)
def subquery_scalar_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("v_lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("v_part")
    return spark.sql(
        """
        SELECT p.p_brand,
               CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 2, 2) AS DOUBLE) AS avg_halfyear_revenue
        FROM v_lineitem l
        JOIN v_part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand IN ('Brand#1', 'Brand#2')
          AND l.l_quantity < (
            SELECT 0.5 * AVG(l2.l_quantity)
            FROM v_lineitem l2 WHERE l2.l_partkey = l.l_partkey
          )
        GROUP BY p.p_brand
        ORDER BY p.p_brand
        """
    )


# --- Distinct aggregates ----------------------------------------------------

@register(
    "agg_distinct",
    """
    SELECT o_orderpriority,
           COUNT(*)                    AS n_orders,
           COUNT(DISTINCT o_custkey)   AS n_customers,
           COUNT(DISTINCT o_orderstatus) AS n_statuses
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="COUNT(DISTINCT) expansion — Catalyst rewrites to two-phase "
    "partial/final aggregation (no driver-side distinct).",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    return (
        od.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
            F.countDistinct("o_orderstatus").alias("n_statuses"),
        )
        .orderBy("o_orderpriority")
    )


# --- Grouping sets / rollup -------------------------------------------------

@register(
    "agg_rollup",
    """
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           COUNT(*)                AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    ORDER BY region_name, nation_name
    """,
    doc="ROLLUP hierarchy totals — Expand + single aggregate, no re-scan per level.",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region")
    return (
        cu.join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
            "total_balance",
        )
        .orderBy("region_name", "nation_name")
    )


@register(
    "agg_grouping_sets",
    """
    SELECT COALESCE(l_returnflag, 'ALL')   AS returnflag,
           COALESCE(l_linestatus, 'ALL')   AS linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
                                           AS grouping_lvl,
           CAST(COUNT(*) AS BIGINT)        AS n_items,
           ROUND(SUM(l_quantity), 2)       AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    ORDER BY grouping_lvl, returnflag, linestatus
    """,
    doc="Explicit GROUPING SETS (detail, per-returnflag, grand total) with "
    "GROUPING() disambiguation of real-NULL vs subtotal rows — the "
    "irregular-lattice case CUBE/ROLLUP can't express. Same physical shape "
    "as CUBE: one Expand over the listed sets, one hash aggregate, one "
    "shuffle regardless of set count.",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("v_lineitem_gs")
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL')   AS returnflag,
               COALESCE(l_linestatus, 'ALL')   AS linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
                                               AS grouping_lvl,
               COUNT(*)                        AS n_items,
               ROUND(SUM(l_quantity), 2)       AS sum_qty
        FROM v_lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        ORDER BY grouping_lvl, returnflag, linestatus
        """
    )


# --- Window functions -------------------------------------------------------

@register(
    "window_lag_lead_delta",
    """
    SELECT event_id, user_id,
           ROUND(value, 2) AS value,
           ROUND(value - LAG(value)  OVER w, 2) AS delta_prev,
           ROUND(LEAD(value) OVER w - value, 2) AS delta_next,
           CAST(ROW_NUMBER() OVER w AS BIGINT)  AS seq_no
    FROM events
    WHERE user_id < 10
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, seq_no
    """,
    doc="LAG/LEAD offset analytics: per-user event-to-event value deltas "
    "plus a sequence number, deterministic tie-break on (ts, event_id). "
    "One shuffle on user_id then a single in-partition sort serves all "
    "three window functions (Catalyst collapses same-frame windows); the "
    "user_id<10 filter is pushed to the scan.",
)
def window_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.round("value", 2).alias("value"),
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta_prev"),
        F.round(F.lead("value").over(w) - F.col("value"), 2).alias("delta_next"),
        F.row_number().over(w).cast("long").alias("seq_no"),
    ).orderBy("user_id", "seq_no")


@register(
    "window_topk_per_group",
    """
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_name,
             ROUND(c_acctbal, 2) AS acctbal,
             RANK() OVER (PARTITION BY c_mktsegment
                          ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer
    ) WHERE rnk <= 5
    ORDER BY c_mktsegment, rnk
    """,
    doc="Top-k per group via RANK window — one shuffle on the partition key; "
    "at scale Spark applies WindowGroupLimit pushdown to keep only k rows per "
    "partition before the sort.",
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        cu.select(
            "c_mktsegment",
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.rank().over(w).alias("rnk"),
        )
        .where(F.col("rnk") <= 5)
        .orderBy("c_mktsegment", "rnk")
    )


@register(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           ROW_NUMBER() OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
    FROM orders
    WHERE o_custkey < 100
    ORDER BY o_custkey, order_seq
    """,
    doc="Running total + row_number — the same Window machinery the engine's "
    "sequencer (Q3/Q4) uses for per-key chains.",
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders").where(F.col("o_custkey") < 100)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        od.select(
            "o_custkey",
            "o_orderkey",
            F.round(
                F.sum("o_totalprice").over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
                2,
            ).alias("running_spend"),
            F.row_number().over(w).alias("order_seq"),
        )
        .orderBy("o_custkey", "order_seq")
    )


@register(
    "window_range_trailing",
    """
    WITH ev AS (
      SELECT event_id, user_id, value, epoch_us(ts) AS tus
      FROM events WHERE user_id < 10
    )
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_trailing_1h,
           ROUND(SUM(value) OVER w, 2) AS sum_trailing_1h
    FROM ev
    WINDOW w AS (PARTITION BY user_id ORDER BY tus
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
    doc="RANGE-frame window: per-user trailing-1-hour event count and value "
    "sum — the frame is bounded by event TIME (epoch micros), not row "
    "count, so it is the windowed form of 'rate over the last hour'. "
    "Distinct machinery from ROWS frames: Spark binds the frame by value "
    "range per row. One shuffle on user_id; linear scan per partition.",
)
def window_range_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("user_id") < 10)
        .select("event_id", "user_id", "value", F.unix_micros("ts").alias("tus"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("tus")
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_trailing_1h"),
    ).orderBy("user_id", "event_id")


@register(
    "ts_gapfill_resample",
    """
    WITH obs AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket_ts,
             FLOOR(AVG(value) * 10000.0 + 0.5) / 10000.0 AS avg_value,
             COUNT(*) AS n_events
      FROM events WHERE user_id < 50
      GROUP BY user_id, date_trunc('hour', ts)
    ),
    rng AS (SELECT user_id, MIN(bucket_ts) AS mn, MAX(bucket_ts) AS mx
            FROM obs GROUP BY user_id),
    grid AS (SELECT user_id,
                    unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket_ts
             FROM rng)
    SELECT g.user_id, g.bucket_ts,
           COALESCE(o.n_events, 0) AS n_events,
           LAST_VALUE(o.avg_value IGNORE NULLS) OVER (
             PARTITION BY g.user_id ORDER BY g.bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
           o.avg_value IS NULL AS is_gap
    FROM grid g LEFT JOIN obs o
      ON o.user_id = g.user_id AND o.bucket_ts = g.bucket_ts
    ORDER BY g.user_id, g.bucket_ts
    """,
    doc="Time-series gap-fill + resample: per-user hourly buckets over the "
    "user's own [first, last] range, empty buckets forward-filled with the "
    "last observed hourly average. The dense grid comes from sequence()+"
    "explode on per-user aggregates (distributed fan-out, no driver loop), "
    "the fill is one last(ignorenulls) running window — one shuffle on "
    "user_id for the window, one equi-join grid⋈obs on (user, bucket). "
    "Both keys are uniform at any scale; grid size is span/granularity per "
    "user, independent of event volume.",
)
def ts_gapfill_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.functions.numeric import round_half_up

    ev = _t(spark, sf_dir, "events").where(F.col("user_id") < 50)
    obs = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    ).agg(
        round_half_up(F.avg("value")).alias("avg_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("bucket_ts").alias("mn"), F.max("bucket_ts").alias("mx"))
        .select(
            "user_id",
            F.explode(
                F.sequence("mn", "mx", F.expr("interval 1 hour"))
            ).alias("bucket_ts"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, ["user_id", "bucket_ts"], "left")
        .select(
            "user_id",
            "bucket_ts",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.last("avg_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("avg_value").isNull().alias("is_gap"),
        )
        .orderBy("user_id", "bucket_ts")
    )


# --- Semi / anti joins ------------------------------------------------------

@register(
    "join_semi_anti",
    """
    WITH buyers AS (
      SELECT COUNT(*) AS n FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders)
    ), lurkers AS (
      SELECT COUNT(*) AS n FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    )
    SELECT buyers.n AS n_with_orders, lurkers.n AS n_without_orders
    FROM buyers, lurkers
    """,
    doc="SEMI/ANTI existence-check cardinalities in ONE pass: left join "
    "against the distinct'd key set, count matches and misses in the same "
    "aggregate — each table is scanned once and both answers come from one "
    "action (the naive two-count form scans customer and orders twice).",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer").select("c_custkey")
    ok = _t(spark, sf_dir, "orders").select("o_custkey").distinct()
    return (
        cu.join(ok, cu.c_custkey == ok.o_custkey, "left")
        .agg(
            F.count("o_custkey").alias("n_with_orders"),
            F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("_anti"),
        )
        .select(
            "n_with_orders", F.col("_anti").cast("long").alias("n_without_orders")
        )
    )


# --- Bucketed co-located join -----------------------------------------------

@register(
    "join_bucketed_colocated",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Big⋈big join via BUCKETED tables: both sides are written "
    "bucketBy(8, orderkey)+sortBy once, then the join plans as a "
    "SortMergeJoin over bare bucketed scans — NO Exchange, no Sort on "
    "either side (asserted in tests/test_bucketing.py). The "
    "pay-the-shuffle-once pattern for fact⋈fact keys reused across many "
    "queries at 100 TB. Results identical to the plain shuffle join, "
    "which is what the oracle runs.",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from kinesis_stream_consumer_spark.operators import bucketing as B

    base = tempfile.mkdtemp(prefix="ksc-bucketed-")
    B.write_bucketed(
        _t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        ),
        "ksc_orders_bucketed", "o_orderkey", 8, path=f"{base}/orders",
    )
    B.write_bucketed(
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o_orderkey"), "l_quantity"),
        "ksc_lineitem_bucketed", "o_orderkey", 8, path=f"{base}/lineitem",
    )
    return (
        B.colocated_join(
            spark, "ksc_orders_bucketed", "ksc_lineitem_bucketed", "o_orderkey"
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        )
        .orderBy("o_orderpriority")
    )


# --- Range (non-equi) join --------------------------------------------------

@register(
    "join_range_shiplag",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_late_lines,
           ROUND(AVG(CAST(EXTRACT(EPOCH FROM (l_shipdate - o_orderdate)) AS DOUBLE) / 86400.0), 2) AS avg_lag_days
    FROM orders JOIN lineitem
      ON l_orderkey = o_orderkey
     AND l_shipdate > o_orderdate + INTERVAL 90 DAY
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="Equi-join with a range residual (ship-lag > 90 days) — the equi key "
    "drives the shuffle; the range predicate is a post-join filter, never a "
    "cartesian product.",
)
def join_range_shiplag(spark: SparkSession, sf_dir: str) -> DataFrame:
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    lag_days = (
        F.col("l_shipdate").cast("timestamp").cast("double")
        - F.col("o_orderdate").cast("timestamp").cast("double")
    ) / 86400.0
    return (
        od.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_late_lines"),
            F.round(F.avg(lag_days), 2).alias("avg_lag_days"),
        )
        .orderBy("o_orderpriority")
    )


# --- Multi-format scans -------------------------------------------------------

@register(
    "scan_csv_json_roundtrip",
    """
    WITH agg AS (
      SELECT event_type, COUNT(*) AS n_events,
             ROUND(SUM(value), 2) AS sum_value,
             CAST(SUM(epoch_us(ts)) AS BIGINT) AS sum_ts_us
      FROM events GROUP BY event_type
    )
    SELECT f.fmt, a.* FROM agg a
    CROSS JOIN (SELECT unnest(['csv', 'jsonl']) AS fmt) f
    ORDER BY fmt, event_type
    """,
    doc="Source-format coverage: the events table is written out as CSV and "
    "as JSON-lines (timestamps as epoch micros, JSON props as an opaque "
    "quoted string), read back with EXPLICIT schemas (inference is a full "
    "extra pass — never at 100 TB), and aggregated per format. Identical "
    "results from both formats AND from the parquet oracle proves lossless "
    "decode across all three sources, including doubles and quoted JSON "
    "through CSV.",
)
def scan_csv_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from kinesis_stream_consumer_spark.sources import formats as FMT

    flat = _t(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    base = tempfile.mkdtemp(prefix="ksc-formats-")
    flat.write.mode("overwrite").option("header", "true").csv(f"{base}/csv")
    flat.write.mode("overwrite").json(f"{base}/jsonl")
    both = FMT.read_csv(spark, f"{base}/csv", FMT.EVENTS_FLAT_SCHEMA).withColumn(
        "fmt", F.lit("csv")
    ).unionByName(
        FMT.read_jsonl(spark, f"{base}/jsonl", FMT.EVENTS_FLAT_SCHEMA).withColumn(
            "fmt", F.lit("jsonl")
        )
    )
    return (
        both.groupBy("fmt", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.sum("ts_us").cast("long").alias("sum_ts_us"),
        )
        .orderBy("fmt", "event_type")
    )


# --- Skew-mitigated aggregation ----------------------------------------------

@register(
    "agg_salted_skew",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value,
           MAX(value) AS max_value
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="Salted two-phase aggregation over a LOW-CARDINALITY skewed key "
    "(event_type, 5 values): phase 1 groups by (key, salt) so the hot "
    "key's rows spread across 16 reducers, phase 2 merges ≤16 partials "
    "per key. Deterministic hash salt (not rand — retried tasks must salt "
    "identically). Results exactly equal the unsalted plan, which is what "
    "the oracle runs; combiners are explicit (sum/min/max) because "
    "non-decomposable aggregates must be expressed as parts.",
)
def agg_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators.skew import salted_agg

    ev = _t(spark, sf_dir, "events")
    out = salted_agg(
        ev.select("event_type", "value"),
        "event_type",
        {
            "n_events": (F.count(F.lit(1)), "sum"),
            "sum_value": (F.sum("value"), "sum"),
            "max_value": (F.max("value"), "max"),
        },
    )
    return out.select(
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
        "max_value",
    ).orderBy("event_type")


# --- Set operations ---------------------------------------------------------

@register(
    "setops_part_brands",
    """
    WITH big AS (SELECT DISTINCT p_brand FROM part WHERE p_size >= 30),
         cheap AS (SELECT DISTINCT p_brand FROM part WHERE p_retailprice < 1200)
    SELECT 'both' AS which, p_brand FROM (SELECT p_brand FROM big INTERSECT SELECT p_brand FROM cheap)
    UNION ALL
    SELECT 'big_only' AS which, p_brand FROM (SELECT p_brand FROM big EXCEPT SELECT p_brand FROM cheap)
    ORDER BY which, p_brand
    """,
    doc="INTERSECT / EXCEPT / UNION ALL — Catalyst plans set ops as "
    "semi/anti aggregates.",
)
def setops_part_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = _t(spark, sf_dir, "part")
    big = pa.where(F.col("p_size") >= 30).select("p_brand").distinct()
    cheap = pa.where(F.col("p_retailprice") < 1200).select("p_brand").distinct()
    both = big.intersect(cheap).select(F.lit("both").alias("which"), "p_brand")
    only = big.exceptAll(cheap).select(F.lit("big_only").alias("which"), "p_brand")
    return both.unionByName(only).orderBy("which", "p_brand")


# --- Scalar function surface ------------------------------------------------

@register(
    "scalar_functions",
    """
    SELECT p_partkey,
           UPPER(p_brand)                              AS brand_upper,
           SUBSTR(p_name, 1, 8)                        AS name_prefix,
           LENGTH(p_name)                              AS name_len,
           md5(p_name)                                 AS name_md5,
           ROUND(p_retailprice * 1.1, 2)               AS taxed_price,
           CAST(FLOOR(p_size / 10) AS INTEGER)         AS size_bucket,
           CASE WHEN p_size >= 25 THEN 'L' WHEN p_size >= 10 THEN 'M' ELSE 'S' END AS size_class
    FROM part
    WHERE p_partkey < 200
    ORDER BY p_partkey
    """,
    doc="String/math/hash scalar functions — all JVM-side whole-stage-codegen; "
    "md5 parity with the reference's identity fingerprints "
    "(reference kinesis-identify.js:135-137).",
)
def scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    pa = _t(spark, sf_dir, "part").where(F.col("p_partkey") < 200)
    return pa.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("taxed_price"),
        F.floor(F.col("p_size") / 10).cast("int").alias("size_bucket"),
        F.when(F.col("p_size") >= 25, "L")
        .when(F.col("p_size") >= 10, "M")
        .otherwise("S")
        .alias("size_class"),
    ).orderBy("p_partkey")


@register(
    "scalar_datetime_json",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    WHERE EXTRACT(hour FROM ts) BETWEEN 9 AND 17
    GROUP BY 1, 2
    ORDER BY day, event_type
    LIMIT 100
    """,
    doc="Datetime extraction + JSON path access over the events stream table — "
    "get_json_object stays JVM-side (no Python JSON parsing), mirroring the "
    "reference's schema-on-read messages (kinesis-processing.js:502-517).",
)
def scalar_datetime_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.where(F.hour("ts").between(9, 17))
        .groupBy(
            F.date_trunc("day", "ts").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
        )
        .orderBy("day", "event_type")
        .limit(100)
    )


# --- CUBE + grouping sets ---------------------------------------------------

@register(
    "agg_cube",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(COUNT(*) AS BIGINT)      AS n_items,
           ROUND(SUM(l_quantity), 2)     AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
    doc="CUBE over (returnflag, linestatus): all 2^2 grouping sets in one "
    "Expand + single hash aggregate — one scan, one shuffle, regardless of "
    "how many grouping sets (vs re-scanning per level).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n_items",
            "sum_qty",
        )
        .orderBy("returnflag", "linestatus")
    )


# --- Approximate distinct (HLL) ---------------------------------------------

@register(
    "agg_approx_distinct",
    """
    SELECT o_orderpriority,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_customers,
           CAST(COUNT(*) AS BIGINT)                  AS n_orders,
           TRUE                                      AS within_rsd
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="approx_count_distinct (HyperLogLog++) per order priority — the "
    "sketch merges map-side, constant memory per group: the 100 TB "
    "cardinality-estimation path where count_distinct's exact shuffle "
    "would dominate. Hash-checked via a deterministic envelope verdict: "
    "the HLL estimate must land within 2.5×rsd of the exact count (emitted "
    "as a boolean, exact side SQL-expressible), so the sketch's accuracy "
    "contract is what the oracle pins, not the engine-specific estimate.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ord_ = _t(spark, sf_dir, "orders")
    return (
        ord_.groupBy("o_orderpriority")
        .agg(
            F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx"),
            F.countDistinct("o_custkey").alias("exact_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_orderpriority",
            "exact_customers",
            "n_orders",
            (
                F.abs(F.col("approx") - F.col("exact_customers"))
                / F.col("exact_customers")
                <= 0.05
            ).alias("within_rsd"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_approx_percentile",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 2) AS exact_p50,
           ROUND(quantile_cont(value, 0.99), 2) AS exact_p99,
           TRUE AS p50_within_5pct,
           TRUE AS p99_within_5pct
    FROM events GROUP BY event_type ORDER BY event_type
    """,
    doc="approx_percentile (t-digest-style sketch) per event_type — "
    "constant memory per group, merges map-side: the 100 TB quantile path "
    "where an exact percentile needs a per-group sort. Hash-checked via "
    "the same envelope pattern as agg_approx_distinct: the approximate "
    "p50/p99 must land within 5% relative of DuckDB's exact "
    "quantile_cont, emitted as booleans; the sketch's accuracy contract "
    "is what the oracle pins, not the engine-specific estimate.",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def within(approx, exact):
        return (F.abs(approx - exact) / F.abs(exact) <= 0.05) | (
            F.abs(approx - exact) <= 0.01
        )

    agg = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("a50"),
        F.percentile_approx("value", 0.99, 10000).alias("a99"),
        F.expr("percentile(value, 0.5)").alias("e50"),
        F.expr("percentile(value, 0.99)").alias("e99"),
    )
    return agg.select(
        "event_type",
        F.round("e50", 2).alias("exact_p50"),
        F.round("e99", 2).alias("exact_p99"),
        within(F.col("a50"), F.col("e50")).alias("p50_within_5pct"),
        within(F.col("a99"), F.col("e99")).alias("p99_within_5pct"),
    ).orderBy("event_type")


# --- As-of join (merge-asof) ------------------------------------------------

@register(
    "join_asof_prior_signup",
    """
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    signups AS (
      SELECT user_id, ts, MAX(event_id) AS signup_event_id
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id,
           s.signup_event_id AS asof_signup_event_id,
           CAST(CASE WHEN s.signup_event_id IS NULL THEN NULL
                ELSE (epoch_us(CAST(p.ts AS TIMESTAMP)) - epoch_us(CAST(s.ts AS TIMESTAMP)))
                     // 1000000 END AS BIGINT) AS gap_s
    FROM purchases p
    ASOF LEFT JOIN signups s ON p.user_id = s.user_id AND p.ts >= s.ts
    ORDER BY p.event_id
    """,
    doc="Merge-as-of join: each purchase enriched with the user's most "
    "recent prior signup (inclusive). Spark has no ASOF JOIN; implemented "
    "as the union-window carry-forward (operators/joins.py): one shuffle "
    "on user_id, last(ignoreNulls) over (time, side) ordering — linear per "
    "partition, no range-join candidate pairs. Oracle: DuckDB native "
    "ASOF LEFT JOIN.",
)
def join_asof_prior_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators.joins import merge_asof

    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("signup_event_id"))
    )
    joined = merge_asof(
        purchases,
        signups,
        key="user_id",
        left_time="ts",
        right_time="ts",
        right_cols=["signup_event_id", "ts"],
    )
    gap = (
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_ts")))
        / F.lit(1000000)
    ).cast("bigint")
    return joined.select(
        "event_id",
        "user_id",
        "asof_signup_event_id",
        F.when(F.col("asof_signup_event_id").isNotNull(), gap).alias("gap_s"),
    ).orderBy("event_id")


# --- Pandas UDAF surface (vectorized grouped aggregation) -------------------

@register(
    "udaf_weighted_avg",
    """
    SELECT l_returnflag,
           ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4)
             AS weighted_avg_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="User-defined aggregate via Arrow-batched grouped-agg pandas_udf — "
    "the engine's UDAF surface (reference analogue: processAll aggregation "
    "over a batch, X2). Arrow transfers whole column batches; the numpy "
    "body is vectorized. For scale: grouped-agg pandas UDFs don't do "
    "partial aggregation, so the shuffle carries raw rows — prefer "
    "built-ins when expressible (q1); this query exists to pin the "
    "UDAF path itself.",
)
def udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit functionType: `from __future__ import annotations` stringifies
    # type hints, so signature inference can't classify this as GROUPED_AGG
    @pandas_udf("double", PandasUDFType.GROUPED_AGG)
    def weighted_avg(price, qty):
        return float((price * qty).sum() / qty.sum())

    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                weighted_avg(F.col("l_extendedprice"), F.col("l_quantity")), 4
            ).alias("weighted_avg_price")
        )
        .orderBy("l_returnflag")
    )


# --- Pivot (wide aggregation) -----------------------------------------------

@register(
    "agg_pivot",
    """
    SELECT CAST(user_id % 10 AS BIGINT) AS user_bucket,
           CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events
    GROUP BY 1
    ORDER BY user_bucket
    """,
    doc="Pivot: long→wide event-type counts per user bucket via "
    "groupBy().pivot(values=[…]).count(). Supplying the pivot values "
    "explicitly matters at scale: without them Spark runs an extra "
    "distinct scan just to discover the columns.",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    pivoted = (
        ev.withColumn("user_bucket", (F.col("user_id") % 10).cast("long"))
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
    )
    return pivoted.select(
        "user_bucket",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("long").alias(c)
            for c in ("click", "error", "purchase", "signup", "view")
        ],
    ).orderBy("user_bucket")


# --- Percentiles + argmax aggregates ----------------------------------------

@register(
    "agg_percentiles",
    """
    SELECT l_returnflag,
           ROUND(quantile_cont(l_extendedprice, 0.5), 4)  AS median_price,
           ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
           ROUND(MAX(l_extendedprice), 2)                 AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    doc="Exact interpolated percentiles (SQL percentile_cont semantics on "
    "both engines). Exact percentiles sort per group; at 100 TB swap in "
    "approx_percentile (t-digest, mergeable map-side) when ±ε is "
    "acceptable — same query shape.",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_extendedprice", F.lit(0.5)), 4).alias(
                "median_price"
            ),
            F.round(F.percentile("l_extendedprice", F.lit(0.95)), 4).alias(
                "p95_price"
            ),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_argmax",
    """
    SELECT r_name,
           arg_max(n_name, nation_balance) AS richest_nation,
           ROUND(MAX(nation_balance), 2)   AS top_balance
    FROM (
      SELECT r_name, n_name, SUM(c_acctbal) AS nation_balance
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
    )
    GROUP BY r_name
    ORDER BY r_name
    """,
    doc="max_by / arg_max: the value of one column at another's maximum — "
    "avoids the join-back-to-max anti-pattern (two scans + a shuffle) with "
    "a single mergeable aggregate.",
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = _t(spark, sf_dir, "customer")
    na = _t(spark, sf_dir, "nation")
    re = _t(spark, sf_dir, "region")
    nation_bal = (
        cu.join(F.broadcast(na), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(re), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum("c_acctbal").alias("nation_balance"))
    )
    return (
        nation_bal.groupBy("r_name")
        .agg(
            F.max_by("n_name", "nation_balance").alias("richest_nation"),
            F.round(F.max("nation_balance"), 2).alias("top_balance"),
        )
        .orderBy("r_name")
    )
