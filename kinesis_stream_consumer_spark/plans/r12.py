"""Round-12 queries: new operators land here so they register inside the
driver's first-50 CORRECTNESS window (registration order = import order in
plans/queries.py; this module is imported right after llm_pipeline).

Opens with the three ADVICE-r11 blocks moved in from the (now parked)
plans/r11.py with their fixes — an edited block must re-enter the window:

- scan_parquet_codec_roundtrip: the timestamp fingerprint summed RAW epoch
  micros, which overflows int64 at sf0.1 (~3.4e19 per major type vs 9.2e18
  max — ANSI ARITHMETIC_OVERFLOW on Spark, HUGEINT->BIGINT cast error on
  DuckDB). Now sums offsets from the corpus min and ASSERTS capacity.
- graph_modularity: the int64 capacity assert understated the real
  requirement ~5x (the positivity-shift term 2*4m^2*_MOD_SHIFT = 3.2e7*m^2
  dominates the 8e6*m^2 the assert modeled). Tightened to the derived
  worst-case coefficient.
- events_conversion_horizon: the corpus-max driver literal now takes the
  empty-frame guard its sibling blocks already had (int(None) raised).

Certified blocks migrate out of the window at the NEXT round's fold by
moving this module's import to the parked-last section (the r10/r11
pattern) — never edit a block after its round's CORRECTNESS file is
recorded without re-entering the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.plans.graph_shared import (
    _COEDGES_SQL,
    _LPA_ROUNDS,
    _co_edges,
    _lpa_round_sql,
)
from kinesis_stream_consumer_spark.plans.queries import (
    _t,
    register,
)

# --- r12: parquet codec roundtrip (scan-matrix leg; ADVICE-r11 overflow fix) --

_CODEC_CACHE: dict = {}


@register(
    "scan_parquet_codec_roundtrip",
    """
    WITH mn AS (SELECT MIN(epoch_us(ts)) AS mn FROM events),
    agg AS (
      SELECT event_type, COUNT(*) AS n_events,
             SUM(epoch_us(ts) - mn.mn) AS sum_ts_off, SUM(user_id) AS sum_user
      FROM events CROSS JOIN mn GROUP BY 1
    )
    SELECT codec, event_type,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(sum_ts_off AS BIGINT) AS sum_ts_off,
           CAST(sum_user AS BIGINT) AS sum_user
    FROM agg CROSS JOIN (SELECT unnest(['gzip', 'zstd']) AS codec) c
    ORDER BY codec, event_type
    """,
    doc="Parquet compression-codec roundtrip, completing the scan matrix "
    "alongside the ORC/CSV/JSONL/schema-evolution legs: the events table "
    "is written once with gzip and once with zstd (the two codecs a "
    "100 TB lake actually debates — zstd ~2x faster decode at parity "
    "ratio, the default recommendation since Spark 3.2) and both copies "
    "are read back and aggregated; equality against the ORIGINAL-table "
    "oracle proves lossless roundtrip of timestamps and longs through "
    "each codec path. The timestamp fingerprint sums OFFSETS from the "
    "corpus min (ADVICE r11: raw epoch-micro sums overflow int64 at "
    "sf0.1 — ~3.4e19 vs the 9.2e18 limit), and int64 capacity for both "
    "fingerprints is ASSERTED from the same one-row aggregate that "
    "yields the min ('asserted, not narrated'). The written files keep "
    "absolute micros — only the fingerprint is offset-based. Scratch "
    "layouts live under the session temp root (removed at exit). Codec "
    "choice is a pure storage-layer concern — pushdown/pruning claims "
    "carry over unchanged, which is exactly what this pins.",
)
def scan_parquet_codec_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    ev = _t(spark, sf_dir, "events")
    # One column-pruned one-row aggregate -> driver literals (k-means-model
    # pattern): the fingerprint's anchor AND its capacity proof.
    stats = ev.agg(
        F.min(F.unix_micros("ts")).alias("mn"),
        F.max(F.unix_micros("ts")).alias("mx"),
        F.max(F.abs(F.col("user_id"))).alias("mu"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    mn = int(stats["mn"] or 0)
    mx = int(stats["mx"] or 0)
    mu = int(stats["mu"] or 0)
    n = int(stats["n"])
    # Worst case per-type sum <= n * max term (conservative: all rows in
    # one type at the extreme value).
    assert (mx - mn) * n < 2**63, (
        "codec-roundtrip ts fingerprint would overflow int64 — widen the "
        "offset base (e.g. per-type min) or sum at coarser granularity"
    )
    assert mu * n < 2**63, (
        "codec-roundtrip user_id fingerprint would overflow int64"
    )
    # write once per (session, sf) — the _JSON_EVO_CACHE discipline; every
    # gate test that materializes this query reuses the same layout
    key = (spark.sparkContext.applicationId, sf_dir)
    base = _CODEC_CACHE.get(key)
    if base is None:
        flat = ev.select(
            "event_id",
            F.unix_micros("ts").alias("ts_us"),
            "user_id",
            "event_type",
        )
        base = tempfile.mkdtemp(prefix="ksc-codec-")
        for codec in ("gzip", "zstd"):
            flat.write.mode("overwrite").option("compression", codec).parquet(
                f"{base}/{codec}"
            )
        _CODEC_CACHE[key] = base
    outs = []
    for codec in ("gzip", "zstd"):
        back = spark.read.parquet(f"{base}/{codec}")
        outs.append(
            back.groupBy("event_type").agg(
                F.count(F.lit(1)).cast("long").alias("n_events"),
                F.sum(F.col("ts_us") - F.lit(mn)).cast("long").alias(
                    "sum_ts_off"
                ),
                F.sum("user_id").cast("long").alias("sum_user"),
            ).select(F.lit(codec).alias("codec"), "*")
        )
    return outs[0].unionAll(outs[1]).orderBy("codec", "event_type")


# --- r12: modularity of the LPA partition (ADVICE-r11 assert fix) -------------

# Positivity shift for the signed per-community modularity contribution
# (|contribution_micro| <= 1e6 by definition, so 4e6 dominates).
_MOD_SHIFT = 4_000_000

# Worst-case int64 coefficient of m^2 in the modularity numerator
# (ADVICE r11: the old 8e6*m^2 assert understated the real requirement ~5x):
#   shift term   2 * (4m^2) * _MOD_SHIFT           = 3.2e7 * m^2
#   signed term  |2e6 * (4m*m_c - d_c^2)| <= 2e6*4m^2 = 8e6 * m^2
#   half-up term 4m^2                               =    4 * m^2
_MOD_COEFF = 8 * _MOD_SHIFT + 8_000_000 + 4  # 40_000_004


@register(
    "graph_modularity",
    f"""
    WITH {_COEDGES_SQL},
    bidir AS (
      SELECT u AS s, v AS d FROM edges
      UNION ALL SELECT v, u FROM edges
    ),
    l0 AS (SELECT DISTINCT s AS node, s AS label FROM bidir),
    {",".join(_lpa_round_sql(i).lstrip() for i in range(1, _LPA_ROUNDS + 1))},
    m AS (SELECT COUNT(*) AS m FROM edges),
    deg AS (SELECT s AS node, COUNT(*) AS d FROM bidir GROUP BY 1),
    intra AS (
      SELECT la.label, COUNT(*) AS m_c
      FROM edges e
      JOIN l{_LPA_ROUNDS} la ON la.node = e.u
      JOIN l{_LPA_ROUNDS} lb ON lb.node = e.v
      WHERE la.label = lb.label
      GROUP BY 1
    ),
    comm AS (
      SELECT l.label, COUNT(*) AS n_nodes, SUM(deg.d) AS d_c
      FROM l{_LPA_ROUNDS} l JOIN deg ON deg.node = l.node
      GROUP BY 1
    )
    SELECT CAST(c.label AS BIGINT) AS community,
           CAST(c.n_nodes AS BIGINT) AS n_nodes,
           CAST(COALESCE(i.m_c, 0) AS BIGINT) AS intra_edges,
           CAST(c.d_c AS BIGINT) AS degree_sum,
           CAST((2000000 * (4 * m.m * COALESCE(i.m_c, 0) - c.d_c * c.d_c)
                 + 4 * m.m * m.m
                 + 2 * (4 * m.m * m.m) * {_MOD_SHIFT})
                // (2 * (4 * m.m * m.m)) - {_MOD_SHIFT}
             AS BIGINT) AS contribution_micro
    FROM comm c LEFT JOIN intra i ON i.label = c.label CROSS JOIN m
    ORDER BY n_nodes DESC, community LIMIT 10
    """,
    doc="Newman modularity of the LPA communities over the co-purchase "
    "graph, per community: contribution_c = m_c/m − (D_c/2m)² in exact "
    "half-up integer MICRO-units — the quality score that says whether "
    "the label-propagation partition found real structure (Σ "
    "contributions = Q; random partitions sit near 0). Pairs with "
    "graph_label_propagation the way the recall evals pair with their "
    "indexes: the partition op reports membership, this one scores it. "
    "Signed numerator 4m·m_c − D_c² takes the positivity shift so "
    "DuckDB's floor and Spark's truncate agree; int64 capacity is "
    "ASSERTED from the edge count the plan already pulls as a driver "
    "literal, with the coefficient DERIVED from the expression's actual "
    "worst-case term (~4.0e7·m² < 2^63 ⟹ m < ~4.8e5 edges; ADVICE r11 "
    "caught the old 8e6·m² assert understating this ~5x) — beyond it, "
    "rerun with the double objective. Labels ride the SAME unrolled-"
    "round oracle fragment as graph_label_propagation (plans/"
    "graph_shared.py); the Spark side reuses the session-cached edge "
    "checkpoint and the label_propagation operator, adds two label-"
    "keyed joins and community-bounded aggregates — nothing new is "
    "corpus-scaled.",
)
def graph_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.operators.graph import (
        label_propagation,
    )

    edges = _co_edges(spark, sf_dir)
    m = edges.count()  # checkpointed frame: a cheap driver literal
    assert _MOD_COEFF * m * m < 2**63, (
        "modularity micro-unit arithmetic supports < ~4.8e5 edges — rerun "
        "with the double objective"
    )
    labels = label_propagation(edges, rounds=_LPA_ROUNDS).localCheckpoint(
        eager=True
    )  # node-bounded; read 3x below
    deg = (
        edges.select(F.col("u").alias("node"))
        .unionAll(edges.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    la = labels.select(F.col("node").alias("u"), F.col("label").alias("lu"))
    lb = labels.select(F.col("node").alias("v"), F.col("label").alias("lv"))
    intra = (
        edges.join(la, "u")
        .join(lb, "v")
        .where(F.col("lu") == F.col("lv"))
        .groupBy(F.col("lu").alias("label"))
        .agg(F.count(F.lit(1)).alias("m_c"))
    )
    comm = (
        labels.join(deg, "node")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_nodes"), F.sum("d").alias("d_c"))
    )
    four_m2 = 4 * m * m
    return (
        comm.join(intra, "label", "left")
        .select(
            F.col("label").cast("long").alias("community"),
            F.col("n_nodes").cast("long").alias("n_nodes"),
            F.coalesce(F.col("m_c"), F.lit(0)).cast("long").alias("intra_edges"),
            F.col("d_c").cast("long").alias("degree_sum"),
            F.expr(
                f"(CAST(2000000 AS BIGINT)"
                f" * (4 * CAST({m} AS BIGINT) * coalesce(m_c, 0) - d_c * d_c)"
                f" + CAST({four_m2} AS BIGINT)"
                f" + 2 * CAST({four_m2} AS BIGINT) * {_MOD_SHIFT})"
                f" div (2 * CAST({four_m2} AS BIGINT)) - {_MOD_SHIFT}"
            )
            .cast("long")
            .alias("contribution_micro"),
        )
        .orderBy(F.col("n_nodes").desc(), "community")
        .limit(10)
    )


# --- r12: censoring-aware conversion horizons (ADVICE-r11 empty guard) --------


@register(
    "events_conversion_horizon",
    """
    WITH mx AS (SELECT MAX(ts) AS mts FROM events),
    su AS (
      SELECT user_id, MIN(ts) AS s FROM events
      WHERE event_type = 'signup' GROUP BY 1
    ),
    conv AS (
      SELECT su.user_id, MIN(epoch_us(e.ts) - epoch_us(su.s)) AS lat_us
      FROM su JOIN events e
        ON e.user_id = su.user_id AND e.event_type = 'purchase'
           AND e.ts >= su.s
      GROUP BY 1
    ),
    base AS (
      SELECT su.user_id,
             epoch_us(mx.mts) - epoch_us(su.s) AS obs_us,
             c.lat_us
      FROM su CROSS JOIN mx LEFT JOIN conv c ON c.user_id = su.user_id
    ),
    h AS (SELECT unnest([7, 14, 30]) AS horizon_days)
    SELECT CAST(h.horizon_days AS BIGINT) AS horizon_days,
           CAST(COUNT(*) AS BIGINT) AS n_eligible,
           CAST(SUM(CASE WHEN b.lat_us IS NOT NULL
                          AND b.lat_us <= h.horizon_days * 86400000000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           CAST((20000 * SUM(CASE WHEN b.lat_us IS NOT NULL
                          AND b.lat_us <= h.horizon_days * 86400000000
                         THEN 1 ELSE 0 END) + COUNT(*))
                // (2 * COUNT(*)) AS BIGINT) AS conversion_bp
    FROM base b CROSS JOIN h
    WHERE b.obs_us >= h.horizon_days * 86400000000
    GROUP BY 1 ORDER BY 1
    """,
    doc="Censoring-aware conversion rate by horizon: share of signups "
    "that purchase within 7/14/30 days, counting ONLY users whose "
    "observation window (first signup → corpus max event time) covers "
    "the horizon — the right-censoring denominator discipline a naive "
    "conversion rate gets wrong (recent signups can't have converted "
    "within 30 days yet and must leave the denominator, not count as "
    "failures; the fixed-horizon slice of a Kaplan-Meier survival "
    "curve, computed in exact integer microseconds with no float "
    "product chain). Complements events_latency_between_types (median "
    "latency among converters) with the population-level rate. The "
    "corpus max timestamp is one column-pruned agg pulled as a driver "
    "literal (k-means-model pattern) with the sibling blocks' empty-"
    "frame guard (ADVICE r11: int(None) raised on an empty corpus); "
    "user frames are user-keyed aggregates; the horizon fan-out is a "
    "3-element literal explode.",
)
def events_conversion_horizon(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    mts = ev.agg(F.max(F.unix_micros("ts")).alias("m")).first()["m"]
    su = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s"))
    )
    pu = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    conv = (
        su.join(pu, "user_id")
        .where(F.col("ts") >= F.col("s"))
        .select(
            "user_id",
            (F.unix_micros("ts") - F.unix_micros("s")).alias("lat"),
        )
        .groupBy("user_id")
        .agg(F.min("lat").alias("lat_us"))
    )
    base = (
        su.select(
            "user_id",
            (F.lit(int(mts or 0)) - F.unix_micros("s")).alias("obs_us"),
        )
        .join(conv, "user_id", "left")
    )
    day_us = 86400000000
    fan = base.select(
        "obs_us",
        "lat_us",
        F.explode(F.array(*[F.lit(h) for h in (7, 14, 30)])).alias(
            "horizon_days"
        ),
    ).where(F.col("obs_us") >= F.col("horizon_days") * day_us)
    hit = F.when(
        F.col("lat_us").isNotNull()
        & (F.col("lat_us") <= F.col("horizon_days") * day_us),
        1,
    ).otherwise(0)
    return (
        fan.groupBy("horizon_days")
        .agg(F.count(F.lit(1)).alias("ne"), F.sum(hit).alias("nc"))
        .select(
            F.col("horizon_days").cast("long").alias("horizon_days"),
            F.col("ne").cast("long").alias("n_eligible"),
            F.col("nc").cast("long").alias("n_converted"),
            F.expr("(20000 * nc + ne) div (2 * ne)")
            .cast("long")
            .alias("conversion_bp"),
        )
        .orderBy("horizon_days")
    )
