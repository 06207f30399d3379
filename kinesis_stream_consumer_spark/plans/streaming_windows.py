"""Streaming time-window queries (SURVEY §2.2 'streaming watermarks /
tumbling / session windows' row).

The reference has NO time-windowed operators — its notion of "late data" is
a replayed batch, handled by state-revive idempotency (D1/T2). The Spark
engine exposes the Structured Streaming windowing surface over the same
event model; these queries pin the semantics in batch mode (identical
window assignment code path), with `withWatermark` applied exactly as the
streaming job would — a no-op in batch, a state-eviction bound in
streaming.

Scale notes: window aggregation is a single hash-shuffle on
(window, keys); session windows shuffle on user then merge per-group —
both map-side-combine friendly. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.plans.queries import _t, register

_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@register(
    "streaming_tumbling_window",
    f"""
    SELECT strftime(time_bucket(INTERVAL 1 HOUR, ts), '{_TS_FMT_DUCK}') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="Tumbling 1-hour event-time windows per event_type — "
    "`window(ts, '1 hour')` + groupBy, with a 10-minute watermark exactly "
    "as the streaming variant would set it (state eviction bound; no-op in "
    "batch). One hash-shuffle on (window, event_type), partial aggregation "
    "map-side.",
)
def streaming_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withWatermark("ts", "10 minutes")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "streaming_session_window",
    f"""
    WITH marked AS (
      SELECT user_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    sessions AS (
      SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS session_no
      FROM marked
    )
    SELECT user_id,
           strftime(MIN(ts), '{_TS_FMT_DUCK}') AS session_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM sessions
    GROUP BY user_id, session_no
    ORDER BY user_id, session_start
    """,
    doc="Session windows (30-minute inactivity gap) per user — "
    "`session_window(ts, '30 minutes')`. In streaming this is the stateful "
    "session-merge operator with watermark eviction; the oracle reproduces "
    "the gap semantics via lag + cumulative-sum session numbering. Session "
    "start (not gap-extended end) is compared so both engines agree "
    "exactly.",
)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withWatermark("ts", "10 minutes")
    return (
        ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", _TS_FMT_SPARK).alias("session_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("user_id", "session_start")
    )


@register(
    "streaming_sliding_window",
    f"""
    WITH buckets AS (
      SELECT time_bucket(INTERVAL 30 MINUTE, ts) AS tb, event_type, value FROM events
    ),
    expanded AS (
      SELECT unnest([tb, tb - INTERVAL 30 MINUTE]) AS window_start, event_type, value
      FROM buckets
    )
    SELECT strftime(window_start, '{_TS_FMT_DUCK}') AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM expanded
    GROUP BY 1, 2
    ORDER BY window_start, event_type
    """,
    doc="Sliding windows (1h length, 30m slide): every event lands in 2 "
    "overlapping windows — Spark expands via the window() generator before "
    "one hash aggregation. Oracle reproduces the expansion with "
    "unnest([bucket, bucket − slide]). At scale the fan-out factor is "
    "length/slide; partial aggregation still combines map-side.",
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withWatermark("ts", "10 minutes")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format("w.start", _TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "streaming_stream_join",
    """
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    views AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    )
    SELECT c.user_id,
           COUNT(*) AS n_attributions,
           CAST(COUNT(DISTINCT c.event_id) AS BIGINT) AS n_attributed_clicks
    FROM clicks c JOIN views v
      ON v.user_id = c.user_id
     AND v.ts <= c.ts AND c.ts < v.ts + INTERVAL 30 MINUTE
    GROUP BY c.user_id ORDER BY c.user_id
    """,
    doc="Stream-stream interval join (view→click attribution within 30 "
    "minutes): both sides carry watermarks and the join condition bounds "
    "event time, which is exactly what lets Structured Streaming evict "
    "buffered state — an UNBOUNDED stream-stream join is impossible at "
    "scale; the interval bound makes state O(watermark × rate). Equi-key "
    "user_id drives the shuffle; the time bound is the residual. The same "
    "plan runs genuinely streaming in "
    "tests/test_streaming_extra.py::test_stream_stream_interval_join.",
)
def streaming_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "10 minutes")
    )
    views = (
        ev.where(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "10 minutes")
    )
    joined = clicks.join(
        views,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("click_ts") < F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    return (
        joined.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_attributions"),
            F.countDistinct("click_id").alias("n_attributed_clicks"),
        )
        .orderBy("user_id")
    )
