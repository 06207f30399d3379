"""Property test: the window identity behind events_cusum_drift.

The registered query computes Page's CUSUM S_t = max(0, S_{t-1} + d_t)
NOT by recursion (window functions can't) but by the prefix-sum identity
S_t = P_t - min(0, min_{i<=t} P_i). The oracle-parity test pins Spark
against DuckDB computing the SAME identity — this test pins the identity
itself against the textbook recursion, on arbitrary integer series."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _recursive(ds: list[int]) -> list[int]:
    s, out = 0, []
    for d in ds:
        s = max(0, s + d)
        out.append(s)
    return out


def _window_identity(ds: list[int]) -> list[int]:
    out, pfx, mn = [], 0, 0
    for d in ds:
        pfx += d
        mn = min(mn, pfx)
        out.append(pfx - min(mn, 0))
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), max_size=200))
def test_cusum_prefix_identity_equals_recursion(ds):
    assert _window_identity(ds) == _recursive(ds)


def test_streaming_cusum_matches_batch(spark, tmp_path):
    """The applyInPandasWithState CUSUM keeper (state = 2 longs/user)
    over time-sliced micro-batches emits exactly the batch query's
    per-event CUSUM values for the same fixed reference level."""
    from pyspark.sql import functions as F

    from kinesis_stream_consumer_spark.streaming.stateful import (
        streaming_cusum,
    )
    from tests.conftest import SF_SMOKE

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    base = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"),
        F.expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").alias("cents"),
    ).withColumn(
        "ku",
        F.expr(
            "(2 * SUM(cents) OVER (PARTITION BY user_id)"
            " + COUNT(*) OVER (PARTITION BY user_id))"
            " div (2 * COUNT(*) OVER (PARTITION BY user_id))"
        ),
    )
    base = base.localCheckpoint(eager=True)
    cuts = base.selectExpr(
        "percentile_approx(us, 0.34) AS c1", "percentile_approx(us, 0.67) AS c2"
    ).collect()[0]
    slices = [
        base.where(F.col("us") <= cuts.c1),
        base.where((F.col("us") > cuts.c1) & (F.col("us") <= cuts.c2)),
        base.where(F.col("us") > cuts.c2),
    ]
    for s in slices:  # sequential writes => increasing mtimes => in-order
        s.coalesce(1).write.mode("append").json(str(tmp_path / "in"))
    stream = (
        spark.readStream.schema(
            "user_id bigint, event_id bigint, us bigint, cents bigint,"
            " ku bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    q = (
        streaming_cusum(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("cusum_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.user_id, r.event_id): r.cusum_cents
        for r in spark.sql("SELECT * FROM cusum_stream").collect()
    }
    # batch twin: the registered query's stacked-window identity with the
    # SAME per-user k, unfiltered (no alarm threshold)
    from pyspark.sql.window import Window as W

    w_run = (
        W.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    batch = (
        base.withColumn(
            "pfx", F.sum(F.col("cents") - F.col("ku")).over(w_run)
        )
        .withColumn(
            "cusum",
            F.col("pfx") - F.least(F.min("pfx").over(w_run), F.lit(0)),
        )
        .select("user_id", "event_id", "cusum")
    )
    expected = {
        (r.user_id, r.event_id): r.cusum for r in batch.collect()
    }
    assert streamed == expected
