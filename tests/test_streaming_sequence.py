"""Streaming twin of the sequential-pattern miner: the bounded-state
applyInPandasWithState bigram keeper over time-sliced micro-batches must
emit EXACTLY the batch window query's contiguous bigrams — occurrences,
support, and per-event identity — including across batch boundaries
(the state hand-off is the whole point) and NULL-type chain advancement."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_streaming_bigrams_match_batch_window(spark, tmp_path):
    from kinesis_stream_consumer_spark.streaming.stateful import (
        streaming_sequence_bigrams,
    )

    # Force multi-chunk groups: with a tiny Arrow batch size, any user
    # with >3 events in a micro-batch arrives as MULTIPLE pdfs, pinning
    # the concat-before-sort path (r12 review: a per-chunk sort would
    # pair non-adjacent events and corrupt the carried state).
    prev_arrow = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        _run_bigram_parity(spark, tmp_path)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev_arrow
        )


def _run_bigram_parity(spark, tmp_path):
    from kinesis_stream_consumer_spark.streaming.stateful import (
        streaming_sequence_bigrams,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    base = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"),
        "event_type",
    ).localCheckpoint(eager=True)
    cuts = base.selectExpr(
        "percentile_approx(us, 0.34) AS c1",
        "percentile_approx(us, 0.67) AS c2",
    ).collect()[0]
    slices = [
        base.where(F.col("us") <= cuts.c1),
        base.where((F.col("us") > cuts.c1) & (F.col("us") <= cuts.c2)),
        base.where(F.col("us") > cuts.c2),
    ]
    # Pin micro-batch order EXPLICITLY (ADVICE r12): the file source
    # orders by mtime with path as the tie-break, and part-file names
    # carry random UUIDs — on a coarse-mtime filesystem two slices
    # written in the same tick could be consumed out of order. Write
    # each slice to its own staging dir, move the part file to a
    # numbered name, and stamp strictly-increasing mtimes via os.utime
    # so both the mtime order AND the path tie-break agree.
    import glob as _glob
    import os as _os
    import shutil as _shutil

    (tmp_path / "in").mkdir()
    for i, s in enumerate(slices):
        stage = tmp_path / f"slice{i}"
        s.coalesce(1).write.mode("overwrite").json(str(stage))
        part = _glob.glob(str(stage / "part-*.json"))[0]
        dst = tmp_path / "in" / f"{i:04d}.json"
        _shutil.move(part, dst)
        _os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(
            "user_id bigint, event_id bigint, us bigint, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    q = (
        streaming_sequence_bigrams(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("seq_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM seq_stream").collect()
    streamed_rows = {(r.user_id, r.event_id): r.pattern for r in emitted}
    streamed_counts = Counter(r.pattern for r in emitted)
    streamed_support = Counter(
        p for _, p in {(r.user_id, r.pattern) for r in emitted}
    )

    # batch twin: the registered miner's window shape, full bigram frame
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("us", "event_id")
    batch = (
        base.select(
            "user_id",
            "event_id",
            F.lag("event_type").over(w).alias("prev"),
            F.col("event_type").alias("cur"),
        )
        .where(F.col("prev").isNotNull() & F.col("cur").isNotNull())
        .select(
            "user_id",
            "event_id",
            F.concat("prev", F.lit(">"), "cur").alias("pattern"),
        )
        .collect()
    )
    batch_rows = {(r.user_id, r.event_id): r.pattern for r in batch}
    batch_counts = Counter(r.pattern for r in batch)
    batch_support = Counter(p for _, p in {(r.user_id, r.pattern) for r in batch})

    # cross-batch continuity actually exercised: bigrams must span slices
    assert len(slices) == 3 and len(batch_rows) > 0
    assert streamed_rows == batch_rows  # per-event identity, incl. hand-offs
    assert streamed_counts == batch_counts  # occurrences
    assert streamed_support == batch_support  # support

    # at least one emitted bigram crossed a micro-batch boundary (b > 1
    # rows referencing a predecessor from an earlier batch): with three
    # time slices per user this must happen unless every user fits one
    # slice — assert the stream really handed state across batches
    assert max(r.b for r in emitted) >= 2
