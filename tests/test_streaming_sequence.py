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


def test_streaming_sessionize_matches_batch_rollup(spark, tmp_path):
    """The bounded-state sessionize keeper (one open-session tuple per
    user) must reproduce the batch events_sessionize rollup exactly —
    session numbering, counts, start epoch, duration — including
    sessions that SPAN micro-batch boundaries (the state hand-off), when
    fed the same events as three time-sliced micro-batches."""
    # Force multi-chunk groups (the bigram test's discipline): tiny Arrow
    # batches make >3-event users arrive as MULTIPLE pdfs, pinning the
    # keeper's concat-before-sort path.
    prev_arrow = spark.conf.get(
        "spark.sql.execution.arrow.maxRecordsPerBatch"
    )
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        _run_sessionize_parity(spark, tmp_path)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", prev_arrow
        )


def _run_sessionize_parity(spark, tmp_path):
    from kinesis_stream_consumer_spark.streaming.stateful import (
        streaming_sessionize,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    base = ev.select(
        "user_id",
        "event_id",
        F.expr("unix_micros(CAST(ts AS TIMESTAMP))").alias("us"),
    ).localCheckpoint(eager=True)
    # Cut the stream INSIDE sessions on purpose: with 30-minute sessions
    # and percentile cuts, no session happened to straddle a boundary in
    # the smoke data, leaving the hand-off path unexercised. Midpoints of
    # within-session consecutive event pairs (gap <= 30 min, strictly
    # increasing us) guarantee the pair lands in different slices, so at
    # least one session SPANS each boundary.
    from pyspark.sql.window import Window as _W

    _w = _W.partitionBy("user_id").orderBy("us", "event_id")
    mids = [
        r.mid
        for r in base.withColumn("prev", F.lag("us").over(_w))
        .where(
            F.col("prev").isNotNull()
            & (F.col("us") > F.col("prev"))
            & (F.col("us") - F.col("prev") <= 1_800_000_000)
        )
        .select(
            ((F.col("prev") + F.col("us")) / 2).cast("long").alias("mid")
        )
        .distinct()
        .orderBy("mid")
        .collect()
    ]
    assert len(mids) >= 2, "smoke data has too few in-session pairs"
    c1, c2 = mids[len(mids) // 3], mids[2 * len(mids) // 3]
    assert c1 < c2
    slices = [
        base.where(F.col("us") <= c1),
        base.where((F.col("us") > c1) & (F.col("us") <= c2)),
        base.where(F.col("us") > c2),
    ]
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
        spark.readStream.schema("user_id bigint, event_id bigint, us bigint")
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    q = (
        streaming_sessionize(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("sess_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM sess_stream").collect()
    latest = {}
    for r in emitted:  # update semantics: keep the last emission
        k = (r.user_id, r.session_n)
        if k not in latest or r.b > latest[k].b:
            latest[k] = r
    streamed = {
        k: (r.n_events, r.start_epoch, r.duration_s)
        for k, r in latest.items()
    }

    # batch twin: the certified events_sessionize rollup shape
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gap = F.col("us") - F.lag("us").over(w)
    rolled = (
        base.withColumn(
            "is_new",
            F.when(
                F.lag("us").over(w).isNull() | (gap > 1_800_000_000), 1
            ).otherwise(0),
        )
        .withColumn(
            "session_n",
            F.sum("is_new").over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        .groupBy("user_id", "session_n")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.expr(
                "(min(us) - pmod(min(us), 1000000)) div 1000000"
            ).alias("start_epoch"),
            F.expr("(max(us) - min(us)) div 1000000").alias("duration_s"),
        )
        .collect()
    )
    batch = {
        (r.user_id, r.session_n): (r.n_events, r.start_epoch, r.duration_s)
        for r in rolled
    }
    assert len(batch) > 0
    assert streamed == batch

    # the hand-off is actually exercised: at least one session's rollup
    # was emitted in more than one micro-batch (it spanned a boundary)
    spans = set()
    seen_b = {}
    for r in emitted:
        k = (r.user_id, r.session_n)
        seen_b.setdefault(k, set()).add(r.b)
    spans = [k for k, bs in seen_b.items() if len(bs) >= 2]
    assert spans, "no session spanned a micro-batch boundary"


def test_streaming_topk_matches_batch_window(spark, tmp_path):
    """The bounded-state top-k keeper (two 5-long arrays per event type)
    must reproduce the batch top-k-per-group window exactly — ranks,
    event identities, milli values, deterministic tie-break — when the
    stream is cut into three micro-batches that SPREAD each type's top
    entries across batches (event_id mod 3 slicing), so the kept-set
    hand-off is exercised on every type."""
    from kinesis_stream_consumer_spark.streaming.stateful import (
        _TOPK_K,
        streaming_topk,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    base = ev.select(
        "event_type",
        "event_id",
        F.expr(
            "CAST(floor(value * 1000 + 0.5) AS BIGINT)"
        ).alias("value_milli"),
    ).localCheckpoint(eager=True)
    slices = [
        base.where(F.col("event_id") % 3 == i) for i in range(3)
    ]
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
            "event_type string, event_id bigint, value_milli bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    q = (
        streaming_topk(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("topk_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    emitted = spark.sql("SELECT * FROM topk_stream").collect()
    latest = {}
    for r in emitted:  # update semantics: keep the last emission
        k = (r.event_type, r.rank)
        if k not in latest or r.b > latest[k].b:
            latest[k] = r
    streamed = {
        k: (r.event_id, r.value_milli) for k, r in latest.items()
    }
    # drop stale high ranks: a type that once emitted rank r but whose
    # final batch emitted fewer rows than r never happens here (ranks
    # only grow as events accumulate), asserted below via exact equality

    # batch twin: row_number over (value_milli DESC, event_id ASC)
    from pyspark.sql.window import Window as W

    w = W.partitionBy("event_type").orderBy(
        F.col("value_milli").desc(), F.col("event_id")
    )
    rolled = (
        base.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= _TOPK_K)
        .collect()
    )
    batch = {
        (r.event_type, r.rank): (r.event_id, r.value_milli)
        for r in rolled
    }
    assert len(batch) > 0
    assert streamed == batch

    # the hand-off is exercised: every type's final top-5 mixes event
    # ids from at least two different slices (mod-3 residues)
    for typ in {t for t, _ in batch}:
        residues = {
            batch[(typ, r)][0] % 3
            for r in range(1, _TOPK_K + 1)
            if (typ, r) in batch
        }
        assert len(residues) >= 2, f"{typ}: top-k never crossed a batch"
