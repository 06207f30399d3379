"""Streaming + engine extras: DynamoDB stream type (S2/S7), the
Structured Streaming attachment (S1/F1), native stateful operators, and
the HLL approx-distinct accuracy envelope."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.config import EngineConfig, StreamType
from kinesis_stream_consumer_spark.sources import events_as_kinesis_records
from kinesis_stream_consumer_spark.sources.records import DYNAMODB_RECORD_SCHEMA
from kinesis_stream_consumer_spark.streaming import Engine, TaskDef

from tests.conftest import SF_CORRECT, SF_SMOKE


def _t(spark, sf, name):
    from kinesis_stream_consumer_spark.plans.queries import _t as t

    return t(spark, sf, name)


def noop(message, task):
    return None


# --- S2/S7: DynamoDB stream type --------------------------------------------


def test_dynamodb_stream_records(spark, tmp_path):
    """DynamoDB CDC records: NewImage JSON is the message
    (useStreamEventRecordAsMessage, reference kinesis-processing.js:114)."""
    ev = _t(spark, SF_SMOKE, "events").where(F.col("event_id") < 12)
    records = ev.select(
        F.concat(
            F.lit("shardId-000000000000:"),
            F.lpad(F.col("event_id").cast("string"), 20, "0"),
        ).alias("eventID"),
        F.lit("1.1").alias("eventVersion"),
        F.when(F.col("event_id") % 3 == 0, "INSERT").otherwise("MODIFY").alias(
            "eventName"
        ),
        F.lit("aws:dynamodb").alias("eventSource"),
        F.lit("arn:aws:dynamodb:us-west-2:1:table/T/stream/S").alias(
            "eventSourceARN"
        ),
        F.lit("us-west-2").alias("awsRegion"),
        F.struct(
            F.to_json(F.struct(F.col("event_id").alias("id1"))).alias("Keys"),
            F.to_json(
                F.struct(
                    F.col("event_id").alias("id1"),
                    F.col("user_id").alias("k1"),
                    F.col("event_type").alias("k2"),
                    F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("n1"),
                    F.col("event_id").alias("n2"),
                )
            ).alias("NewImage"),
            F.lit(None).cast("string").alias("OldImage"),
            F.lpad(F.col("event_id").cast("string"), 21, "0").alias(
                "SequenceNumber"
            ),
            F.lit(100).cast("long").alias("SizeBytes"),
            F.lit("NEW_AND_OLD_IMAGES").alias("StreamViewType"),
        ).alias("dynamodb"),
    )
    cfg = EngineConfig(
        stream_type=StreamType.dynamodb,
        sequencing_per_key=True,
        key_property_names=["k1", "k2"],
        id_property_names=["id1"],
        seq_no_property_names=["n1", "n2"],
    )
    eng = Engine(
        spark,
        cfg,
        state_path=str(tmp_path / "state"),
        drq_path=str(tmp_path / "drq"),
        dmq_path=str(tmp_path / "dmq"),
        process_one_defs=[TaskDef("t1", noop)],
    )
    res = eng.process_batch(records, batch_id=1)
    assert res.messages == 12 and res.fully_finalised == 12
    rows = eng.state.read_all().collect()
    assert all(r["streamConsumerId"].startswith("D|") for r in rows)
    assert all(json.loads(r["tasks_json"])["t1"]["status"] == "Completed" for r in rows)


def test_dynamodb_attribute_value_unmarshal(spark, tmp_path):
    """Real DynamoDB stream images arrive as typed attribute values
    ({"id1": {"N": "3"}, "k1": {"S": "x"}}); the engine simplifies them to
    plain JSON before identification (reference
    dynamoDBUtils.simplifyKeysNewImageAndOldImage, test/samples.js:314-351,
    exercised by test/kinesis-processing.test.js:1357-1510) — so $.k1
    property resolution works on the wire format, not just pre-simplified
    fixtures."""
    ev = _t(spark, SF_SMOKE, "events").where(F.col("event_id") < 12)
    av_image = F.concat(
        F.lit('{"id1":{"N":"'),
        F.col("event_id"),
        F.lit('"},"k1":{"N":"'),
        F.col("user_id"),
        F.lit('"},"k2":{"S":"'),
        F.col("event_type"),
        F.lit('"},"n1":{"S":"'),
        F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"),
        F.lit('"},"n2":{"N":"'),
        F.col("event_id"),
        F.lit('"},"extra":{"M":{"flag":{"BOOL":true},"tags":{"L":[{"S":"a"},{"N":"2"}]}}}}'),
    )
    records = ev.select(
        F.concat(
            F.lit("shardId-000000000000:"),
            F.lpad(F.col("event_id").cast("string"), 20, "0"),
        ).alias("eventID"),
        F.lit("1.1").alias("eventVersion"),
        F.lit("MODIFY").alias("eventName"),
        F.lit("aws:dynamodb").alias("eventSource"),
        F.lit("arn:aws:dynamodb:us-west-2:1:table/T/stream/S").alias(
            "eventSourceARN"
        ),
        F.lit("us-west-2").alias("awsRegion"),
        F.struct(
            F.concat(
                F.lit('{"id1":{"N":"'), F.col("event_id"), F.lit('"}}')
            ).alias("Keys"),
            av_image.alias("NewImage"),
            F.lit(None).cast("string").alias("OldImage"),
            F.lpad(F.col("event_id").cast("string"), 21, "0").alias(
                "SequenceNumber"
            ),
            F.lit(100).cast("long").alias("SizeBytes"),
            F.lit("NEW_AND_OLD_IMAGES").alias("StreamViewType"),
        ).alias("dynamodb"),
    )
    cfg = EngineConfig(
        stream_type=StreamType.dynamodb,
        sequencing_per_key=True,
        key_property_names=["k1", "k2"],
        id_property_names=["id1"],
        seq_no_property_names=["n1", "n2"],
    )
    eng = Engine(
        spark,
        cfg,
        state_path=str(tmp_path / "state"),
        drq_path=str(tmp_path / "drq"),
        dmq_path=str(tmp_path / "dmq"),
        process_one_defs=[TaskDef("t1", noop)],
    )
    res = eng.process_batch(records, batch_id=1)
    # every record's keys resolved from the simplified image — nothing
    # lands unusable for "missing mandatory key properties"
    assert res.messages == 12 and res.unusable == 0
    assert res.fully_finalised == 12
    rows = eng.state.read_all().collect()
    # keys/ids came out of the UNMARSHALLED values (no {"N": ...} wrappers)
    assert all(r["id"] == f"id1:{i}" for i, r in zip(
        sorted(int(x["id"].split(":")[1]) for x in rows),
        sorted(rows, key=lambda r: int(r["id"].split(":")[1])),
    ))
    assert all('{"N"' not in r["key"] and '{"S"' not in r["key"] for r in rows)


def test_simplify_attribute_values_unit():
    """The recursive unmarshal itself, per the reference's sample shapes
    (test/samples.js:314-351): S/N/BOOL/NULL/M/L/SS/NS, with plain JSON
    passing through untouched."""
    from kinesis_stream_consumer_spark.streaming.ingest import (
        simplify_dynamodb_attribute_values as simp,
    )

    av = {
        "id1": {"S": "abc"},
        "k2": {"N": "42"},
        "price": {"N": "1.5"},
        "ok": {"BOOL": True},
        "gone": {"NULL": True},
        "nested": {"M": {"a": {"S": "x"}, "b": {"N": "7"}}},
        "arr": {"L": [{"S": "p"}, {"N": "3"}]},
        "sset": {"SS": ["a", "b"]},
        "nset": {"NS": ["1", "2.5"]},
    }
    assert simp(av) == {
        "id1": "abc",
        "k2": 42,
        "price": 1.5,
        "ok": True,
        "gone": None,
        "nested": {"a": "x", "b": 7},
        "arr": ["p", 3],
        "sset": ["a", "b"],
        "nset": [1, 2.5],
    }
    # pre-simplified plain JSON is a no-op (backwards compatible)
    plain = {"id1": 3, "k1": "x", "deep": {"a": [1, 2]}}
    assert simp(plain) == plain


# --- S1: streaming attachment ------------------------------------------------


def test_streaming_attach_foreachbatch(spark, tmp_path):
    """stream_records → attach → availableNow: 2 files ⇒ 2 micro-batches;
    DMQ accumulates across batches, state holds the last batch per shard."""
    from kinesis_stream_consumer_spark.sources import stream_records

    ev = _t(spark, SF_SMOKE, "events")
    for i in range(2):
        batch = events_as_kinesis_records(
            ev.where((F.col("event_id") >= i * 10) & (F.col("event_id") < (i + 1) * 10))
        )
        batch.coalesce(1).write.mode("append").json(str(tmp_path / "in"))

    def rejector(message, task):
        if message["k2"] == "error":
            task.reject("error events rejected")

    cfg = EngineConfig(
        sequencing_per_key=True,
        key_property_names=["k1", "k2"],
        id_property_names=["id1"],
        seq_no_property_names=["n1", "n2"],
    )
    eng = Engine(
        spark,
        cfg,
        state_path=str(tmp_path / "state"),
        drq_path=str(tmp_path / "drq"),
        dmq_path=str(tmp_path / "dmq"),
        process_one_defs=[TaskDef("validate", rejector)],
    )
    q = eng.attach(
        stream_records(spark, str(tmp_path / "in")), str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(120)
    n_err = ev.where(
        (F.col("event_id") < 20) & (F.col("event_type") == "error")
    ).count()
    dmq = spark.read.parquet(str(tmp_path / "dmq"))
    assert dmq.count() == n_err
    assert set(dmq.select("ver").distinct().toPandas()["ver"]) == {"DM|K|2.0"}


# --- Native stateful operator ------------------------------------------------


def test_running_user_stats_stateful(spark, tmp_path):
    """applyInPandasWithState keeps per-user cumulative stats across
    micro-batches; totals after the last batch equal the batch-free
    groupBy."""
    from kinesis_stream_consumer_spark.streaming.stateful import running_user_stats

    ev = _t(spark, SF_SMOKE, "events").where(F.col("event_id") < 200)
    for i in range(2):
        (
            ev.where((F.col("event_id") >= i * 100) & (F.col("event_id") < (i + 1) * 100))
            .coalesce(1)
            .write.mode("append")
            .json(str(tmp_path / "in"))
        )
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    q = (
        running_user_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("running_stats")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emitted row per user = cumulative totals
    out = spark.sql(
        """
        SELECT user_id, n_events, ROUND(sum_value, 2) AS sum_value FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY batch_seen DESC, n_events DESC) rn
          FROM running_stats
        ) WHERE rn = 1
        """
    )
    expected = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    assert out.exceptAll(expected).count() == 0
    assert expected.exceptAll(out).count() == 0


# --- HLL approx-distinct accuracy -------------------------------------------


def test_approx_distinct_rsd_bound(spark):
    from kinesis_stream_consumer_spark.plans import QUERIES

    rows = QUERIES["agg_approx_distinct"].fn(spark, SF_CORRECT).collect()
    exact = {
        r["o_orderpriority"]: r["n"]
        for r in _t(spark, SF_CORRECT, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert rows and all(r["within_rsd"] for r in rows)
    for r in rows:
        assert r["exact_customers"] == exact[r["o_orderpriority"]]


# --- Batch keyed on eventID (reference batchKeyedOnEventID option) -----------


def test_batch_keyed_on_event_id(spark, tmp_path):
    """'E|<eventID>' batch keys (reference test/batch.test.js:123-152
    eventID variant): state partitions per event instead of per shard."""
    ev = _t(spark, SF_SMOKE, "events").where(F.col("event_id") < 6)
    cfg = EngineConfig(
        batch_keyed_on_event_id=True,
        sequencing_per_key=True,
        key_property_names=["k1", "k2"],
        id_property_names=["id1"],
        seq_no_property_names=["n1", "n2"],
    )
    eng = Engine(
        spark,
        cfg,
        state_path=str(tmp_path / "state"),
        drq_path=str(tmp_path / "drq"),
        dmq_path=str(tmp_path / "dmq"),
        process_one_defs=[TaskDef("t1", noop)],
    )
    res = eng.process_batch(events_as_kinesis_records(ev), batch_id=1)
    assert res.fully_finalised == 6
    keys = {r["shardOrEventID"] for r in eng.state.read_all().collect()}
    assert len(keys) == 6 and all(k.startswith("E|shardId-") for k in keys)


# --- Streaming dedup with watermark ------------------------------------------


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: duplicate deliveries inside the
    watermark interval are suppressed in a real streaming query — the
    Spark-native half of the reference's D1 dedup story (state-table
    revive covers cross-batch replays beyond the watermark)."""
    ev = _t(spark, SF_SMOKE, "events").where(F.col("event_id") < 50)
    # two files with overlapping rows = duplicate deliveries
    ev.coalesce(1).write.mode("append").json(str(tmp_path / "in"))
    ev.where(F.col("event_id") < 25).coalesce(1).write.mode("append").json(
        str(tmp_path / "in")
    )
    stream = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 50  # 75 delivered, 25 duplicates suppressed
    assert out.select("event_id").distinct().count() == 50


# --- F1 through the real streaming checkpoint --------------------------------


def test_streaming_replay_after_failure(spark, tmp_path):
    """The full F1 loop through Structured Streaming's own checkpoint: a
    poison message fails the query mid-stream; restarting the query replays
    the uncommitted micro-batch, the engine revives saved task state
    (completed work skipped), and with the poison fixed the stream drains.
    """
    from kinesis_stream_consumer_spark.sources import stream_records

    ev = _t(spark, SF_SMOKE, "events")
    # poison lives in the LAST micro-batch so its state survives (each
    # committed batch overwrites its shards' state — reference per-batch
    # item semantics)
    for i in range(2):
        batch = events_as_kinesis_records(
            ev.where(
                (F.col("event_id") >= i * 10) & (F.col("event_id") < (i + 1) * 10)
            )
        )
        batch.coalesce(1).write.mode("append").json(str(tmp_path / "in"))

    def flaky(message, task):
        if message["id1"] == 15:  # lives in the 2nd file/micro-batch
            raise RuntimeError("poison")

    cfg = EngineConfig(
        sequencing_per_key=True,
        key_property_names=["k1", "k2"],
        id_property_names=["id1"],
        seq_no_property_names=["n1", "n2"],
    )

    def engine_with(fn):
        return Engine(
            spark,
            cfg,
            state_path=str(tmp_path / "state"),
            drq_path=str(tmp_path / "drq"),
            dmq_path=str(tmp_path / "dmq"),
            process_one_defs=[TaskDef("t1", fn)],
        )

    q = engine_with(flaky).attach(
        stream_records(spark, str(tmp_path / "in")), str(tmp_path / "ckpt")
    ).start()
    with pytest.raises(Exception, match="batch incomplete|poison|Terminated"):
        q.awaitTermination(120)
        if q.exception():
            raise Exception(str(q.exception()))

    # restart with the poison fixed: Spark replays the failed micro-batch
    # from ITS checkpoint; the engine's state makes the replay idempotent
    q2 = engine_with(noop).attach(
        stream_records(spark, str(tmp_path / "in")), str(tmp_path / "ckpt")
    ).start()
    q2.awaitTermination(120)
    assert q2.exception() is None

    state = engine_with(noop).state.read_all()
    statuses = {
        r["identity"]: json.loads(r["tasks_json"])["t1"]
        for r in state.collect()
        if r["tasks_json"]
    }
    assert statuses["id1:15"]["status"] == "Completed"
    assert statuses["id1:15"]["attempts"] == 2  # failed once, then re-ran
    batch2_others = [
        t
        for i, t in statuses.items()
        if i != "id1:15" and 10 <= int(i.split(":")[1]) < 20
    ]
    assert batch2_others
    assert all(
        t["status"] == "Completed" and t["attempts"] == 1 for t in batch2_others
    )


# --- Stream-stream interval join --------------------------------------------


def test_stream_stream_interval_join(spark, tmp_path):
    """The view→click attribution join runs GENUINELY streaming: both sides
    are file streams with watermarks, the interval bound makes buffered
    state evictable, and the streamed result matches the batch join."""
    ev = _t(spark, SF_SMOKE, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    src = str(tmp_path / "ev")
    ev.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def sides(df):
        clicks = (
            df.where(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                "user_id",
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", "10 minutes")
        )
        views = (
            df.where(F.col("event_type") == "view")
            .select(
                F.col("event_id").alias("view_id"),
                F.col("user_id").alias("v_user_id"),
                F.col("ts").alias("view_ts"),
            )
            .withWatermark("view_ts", "10 minutes")
        )
        return clicks.join(
            views,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts") <= F.col("click_ts"))
            & (
                F.col("click_ts")
                < F.col("view_ts") + F.expr("INTERVAL 30 MINUTES")
            ),
        ).select("click_id", "view_id", "user_id")

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        sides(stream)
        .writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.table("ssj_out")
    batch = sides(spark.read.parquet(src))
    assert streamed.count() == batch.count() > 0
    assert (
        streamed.exceptAll(batch).count() == 0
        and batch.exceptAll(streamed).count() == 0
    )


def test_streaming_incremental_corpus_dedup(spark, tmp_path):
    """Incremental exact dedup over a document STREAM: watermarked
    dropDuplicates on the content digest keeps the first arrival and
    drops re-deliveries in LATER micro-batches via Spark-managed
    dedup state — the streaming face of dedup_exact (batch mode pins
    the same digest rule against the DuckDB oracle).

    Scale notes: state is keyed by digest only (slim), the watermark
    bounds it, and each micro-batch shuffles on digest exactly like the
    batch operator."""
    import pyspark.sql.functions as F
    from pyspark.sql import types as T

    docs = _t(spark, SF_CORRECT, "documents").limit(60).select(
        "doc_id", "text"
    )
    rows = [(int(r["doc_id"]), r["text"]) for r in docs.collect()]
    # batch 0: docs 0..39; batch 1: docs 20..59 (20..39 are re-deliveries
    # with NEW doc_ids — same text, so the digest state must drop them)
    b0 = rows[:40]
    b1 = [(doc_id + 100000, text) for doc_id, text in rows[20:60]]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    for i, batch in enumerate((b0, b1)):
        spark.createDataFrame(batch, schema).withColumn(
            "arrival_ts", F.lit(f"2026-01-01 00:0{i}:00").cast("timestamp")
        ).coalesce(1).write.mode("append").json(str(tmp_path / "in"))

    stream = (
        spark.readStream.schema(
            "doc_id long, text string, arrival_ts timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
        .withColumn("digest", F.md5(F.col("text").cast("binary")))
        .withWatermark("arrival_ts", "10 minutes")
        .dropDuplicates(["digest"])
    )
    q = (
        stream.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.read.parquet(str(tmp_path / "out"))
    n_unique_texts = len({t for _, t in rows})
    assert out.count() == n_unique_texts
    # every re-delivered duplicate was dropped by the cross-batch state
    assert out.where(F.col("doc_id") >= 100000).count() == len(
        {t for _, t in rows[40:60]} - {t for _, t in rows[:40]}
    )


def test_streaming_cms_sketch_matches_batch(spark, tmp_path):
    """Incremental Count-Min-Sketch maintenance under Structured
    Streaming: the sketch is a LINEAR aggregate (counters add), so a
    streaming groupBy(d, bucket) count over micro-batched documents must
    end exactly equal to the batch sketch over the same corpus — the
    property that lets a 100 TB pipeline keep live frequency estimates
    without ever recounting the corpus."""
    from kinesis_stream_consumer_spark.operators.text import cms_bucket_rows

    docs = _t(spark, SF_SMOKE, "documents")
    # three micro-batches of documents
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).json(str(tmp_path / "in"))
    stream = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string, n_chars bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    sketch_stream = (
        cms_bucket_rows(stream, "text", 32, 4)
        .groupBy("d", "b")
        .count()
    )
    q = (
        sketch_stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("cms_sketch")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["d"], r["b"]): r["count"]
        for r in spark.sql("SELECT * FROM cms_sketch").collect()
    }
    batch = {
        (r["d"], r["b"]): r["c"]
        for r in cms_bucket_rows(docs, "text", 32, 4)
        .groupBy("d", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    assert streamed == batch
    assert len(batch) <= 4 * 32  # sketch stays sketch-sized


def test_streaming_hll_registers_match_batch(spark, tmp_path):
    """Incremental HyperLogLog maintenance under Structured Streaming:
    registers are a MAX-MERGEABLE aggregate, so a streaming
    groupBy(g, bucket).max(rho) over micro-batched events must end
    register-for-register equal to the batch sketch over the same rows —
    live distinct-user estimates without ever re-scanning history (the
    streaming twin of test_hll_registers_merge_linearly)."""
    from kinesis_stream_consumer_spark.operators import sketches as SK

    ev = _t(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", F.col("user_id").cast("string").alias("uid")
    )
    for i in range(3):
        ev.where(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).json(str(tmp_path / "in"))
    stream = (
        spark.readStream.schema("event_id bigint, event_type string, uid string")
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    # same per-row register prep as hll_registers, aggregated by the
    # streaming engine across micro-batches
    from kinesis_stream_consumer_spark.operators.dedup import md5_u56_le

    h = md5_u56_le(F.col("uid"))
    rho = F.least(
        F.lit(56 - SK.HLL_P + 1) - F.length(F.bin(F.shiftright(h, SK.HLL_P))),
        F.lit(SK.HLL_RMAX),
    ).cast("long")
    reg_stream = (
        stream.select(
            F.col("event_type").alias("g"),
            (h % SK.HLL_M).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    q = (
        reg_stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hll_reg")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["g"], r["bucket"]): r["r"]
        for r in spark.sql("SELECT * FROM hll_reg").collect()
    }
    batch = {
        (r["g"], r["bucket"]): r["r"]
        for r in SK.hll_registers(ev, "event_type", F.col("uid")).collect()
    }
    assert streamed == batch
    assert len(batch) <= 5 * SK.HLL_M  # registers stay register-sized


def test_streaming_bloom_filter_matches_batch(spark, tmp_path):
    """Incremental Bloom-filter maintenance under Structured Streaming:
    the filter is a BIT-SET — a union-mergeable aggregate — so a streaming
    distinct over micro-batched reference docs' probe positions must end
    bit-for-bit equal to the batch filter, and probing candidates against
    the streamed filter must reproduce the batch query's bloom_hit column
    exactly. Completes the streaming twin set for the sketch family
    (CMS counter-linearity, HLL register max-merge, Bloom bit union):
    yesterday's filter + today's micro-batches without re-scanning
    history, state = m bits regardless of corpus size."""
    from kinesis_stream_consumer_spark.operators import dedup as D
    from kinesis_stream_consumer_spark.plans.curation import (
        _BLOOM_K,
        _BLOOM_M,
    )

    docs = _t(spark, SF_SMOKE, "documents").select("doc_id", "text")
    dg = docs.select("doc_id", D.exact_digest(F.col("text")).alias("dg"))
    ref = dg.where(F.col("doc_id") % 2 == 0)
    for i in range(3):
        ref.where(F.col("doc_id") % 6 == 2 * i).coalesce(1).write.mode(
            "append"
        ).json(str(tmp_path / "in"))
    stream = (
        spark.readStream.schema("doc_id bigint, dg string")
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    js = F.array(*[F.lit(j) for j in range(_BLOOM_K)])
    pos = (
        D.md5_u56_le(
            F.concat(F.col("j").cast("string"), F.lit("|"), F.col("dg"))
        )
        % _BLOOM_M
    ).alias("pos")
    bit_stream = (
        stream.select(F.explode(js).alias("j"), "dg")
        .select(pos)
        .groupBy("pos")
        .count()  # streaming distinct-by-key: the maintained bit set
    )
    q = (
        bit_stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("bloom_bits")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed_bits = {
        r["pos"] for r in spark.sql("SELECT pos FROM bloom_bits").collect()
    }
    batch_bits = {
        r["pos"]
        for r in ref.select(F.explode(js).alias("j"), "dg")
        .select(pos)
        .distinct()
        .collect()
    }
    assert streamed_bits == batch_bits            # bit-for-bit equal
    assert len(batch_bits) <= _BLOOM_M            # state stays m bits
    # probing candidates against the STREAMED filter reproduces the batch
    # query's bloom_hit column
    cand = dg.where(F.col("doc_id") % 2 == 1)
    probe = cand.select("doc_id", F.explode(js).alias("j"), "dg").select(
        "doc_id", pos
    )
    hits = {
        r["doc_id"]
        for r in probe.groupBy("doc_id")
        .agg(
            F.sum(
                F.col("pos").isin(*streamed_bits).cast("int")
            ).alias("n_set")
        )
        .where(F.col("n_set") == _BLOOM_K)
        .collect()
    }
    from kinesis_stream_consumer_spark.plans.queries import QUERIES

    batch_hits = {
        r["doc_id"]
        for r in QUERIES["curation_bloom_novelty"]
        .fn(spark, SF_SMOKE)
        .where(F.col("bloom_hit"))
        .collect()
    }
    assert hits == batch_hits


# --- Live sketch monitoring over an attached stream --------------------------


def test_live_stream_sketch_monitoring(spark, tmp_path):
    """The engine-native sketches are a first-class MONITORING surface on a
    LIVE attach() stream (VERDICT r7 #7): while the stream runs, (a) a
    boundary reader driven by the post_finalise_batch hook reads the HLL
    registers back from the state table at every micro-batch commit and
    must see exactly the batch-prefix sketch — the state the engine just
    saved, fully visible, nothing torn; and (b) a concurrent poller thread
    reading the state table at arbitrary times must only ever observe
    per-(shard, bucket) register values that never DECREASE across
    successive reads — the max-merge monotonicity that makes mid-stream
    sketch reads meaningful at all (an additive counter gives a torn read
    no such guarantee)."""
    import threading

    from kinesis_stream_consumer_spark.operators import sketches as SK
    from kinesis_stream_consumer_spark.sources import stream_records

    ev = _t(spark, SF_SMOKE, "events").where(F.col("event_id") < 400)
    n_batches = 4
    for i in range(n_batches):
        events_as_kinesis_records(
            ev.where(F.col("event_id") % n_batches == i)
        ).coalesce(1).write.mode("append").json(str(tmp_path / "in"))

    def _registers_from_state():
        rows = (
            spark.read.parquet(str(tmp_path / "state"))
            .where(F.col("kind") == "sketch")
            .select("shardOrEventID", "sketch_bucket", "sketch_r")
            .collect()
        )
        return {
            (r["shardOrEventID"], r["sketch_bucket"]): r["sketch_r"]
            for r in rows
        }

    boundary_snapshots = []

    def on_boundary(result, engine):
        boundary_snapshots.append((result.batch_id, _registers_from_state()))

    def noop_task(message, task):
        return None

    cfg = EngineConfig(
        sequencing_per_key=True,
        key_property_names=["k1", "k2"],
        id_property_names=["id1"],
        seq_no_property_names=["n1", "n2"],
        track_distinct_sketch=True,
        post_finalise_batch=on_boundary,
    )
    eng = Engine(
        spark,
        cfg,
        state_path=str(tmp_path / "state"),
        drq_path=str(tmp_path / "drq"),
        dmq_path=str(tmp_path / "dmq"),
        process_one_defs=[TaskDef("validate", noop_task)],
    )

    polls, stop = [], threading.Event()

    def poller():
        while not stop.is_set():
            try:
                polls.append(_registers_from_state())
            except Exception:
                pass  # mid-commit listing / not-yet-created dir: retry
            stop.wait(0.05)

    th = threading.Thread(target=poller, daemon=True)
    th.start()
    q = eng.attach(
        stream_records(spark, str(tmp_path / "in")), str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(240)
    stop.set()
    th.join(10)

    # (a) every boundary read equals the batch-prefix sketch, computed
    # independently from the same identity rule the engine uses
    assert len(boundary_snapshots) == n_batches
    for bid, snap in boundary_snapshots:
        prefix = ev.where(F.col("event_id") % n_batches <= bid)
        expected = {
            (r["g"], r["bucket"]): r["r"]
            for r in SK.hll_registers(
                prefix.select(
                    F.concat(
                        F.lit("S|shardId-"),
                        F.lpad((F.col("user_id") % 4).cast("int").cast("string"), 12, "0"),
                    ).alias("shard"),
                    F.concat(F.lit("id1:"), F.col("event_id").cast("string")).alias("ident"),
                ),
                "shard",
                F.col("ident"),
            ).collect()
        }
        assert snap == expected, f"boundary read at batch {bid} diverged"
    # (b) concurrent polls: per-register monotone non-decreasing
    last = {}
    assert polls, "poller never completed a read while the stream ran"
    for snap in polls:
        for key, r in snap.items():
            assert r >= last.get(key, 0), f"register {key} went backwards"
            last[key] = r


@pytest.mark.parametrize("kind", ["cms", "qsk", "rsv"])
def test_live_stream_sketch_monitoring_all_kinds(spark, tmp_path, kind):
    """Extends the HLL live-monitoring scenario (above) to the other three
    engine-native sketch kinds (VERDICT r8 #6): on a LIVE attach() stream,
    (a) a boundary reader driven by post_finalise_batch must see exactly
    the batch-prefix sketch after every commit, and (b) a concurrent
    poller observes the KIND-SPECIFIC mid-stream invariant — for the
    additive kinds (cms, qsk) every clean read of a shard's counters
    equals some batch-prefix's counters for that shard (counters only
    ever step forward a whole committed batch at a time); for the
    min-merge reservoir the priority at each (shard, rank) never
    INCREASES across reads (new items only improve the register), the
    mirror of the HLL max-merge monotonicity. Polls that catch the save
    mid-overwrite (duplicate (shard, register) rows from old+new files
    both visible) are skipped — per-shard partition replacement is only
    atomic per file, which is exactly why the invariant is stated on
    clean reads."""
    import threading

    from kinesis_stream_consumer_spark.operators.dedup import md5_u56_le
    from kinesis_stream_consumer_spark.operators.sketches import (
        cms_counters,
        qsketch_buckets,
        reservoir_merge,
    )
    from kinesis_stream_consumer_spark.sources import stream_records

    ev = _t(spark, SF_SMOKE, "events").where(F.col("event_id") < 400)
    n_batches = 4
    for i in range(n_batches):
        events_as_kinesis_records(
            ev.where(F.col("event_id") % n_batches == i)
        ).coalesce(1).write.mode("append").json(str(tmp_path / "in"))

    state_kind = {"cms": "cms", "qsk": "qsk", "rsv": "rsv"}[kind]

    def _read_state():
        """[(shard, register-id, value)] rows of the cumulative kind."""
        reg_id = "identity" if kind == "rsv" else "sketch_bucket"
        val = "sketch_r"
        return [
            (r["shardOrEventID"], r[reg_id], r[val])
            for r in spark.read.parquet(str(tmp_path / "state"))
            .where(F.col("kind") == state_kind)
            .select("shardOrEventID", reg_id, val)
            .collect()
        ]

    def _shard():
        return F.concat(
            F.lit("S|shardId-"),
            F.lpad((F.col("user_id") % 4).cast("string"), 12, "0"),
        ).alias("g")

    def _expected_prefix(bid):
        """{(shard, register-id): value} for the prefix through batch bid."""
        prefix = ev.where(F.col("event_id") % n_batches <= bid)
        if kind == "cms":
            frame = cms_counters(
                prefix.select(
                    _shard(),
                    F.concat(
                        F.lit("k1:"),
                        F.col("user_id").cast("string"),
                        F.lit("|k2:"),
                        F.col("event_type"),
                    ).alias("key"),
                ),
                "g",
                F.col("key"),
            ).select("g", F.col("idx").alias("rid"), F.col("cnt").alias("v"))
        elif kind == "qsk":
            frame = qsketch_buckets(
                prefix.select(_shard(), F.col("event_id").alias("v")),
                "g",
                F.col("v"),
            ).select("g", F.col("qid").alias("rid"), F.col("cnt").alias("v"))
        else:
            keys = prefix.select(
                _shard(),
                F.concat(F.lit("id1:"), F.col("event_id").cast("string")).alias("id"),
                F.lit(1).cast("long").alias("w"),
            ).withColumn("pri", md5_u56_le(F.col("id")))
            frame = reservoir_merge(keys, 5).select(
                "g",
                F.concat(F.lit("RSV|"), F.col("id")).alias("rid"),
                F.col("pri").alias("v"),
            )
        return {(r["g"], r["rid"]): r["v"] for r in frame.collect()}

    boundary_snapshots = []

    def on_boundary(result, engine):
        boundary_snapshots.append(
            (result.batch_id, dict(((g, i), v) for g, i, v in _read_state()))
        )

    cfg = EngineConfig(
        sequencing_per_key=True,
        key_property_names=["k1", "k2"],
        id_property_names=["id1"],
        seq_no_property_names=["n1", "n2"],
        track_frequency_sketch=(kind == "cms"),
        track_quantile_sketch=(kind == "qsk"),
        track_sample_sketch=(kind == "rsv"),
        sample_sketch_n=5,
        post_finalise_batch=on_boundary,
    )
    eng = Engine(
        spark,
        cfg,
        state_path=str(tmp_path / "state"),
        drq_path=str(tmp_path / "drq"),
        dmq_path=str(tmp_path / "dmq"),
        process_one_defs=[TaskDef("validate", noop)],
    )

    polls, stop = [], threading.Event()

    def poller():
        while not stop.is_set():
            try:
                polls.append(_read_state())
            except Exception:
                pass  # mid-commit listing / not-yet-created dir: retry
            stop.wait(0.05)

    th = threading.Thread(target=poller, daemon=True)
    th.start()
    q = eng.attach(
        stream_records(spark, str(tmp_path / "in")), str(tmp_path / "ckpt")
    ).start()
    q.awaitTermination(240)
    stop.set()
    th.join(10)

    # (a) boundary exactness per kind: post-commit state == the
    # independently recomputed batch-prefix sketch
    assert len(boundary_snapshots) == n_batches
    expected_by_prefix = {
        b: _expected_prefix(b) for b in range(n_batches)
    }
    for bid, snap in boundary_snapshots:
        assert snap == expected_by_prefix[bid], (
            f"{kind}: boundary read at batch {bid} diverged"
        )

    # (b) concurrent polls, clean reads only (no duplicate registers)
    assert polls, "poller never completed a read while the stream ran"
    prefix_sets = {}  # per shard: the set of admissible counter dicts
    for b, exp in expected_by_prefix.items():
        for (g, rid), v in exp.items():
            prefix_sets.setdefault(g, {}).setdefault(b, {})[rid] = v
    clean = 0
    last_rsv: dict = {}
    for rows in polls:
        keys = [(g, rid) for g, rid, _ in rows]
        if len(keys) != len(set(keys)):
            continue  # torn read: old+new partition files both visible
        clean += 1
        snap: dict = {}
        for g, rid, v in rows:
            snap.setdefault(g, {})[rid] = v
        if kind == "rsv":
            # min-merge: the register at each rank only ever improves;
            # identity-keyed values are priorities — a re-observed
            # identity keeps its priority, and the per-shard rank-v
            # multiset never gains a LARGER k-th smallest
            for g, kept in snap.items():
                pris = sorted(kept.values())
                old = sorted(last_rsv.get(g, pris))
                for i, p in enumerate(pris[: len(old)]):
                    assert p <= old[i], f"rsv register at {g} regressed"
                last_rsv[g] = pris
        else:
            # additive: a shard's counters match SOME committed prefix
            for g, kept in snap.items():
                admissible = list(prefix_sets.get(g, {}).values())
                assert any(kept == p for p in admissible), (
                    f"{kind}: shard {g} counters match no batch prefix"
                )
    assert clean > 0, "no clean poll completed"
