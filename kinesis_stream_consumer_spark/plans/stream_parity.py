"""Stream-parity queries: the reference's OWN operator semantics (SURVEY §2.1)
expressed as declarative Spark plans over the ``events`` stream table, each
with a DuckDB oracle.

The ``events`` table stands in for a decoded Kinesis batch: ``event_id`` ≙
eventID/sequenceNumber, ``user_id`` ≙ partition key, ``ts``+``event_id`` ≙
seqNo properties, ``props`` ≙ the JSON message body. Batch/stateful behavior
(attempt tracking across replays, checkpoint revive) is exercised by the
pytest suite against the engine modules; these queries pin down the
per-batch, purely-functional semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kinesis_stream_consumer_spark.plans.queries import _t, register

# Canonical timestamp rendering shared by both engines (microsecond precision)
_TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
_TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


# --- I1–I3: MD5 fingerprinting + id/key/seqNo resolution --------------------

@register(
    "identify_ids_keys_seqnos",
    f"""
    SELECT event_id,
           'id1:' || CAST(event_id AS VARCHAR)                            AS id,
           'k1:'  || CAST(user_id AS VARCHAR) || '|k2:' || event_type     AS key,
           'n1:'  || strftime(ts, '{_TS_FMT_DUCK}')
                  || '|n2:' || CAST(event_id AS VARCHAR)                  AS seqNo,
           md5('id1:' || CAST(event_id AS VARCHAR)
               || '|k1:' || CAST(user_id AS VARCHAR)
               || '|v:'  || printf('%.2f', value))                        AS msg_md5,
           md5(props)                                                     AS data_md5
    FROM events
    WHERE event_id < 1000
    ORDER BY event_id
    """,
    doc="Reference I1–I3: ids/keys/seqNos resolved from configured property "
    "names and serialized to 'name:value|…' canonical strings "
    "(reference kinesis-identify.js:85-133, serialization "
    "test/batch-10-state.json:14-16); MD5 digests for identity/dedup "
    "(kinesis-identify.js:135-137). Pure column expressions — "
    "whole-stage-codegen, no Python.",
)
def identify_ids_keys_seqnos(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    eid = F.col("event_id").cast("string")
    return ev.select(
        "event_id",
        F.concat(F.lit("id1:"), eid).alias("id"),
        F.concat(
            F.lit("k1:"), F.col("user_id").cast("string"), F.lit("|k2:"), F.col("event_type")
        ).alias("key"),
        F.concat(
            F.lit("n1:"),
            F.date_format("ts", _TS_FMT_SPARK),
            F.lit("|n2:"),
            eid,
        ).alias("seqNo"),
        F.md5(
            F.concat(
                F.lit("id1:"), eid,
                F.lit("|k1:"), F.col("user_id").cast("string"),
                F.lit("|v:"), F.format_string("%.2f", "value"),
            ).cast("binary")
        ).alias("msg_md5"),
        F.md5(F.col("props").cast("binary")).alias("data_md5"),
    ).orderBy("event_id")


# --- Q1: SortType normalization of sequence-number parts --------------------

@register(
    "sequencing_sorttype",
    r"""
    WITH parts AS (
      SELECT event_id,
             CASE CAST(event_id % 4 AS INTEGER)
               WHEN 0 THEN printf('%.2f', value)
               WHEN 1 THEN '2000000000000000000000' || CAST(event_id AS VARCHAR)
               WHEN 2 THEN strftime(ts, '%Y-%m-%d')
               ELSE event_type
             END AS part
      FROM events WHERE event_id < 2000
    )
    SELECT event_id, part,
           CASE
             WHEN regexp_full_match(part, '\d{4}-\d{2}-\d{2}')                    THEN 'DATE'
             WHEN regexp_full_match(part, '\d{4}-\d{2}-\d{2}T.*')                 THEN 'DATE_TIME'
             WHEN regexp_full_match(part, '[+-]?\d{16,}')                         THEN 'INTEGER_LIKE'
             WHEN regexp_full_match(part, '[+-]?\d+(\.\d+)?([eE][+-]?\d+)?')      THEN 'NUMBER'
             ELSE 'STRING'
           END AS sort_type
    FROM parts
    ORDER BY event_id
    """,
    doc="Reference Q1 sequencing normalization: classify each seqNo part into "
    "a SortType (NUMBER / INTEGER_LIKE for >15-digit integers kept as exact "
    "strings / DATE / DATE_TIME / STRING) — reference semantics pinned by "
    "test/sequencing-per-shard.test.js:114-209. Kinesis 56-digit seqNos "
    "exceed Decimal(38) so INTEGER_LIKE stays a string compared numerically "
    "(here: regex-classified declaratively).",
)
def sequencing_sorttype(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    part = (
        F.when(F.col("event_id") % 4 == 0, F.format_string("%.2f", "value"))
        .when(
            F.col("event_id") % 4 == 1,
            F.concat(F.lit("2000000000000000000000"), F.col("event_id").cast("string")),
        )
        .when(F.col("event_id") % 4 == 2, F.date_format("ts", "yyyy-MM-dd"))
        .otherwise(F.col("event_type"))
    )
    df = ev.select("event_id", part.alias("part"))
    sort_type = (
        F.when(F.col("part").rlike(r"^\d{4}-\d{2}-\d{2}$"), "DATE")
        .when(F.col("part").rlike(r"^\d{4}-\d{2}-\d{2}T.*$"), "DATE_TIME")
        .when(F.col("part").rlike(r"^[+-]?\d{16,}$"), "INTEGER_LIKE")
        .when(F.col("part").rlike(r"^[+-]?\d+(\.\d+)?([eE][+-]?\d+)?$"), "NUMBER")
        .otherwise("STRING")
    )
    return df.select("event_id", "part", sort_type.alias("sort_type")).orderBy("event_id")


# --- Q3/Q4: sequencing chains (per-shard and per-key) -----------------------

@register(
    "sequencing_chains_per_key",
    """
    SELECT user_id, event_id,
           ROW_NUMBER() OVER w AS seq_index,
           LAG(event_id)  OVER w AS prev_event_id,
           LEAD(event_id) OVER w AS next_event_id,
           CASE WHEN LAG(event_id) OVER w IS NULL THEN TRUE ELSE FALSE END AS is_first
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, seq_index
    """,
    doc="Reference Q4 per-key sequencing: one ordered chain per distinct key; "
    "prev/next links and exactly one 'first message to process' per chain "
    "(test/sequencing-per-key.test.js:474-622). lag/lead literally reproduce "
    "the prevMessage/nextMessage links; chains are Spark partitions so all "
    "chains run concurrently — the reference's own max-parallelism mode.",
)
def sequencing_chains_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w).alias("seq_index"),
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
        F.lag("event_id").over(w).isNull().alias("is_first"),
    ).orderBy("user_id", "seq_index")


@register(
    "sequencing_chains_per_shard",
    """
    WITH sharded AS (
      SELECT *, 'shard-' || CAST(CAST(user_id % 4 AS INTEGER) AS VARCHAR) AS shard_id
      FROM events
    )
    SELECT shard_id, event_id,
           ROW_NUMBER() OVER w AS seq_index,
           LAG(event_id)  OVER w AS prev_event_id,
           LEAD(event_id) OVER w AS next_event_id
    FROM sharded
    WINDOW w AS (PARTITION BY shard_id ORDER BY ts, event_id)
    ORDER BY shard_id, seq_index
    """,
    doc="Reference Q3 per-shard sequencing: ONE total chain per shard/batch "
    "(test/sequencing-per-shard.test.js:474-550). At 100 TB this mode "
    "serializes each shard's partition — the engine documents per-key mode "
    "(sequencing_chains_per_key) as the scale path, exactly as the reference "
    "recommends for parallelism.",
)
def sequencing_chains_per_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").withColumn(
        "shard_id",
        F.concat(F.lit("shard-"), (F.col("user_id") % 4).cast("int").cast("string")),
    )
    w = Window.partitionBy("shard_id").orderBy("ts", "event_id")
    return ev.select(
        "shard_id",
        "event_id",
        F.row_number().over(w).alias("seq_index"),
        F.lag("event_id").over(w).alias("prev_event_id"),
        F.lead("event_id").over(w).alias("next_event_id"),
    ).orderBy("shard_id", "seq_index")


# --- I4: batch-key resolution ----------------------------------------------

@register(
    "batch_key_resolution",
    """
    SELECT 'K|TestStream|consumer:dev' AS streamConsumerId,
           'S|shard-' || CAST(CAST(user_id % 4 AS INTEGER) AS VARCHAR) AS shardOrEventID,
           COUNT(*) AS n_records,
           MIN(event_id) AS first_event_id
    FROM events
    GROUP BY 2
    ORDER BY shardOrEventID
    """,
    doc="Reference I4: batch key '{streamConsumerId: K|<stream>|<consumer:stage>, "
    "shardOrEventID: S|<shardId>}' (test/batch.test.js:123-152) — the "
    "grouping key of the engine's state table.",
)
def batch_key_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn(
            "shardOrEventID",
            F.concat(F.lit("S|shard-"), (F.col("user_id") % 4).cast("int").cast("string")),
        )
        .groupBy("shardOrEventID")
        .agg(
            F.count(F.lit(1)).alias("n_records"),
            F.min("event_id").alias("first_event_id"),
        )
        .select(
            F.lit("K|TestStream|consumer:dev").alias("streamConsumerId"),
            "shardOrEventID",
            "n_records",
            "first_event_id",
        )
        .orderBy("shardOrEventID")
    )


# --- S6 + P1: decode + parse + usable/unusable split ------------------------

@register(
    "ingest_usable_split",
    """
    WITH decoded AS (
      SELECT event_id,
             decode(from_base64(base64(CAST(props AS BLOB)))) AS data_str,
             TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT CASE WHEN k IS NULL THEN 'unusable' ELSE 'usable' END AS bucket,
           COUNT(*) AS n,
           md5(MIN(data_str)) AS sample_md5
    FROM decoded
    GROUP BY 1
    ORDER BY bucket
    """,
    doc="Reference S6+P1: base64 round-trip of record data, JSON parse, and "
    "the usable/unusable partition (kinesis-processing.js:477-517: parse "
    "failure ⇒ addUnusableRecord). Declarative split = filter + anti-filter; "
    "no exceptions, no row loop.",
)
def ingest_usable_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    decoded = ev.select(
        "event_id",
        F.unbase64(F.base64(F.col("props").cast("binary"))).alias("data_bytes"),
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    return (
        decoded.select(
            F.when(F.col("k").isNull(), "unusable").otherwise("usable").alias("bucket"),
            F.col("data_bytes").cast("string").alias("data_str"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.md5(F.min("data_str").cast("binary")).alias("sample_md5"),
        )
        .orderBy("bucket")
    )


# --- D1: dedup of replayed (at-least-once) deliveries -----------------------

@register(
    "dedup_replayed_batch",
    """
    WITH replayed AS (
      SELECT *, 1 AS src FROM events WHERE event_id < 5000
      UNION ALL
      SELECT *, 2 AS src FROM events WHERE event_id < 2500  -- partial replay
    ),
    identified AS (
      SELECT src, md5(CAST(event_id AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)
                      || '|' || props) AS msg_md5
      FROM replayed
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_delivered,
           CAST(COUNT(DISTINCT msg_md5) AS BIGINT) AS n_unique,
           CAST(SUM(CASE WHEN src = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_expected
    FROM identified
    """,
    doc="Reference D1: at-least-once delivery + idempotent re-execution — a "
    "replayed batch must not double-process; identity = md5 over "
    "ids/data (test/batch.test.js:443-462). Spark: dropDuplicates on the "
    "identity digest (hash-partition on md5, map-side combine).",
)
def dedup_replayed_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    batch = ev.where(F.col("event_id") < 5000).withColumn("src", F.lit(1))
    replayed = batch.unionByName(
        ev.where(F.col("event_id") < 2500).withColumn("src", F.lit(2))
    )
    identified = replayed.select(
        "src",
        F.md5(
            F.concat_ws(
                "|",
                F.col("event_id").cast("string"),
                F.col("user_id").cast("string"),
                F.col("props"),
            ).cast("binary")
        ).alias("msg_md5"),
    )
    # ONE aggregate job (count + distinct + filtered count together) — the
    # dedup itself is the count_distinct on the identity digest; no
    # driver-side multi-job orchestration
    return identified.agg(
        F.count(F.lit(1)).alias("n_delivered"),
        F.count_distinct("msg_md5").alias("n_unique"),
        F.sum(F.when(F.col("src") == 1, 1).otherwise(0)).alias("n_expected"),
    )


# --- D2/D3: dead-letter envelopes -------------------------------------------

@register(
    "dmq_envelopes",
    """
    SELECT 'DM|K|2.0' AS ver,
           'K|TestStream|consumer:dev' AS streamConsumerId,
           'S|shard-' || CAST(CAST(user_id % 4 AS INTEGER) AS VARCHAR) AS shardOrEventID,
           event_id,
           'id1:' || CAST(event_id AS VARCHAR) AS id,
           'Task processOne rejected message' AS reasonRejected,
           SUBSTR(COALESCE(CAST(user_id AS VARCHAR), 'K|TestStream|consumer:dev',
                           'LAST_RESORT_KEY'), 1, 256) AS partitionKey
    FROM events
    WHERE event_type = 'error'
    ORDER BY event_id
    """,
    doc="Reference D3: dead-message envelope {ver:'DM|K|2.0', streamConsumerId, "
    "shardOrEventID, id, reasonRejected} (kinesis-processing.js:708-724) with "
    "the partition-key fallback chain record-pk ▷ streamConsumerId ▷ "
    "'LAST_RESORT_KEY' truncated to Kinesis max key size "
    "(kinesis-processing.js:743-746,:41). Envelope construction is pure "
    "projection — the sink append is the only side-effect.",
)
def dmq_envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "error")
    return ev.select(
        F.lit("DM|K|2.0").alias("ver"),
        F.lit("K|TestStream|consumer:dev").alias("streamConsumerId"),
        F.concat(F.lit("S|shard-"), (F.col("user_id") % 4).cast("int").cast("string")).alias(
            "shardOrEventID"
        ),
        "event_id",
        F.concat(F.lit("id1:"), F.col("event_id").cast("string")).alias("id"),
        F.lit("Task processOne rejected message").alias("reasonRejected"),
        F.substring(
            F.coalesce(
                F.col("user_id").cast("string"),
                F.lit("K|TestStream|consumer:dev"),
                F.lit("LAST_RESORT_KEY"),
            ),
            1,
            256,
        ).alias("partitionKey"),
    ).orderBy("event_id")


# --- Full engine end-to-end (S→I→Q→X→T→D→F) ---------------------------------

@register(
    "engine_end_to_end",
    """
    SELECT CASE WHEN event_type = 'error' THEN 'Rejected' ELSE 'Completed' END AS status,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    WHERE event_id < 2000
    GROUP BY 1
    ORDER BY status
    """,
    doc="The whole consumer lifecycle as one verifiable query: events → "
    "Kinesis records (base64/JSON envelopes) → ingest → per-key sequencing "
    "→ processOne task execution (reject on event_type='error') → finalise "
    "→ state table; the saved task statuses must equal the oracle's "
    "declarative classification. Exercises S4-S7, I1-I4, Q1/Q4, X1, T4, D3, "
    "F1 in one pass.",
)
def engine_end_to_end(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from pyspark.sql import functions as F2
    from kinesis_stream_consumer_spark.config import EngineConfig
    from kinesis_stream_consumer_spark.sources import events_as_kinesis_records
    from kinesis_stream_consumer_spark.streaming import Engine, TaskDef
    from kinesis_stream_consumer_spark.streaming.tasks import TaskRejectedError

    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 2000)
    records = events_as_kinesis_records(ev)

    def validate(message, task):
        if message["k2"] == "error":
            raise TaskRejectedError("error events rejected")

    tmp = tempfile.mkdtemp(prefix="ksc-e2e-")
    cfg = EngineConfig(
        sequencing_per_key=True,
        key_property_names=["k1", "k2"],
        id_property_names=["id1"],
        seq_no_property_names=["n1", "n2"],
    )
    eng = Engine(
        spark,
        cfg,
        state_path=f"{tmp}/state",
        drq_path=f"{tmp}/drq",
        dmq_path=f"{tmp}/dmq",
        process_one_defs=[TaskDef("validate", validate)],
    )
    eng.process_batch(records, batch_id=1)
    state = eng.state.read_all()
    return (
        state.select(
            F2.get_json_object("tasks_json", "$.validate.status").alias("status")
        )
        .groupBy("status")
        .agg(F2.count(F2.lit(1)).cast("long").alias("n"))
        .orderBy("status")
    )


# --- S3/S5: KPL de-aggregation through the real ingest path ------------------

@register(
    "kpl_deagg_roundtrip",
    """
    SELECT event_id,
           CAST(CAST(event_id % 5 AS INTEGER) AS BIGINT) AS sub_seq_no,
           CAST(user_id AS VARCHAR) AS pk
    FROM events
    WHERE event_id < 300
    ORDER BY event_id
    """,
    doc="Reference S3/S5: KPL-aggregated blobs (5 user records each, built "
    "with the pure-Python codec for the public KPL wire format, "
    "kpl-deagg-async.js:50-186) de-aggregate through the real ingest path — "
    "each user record becomes its own message with its subSequenceNumber "
    "and the KPL-carried partition key. The oracle predicts every "
    "(event, sub-seq, pk) from the blob layout.",
)
def kpl_deagg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import base64 as _b64
    import json as _json

    from kinesis_stream_consumer_spark.config import EngineConfig
    from kinesis_stream_consumer_spark.sources import kpl_aggregate
    from kinesis_stream_consumer_spark.sources.records import KINESIS_RECORD_SCHEMA
    from kinesis_stream_consumer_spark.streaming.ingest import ingest

    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_id") < 300)
        .select("event_id", "user_id")
        .orderBy("event_id")
        .collect()
    )
    # build one KPL blob per 5 consecutive events (driver-side test-vector
    # construction only — the decode runs distributed inside ingest)
    recs = []
    for blob_idx in range(0, len(ev), 5):
        chunk = ev[blob_idx : blob_idx + 5]
        blob = kpl_aggregate(
            [
                (
                    str(r["user_id"]),
                    _json.dumps(
                        {"id1": r["event_id"], "k1": r["user_id"]}
                    ).encode(),
                )
                for r in chunk
            ]
        )
        seq = str(blob_idx // 5).zfill(56)
        recs.append(
            {
                "eventID": f"shardId-000000000000:{seq}",
                "eventVersion": "1.0",
                "eventName": "aws:kinesis:record",
                "eventSource": "aws:kinesis",
                "eventSourceARN": "arn:aws:kinesis:us-west-2:1:stream/T",
                "awsRegion": "us-west-2",
                "invokeIdentityArn": None,
                "kinesis": {
                    "kinesisSchemaVersion": "1.0",
                    "partitionKey": "agg",
                    "explicitHashKey": None,
                    "sequenceNumber": seq,
                    "data": _b64.b64encode(blob).decode(),
                },
            }
        )
    records = spark.createDataFrame(recs, KINESIS_RECORD_SCHEMA)
    cfg = EngineConfig(kpl_encoded=True, id_property_names=["id1"])
    msgs = ingest(records, cfg).messages
    return msgs.select(
        F.get_json_object("msg_json", "$.id1").cast("long").alias("event_id"),
        F.col("event_sub_seq_no").alias("sub_seq_no"),
        F.col("partition_key").alias("pk"),
    ).orderBy("event_id")


# --- T1–T4/D1: state save → load → revive across two real batches -----------

@register(
    "state_replay_attempts",
    """
    SELECT CASE WHEN event_type = 'error' THEN CAST(2 AS BIGINT)
                ELSE CAST(1 AS BIGINT) END AS attempts,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    WHERE event_id < 1000
    GROUP BY 1
    ORDER BY attempts
    """,
    doc="Reference T1–T4 + D1 across TWO real process_batch calls: batch 1 "
    "fails every 'error' message (state saved, batch raises for replay); "
    "the replayed batch loads + revives that state — completed tasks are "
    "skipped (attempts stay 1, D1), failed tasks re-execute exactly once "
    "more (attempts 2) and complete. The oracle predicts the final "
    "attempts histogram declaratively "
    "(test/kinesis-consumer.test.js:746-845).",
)
def state_replay_attempts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from kinesis_stream_consumer_spark.config import EngineConfig
    from kinesis_stream_consumer_spark.sources import events_as_kinesis_records
    from kinesis_stream_consumer_spark.streaming import (
        BatchReplayError,
        Engine,
        TaskDef,
    )

    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    records = events_as_kinesis_records(ev)
    tmp = tempfile.mkdtemp(prefix="ksc-replay-")
    cfg = EngineConfig(
        sequencing_required=False,
        id_property_names=["id1"],
    )

    def flaky(message, task):
        if message["k2"] == "error":
            raise RuntimeError("transient failure")

    def fixed(message, task):
        return None

    def engine(fn):
        return Engine(
            spark,
            cfg,
            state_path=f"{tmp}/state",
            drq_path=f"{tmp}/drq",
            dmq_path=f"{tmp}/dmq",
            process_one_defs=[TaskDef("t1", fn)],
        )

    try:
        engine(flaky).process_batch(records, batch_id=1)
    except BatchReplayError:
        pass  # F1: incomplete ⇒ replay — exactly the contract under test
    eng2 = engine(fixed)
    eng2.process_batch(records, batch_id=2)
    return (
        eng2.state.read_all()
        .select(
            F.get_json_object("tasks_json", "$.t1.attempts")
            .cast("long")
            .alias("attempts")
        )
        .groupBy("attempts")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("attempts")
    )


# --- X5: timeout race through the real deadline path -------------------------

@register(
    "timeout_policy",
    """
    SELECT 'after_replay' AS phase, 'Completed' AS status,
           CAST(1 AS BIGINT) AS attempts, CAST(COUNT(*) AS BIGINT) AS n
    FROM events WHERE event_id < 500
    UNION ALL
    SELECT 'after_timeout', 'TimedOut', CAST(0 AS BIGINT), CAST(COUNT(*) AS BIGINT)
    FROM events WHERE event_id < 500
    ORDER BY phase
    """,
    doc="Reference X5 timeout race: with a zero remaining-time budget every "
    "task transitions to TimedOut (attempts RESET — "
    "test/kinesis-consumer.test.js:2985-2988), state is still saved, and "
    "the batch fails for replay; the replayed batch with a normal budget "
    "executes everything fresh (attempts 1, Completed). Both phase "
    "snapshots come from the real saved state table.",
)
def timeout_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from kinesis_stream_consumer_spark.config import EngineConfig
    from kinesis_stream_consumer_spark.sources import events_as_kinesis_records
    from kinesis_stream_consumer_spark.streaming import (
        BatchReplayError,
        Engine,
        TaskDef,
    )

    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 500)
    records = events_as_kinesis_records(ev)
    tmp = tempfile.mkdtemp(prefix="ksc-timeout-")
    cfg = EngineConfig(sequencing_required=False, id_property_names=["id1"])

    def work(message, task):
        return None

    eng = Engine(
        spark,
        cfg,
        state_path=f"{tmp}/state",
        drq_path=f"{tmp}/drq",
        dmq_path=f"{tmp}/dmq",
        process_one_defs=[TaskDef("t1", work)],
    )
    try:
        eng.process_batch(records, batch_id=1, remaining_time_ms=0)
    except BatchReplayError:
        pass  # expected: everything timed out ⇒ replay

    def snapshot(phase):
        return (
            eng.state.read_all()
            .select(
                F.lit(phase).alias("phase"),
                F.get_json_object("tasks_json", "$.t1.status").alias("status"),
                F.get_json_object("tasks_json", "$.t1.attempts")
                .cast("long")
                .alias("attempts"),
            )
            .groupBy("phase", "status", "attempts")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .localCheckpoint(eager=True)  # freeze before the next save overwrites
        )

    snap1 = snapshot("after_timeout")
    eng.process_batch(records, batch_id=2)  # normal budget ⇒ fresh execution
    snap2 = snapshot("after_replay")
    return snap1.unionByName(snap2).orderBy("phase")


# --- D2: DRQ envelopes through the real ingest path --------------------------

@register(
    "drq_envelopes_ingest",
    """
    SELECT 'DR|K|2.0' AS ver,
           'K|TestStream|consumer:dev' AS streamConsumerId,
           'S|shardId-' || lpad(CAST(CAST(user_id % 4 AS INTEGER) AS VARCHAR), 12, '0')
             AS shardOrEventID,
           'shardId-' || lpad(CAST(CAST(user_id % 4 AS INTEGER) AS VARCHAR), 12, '0')
             || ':' || lpad(CAST(event_id AS VARCHAR), 56, '0') AS eventID,
           'unparseable record data (S6)' AS reasonUnusable,
           CAST(user_id AS VARCHAR) AS partitionKey
    FROM events
    WHERE event_id < 500 AND event_id % 10 = 0
    ORDER BY eventID
    """,
    doc="Reference D2 through the REAL ingest path: every 10th record's "
    "payload is corrupted to non-JSON, ingest partitions it unusable (P1), "
    "and dead_record_envelopes builds the 'DR|K|2.0' envelope with the "
    "partition-key fallback chain (kinesis-processing.js:634-647,743-746). "
    "The oracle predicts each envelope from the corruption rule.",
)
def drq_envelopes_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.config import EngineConfig
    from kinesis_stream_consumer_spark.sources import events_as_kinesis_records
    from kinesis_stream_consumer_spark.streaming.dlq import dead_record_envelopes
    from kinesis_stream_consumer_spark.streaming.ingest import ingest

    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 500)
    records = events_as_kinesis_records(ev)
    # corrupt every 10th payload (sequenceNumber carries the event_id)
    corrupted = records.withColumn(
        "kinesis",
        F.when(
            F.col("kinesis.sequenceNumber").cast("long") % 10 == 0,
            F.col("kinesis").withField(
                "data", F.base64(F.lit("<not json>").cast("binary"))
            ),
        ).otherwise(F.col("kinesis")),
    )
    cfg = EngineConfig()
    unusable = ingest(corrupted, cfg).unusable
    return (
        dead_record_envelopes(unusable, cfg.stream_consumer_id, "K")
        .select(
            "ver",
            "streamConsumerId",
            "shardOrEventID",
            "eventID",
            "reasonUnusable",
            "partitionKey",
        )
        .orderBy("eventID")
    )


# --- C1/C2: consumer identity + staged resource names ------------------------

@register(
    "consumer_identity",
    """
    SELECT * FROM (VALUES
      ('base',     'consumer:dev',    'K|TestStream|consumer:dev',
       'StreamConsumerBatchState_DEV', 'DeadRecordQueue_DEV', 'DeadMessageQueue_DEV'),
      ('suffixed', 'consumer:dev|s1', 'K|TestStream|consumer:dev|s1',
       'StreamConsumerBatchState_DEV', 'DeadRecordQueue_DEV', 'DeadMessageQueue_DEV'),
      ('dynamodb', 'consumer:dev',    'D|TestStream|consumer:dev',
       'StreamConsumerBatchState_DEV', 'DeadRecordQueue_DEV', 'DeadMessageQueue_DEV'),
      ('prod',     'consumer:prod',   'K|TestStream|consumer:prod',
       'StreamConsumerBatchState_PROD', 'DeadRecordQueue_PROD', 'DeadMessageQueue_PROD')
    ) AS t(cfg_case, consumer_id, stream_consumer_id, state_table, drq_name, dmq_name)
    ORDER BY cfg_case
    """,
    doc="Reference C1/C2: consumer identity '<function>:<stage>[|<suffix>]', "
    "stream-consumer id '<K|D>|<stream>|<consumer>' and stage-suffixed "
    "resource names (kinesis-consumer.js:82, default-kinesis-options.json:9-15, "
    "asserted test/batch.test.js:88-152) — emitted from real EngineConfig "
    "instances so the driver pins the identity scheme.",
)
def consumer_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kinesis_stream_consumer_spark.config import EngineConfig, StreamType

    cases = {
        "base": EngineConfig(),
        "suffixed": EngineConfig(consumer_id_suffix="s1"),
        "dynamodb": EngineConfig(stream_type=StreamType.dynamodb),
        "prod": EngineConfig(stage="prod"),
    }
    rows = [
        (
            name,
            c.consumer_id,
            c.stream_consumer_id,
            c.state_table,
            c.drq_name,
            c.dmq_name,
        )
        for name, c in sorted(cases.items())
    ]
    return spark.createDataFrame(
        rows,
        "cfg_case string, consumer_id string, stream_consumer_id string, "
        "state_table string, drq_name string, dmq_name string",
    ).orderBy("cfg_case")


# --- F3: lifecycle hooks fire ------------------------------------------------

@register(
    "hooks_fire",
    """
    SELECT 'messages_seen' AS hook, CAST(COUNT(*) AS BIGINT) AS n
    FROM events WHERE event_id < 200
    UNION ALL SELECT 'post_finalise_batch', 1
    UNION ALL SELECT 'pre_finalise_batch', 1
    UNION ALL SELECT 'pre_process_batch', 1
    ORDER BY hook
    """,
    doc="Reference F3: the three lifecycle hooks (preProcessBatch, "
    "preFinaliseBatch, postFinaliseBatch — kinesis-processing.js:292-298) "
    "each fire exactly once per batch through the real engine; the "
    "post-hook's BatchResult carries the message count.",
)
def hooks_fire(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from kinesis_stream_consumer_spark.config import EngineConfig
    from kinesis_stream_consumer_spark.sources import events_as_kinesis_records
    from kinesis_stream_consumer_spark.streaming import Engine, TaskDef

    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 200)
    records = events_as_kinesis_records(ev)
    fired = {"pre_process_batch": 0, "pre_finalise_batch": 0}
    seen = {"messages": 0, "post_finalise_batch": 0}

    def pre_process(df, engine):
        fired["pre_process_batch"] += 1
        return df

    def pre_finalise(df, engine):
        fired["pre_finalise_batch"] += 1

    def post_finalise(result, engine):
        seen["post_finalise_batch"] += 1
        seen["messages"] = result.messages

    tmp = tempfile.mkdtemp(prefix="ksc-hooks-")
    cfg = EngineConfig(
        sequencing_required=False,
        id_property_names=["id1"],
        pre_process_batch=pre_process,
        pre_finalise_batch=pre_finalise,
        post_finalise_batch=post_finalise,
    )
    eng = Engine(
        spark,
        cfg,
        state_path=f"{tmp}/state",
        drq_path=f"{tmp}/drq",
        dmq_path=f"{tmp}/dmq",
        process_one_defs=[TaskDef("t1", lambda m, t: None)],
    )
    eng.process_batch(records, batch_id=1)
    rows = [
        ("messages_seen", seen["messages"]),
        ("post_finalise_batch", seen["post_finalise_batch"]),
        ("pre_finalise_batch", fired["pre_finalise_batch"]),
        ("pre_process_batch", fired["pre_process_batch"]),
    ]
    return spark.createDataFrame(rows, "hook string, n long").orderBy("hook")


# --- F2: resubmit incomplete messages (unsequenced) --------------------------

@register(
    "resubmit_incomplete",
    """
    SELECT event_id
    FROM events
    WHERE event_id < 500 AND event_type = 'error'
    ORDER BY event_id
    """,
    doc="Reference F2: in unsequenced mode with a resubmit sink configured, "
    "incomplete messages are RESUBMITTED to the source instead of failing "
    "the whole batch (kinesis-consumer.unseq.test.js:1521,1867) — ordering "
    "doesn't matter there, so only the stragglers replay. The query runs "
    "the real engine and reads the resubmitted records back from the sink.",
)
def resubmit_incomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from kinesis_stream_consumer_spark.config import EngineConfig
    from kinesis_stream_consumer_spark.sources import events_as_kinesis_records
    from kinesis_stream_consumer_spark.sources.records import KINESIS_RECORD_SCHEMA
    from kinesis_stream_consumer_spark.streaming import Engine, TaskDef

    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 500)
    records = events_as_kinesis_records(ev)
    tmp = tempfile.mkdtemp(prefix="ksc-resubmit-")

    def flaky(message, task):
        if message["k2"] == "error":
            raise RuntimeError("still failing")

    cfg = EngineConfig(sequencing_required=False, id_property_names=["id1"])
    eng = Engine(
        spark,
        cfg,
        state_path=f"{tmp}/state",
        drq_path=f"{tmp}/drq",
        dmq_path=f"{tmp}/dmq",
        process_one_defs=[TaskDef("t1", flaky)],
        resubmit_path=f"{tmp}/resubmit",
    )
    eng.process_batch(records, batch_id=1)  # must NOT raise — F2 contract
    resubmitted = spark.read.schema(KINESIS_RECORD_SCHEMA).json(f"{tmp}/resubmit")
    return resubmitted.select(
        F.col("kinesis.sequenceNumber").cast("long").alias("event_id")
    ).orderBy("event_id")


# --- X4/F1: max-attempts discard policy as a declarative rule ---------------

@register(
    "attempts_discard_policy",
    """
    WITH tracked AS (
      SELECT event_id,
             CAST(event_id % 12 AS INTEGER) AS attempts
      FROM events WHERE event_id < 5000
    )
    SELECT CASE
             WHEN attempts >= 10 THEN 'Discarded'
             WHEN attempts = 0  THEN 'Unstarted'
             ELSE 'Failed'
           END AS status,
           COUNT(*) AS n,
           MIN(attempts) AS min_attempts,
           MAX(attempts) AS max_attempts
    FROM tracked
    GROUP BY 1
    ORDER BY status
    """,
    doc="Reference X4: per-task attempts accounting with maxNumberOfAttempts "
    "(default 10) ⇒ Discarded — poison-pill ejection so one bad message "
    "can't block the shard forever (default-kinesis-options.json:37, "
    "test/kinesis-consumer.test.js:2530-2759). Expressed as the engine's "
    "declarative status-transition rule over the state table.",
)
def attempts_discard_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 5000)
    tracked = ev.select(
        "event_id", (F.col("event_id") % 12).cast("int").alias("attempts")
    )
    status = (
        F.when(F.col("attempts") >= 10, "Discarded")
        .when(F.col("attempts") == 0, "Unstarted")
        .otherwise("Failed")
    )
    return (
        tracked.select(status.alias("status"), "attempts")
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("attempts").alias("min_attempts"),
            F.max("attempts").alias("max_attempts"),
        )
        .orderBy("status")
    )
