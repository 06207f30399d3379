"""Record sources: the engine's canonical input schemas and readers.

The reference is push-based (one Lambda Kinesis event per batch,
test/samples.js:195-232). The Spark engine inverts this to pull: a batch
DataFrame of records, or a Structured Streaming source whose micro-batch
plays the role of one Lambda event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Kinesis stream-event record (reference test/samples.js:195-213,267-287).
KINESIS_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("eventID", T.StringType()),
        T.StructField("eventVersion", T.StringType()),
        T.StructField("eventName", T.StringType()),
        T.StructField("eventSource", T.StringType()),
        T.StructField("eventSourceARN", T.StringType()),
        T.StructField("awsRegion", T.StringType()),
        T.StructField("invokeIdentityArn", T.StringType()),
        T.StructField(
            "kinesis",
            T.StructType(
                [
                    T.StructField("kinesisSchemaVersion", T.StringType()),
                    T.StructField("partitionKey", T.StringType()),
                    T.StructField("explicitHashKey", T.StringType()),
                    T.StructField("sequenceNumber", T.StringType()),
                    T.StructField("data", T.StringType()),  # base64
                ]
            ),
        ),
    ]
)

# DynamoDB stream-event record (reference test/samples.js:289-353; the
# second supported streamType, kinesis-processing.js:28). Keys/images kept
# as JSON strings — attribute-value maps are schema-on-read exactly like
# message bodies.
DYNAMODB_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("eventID", T.StringType()),
        T.StructField("eventVersion", T.StringType()),
        T.StructField("eventName", T.StringType()),  # INSERT | MODIFY | REMOVE
        T.StructField("eventSource", T.StringType()),
        T.StructField("eventSourceARN", T.StringType()),
        T.StructField("awsRegion", T.StringType()),
        T.StructField(
            "dynamodb",
            T.StructType(
                [
                    T.StructField("Keys", T.StringType()),  # JSON
                    T.StructField("NewImage", T.StringType()),  # JSON
                    T.StructField("OldImage", T.StringType()),  # JSON
                    T.StructField("SequenceNumber", T.StringType()),
                    T.StructField("SizeBytes", T.LongType()),
                    T.StructField("StreamViewType", T.StringType()),
                ]
            ),
        ),
    ]
)


def read_records(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read a directory of record files (json or parquet)."""
    if path.endswith(".json") or path.endswith("json"):
        return spark.read.schema(KINESIS_RECORD_SCHEMA).json(path)
    return spark.read.parquet(path)


def stream_records(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Structured Streaming file source over record files: each trigger's
    micro-batch ≙ one reference "stream event" (S1). In production this is
    `spark.readStream.format("kinesis")` / Kafka; the engine only sees a
    records DataFrame either way."""
    return (
        spark.readStream.schema(KINESIS_RECORD_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .json(path)
    )


def kinesis_stream(
    spark: SparkSession,
    stream_name: str,
    region: str,
    endpoint_url: str | None = None,
    starting_position: str = "LATEST",
    connector_format: str = "aws-kinesis",
) -> DataFrame:
    """Live Kinesis source seam: `readStream.format("aws-kinesis")` with
    the connector's option names, normalized to KINESIS_RECORD_SCHEMA so
    the engine sees the SAME records DataFrame as the file-source path
    (the one the test/bench harness drives).

    The Kinesis connector (spark-streaming-sql-kinesis-connector, or
    Kinesis->Kafka via MSK) ships as a separate jar; this container has
    none, so calling without the jar raises Spark's standard
    DATA_SOURCE_NOT_FOUND, which we re-raise with the wiring instructions.
    The option mapping and projection below are the real integration
    surface — swap the jar in and the engine runs unchanged (reference S1:
    kinesis-consumer.js handler receives the same record shape from
    Lambda's Kinesis trigger)."""
    reader = (
        spark.readStream.format(connector_format)
        .option("streamName", stream_name)
        .option("region", region)
        .option("startingposition", starting_position)
    )
    if endpoint_url:
        reader = reader.option("endpointUrl", endpoint_url)
    try:
        raw = reader.load()
    except Exception as e:  # connector jar absent in this environment
        raise RuntimeError(
            "Kinesis connector not on the classpath. Add the "
            "spark-streaming-sql-kinesis-connector jar (--packages) or "
            "point the engine at the file/Kafka source path; the engine "
            "consumes the same records DataFrame either way."
        ) from e
    return project_kinesis_connector_records(raw, stream_name, region)


def project_kinesis_connector_records(
    raw: DataFrame, stream_name: str, region: str
) -> DataFrame:
    """Connector columns -> reference Lambda record shape (S1). Pure
    column projection, testable without the connector jar. eventID is
    '{shardId}:{sequenceNumber}' — the same shape as
    events_as_kinesis_records and the reference's sample eventIDs —
    because ingest derives shard_id as split(eventID, ':')[0]; a literal
    prefix here would collapse every shard into one sequencing chain and
    one (consumer, shard) state partition."""
    return raw.select(
        F.concat(F.col("shardId"), F.lit(":"),
                 F.col("sequenceNumber")).alias("eventID"),
        F.lit("1.0").alias("eventVersion"),
        F.lit("aws:kinesis:record").alias("eventName"),
        F.lit("aws:kinesis").alias("eventSource"),
        F.concat(
            F.lit(f"arn:aws:kinesis:{region}:000000000000:stream/"),
            F.lit(stream_name),
        ).alias("eventSourceARN"),
        F.lit(region).alias("awsRegion"),
        F.lit(None).cast("string").alias("invokeIdentityArn"),
        F.struct(
            F.lit("1.0").alias("kinesisSchemaVersion"),
            F.col("partitionKey").alias("partitionKey"),
            F.lit(None).cast("string").alias("explicitHashKey"),
            F.col("sequenceNumber").alias("sequenceNumber"),
            F.base64(F.col("data")).alias("data"),
        ).alias("kinesis"),
    )


def dynamodb_stream(
    spark: SparkSession,
    table_name: str,
    region: str,
    endpoint_url: str | None = None,
    starting_position: str = "LATEST",
    connector_format: str = "dynamodb-streams",
) -> DataFrame:
    """Live DynamoDB Streams source seam (reference S2,
    kinesis-processing.js:28 `streamType: 'dynamodb'`): same contract as
    `kinesis_stream` — connector options in, DYNAMODB_RECORD_SCHEMA
    records out, so `streaming/ingest.py`'s attribute-value unmarshal path
    runs unchanged. DynamoDB Streams is Kinesis-compatible via the
    Streams Kinesis Adapter, so the same connector jar families apply;
    without one on the classpath this raises the actionable wiring error
    rather than a bare ClassNotFound."""
    reader = (
        spark.readStream.format(connector_format)
        .option("tableName", table_name)
        .option("region", region)
        .option("startingposition", starting_position)
    )
    if endpoint_url:
        reader = reader.option("endpointUrl", endpoint_url)
    try:
        raw = reader.load()
    except Exception as e:
        raise RuntimeError(
            "DynamoDB Streams connector not on the classpath. Add a "
            "Kinesis-adapter-compatible connector jar (--packages), or "
            "feed DYNAMODB_RECORD_SCHEMA record files to "
            "stream_records()/read_records(); the engine consumes the "
            "same records DataFrame either way."
        ) from e
    return project_dynamodb_connector_records(raw, table_name, region)


def project_dynamodb_connector_records(
    raw: DataFrame, table_name: str, region: str
) -> DataFrame:
    """Connector columns -> DYNAMODB_RECORD_SCHEMA (S2). Pure column
    projection, testable without the connector jar."""
    return raw.select(
        F.col("eventID"),
        F.lit("1.1").alias("eventVersion"),
        F.col("eventName"),
        F.lit("aws:dynamodb").alias("eventSource"),
        F.concat(
            F.lit(f"arn:aws:dynamodb:{region}:000000000000:table/"),
            F.lit(table_name),
            F.lit("/stream"),
        ).alias("eventSourceARN"),
        F.lit(region).alias("awsRegion"),
        F.struct(
            F.col("keys").alias("Keys"),
            F.col("newImage").alias("NewImage"),
            F.col("oldImage").alias("OldImage"),
            F.col("sequenceNumber").alias("SequenceNumber"),
            F.col("sizeBytes").alias("SizeBytes"),
            F.col("streamViewType").alias("StreamViewType"),
        ).alias("dynamodb"),
    )


def events_as_kinesis_records(
    events: DataFrame,
    stream_name: str = "TestStream",
    n_shards: int = 4,
    region: str = "us-west-2",
) -> DataFrame:
    """Wrap the TESTDATA ``events`` table rows as Kinesis stream-event
    records: the message body is a JSON object carrying the event fields,
    base64-encoded into kinesis.data; partitionKey = user_id; shard =
    user_id % n_shards; sequenceNumber = zero-padded 56-digit string built
    from the event_id (Kinesis seqNos are 56-digit integers, SURVEY §1.3).

    Pure column expressions — this builder runs at scale as the parity
    harness for the ingest path.
    """
    shard = F.concat(
        F.lit("shardId-"), F.lpad((F.col("user_id") % n_shards).cast("string"), 12, "0")
    )
    seq_no = F.lpad(F.col("event_id").cast("string"), 56, "0")
    body = F.to_json(
        F.struct(
            F.col("event_id").alias("id1"),
            F.col("user_id").alias("k1"),
            F.col("event_type").alias("k2"),
            F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("n1"),
            F.col("event_id").alias("n2"),
            F.col("value").alias("value"),
            F.col("props").alias("props"),
        )
    )
    return events.select(
        F.concat(shard, F.lit(":"), seq_no).alias("eventID"),
        F.lit("1.0").alias("eventVersion"),
        F.lit("aws:kinesis:record").alias("eventName"),
        F.lit("aws:kinesis").alias("eventSource"),
        F.concat(
            F.lit(f"arn:aws:kinesis:{region}:111111111111:stream/"), F.lit(stream_name)
        ).alias("eventSourceARN"),
        F.lit(region).alias("awsRegion"),
        F.lit("arn:aws:iam::111111111111:role/consumer").alias("invokeIdentityArn"),
        F.struct(
            F.lit("1.0").alias("kinesisSchemaVersion"),
            F.col("user_id").cast("string").alias("partitionKey"),
            F.lit(None).cast("string").alias("explicitHashKey"),
            seq_no.alias("sequenceNumber"),
            F.base64(body.cast("binary")).alias("data"),
        ).alias("kinesis"),
    )
