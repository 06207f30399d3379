"""Live-connector seam tests (reference S1/S2, kinesis-consumer.js:197-206).

The container ships no Kinesis/DynamoDB connector jar, so the
`format("aws-kinesis")` load itself can only run when one is provided
(KINESIS_CONNECTOR_JAR on the classpath). What we CAN execute always:

- the pure column projections that turn connector output into the engine's
  canonical record schemas (the actual integration surface), composed with
  the real ingest path end-to-end;
- the no-jar failure mode: the seam raises the actionable wiring error.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kinesis_stream_consumer_spark.config import EngineConfig
from kinesis_stream_consumer_spark.sources.records import (
    KINESIS_RECORD_SCHEMA,
    project_dynamodb_connector_records,
    project_kinesis_connector_records,
)
import importlib

ig = importlib.import_module("kinesis_stream_consumer_spark.streaming.ingest")

# Column shape emitted by the public Kinesis SQL connector
# (spark-streaming-sql-kinesis-connector): data is the raw payload bytes.
CONNECTOR_SCHEMA = T.StructType(
    [
        T.StructField("data", T.BinaryType()),
        T.StructField("streamName", T.StringType()),
        T.StructField("partitionKey", T.StringType()),
        T.StructField("sequenceNumber", T.StringType()),
        T.StructField("shardId", T.StringType()),
    ]
)


def _raw_connector_df(spark):
    rows = [
        (
            b'{"id1": %d, "k1": %d, "n1": %d}' % (i, i % 2, i),
            "TestStream",
            str(i % 2),
            str(10_000 + i),
            f"shardId-{i % 2:012d}",
        )
        for i in range(6)
    ]
    return spark.createDataFrame(rows, CONNECTOR_SCHEMA)


def test_kinesis_projection_matches_record_schema_and_shard_derivation(spark):
    recs = project_kinesis_connector_records(
        _raw_connector_df(spark), "TestStream", "us-west-2"
    )
    # Schema parity with the file-source records (minus nullability).
    assert [f.name for f in recs.schema.fields] == [
        f.name for f in KINESIS_RECORD_SCHEMA.fields
    ]
    assert (
        recs.schema["kinesis"].dataType.fieldNames()
        == KINESIS_RECORD_SCHEMA["kinesis"].dataType.fieldNames()
    )
    out = recs.select(
        "eventID",
        F.split("eventID", ":").getItem(0).alias("derived_shard"),
        "kinesis.sequenceNumber",
    ).collect()
    # ADVICE r3 (high): a literal 'shardId:' eventID prefix collapsed every
    # shard into one sequencing chain. eventID must be '{shard}:{seq}'.
    for r in out:
        assert r.derived_shard.startswith("shardId-"), r.eventID
        assert r.eventID == f"{r.derived_shard}:{r.sequenceNumber}"
    assert {r.derived_shard for r in out} == {
        "shardId-000000000000",
        "shardId-000000000001",
    }


def test_kinesis_projection_flows_through_ingest(spark):
    recs = project_kinesis_connector_records(
        _raw_connector_df(spark), "TestStream", "us-west-2"
    )
    cfg = EngineConfig(
        sequencing_per_key=True,
        id_property_names=["id1"],
        key_property_names=["k1"],
        seq_no_property_names=["n1"],
    )
    res = ig.ingest(recs, cfg)
    rows = res.messages.select("shard_id", "event_seq_no", "msg_md5").collect()
    assert len(rows) == 6
    assert {r.shard_id for r in rows} == {
        "shardId-000000000000",
        "shardId-000000000001",
    }
    assert all(r.msg_md5 for r in rows)


def test_dynamodb_projection_shape(spark):
    raw = spark.createDataFrame(
        [
            (
                "evt-1",
                "INSERT",
                '{"pk": {"S": "a"}}',
                '{"pk": {"S": "a"}, "v": {"N": "1"}}',
                None,
                "111",
                42,
                "NEW_AND_OLD_IMAGES",
            )
        ],
        "eventID string, eventName string, keys string, newImage string, "
        "oldImage string, sequenceNumber string, sizeBytes long, "
        "streamViewType string",
    )
    recs = project_dynamodb_connector_records(raw, "MyTable", "us-west-2")
    row = recs.collect()[0]
    assert row.eventSource == "aws:dynamodb"
    assert row.dynamodb.SequenceNumber == "111"
    assert "table/MyTable/stream" in row.eventSourceARN


def test_kinesis_seam_raises_actionable_error_without_jar(spark):
    from kinesis_stream_consumer_spark.sources.records import kinesis_stream

    if os.environ.get("KINESIS_CONNECTOR_JAR"):
        pytest.skip("connector jar present; live path covered below")
    with pytest.raises(RuntimeError, match="connector not on the classpath"):
        kinesis_stream(spark, "TestStream", "us-west-2")


@pytest.mark.skipif(
    not os.environ.get("KINESIS_CONNECTOR_JAR"),
    reason="no Kinesis connector jar in this container "
    "(set KINESIS_CONNECTOR_JAR and add it to spark.jars to run)",
)
def test_kinesis_seam_live_load(spark):
    from kinesis_stream_consumer_spark.sources.records import kinesis_stream

    df = kinesis_stream(
        spark,
        os.environ.get("KINESIS_STREAM_NAME", "TestStream"),
        os.environ.get("AWS_REGION", "us-west-2"),
        endpoint_url=os.environ.get("KINESIS_ENDPOINT_URL"),
        starting_position="TRIM_HORIZON",
    )
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        f.name for f in KINESIS_RECORD_SCHEMA.fields
    ]
