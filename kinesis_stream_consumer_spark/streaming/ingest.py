"""Ingest: records DataFrame → (messages, unusable) — reference S3–S7, I1–I3, P1.

Everything here is declarative column expressions (whole-stage codegen);
the only Python is the KPL de-aggregation UDF (S3), which fires only when
``config.kpl_encoded`` and is Arrow-batched via pandas_udf.

Reference parity:
- S3  KPL deagg + subSequenceNumber: kpl-deagg-async.js:50-186
- S4/S5 extract + unusable split:    kinesis-processing.js:477-489,533-570
- S6  base64 + JSON parse:           kinesis-processing.js:502-517
- I1  MD5 fingerprints:              kinesis-identify.js:33-44,135-137
- I2  event id/seqNos:               kinesis-identify.js:54-68
- I3  id/key/seqNo property resolution (message ▷ userRecord ▷ record,
      compound names, mandatory-key enforcement): kinesis-identify.js:85-133
- P1  usable/unusable partition:     kinesis-processing.js:483-487
"""

from __future__ import annotations

import base64 as b64
from dataclasses import dataclass
from typing import Iterator, List, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from kinesis_stream_consumer_spark.config import EngineConfig, StreamType

# Record-level fields the property resolver may fall back to when a
# configured property name is absent from the message body
# (reference lookup order message ▷ userRecord ▷ record,
# kinesis-identify.js:170-189).
_RECORD_LEVEL = {
    "partitionKey": lambda: F.col("partition_key"),
    "explicitHashKey": lambda: F.col("explicit_hash_key"),
    "sequenceNumber": lambda: F.col("event_seq_no"),
    "eventID": lambda: F.col("event_id"),
    "eventSeqNo": lambda: F.col("event_seq_no"),
    "eventSubSeqNo": lambda: F.col("event_sub_seq_no").cast("string"),
}

_USER_RECORD_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("partitionKey", T.StringType()),
            T.StructField("explicitHashKey", T.StringType()),
            T.StructField("data", T.StringType()),  # base64 of sub-record
            T.StructField("subSequenceNumber", T.LongType()),
        ]
    )
)


@pandas_udf(_USER_RECORD_SCHEMA)
def _kpl_deagg_udf(data_b64: pd.Series) -> pd.Series:
    """S3: de-aggregate KPL blobs; non-KPL passthrough; bad blob → None
    (→ unusable branch). Arrow-batched — one Python call per record batch."""
    from kinesis_stream_consumer_spark.sources.kpl import kpl_deaggregate

    def deagg(v):
        if v is None:
            return None
        try:
            raw = b64.b64decode(v)
            urs = kpl_deaggregate(raw)
        except Exception:
            return None  # checksum/parse failure ⇒ unusable record
        if urs is None:  # not KPL-aggregated: single passthrough user record
            return [
                {
                    "partitionKey": None,
                    "explicitHashKey": None,
                    "data": v,
                    "subSequenceNumber": None,
                }
            ]
        return [
            {
                "partitionKey": u["partitionKey"],
                "explicitHashKey": u["explicitHashKey"],
                "data": b64.b64encode(u["data"]).decode(),
                "subSequenceNumber": u["subSequenceNumber"],
            }
            for u in urs
        ]

    return data_b64.map(deagg)


def _msg_path(name: str):
    """get_json_object path for a (possibly compound 'a.b.c') property name."""
    return F.get_json_object("data_str", "$." + name)


def _resolve(name: str):
    """I3 lookup order: message body ▷ record-level fallback."""
    expr = _msg_path(name)
    if name in _RECORD_LEVEL:
        expr = F.coalesce(expr, _RECORD_LEVEL[name]())
    return expr


def _canonical(names: Sequence[str]):
    """'n1:v1|n2:v2' canonical serialization (test/batch-10-state.json:14-16)."""
    if not names:
        return F.lit(None).cast("string")
    parts = []
    for n in names:
        parts.append(F.concat_ws(":", F.lit(n), F.coalesce(_resolve(n), F.lit(""))))
    return F.concat_ws("|", *parts)


@dataclass
class IngestResult:
    messages: DataFrame
    unusable: DataFrame


def _flatten_kinesis(records: DataFrame, config: EngineConfig) -> DataFrame:
    """Normalize a Kinesis records DF to the flat envelope columns."""
    flat = records.select(
        F.col("eventID").alias("event_id"),
        F.split(F.col("eventID"), ":").getItem(0).alias("shard_id"),
        F.col("kinesis.sequenceNumber").alias("event_seq_no"),
        F.col("kinesis.partitionKey").alias("partition_key"),
        F.col("kinesis.explicitHashKey").alias("explicit_hash_key"),
        F.col("kinesis.data").alias("data_b64"),
        F.col("eventSourceARN").alias("event_source_arn"),
        F.to_json(F.struct(*records.columns)).alias("record_json"),
    )
    if config.kpl_encoded:
        # S5: deagg → posexplode; outer keeps failed blobs as one null row
        flat = (
            flat.withColumn("user_records", _kpl_deagg_udf(F.col("data_b64")))
            .select(
                "*",
                F.explode_outer("user_records").alias("ur"),
            )
            .select(
                "event_id",
                "shard_id",
                "event_seq_no",
                F.coalesce(F.col("ur.partitionKey"), F.col("partition_key")).alias(
                    "partition_key"
                ),
                F.coalesce(
                    F.col("ur.explicitHashKey"), F.col("explicit_hash_key")
                ).alias("explicit_hash_key"),
                F.col("ur.data").alias("data_b64"),
                F.col("ur.subSequenceNumber").alias("event_sub_seq_no"),
                "event_source_arn",
                "record_json",
            )
        )
    else:
        flat = flat.withColumn("event_sub_seq_no", F.lit(None).cast("long"))
    return flat


def _flatten_dynamodb(records: DataFrame) -> DataFrame:
    """S2/S7: DynamoDB stream records — the NewImage (▷ Keys) JSON *is* the
    message (useStreamEventRecordAsMessage path, kinesis-processing.js:114)."""
    return records.select(
        F.col("eventID").alias("event_id"),
        F.split(F.col("eventID"), ":").getItem(0).alias("shard_id"),
        F.col("dynamodb.SequenceNumber").alias("event_seq_no"),
        F.lit(None).cast("string").alias("partition_key"),
        F.lit(None).cast("string").alias("explicit_hash_key"),
        F.base64(
            F.coalesce(F.col("dynamodb.NewImage"), F.col("dynamodb.Keys")).cast(
                "binary"
            )
        ).alias("data_b64"),
        F.col("eventSourceARN").alias("event_source_arn"),
        F.to_json(F.struct(*records.columns)).alias("record_json"),
        F.lit(None).cast("long").alias("event_sub_seq_no"),
    )


def ingest(records: DataFrame, config: EngineConfig) -> IngestResult:
    """records → identified messages + unusable records (S3–S7, I1–I3, P1)."""
    if config.stream_type == StreamType.dynamodb:
        flat = _flatten_dynamodb(records)
    else:
        flat = _flatten_kinesis(records, config)

    # parse once: msg_json doubles as the validity signal (null ⇒ unusable)
    # and the canonical serialization for the message MD5
    decoded = (
        flat.withColumn("data_str", F.unbase64(F.col("data_b64")).cast("string"))
        .withColumn("msg_json", F.to_json(F.try_parse_json(F.col("data_str"))))
        .withColumn("parsed_ok", F.col("msg_json").isNotNull())
    )

    # I1 MD5 fingerprints + I3 canonical ids/keys/seqNos
    seq_no_names = list(config.seq_no_property_names)
    seq_no_col = (
        _canonical(seq_no_names)
        if seq_no_names
        # fallback [['eventSeqNo',...],['eventSubSeqNo',...]] (kinesis-identify.js:118-124)
        else F.concat_ws(
            "|",
            F.concat_ws(":", F.lit("eventSeqNo"), F.col("event_seq_no")),
            F.concat_ws(
                ":",
                F.lit("eventSubSeqNo"),
                F.coalesce(F.col("event_sub_seq_no").cast("string"), F.lit("")),
            ),
        )
    )
    identified = decoded.select(
        "event_id",
        "shard_id",
        "event_seq_no",
        "event_sub_seq_no",
        "partition_key",
        "explicit_hash_key",
        "event_source_arn",
        "record_json",
        "data_b64",
        "data_str",
        "parsed_ok",
        F.md5(F.col("data_str").cast("binary")).alias("data_md5"),
        F.md5(F.col("record_json").cast("binary")).alias("rec_md5"),
        F.md5(F.coalesce(F.col("msg_json"), F.lit("")).cast("binary")).alias(
            "msg_md5"
        ),
        _canonical(config.id_property_names).alias("id"),
        _canonical(config.key_property_names).alias("key"),
        seq_no_col.alias("seqNo"),
        F.array(
            *[_resolve(n) for n in config.seq_no_property_names]
        ).alias("seq_no_parts")
        if seq_no_names
        else F.array(
            F.col("event_seq_no"),
            F.coalesce(F.col("event_sub_seq_no").cast("string"), F.lit("0")),
        ).alias("seq_no_parts"),
    )

    # Mandatory-property enforcement (I3): keys mandatory in per-key mode,
    # seqNo parts mandatory when sequencing — missing ⇒ unusable (throw in
    # the reference, kinesis-identify.js:85-133).
    reasons = [
        F.when(~F.col("parsed_ok"), "unparseable record data (S6)"),
        F.when(F.col("data_b64").isNull(), "KPL de-aggregation failed (S3)"),
    ]
    if config.sequencing_per_key:
        missing_key = F.lit(False)
        for n in config.key_property_names:
            missing_key = missing_key | _resolve(n).isNull()
        reasons.append(
            F.when(missing_key, "missing mandatory key properties (I3)")
        )
    if config.sequencing_required and seq_no_names:
        missing_seq = F.lit(False)
        for n in seq_no_names:
            missing_seq = missing_seq | _resolve(n).isNull()
        reasons.append(
            F.when(missing_seq, "missing mandatory seqNo properties (I3)")
        )
    reason_unusable = F.coalesce(*reasons, F.lit(None).cast("string"))

    tagged = identified.withColumn("reason_unusable", reason_unusable)
    messages = tagged.where(F.col("reason_unusable").isNull()).drop(
        "reason_unusable", "parsed_ok"
    )
    unusable = tagged.where(F.col("reason_unusable").isNotNull()).drop("parsed_ok")
    return IngestResult(messages=messages, unusable=unusable)
