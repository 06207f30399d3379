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


def _msg_path(name: str, src: str = "data_str"):
    """get_json_object path for a (possibly compound 'a.b.c') property name.

    Resolution semantically targets the canonical EXTRACTED message
    (reference resolves ids off the message object,
    kinesis-identify.js:85-133). With the default JSON extractor the raw
    payload IS that JSON, so ``src`` stays data_str — one parse per
    property, no re-serialization in the loop (inlining the
    to_json(try_parse_json(...)) msg_json expression into every property
    access costs a reparse+reserialize per property — measured ~30%% of
    engine ingest time). A custom extract_message_from_record switches
    ``src`` to msg_json so non-JSON wire formats resolve correctly."""
    return F.get_json_object(src, "$." + name)


def _resolve(name: str, src: str = "data_str"):
    """I3 lookup order: message body ▷ record-level fallback."""
    expr = _msg_path(name, src)
    if name in _RECORD_LEVEL:
        expr = F.coalesce(expr, _RECORD_LEVEL[name]())
    return expr


def _canonical(names: Sequence[str], src: str = "data_str"):
    """'n1:v1|n2:v2' canonical serialization (test/batch-10-state.json:14-16)."""
    if not names:
        return F.lit(None).cast("string")
    parts = []
    for n in names:
        parts.append(
            F.concat_ws(":", F.lit(n), F.coalesce(_resolve(n, src), F.lit("")))
        )
    return F.concat_ws("|", *parts)


@dataclass
class IngestResult:
    messages: DataFrame
    unusable: DataFrame
    # The unfiltered decode→identify frame (messages ∪ unusable, with the
    # reason_unusable column). Consumers that materialize BOTH sides (the
    # engine) should checkpoint THIS and re-derive the split as a column
    # filter: filtering the lazy plans instead lets PushDownPredicate push
    # each side's predicate beneath the projection, re-inlining the
    # unbase64/JSON-parse expressions into the filter — the whole decode
    # runs twice per branch.
    tagged: DataFrame = None


def extract_messages_from_kinesis_record(
    records: DataFrame, config: EngineConfig
) -> DataFrame:
    """Default non-KPL extractMessagesFromRecord: normalize a Kinesis
    records DF to the flat envelope columns (reference
    ``extractMessagesFromKinesisRecord``, kinesis-processing.js:477-489).

    Any custom ``extract_messages_from_record`` must produce the same
    envelope columns: event_id, shard_id, event_seq_no, event_sub_seq_no,
    partition_key, explicit_hash_key, data_b64, event_source_arn,
    record_json."""
    df = records
    for lvl in _kinesis_flat_levels(records.columns):
        df = df.select(*lvl)
    return df


def _kinesis_flat_levels(record_columns) -> list:
    """The non-KPL Kinesis flatten as projection-level Column lists —
    one definition serving both the direct path and the per-engine
    ingest column cache (see ``ingest``'s ``col_cache``)."""
    return [
        [
            F.col("eventID").alias("event_id"),
            F.split(F.col("eventID"), ":").getItem(0).alias("shard_id"),
            F.col("kinesis.sequenceNumber").alias("event_seq_no"),
            F.col("kinesis.partitionKey").alias("partition_key"),
            F.col("kinesis.explicitHashKey").alias("explicit_hash_key"),
            F.col("kinesis.data").alias("data_b64"),
            F.col("eventSourceARN").alias("event_source_arn"),
            F.to_json(
                F.struct(*[F.col(c) for c in record_columns])
            ).alias("record_json"),
        ],
        ["*", F.lit(None).cast("long").alias("event_sub_seq_no")],
    ]


def extract_messages_from_kpl_encoded_record(
    records: DataFrame, config: EngineConfig
) -> DataFrame:
    """Default KPL extractMessagesFromRecord: de-aggregate each blob into
    its user records and explode (reference
    ``extractMessagesFromKplEncodedRecord``, kinesis-processing.js:533-570;
    S5: deagg → explode; outer keeps failed blobs as one null row)."""
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
    return (
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


def _flatten_kinesis(records: DataFrame, config: EngineConfig) -> DataFrame:
    """Normalize a Kinesis records DF to the flat envelope columns."""
    if config.kpl_encoded:
        return extract_messages_from_kpl_encoded_record(records, config)
    return extract_messages_from_kinesis_record(records, config)


# DynamoDB attribute-value simplification (S2): stream images arrive as
# typed attribute values {"id1": {"N": "123"}, "k1": {"S": "x"}}; the
# reference simplifies them to plain JSON before identification
# (test/samples.js:358-367 via awsStreamConsumerCore's simplifyKeysNew,
# exercised by test/kinesis-processing.test.js:1357-1510). Done here as a
# recursive JSON transform in an Arrow-batched pandas UDF — runs once per
# record on ingest, exactly like the reference's per-record simplify.
def simplify_dynamodb_attribute_values(obj):
    """{'S': 'x'} → 'x', {'N': '1'} → 1, {'M': {...}} → {...}, etc.
    Non-attribute-value JSON passes through unchanged, so pre-simplified
    fixtures keep working."""
    _AV_KEYS = {"S", "N", "B", "BOOL", "NULL", "M", "L", "SS", "NS", "BS"}

    def _num(s):
        try:
            i = int(s)
            return i
        except (TypeError, ValueError):
            try:
                return float(s)
            except (TypeError, ValueError):
                return s

    def simp(v):
        if isinstance(v, dict):
            if len(v) == 1 and next(iter(v)) in _AV_KEYS:
                t, inner = next(iter(v.items()))
                if t == "S" or t == "B":
                    return inner
                if t == "N":
                    return _num(inner)
                if t == "BOOL":
                    return bool(inner)
                if t == "NULL":
                    return None
                if t == "M":
                    return {k: simp(x) for k, x in inner.items()}
                if t == "L":
                    return [simp(x) for x in inner]
                if t == "SS" or t == "BS":
                    return list(inner)
                if t == "NS":
                    return [_num(x) for x in inner]
            return {k: simp(x) for k, x in v.items()}
        if isinstance(v, list):
            return [simp(x) for x in v]
        return v

    return simp(obj)


@pandas_udf(T.StringType())
def _simplify_ddb_udf(image_json: pd.Series) -> pd.Series:
    import json as _json

    def one(s):
        if s is None:
            return None
        try:
            return _json.dumps(
                simplify_dynamodb_attribute_values(_json.loads(s)),
                separators=(",", ":"),
                sort_keys=True,
            )
        except Exception:
            return s  # not JSON — leave for the unusable branch downstream

    return image_json.map(one)


def extract_messages_from_dynamodb_record(
    records: DataFrame, config: EngineConfig
) -> DataFrame:
    """S2/S7: DynamoDB stream records — the simplified NewImage (▷ Keys)
    JSON *is* the message (useStreamEventRecordAsMessage path,
    kinesis-processing.js:114; attribute values simplified per
    test/samples.js:358-367)."""
    return records.select(
        F.col("eventID").alias("event_id"),
        F.split(F.col("eventID"), ":").getItem(0).alias("shard_id"),
        F.col("dynamodb.SequenceNumber").alias("event_seq_no"),
        F.lit(None).cast("string").alias("partition_key"),
        F.lit(None).cast("string").alias("explicit_hash_key"),
        F.base64(
            _simplify_ddb_udf(
                F.coalesce(F.col("dynamodb.NewImage"), F.col("dynamodb.Keys"))
            ).cast("binary")
        ).alias("data_b64"),
        F.col("eventSourceARN").alias("event_source_arn"),
        F.to_json(F.struct(*records.columns)).alias("record_json"),
        F.lit(None).cast("long").alias("event_sub_seq_no"),
    )


def _flatten_dynamodb(records: DataFrame, config: EngineConfig) -> DataFrame:
    return extract_messages_from_dynamodb_record(records, config)


def extract_json_message_from_record(data_str):
    """Default extractMessageFromRecord: parse the decoded payload as JSON
    and re-serialize canonically; null ⇒ unusable (S6,
    kinesis-processing.js:502-517). A custom override maps any wire format
    (CSV, protobuf, …) to a JSON-string Column — Column expression or
    Arrow-batched pandas_udf, the engine doesn't care."""
    return F.to_json(F.try_parse_json(data_str))


def generate_kinesis_md5s(cols):
    """Default generateMD5s (I1): md5 fingerprints of the message, record
    and raw data (reference kinesis-identify.js:33-44,135-137). ``cols``
    maps {data_str, record_json, msg_json} → Columns; returns
    {msg_md5, rec_md5, data_md5} Columns."""
    return {
        "msg_md5": F.md5(F.coalesce(cols["msg_json"], F.lit("")).cast("binary")),
        "rec_md5": F.md5(cols["record_json"].cast("binary")),
        "data_md5": F.md5(cols["data_str"].cast("binary")),
    }


def _seam_free(config: EngineConfig) -> bool:
    """True when ingest uses only the default (config-static) column path —
    no pluggable fn seams, no KPL explode — so its Column forest can be
    cached across micro-batches (seam fns may close over per-call state;
    the defaults are pure functions of the config)."""
    return (
        config.extract_messages_from_record is None
        and config.resolve_event_id_and_seq_nos is None
        and config.extract_message_from_record is None
        and config.generate_md5s is None
        and config.resolve_message_ids_and_seq_nos is None
        and not (config.stream_type != StreamType.dynamodb and config.kpl_encoded)
    )


def ingest(
    records: DataFrame,
    config: EngineConfig,
    col_cache: dict | None = None,
) -> IngestResult:
    """records → identified messages + unusable records (S3–S7, I1–I3, P1).

    Every step is a pluggable seam (reference kinesis-processing.js:284-299):
    ``config.extract_messages_from_record`` replaces the record→envelope
    flatten, ``config.resolve_event_id_and_seq_nos`` rewrites the envelope's
    event identity columns, ``config.extract_message_from_record`` maps the
    decoded payload to the canonical message JSON, ``config.generate_md5s``
    supplies the fingerprint columns, and
    ``config.resolve_message_ids_and_seq_nos`` overrides id/key/seqNo
    resolution. None ⇒ the defaults below.

    ``col_cache``: optional caller-owned dict. On the seam-free default
    path the entire expression forest (flatten select, decode chain,
    identify/md5 select, unusable tagging) is a pure function of the
    config and the record schema, but constructing it is ~0.2 s of py4j
    round-trips — a real per-micro-batch driver cost. The engine passes a
    per-instance dict so batch 2+ replays the cached projection-level
    Column lists (Columns are unresolved expressions, reusable across
    inputs of the same schema). The projection LEVELS are preserved
    exactly (not inlined): data_str/msg_json are multiply-referenced, and
    CollapseProject only spares multiply-referenced aliases when they are
    materialized columns (CLAUDE.md lesson)."""
    cache_key = ("ingest_levels", tuple(records.columns))
    if col_cache is not None and _seam_free(config):
        levels = col_cache.get(cache_key)
        if levels is not None:
            tagged = records
            for lvl in levels:
                tagged = tagged.select(*lvl)
            messages = tagged.where(F.col("reason_unusable").isNull()).drop(
                "reason_unusable", "parsed_ok"
            )
            unusable = tagged.where(
                F.col("reason_unusable").isNotNull()
            ).drop("parsed_ok")
            return IngestResult(
                messages=messages, unusable=unusable, tagged=tagged
            )
    flat_levels = None  # set only on the cacheable default Kinesis path
    if config.extract_messages_from_record is not None:
        flat = config.extract_messages_from_record(records, config)
    elif config.stream_type == StreamType.dynamodb:
        flat = _flatten_dynamodb(records, config)
    elif config.kpl_encoded:
        flat = _flatten_kinesis(records, config)
    else:
        flat_levels = _kinesis_flat_levels(records.columns)
        flat = records
        for lvl in flat_levels:
            flat = flat.select(*lvl)

    # I2 seam: rewrite event_id / event_seq_no / event_sub_seq_no
    # (reference resolveEventIdAndSeqNos, kinesis-identify.js:54-68)
    if config.resolve_event_id_and_seq_nos is not None:
        flat = config.resolve_event_id_and_seq_nos(flat, config)

    # parse once: msg_json doubles as the validity signal (null ⇒ unusable)
    # and the canonical serialization for the message MD5
    extract_msg = (
        config.extract_message_from_record or extract_json_message_from_record
    )
    md5_gen = config.generate_md5s or generate_kinesis_md5s
    decode_levels = [
        ["*", F.unbase64(F.col("data_b64")).cast("string").alias("data_str")],
        ["*", extract_msg(F.col("data_str")).alias("msg_json")],
        ["*", F.col("msg_json").isNotNull().alias("parsed_ok")],
    ]
    decoded = flat
    for lvl in decode_levels:
        decoded = decoded.select(*lvl)
    md5s = md5_gen(
        {
            "data_str": F.col("data_str"),
            "record_json": F.col("record_json"),
            "msg_json": F.col("msg_json"),
        }
    )

    # I1 MD5 fingerprints + I3 canonical ids/keys/seqNos. Properties
    # resolve from the raw payload when it IS the message (default JSON
    # path — avoids re-deriving msg_json per property), from the extracted
    # msg_json when a custom wire format is in play.
    src = "msg_json" if config.extract_message_from_record is not None else "data_str"
    seq_no_names = list(config.seq_no_property_names)
    seq_no_col = (
        _canonical(seq_no_names, src)
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
    # I3 id/key/seqNo resolution — overridable as a whole
    # (reference resolveMessageIdsAndSeqNos, kinesis-identify.js:85-133)
    id_cols = {
        "id": _canonical(config.id_property_names, src),
        "key": _canonical(config.key_property_names, src),
        "seqNo": seq_no_col,
        "seq_no_parts": (
            F.array(*[_resolve(n, src) for n in config.seq_no_property_names])
            if seq_no_names
            else F.array(
                F.col("event_seq_no"),
                F.coalesce(F.col("event_sub_seq_no").cast("string"), F.lit("0")),
            )
        ),
    }
    if config.resolve_message_ids_and_seq_nos is not None:
        id_cols.update(config.resolve_message_ids_and_seq_nos(config) or {})

    identify_level = [
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
        "msg_json",
        "parsed_ok",
        md5s["data_md5"].alias("data_md5"),
        md5s["rec_md5"].alias("rec_md5"),
        md5s["msg_md5"].alias("msg_md5"),
        id_cols["id"].alias("id"),
        id_cols["key"].alias("key"),
        id_cols["seqNo"].alias("seqNo"),
        id_cols["seq_no_parts"].alias("seq_no_parts"),
    ]
    identified = decoded.select(*identify_level)

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
            missing_key = missing_key | _resolve(n, src).isNull()
        reasons.append(
            F.when(missing_key, "missing mandatory key properties (I3)")
        )
    if config.sequencing_required and seq_no_names:
        missing_seq = F.lit(False)
        for n in seq_no_names:
            missing_seq = missing_seq | _resolve(n, src).isNull()
        reasons.append(
            F.when(missing_seq, "missing mandatory seqNo properties (I3)")
        )
    reason_unusable = F.coalesce(*reasons, F.lit(None).cast("string"))

    tag_level = ["*", reason_unusable.alias("reason_unusable")]
    tagged = identified.select(*tag_level)
    messages = tagged.where(F.col("reason_unusable").isNull()).drop(
        "reason_unusable", "parsed_ok"
    )
    unusable = tagged.where(F.col("reason_unusable").isNotNull()).drop("parsed_ok")
    if (
        col_cache is not None
        and flat_levels is not None
        and _seam_free(config)
    ):
        col_cache[cache_key] = (
            flat_levels + decode_levels + [identify_level, tag_level]
        )
    return IngestResult(messages=messages, unusable=unusable, tagged=tagged)
