from kinesis_stream_consumer_spark.sources.records import (
    DYNAMODB_RECORD_SCHEMA,
    KINESIS_RECORD_SCHEMA,
    events_as_kinesis_records,
    read_records,
    stream_records,
)
from kinesis_stream_consumer_spark.sources.kpl import (
    kpl_aggregate,
    kpl_deaggregate,
    is_kpl_aggregated,
)

__all__ = [
    "KINESIS_RECORD_SCHEMA",
    "DYNAMODB_RECORD_SCHEMA",
    "events_as_kinesis_records",
    "read_records",
    "stream_records",
    "kpl_aggregate",
    "kpl_deaggregate",
    "is_kpl_aggregated",
]
