from kinesis_stream_consumer_spark.streaming.engine import (
    BatchReplayError,
    BatchResult,
    Engine,
)
from kinesis_stream_consumer_spark.streaming.ingest import IngestResult, ingest
from kinesis_stream_consumer_spark.streaming.sequencing import sequence_messages
from kinesis_stream_consumer_spark.streaming.state import STATE_SCHEMA, StateStore
from kinesis_stream_consumer_spark.streaming.tasks import (
    TaskDef,
    TaskRejectedError,
)

__all__ = [
    "Engine",
    "BatchResult",
    "BatchReplayError",
    "ingest",
    "IngestResult",
    "sequence_messages",
    "StateStore",
    "STATE_SCHEMA",
    "TaskDef",
    "TaskRejectedError",
]
