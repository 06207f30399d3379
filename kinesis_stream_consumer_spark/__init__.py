"""kinesis_stream_consumer_spark — a PySpark-native stream-analytics engine.

A ground-up re-expression of the capabilities of
``byron-dupreez/kinesis-stream-consumer`` (reference, read-only at
/root/reference) on Apache Spark:

- Structured-Streaming / ``foreachBatch`` micro-batches replace Lambda
  invocations (reference kinesis-consumer.js:112-178).
- DataFrame/SQL expressions replace the per-record JS pipeline
  (reference kinesis-processing.js:477-598).
- A keyed, MERGE-updated state table replaces the DynamoDB
  StreamConsumerBatchState item (reference kinesis-processing.js:102-105).
- The relational/analytics surface (filters, joins, aggregations, windows,
  dedup, similarity, text ops) is exposed Spark-first over the same message
  model.

Nothing here is a port: the reference is a single-threaded Node.js runtime;
this package declares logical plans and lets Catalyst/Tungsten execute them.
"""

from kinesis_stream_consumer_spark.config import EngineConfig, StreamType

__all__ = ["EngineConfig", "StreamType"]

__version__ = "0.1.0"
