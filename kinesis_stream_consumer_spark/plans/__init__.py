from kinesis_stream_consumer_spark.plans.queries import QUERIES, QuerySpec

__all__ = ["QUERIES", "QuerySpec"]
