"""Multi-format batch sources: CSV / JSON-lines / parquet with one schema.

The engine's record readers (records.py) consume JSON-lines; analytics
inputs are parquet. This module rounds out the source surface: explicit-
schema CSV and JSONL readers (schema inference is a full extra pass over
the data — never at 100 TB), plus partitioned-parquet writes whose reads
partition-prune (asserted in tests/test_scan_sources.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Stable roundtrip subset of the events schema: timestamps travel as epoch
# micros (CSV has no timestamp type; ISO strings invite timezone drift) and
# the JSON props column rides as an opaque string (CSV quoting handles the
# embedded commas/quotes).
EVENTS_FLAT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Explicit-schema CSV scan (header, quoted fields)."""
    return spark.read.schema(schema).option("header", "true").csv(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Explicit-schema JSON-lines scan."""
    return spark.read.schema(schema).json(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned layout: equality/IN filters on the partition
    columns prune directories at planning time (PartitionFilters in the
    scan node) — the scan never opens non-matching files."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_corpus_shards(
    df,
    path: str,
    partition_cols: list[str] | None = None,
    max_records_per_file: int = 100_000,
    sort_within: list[str] | None = None,
) -> None:
    """Training-corpus shard writer: layout-partitioned parquet with a
    bounded records-per-file shard size — the output side of the curation
    pipeline (a trainer's data loader wants many same-sized shards it can
    assign to workers, not one file per Spark partition of arbitrary
    size).

    Scale notes: `maxRecordsPerFile` splits oversized partitions at write
    time without an extra shuffle; `partitionBy` gives the
    lang=…/split=… directory layout that lets a loader (or a later Spark
    job) prune whole subtrees; an optional within-partition sort makes
    shard contents deterministic so re-runs produce byte-stable outputs
    (modulo parquet metadata) for caching/diffing."""
    out = df
    if sort_within:
        cols = (partition_cols or []) + sort_within
        out = out.sortWithinPartitions(*cols)
    w = out.write.mode("overwrite").option(
        "maxRecordsPerFile", max_records_per_file
    )
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)


def read_orc(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """ORC scan with an explicit schema — same no-inference discipline as
    read_csv/read_jsonl (a schema-inference pass is a full extra read at
    100 TB). ORC is Spark-native columnar: predicate pushdown and column
    pruning apply exactly as for parquet."""
    return spark.read.schema(schema).orc(path)
