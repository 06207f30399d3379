"""Bucketed-table co-located joins: the no-shuffle join strategy for big⋈big.

A shuffle join on two 100 TB fact tables moves BOTH sides over the network
every time the join runs. Bucketing moves each side ONCE, at write time:
``bucketBy(n, key)`` hash-partitions files on the join key with a fixed
bucket count recorded in the catalog, so a later equi-join on that key reads
matching buckets side-by-side — the physical plan has NO Exchange on either
side (``sortBy`` at write time also drops the per-task Sort). This is the
"pay the shuffle once, reuse it forever" pattern for join keys used by many
downstream queries (fact⋈fact on order/customer/entity ids).

Caveats encoded here: both sides need the SAME bucket count (or a multiple,
with spark.sql.bucketing.coalesceBucketsInJoin.enabled); buckets are
per-catalog-table, so writes go through ``saveAsTable`` (an explicit
``path`` keeps the data external to the warehouse dir); and the bucket
count is a real tuning knob — one bucket per ~shuffle-partition-worth of
data, NOT one per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` hash-bucketed (and bucket-sorted) on the join key."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Equi-join two same-bucket-count tables on their bucket key.

    With both sides bucketed (and sorted) on ``on`` with equal bucket
    counts, Catalyst plans a SortMergeJoin whose children are bare bucketed
    scans — no Exchange, no Sort. Verified by tests/test_bucketing.py via
    plan inspection."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
