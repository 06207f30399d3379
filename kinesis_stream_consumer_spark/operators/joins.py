"""Join operators Spark SQL lacks natively: merge-as-of.

The reference has no joins at all beyond its state-revive equality join
(SURVEY §2.2) — as-of is a driver-mandated extension for the analytics
surface (time-series enrichment: "most recent right row at or before each
left row").

Spark-first shape: the union–window trick, NOT a range join. Tag both
sides, union, one window partitioned by key ordered by (time, side) with
``last(right_cols, ignoreNulls)`` carrying the latest right row forward,
then keep left rows. One shuffle on the key, linear scan per partition —
at 100 TB this beats a range join's O(n·m) per-key bucket comparison and
never materializes candidate pairs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def merge_asof(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: Sequence[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_time <= left_time and the same key (inclusive, like DuckDB
    ``ASOF JOIN ... ON l.t >= r.t``); nulls when no prior right row.

    Right-side ties on (key, time) must be pre-deduplicated by the caller
    for deterministic output.
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    # right rows sort before left rows at equal time (_side 0 < 1) ⇒ a left
    # row at time t sees a right row at exactly t (inclusive as-of)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tagged.unionByName(r_tagged).select(
        "_side",
        *lcols,
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in right_cols
        ],
    )
    return carried.where(F.col("_side") == 1).drop("_side")
