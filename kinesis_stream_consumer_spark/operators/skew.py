"""Skew mitigation: salted two-phase aggregation and salted broadcast join.

AQE's skew-join splitting (enabled in session.py) handles join-side skew at
runtime; these helpers cover the cases AQE doesn't: a groupBy where one key
holds a disproportionate share of rows (the partial aggregate for that key
still lands on one reducer), and map-side salting when a replicated
broadcast join needs the hot key spread across tasks.

Salted two-phase aggregation:
    phase 1: group by (key, salt) — the hot key's rows split across
             `n_salts` reducers, each producing a partial aggregate
    phase 2: group by key — merges at most `n_salts` rows per key

Works for any algebraic aggregate (sum/count/min/max and anything
decomposable into them). Results are exactly equal to the unsalted plan.
"""

from __future__ import annotations

from typing import Dict

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic row salt in [0, n_salts): hash of all columns, NOT
    rand() — keeps the plan deterministic for retries/resume (a retried
    task must salt identically or partial aggregates double-count)."""
    return df.withColumn(
        col_name, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: Dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for skewed group keys.

    ``aggs`` maps output column name → phase-1 aggregate Column; phase 2
    re-merges with the matching combiner (sum for sum/count, min for min,
    max for max — detected from the phase-1 expression name).
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(key, "_salt").agg(
        *[c.alias(f"_p1_{name}") for name, c in aggs.items()]
    )

    def combiner(name: str, col: Column) -> Column:
        expr = str(aggs[name]._jc).lower()
        if expr.startswith("min"):
            return F.min(col)
        if expr.startswith("max"):
            return F.max(col)
        # sum and count both merge by summation
        return F.sum(col)

    return phase1.groupBy(key).agg(
        *[
            combiner(name, F.col(f"_p1_{name}")).alias(name)
            for name in aggs
        ]
    )
