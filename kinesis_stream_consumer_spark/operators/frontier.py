"""Pareto-frontier (skyline) operator.

The reference has no relational surface at all (SURVEY §2.2) — skyline is
a driver-mandated analytics extension: "give me every row not dominated by
another" (dominates = no worse in both criteria, strictly better in one).
Classic in supplier/part selection (cheapest price vs largest size) and in
data curation (quality vs length frontiers).

Spark-first distributed shape (the banded sweep, NOT the naive NOT-EXISTS
self-join which is an O(n²) BroadcastNestedLoopJoin):

  1. Reduce rows to one summary per distinct minimize-value — a hash
     aggregate keyed on the minimize column (map-side combine; the shuffle
     carries (value, max) pairs only).
  2. Band the summaries by equi-width ranges of the minimize column
     (boundaries from a 2-scalar min/max aggregate pulled through the
     driver — the sanctioned scalar-model pattern). Same value → same
     band, so band order is dominance order.
  3. Within each band, a window PARTITIONED BY band sweeps values in
     ascending order keeping the running max of the maximize column —
     bands run in parallel; no global sort over the data.
  4. Across bands, the same sweep runs over the per-band maxima — a frame
     bounded by the band count (driver-chosen constant), so its
     single-partition window is O(n_bands) regardless of corpus size.
  5. A summary survives iff its max beats BOTH the strictly-prior running
     max within its band and every prior band's max; original rows are
     recovered by an equi-join on (minimize value) + equality with the
     per-value max (ties all survive — identical points do not dominate
     each other).

At 100 TB: one keyed shuffle (step 1), one parallel window (step 3), one
bounded window (step 4), one equi-join back (broadcastable: the frontier
is at most one row per distinct minimize value on the sweep's staircase).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
    n_bands: int = 32,
) -> DataFrame:
    """Rows on the 2-D Pareto frontier: minimize ``minimize``, maximize
    ``maximize``. A row is kept iff no other row has minimize ≤ its value
    AND maximize ≥ its value with at least one strict. Ties (identical
    points) all survive."""
    lo, hi = (
        df.agg(F.min(minimize), F.max(minimize)).collect()[0][0:2]
    )
    width = (float(hi) - float(lo)) / n_bands or 1.0
    pp = df.groupBy(minimize).agg(F.max(maximize).alias("_mx"))
    # ONE materialization of the per-value summaries: the in-band window
    # and the cross-band maxima both read the checkpointed slim frame —
    # without it each branch re-runs the full base-table scan + aggregate.
    pp = pp.withColumn(
        "_band",
        F.least(
            F.floor((F.col(minimize) - F.lit(float(lo))) / F.lit(width)),
            F.lit(n_bands - 1),
        ),
    ).localCheckpoint(eager=True)
    in_band = (
        Window.partitionBy("_band")
        .orderBy(minimize)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pp = pp.withColumn("_prev_in_band", F.max("_mx").over(in_band))
    bandmax = pp.groupBy("_band").agg(F.max("_mx").alias("_bmx"))
    prior_bands = Window.orderBy("_band").rowsBetween(
        Window.unboundedPreceding, -1
    )
    bandprev = bandmax.select(
        "_band", F.max("_bmx").over(prior_bands).alias("_prev_bands")
    )
    frontier = (
        pp.join(F.broadcast(bandprev), "_band")
        .where(
            (F.col("_prev_in_band").isNull() | (F.col("_mx") > F.col("_prev_in_band")))
            & (F.col("_prev_bands").isNull() | (F.col("_mx") > F.col("_prev_bands")))
        )
        .select(minimize, "_mx")
    )
    return df.join(frontier, minimize).where(F.col(maximize) == F.col("_mx")).drop(
        "_mx"
    )
