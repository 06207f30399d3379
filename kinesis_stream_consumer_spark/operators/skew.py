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


# Named combiners for phase-2 re-merge. Only aggregates that decompose into
# (phase1 per salt, associative merge) belong here — avg/stddev/percentile
# do NOT (sum of per-salt averages is wrong); express those as their
# decomposed parts (sum + count) and divide after.
COMBINERS = {
    "sum": F.sum,  # also merges count: partial counts add
    "min": F.min,
    "max": F.max,
}


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: Dict[str, tuple],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for skewed group keys.

    ``aggs`` maps output column name → ``(phase1_column, combiner)`` where
    combiner is one of COMBINERS' names ('sum'|'min'|'max') or a callable
    Column → aggregate Column. The spec is EXPLICIT by design: silently
    guessing the merge for a non-decomposable aggregate (e.g. F.avg) would
    return a wrong answer, so anything that isn't a (column, combiner) pair
    with a known combiner raises instead.
    """
    specs = {}
    for name, spec in aggs.items():
        if not (isinstance(spec, tuple) and len(spec) == 2):
            raise TypeError(
                f"salted_agg aggs[{name!r}] must be a (phase1_column, combiner) "
                "pair — bare aggregate Columns are rejected because only "
                "decomposable aggregates (sum/count/min/max) merge correctly "
                "across salt buckets; e.g. avg must be computed as "
                "sum + count and divided after"
            )
        col, comb = spec
        if isinstance(comb, str):
            if comb not in COMBINERS:
                raise ValueError(
                    f"salted_agg aggs[{name!r}]: unsupported combiner {comb!r} "
                    f"(supported: {sorted(COMBINERS)}; pass a callable for "
                    "custom merges)"
                )
            comb = COMBINERS[comb]
        elif not callable(comb):
            raise TypeError(
                f"salted_agg aggs[{name!r}]: combiner must be a name in "
                f"{sorted(COMBINERS)} or a callable, got {type(comb).__name__}"
            )
        specs[name] = (col, comb)

    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(key, "_salt").agg(
        *[col.alias(f"_p1_{name}") for name, (col, _) in specs.items()]
    )
    return phase1.groupBy(key).agg(
        *[
            comb(F.col(f"_p1_{name}")).alias(name)
            for name, (_, comb) in specs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-mitigated shuffle equi-join for LOW-CARDINALITY / hot keys.

    A shuffle join on a 5-value key parks every row on <= 5 reducers no
    matter how wide the cluster is; AQE's skew splitting can split a hot
    PARTITION but not a single hot KEY's sort group. Salting fixes it at
    plan level: fact rows take a deterministic hash salt in [0, n_salts),
    the (small, but not broadcast-worthy) dim replicates across ALL
    salts, and the join keys on (key, salt) — the hot key now spreads
    over n_salts sort groups. Row-for-row identical to the unsalted
    join; dim-side cost is |dim| x n_salts rows, which is the explicit
    trade. Deterministic salt (hash of all fact columns, not rand()) so
    retried tasks salt identically."""
    f = with_salt(fact, n_salts)
    d = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return f.join(d.hint("merge"), [key, "_salt"]).drop("_salt")
