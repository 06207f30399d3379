"""Cross-engine deterministic numeric helpers.

Engines disagree on ROUND tie-breaking (Spark: HALF_UP on the decimal
rendering; DuckDB: half-even in places), which flips value-hashes on exact
.5 boundaries. ``round_half_up`` pins rounding to an explicit
floor(x*10^d + 0.5)/10^d — pure IEEE double arithmetic that evaluates
bit-identically in Spark and DuckDB. ``sql_round`` emits the same formula
as SQL text for the oracle side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column, digits: int = 4) -> Column:
    f = float(10**digits)
    return F.floor(col * f + F.lit(0.5)) / F.lit(f)


def sql_round(expr: str, digits: int = 4) -> str:
    f = float(10**digits)
    return f"FLOOR(({expr}) * {f} + 0.5) / {f}"
