"""Executed-plan SQL-metric inspection: the proof layer for scale claims.

"The shuffle only carries (doc, 8 hashes)" is a design claim; these helpers
turn it into an assertable fact by walking the EXECUTED physical plan
(through the AQE wrapper and query-stage nodes) and collecting each node's
SQLMetrics. Tests assert bounds on shuffle records/bytes — a regression
that breaks map-side combine or starts shuffling payload columns fails CI
instead of surfacing as a 100× slowdown at 100 TB.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame


def _walk(node, depth: int = 0) -> Iterator[tuple[int, object]]:
    yield depth, node
    name = node.nodeName()
    # AQE wrappers don't expose their executed subtree via children()
    if name == "AdaptiveSparkPlan":
        yield from _walk(node.executedPlan(), depth + 1)
        return
    if "QueryStage" in name:
        yield from _walk(node.plan(), depth + 1)
        return
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk(ch.apply(i), depth + 1)


def executed_metrics(df: DataFrame) -> list[tuple[str, dict]]:
    """(nodeName, {metric: value}) for every node of df's EXECUTED plan.

    The DataFrame must have been materialized via an action that runs its
    own queryExecution (``collect()``/``toPandas()`` — NOT ``count()``,
    which plans a separate aggregate and leaves this one unexecuted)."""
    out = []
    for _, node in _walk(df._jdf.queryExecution().executedPlan()):
        m = node.metrics()
        it = m.iterator()
        mm = {}
        while it.hasNext():
            kv = it.next()
            mm[kv._1()] = kv._2().value()
        out.append((node.nodeName(), mm))
    return out


def shuffle_stats(df: DataFrame) -> dict:
    """Aggregate shuffle/generate stats of an executed DataFrame:
    records+bytes written across all Exchanges, rows fanned out by
    Generate (explode) nodes, and the Exchange count."""
    stats = {
        "exchanges": 0,
        "shuffle_records": 0,
        "shuffle_bytes": 0,
        "generated_rows": 0,
    }
    for name, m in executed_metrics(df):
        if name == "Exchange":
            stats["exchanges"] += 1
            stats["shuffle_records"] += m.get("shuffleRecordsWritten", 0)
            stats["shuffle_bytes"] += m.get("shuffleBytesWritten", 0)
        elif name == "Generate":
            stats["generated_rows"] += m.get("numOutputRows", 0)
    return stats
