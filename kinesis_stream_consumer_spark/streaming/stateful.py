"""Native stateful streaming operators (applyInPandasWithState).

The engine's checkpoint/revive machinery (T1–T4) uses foreachBatch + a
state table because the reference's state is externally inspectable and
keyed by message identity (SURVEY §7). This module is the OTHER stateful
surface (§2.2 'stateful ops'): Spark-managed per-key state inside the
streaming runtime, for operators whose state never needs to leave Spark —
running aggregates, per-key rate trackers, session accumulators.

State lives in the streaming state store (RocksDB/HDFS-backed per
partition at scale); each micro-batch touches only the groups present in
the batch. GroupStateTimeout eviction bounds state size under key churn.
"""

from __future__ import annotations

from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


RUNNING_STATS_SCHEMA = (
    "user_id bigint, n_events bigint, sum_value double, batch_seen bigint"
)
_STATE_SCHEMA = "n bigint, s double, b bigint"


def _update_running_stats(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Cumulative (count, sum) per user across micro-batches."""
    n, s, b = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    b += 1
    state.update((n, s, b))
    yield pd.DataFrame(
        [{"user_id": key[0], "n_events": n, "sum_value": s, "batch_seen": b}]
    )


def running_user_stats(events_stream: DataFrame) -> DataFrame:
    """Per-user running event count / value sum over an unbounded stream.

    Emits one row per (user, micro-batch-with-activity): the cumulative
    totals after that batch. Keys not in a batch emit nothing (state
    untouched). Update-mode sink expected.
    """
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running_stats,
            outputStructType=RUNNING_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
