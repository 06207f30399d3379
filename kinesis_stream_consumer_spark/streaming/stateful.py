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


RESERVOIR_OUT_SCHEMA = (
    "g string, id bigint, w bigint, pri bigint, rank int, b bigint"
)
_RESERVOIR_STATE_SCHEMA = (
    "ids array<bigint>, ws array<bigint>, pris array<bigint>, b bigint"
)


def _make_reservoir_update(n: int):
    """Stateful keeper for the priority-sampling register (operators/
    sketches.py reservoir_*): per group, the n+1 smallest (pri, id) rows
    across all micro-batches. The merge is the sketch's MIN-merge —
    idempotent, so at-least-once re-delivery of a batch leaves the
    register unchanged (unlike additive sketch deltas). State is the
    register itself: <= n+1 triples per group, bounded forever."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ids, ws, pris, b = state.get
            items = {
                int(i): (int(w), int(p)) for i, w, p in zip(ids, ws, pris)
            }
        else:
            items, b = {}, 0
        for pdf in pdfs:
            for i, w, p in zip(pdf["id"], pdf["w"], pdf["pri"]):
                items[int(i)] = (int(w), int(p))
        kept = sorted(items.items(), key=lambda kv: (kv[1][1], kv[0]))[: n + 1]
        b += 1
        state.update(
            (
                [i for i, _ in kept],
                [w for _, (w, _) in kept],
                [p for _, (_, p) in kept],
                b,
            )
        )
        yield pd.DataFrame(
            [
                {
                    "g": key[0],
                    "id": i,
                    "w": w,
                    "pri": p,
                    "rank": r + 1,
                    "b": b,
                }
                for r, (i, (w, p)) in enumerate(kept)
            ]
        )

    return update


def streaming_reservoir(keyed_stream: DataFrame, n: int) -> DataFrame:
    """Streaming twin of the batch reservoir sketch: feed
    ``sketches.reservoir_keys(stream, ...)`` in, get the live per-group
    register (with rank and a batch counter) out after every micro-batch.
    Update-mode sink expected; the final register equals the batch
    sketch over the same rows (pinned in test_reservoir)."""
    return keyed_stream.groupBy("g").applyInPandasWithState(
        _make_reservoir_update(n),
        outputStructType=RESERVOIR_OUT_SCHEMA,
        stateStructType=_RESERVOIR_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
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


CUSUM_OUT_SCHEMA = (
    "user_id bigint, event_id bigint, cusum_cents bigint, b bigint"
)
_CUSUM_STATE_SCHEMA = "pfx bigint, mn bigint, b bigint"


def _update_cusum(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming twin of events_cusum_drift's window identity: per user,
    state is just (prefix_sum, prefix_min) — TWO longs regardless of
    stream length — and each event's one-sided CUSUM is
    pfx − min(0, running-min). Events are ordered (ts, event_id) within
    the batch; cross-batch order is the source's responsibility
    (time-sliced micro-batches), same contract as the engine's
    per-chain sequencing. The reference level k rides on each row (a
    calibration constant at monitoring time — the batch query derives
    it from the full series; a live monitor ships it as config)."""
    pfx, mn, b = state.get if state.exists else (0, 0, 0)
    out = []
    # Concatenate BEFORE sorting: a group larger than one Arrow batch
    # arrives as multiple pdfs in arbitrary post-shuffle order; per-chunk
    # sorting would interleave non-adjacent events (r12 review finding —
    # same fix as the bigram keeper below).
    chunks = list(pdfs)
    batch = pd.concat(chunks) if chunks else None
    if batch is not None and len(batch):
        batch = batch.sort_values(["us", "event_id"])
        for eid, cents, ku in zip(
            batch["event_id"], batch["cents"], batch["ku"]
        ):
            pfx += int(cents) - int(ku)
            mn = min(mn, pfx)
            out.append((int(eid), pfx - min(mn, 0)))
    b += 1
    state.update((pfx, mn, b))
    yield pd.DataFrame(
        [
            {"user_id": key[0], "event_id": e, "cusum_cents": c, "b": b}
            for e, c in out
        ]
    )


def streaming_cusum(keyed_stream: DataFrame) -> DataFrame:
    """Live CUSUM drift monitor: input rows
    (user_id, event_id, us, cents, ku) in time-sliced micro-batches;
    output one row per event with its exact CUSUM value. State per user
    is two longs — the prefix sum and its running minimum — so the
    monitor is bounded-memory forever (contrast a naive implementation
    that buffers the series). Pinned equal to the batch window identity
    in tests/test_cusum_identity.py."""
    return keyed_stream.groupBy("user_id").applyInPandasWithState(
        _update_cusum,
        outputStructType=CUSUM_OUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


MG_OUT_SCHEMA = "g string, key string, w_mg bigint, b bigint"
_MG_STATE_SCHEMA = "keys array<string>, ws array<long>, b bigint"


def _make_mg_update(k: int):
    """Stateful keeper for the Misra-Gries summary (operators/sketches.py
    mg_*): state is at most k (key, weight) counters per group, merged
    with each micro-batch's exact batch counts by the standard
    counter-sum-then-re-truncate rule. Additive — NOT replay-idempotent
    (a re-delivered batch double-counts; contrast the min-merge reservoir
    keeper) — but deterministic for a given batch sequence, which the
    twin test pins against a driver-side fold."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, ws, b = state.get
            counters = {str(kk): int(w) for kk, w in zip(keys, ws)}
        else:
            counters, b = {}, 0
        for pdf in pdfs:
            for kk, w in zip(pdf["key"], pdf["w"]):
                counters[str(kk)] = counters.get(str(kk), 0) + int(w)
        ranked = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
        dec = ranked[k][1] if len(ranked) > k else 0
        kept = [(kk, w - dec) for kk, w in ranked[:k] if w - dec > 0]
        b += 1
        state.update(([kk for kk, _ in kept], [w for _, w in kept], b))
        yield pd.DataFrame(
            [{"g": key[0], "key": kk, "w_mg": w, "b": b} for kk, w in kept]
        )

    return update


def streaming_misra_gries(keyed_stream: DataFrame, k: int) -> DataFrame:
    """Streaming twin of the batch Misra-Gries summary: feed rows
    (g, key, w) in, get the live k-counter summary per group out after
    every micro-batch. Update-mode sink expected. The final summary
    equals the driver-side fold of mg_merge over the same batch sequence
    (pinned in tests/test_misra_gries.py) and respects the N/(k+1)
    deterministic bound against the exact stream totals."""
    return keyed_stream.groupBy("g").applyInPandasWithState(
        _make_mg_update(k),
        outputStructType=MG_OUT_SCHEMA,
        stateStructType=_MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SEQPAT_OUT_SCHEMA = "user_id bigint, event_id bigint, pattern string, b bigint"
_SEQPAT_STATE_SCHEMA = "us bigint, typ string, b bigint"


def _update_seq_bigrams(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming twin of events_sequence_patterns' contiguous bigrams
    (the r11 verdict's named extension): per user, state is ONE event —
    (us, type) of the last event seen — so the miner is
    bounded-memory forever; each arriving event emits the bigram
    last>current. NULL event types follow the batch query's
    null-propagating concat semantics exactly: a NULL-typed event emits
    no bigram on either side but still ADVANCES the chain (it occupies
    a position, so a>NULL and NULL>b both vanish while a>NULL>b never
    fuses to a>b). Events are ordered (us, event_id) within the batch;
    cross-batch order is the source's responsibility (time-sliced
    micro-batches), the same contract as the engine's per-chain
    sequencing and the CUSUM keeper above."""
    if state.exists:
        us, typ, b = state.get
    else:
        us, typ, b = None, None, 0
    out = []
    # Concatenate BEFORE sorting (r12 review finding): a group larger
    # than one Arrow batch arrives as multiple pdfs in arbitrary
    # post-shuffle order; a per-chunk sort would pair non-adjacent
    # events and store a wrong last-event state.
    chunks = list(pdfs)
    batch = pd.concat(chunks) if chunks else None
    if batch is not None and len(batch):
        batch = batch.sort_values(["us", "event_id"])
        for e, u, t in zip(
            batch["event_id"], batch["us"], batch["event_type"]
        ):
            # pd.isna covers None, NaN and pd.NA without assuming the
            # Arrow-to-pandas null sentinel is a float (ADVICE r12: the
            # isinstance(t, float) form misclassifies legitimately
            # float-typed values and misses pd.NA).
            cur = None if pd.isna(t) else str(t)
            if us is not None and typ is not None and cur is not None:
                out.append((int(e), f"{typ}>{cur}"))
            elif us is not None and cur is not None:
                pass  # prior was NULL-typed: chain advanced, bigram vanishes
            us, typ = int(u), cur
    b += 1
    state.update((us, typ, b))
    yield pd.DataFrame(
        [
            {"user_id": key[0], "event_id": e, "pattern": p, "b": b}
            for e, p in out
        ]
    )


def streaming_sequence_bigrams(keyed_stream: DataFrame) -> DataFrame:
    """Live sequential-pattern feed: input rows
    (user_id, event_id, us, event_type) in time-sliced micro-batches;
    output one row per contiguous bigram occurrence as it happens.
    Downstream the rows aggregate exactly like the batch miner's gram
    frame (support = distinct users per pattern, occurrences = row
    count) — pinned equal to the batch window query in
    tests/test_streaming_sequence.py. State per user is one event
    (one long + a short string): a billion-user stream holds state
    linear in USERS, never in history length."""
    return keyed_stream.groupBy("user_id").applyInPandasWithState(
        _update_seq_bigrams,
        outputStructType=SEQPAT_OUT_SCHEMA,
        stateStructType=_SEQPAT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


SESSION_OUT_SCHEMA = (
    "user_id bigint, session_n bigint, n_events bigint, "
    "start_epoch bigint, duration_s bigint, b bigint"
)
_SESSION_STATE_SCHEMA = "sn bigint, start bigint, last bigint, n bigint, b bigint"
_SESSION_GAP_US = 1_800_000_000  # 30 min, the events_sessionize threshold


def _update_sessions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming twin of events_sessionize's gap rule (the r12 verdict's
    suggested second twin): per user, state is ONE open session —
    (session_n, start_us, last_us, n_events) — so the sessionizer is
    bounded-memory forever regardless of history length. Each event
    either extends the open session (gap <= 30 min) or rolls the
    counter and opens a new one. Every session TOUCHED by the batch
    re-emits its current rollup row (update semantics: the LATEST
    emission per (user, session_n) is that session's final rollup —
    closed sessions never re-emit, so their last row IS final; the
    open session's row supersedes batch by batch). Events are ordered
    (us, event_id) within the batch — matching the batch query's window
    comparator — and cross-batch order is the source's responsibility
    (time-sliced micro-batches), the same contract as the CUSUM and
    bigram keepers above."""
    if state.exists:
        sn, start, last, n, b = state.get
    else:
        sn, start, last, n, b = 0, None, None, 0, 0
    b += 1
    touched: dict = {}
    # Concatenate BEFORE sorting (the r12 Arrow-chunk lesson): a >1-chunk
    # group arrives as multiple pdfs in shuffle order; a per-chunk sort
    # would interleave non-adjacent events and split sessions wrongly.
    chunks = list(pdfs)
    batch = pd.concat(chunks) if chunks else None
    if batch is not None and len(batch):
        batch = batch.sort_values(["us", "event_id"])
        for tu in batch["us"]:
            tu = int(tu)
            if last is None or tu - last > _SESSION_GAP_US:
                sn += 1
                start, n = tu, 1
            else:
                n += 1
            last = tu
            touched[sn] = (start, last, n)
    state.update((sn, start, last, n, b))
    yield pd.DataFrame(
        [
            {
                "user_id": key[0],
                "session_n": s,
                "n_events": cnt,
                # Python // floors for any sign — the pmod discipline the
                # batch query needs is free here
                "start_epoch": st // 1_000_000,
                "duration_s": (en - st) // 1_000_000,
                "b": b,
            }
            for s, (st, en, cnt) in touched.items()
        ]
    )


def streaming_sessionize(keyed_stream: DataFrame) -> DataFrame:
    """Live gap-based sessionization: input rows
    (user_id, event_id, us) in time-sliced micro-batches; output the
    current per-session rollup row for every session a batch touched.
    Downstream keeps the latest row per (user_id, session_n) — pinned
    equal to the batch events_sessionize rollup (including sessions that
    span micro-batch boundaries) in tests/test_streaming_sequence.py.
    State per user is one 5-long tuple: a billion-user stream holds
    state linear in USERS, never in events."""
    return keyed_stream.groupBy("user_id").applyInPandasWithState(
        _update_sessions,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=_SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


TOPK_OUT_SCHEMA = (
    "event_type string, rank int, event_id bigint, value_milli bigint,"
    " b bigint"
)
_TOPK_STATE_SCHEMA = "vals array<bigint>, ids array<bigint>, b bigint"
_TOPK_K = 5


def _update_topk(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Streaming twin of the batch top-k-per-group window (the r13
    verdict's suggested third keeper): per event type, state is the
    current top-k (value_milli, event_id) pairs — TWO k-long arrays, so
    the keeper is bounded-memory forever regardless of stream length.
    Each batch merges its rows into the kept set and re-emits the full
    current ranking (update semantics: the latest emission per
    (event_type, rank) is current; rank order is value_milli DESC,
    event_id ASC — the batch window's exact comparator, so ties are
    deterministic). At-least-once replay safe BY CONSTRUCTION: a
    re-delivered event either is already in the kept set (skipped by
    the event_id guard) or sits below the kept minimum and loses the
    sort again — the merge is idempotent. Unlike the sessionize/CUSUM
    keepers there is NO cross-batch order contract: top-k is
    order-insensitive, any arrival order converges to the same set."""
    if state.exists:
        vals, ids, b = state.get
        vals, ids = list(vals), list(ids)
    else:
        vals, ids, b = [], [], 0
    b += 1
    kept = set(ids)
    chunks = list(pdfs)
    if chunks:
        batch = pd.concat(chunks)
        for v, e in zip(batch["value_milli"], batch["event_id"]):
            e = int(e)
            if e in kept:
                continue  # at-least-once re-delivery of a kept event
            kept.add(e)
            vals.append(int(v))
            ids.append(e)
    order = sorted(
        range(len(vals)), key=lambda i: (-vals[i], ids[i])
    )[:_TOPK_K]
    vals = [vals[i] for i in order]
    ids = [ids[i] for i in order]
    state.update((vals, ids, b))
    yield pd.DataFrame(
        [
            {
                "event_type": key[0],
                "rank": r + 1,
                "event_id": ids[r],
                "value_milli": vals[r],
                "b": b,
            }
            for r in range(len(ids))
        ]
    )


def streaming_topk(keyed_stream: DataFrame) -> DataFrame:
    """Live top-k leaderboard per event type: input rows
    (event_type, event_id, value_milli) in micro-batches; output the
    current top-5 ranking of every type a batch touched. Downstream
    keeps the latest rows per (event_type, rank) — pinned equal to the
    batch row_number window over the same comparator in
    tests/test_streaming_sequence.py, including top-k entries that
    arrive in DIFFERENT micro-batches (the state hand-off). State per
    type is two 5-long arrays: a billion-event stream holds state
    linear in TYPES x k, never in events."""
    return keyed_stream.groupBy("event_type").applyInPandasWithState(
        _update_topk,
        outputStructType=TOPK_OUT_SCHEMA,
        stateStructType=_TOPK_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
