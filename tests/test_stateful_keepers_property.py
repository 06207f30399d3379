"""Property tests for the applyInPandasWithState keeper LOGIC, driven
directly (fake GroupState, no Spark): the end-to-end parity tests pin one
real dataset through the streaming runtime; these pin the carried-state
recurrences under ARBITRARY batch boundaries and Arrow chunk splits —
the two degrees of freedom the runtime controls and a fixed dataset
exercises only one way. A failure here is a state hand-off or
chunk-ordering bug independent of Spark."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_stream_consumer_spark.streaming.stateful import (
    _SESSION_GAP_US,
    _update_seq_bigrams,
    _update_sessions,
)


class FakeState:
    """Duck-typed GroupState: exists/get/update — the only surface the
    keepers touch."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


# per-user event streams: gaps straddle the 30-minute threshold in both
# directions, including the exact boundary (gap == threshold extends the
# session; gap == threshold + 1 rolls it)
_gaps = st.sampled_from(
    [1, 1000, _SESSION_GAP_US - 1, _SESSION_GAP_US, _SESSION_GAP_US + 1,
     2 * _SESSION_GAP_US]
)


@st.composite
def _event_stream(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    t = draw(st.integers(min_value=0, max_value=10**9))
    events = []
    for i in range(n):
        events.append((i + 1, t))  # (event_id, us), ids strictly increasing
        t += draw(_gaps)
    # batch cuts: time-ordered slices (the source contract)
    n_batches = draw(st.integers(min_value=1, max_value=4))
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=n),
                min_size=n_batches - 1,
                max_size=n_batches - 1,
            )
        )
    )
    batches = []
    prev = 0
    for c in cuts + [n]:
        batches.append(events[prev:c])
        prev = c
    return events, batches


def _chunked(rows: pd.DataFrame, draw_sizes, rnd):
    """Split a batch DataFrame into Arrow-like chunks, SHUFFLED — the
    runtime hands chunks of one group in arbitrary order. The order is a
    hypothesis-drawn permutation (``rnd`` from st.randoms()), not just
    the single reversed permutation the first version tested (ADVICE
    r13: the concat-before-sort contract claims ARBITRARY interleavings,
    so the strategy must actually draw them)."""
    chunks = []
    i = 0
    while i < len(rows):
        step = draw_sizes[len(chunks) % len(draw_sizes)]
        chunks.append(rows.iloc[i : i + step])
        i += step
    rnd.shuffle(chunks)
    return chunks


@given(
    _event_stream(),
    st.lists(st.integers(1, 3), min_size=1, max_size=3),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_sessionize_keeper_matches_mirror_under_any_batching(ev, sizes, rnd):
    events, batches = ev
    state = FakeState()
    latest = {}
    for b, batch in enumerate(batches):
        pdf = pd.DataFrame(
            [{"event_id": e, "us": us} for e, us in batch],
            columns=["event_id", "us"],
        )
        out = list(
            _update_sessions((7,), iter(_chunked(pdf, sizes, rnd)), state)
        )
        for df in out:
            for r in df.itertuples(index=False):
                latest[int(r.session_n)] = (
                    int(r.n_events),
                    int(r.start_epoch),
                    int(r.duration_s),
                )
    # mirror: sessionize the full ordered stream in one pass
    want = {}
    sn, start, last, n = 0, None, None, 0
    for _, us in events:
        if last is None or us - last > _SESSION_GAP_US:
            if sn:
                want[sn] = (n, start // 10**6, (last - start) // 10**6)
            sn += 1
            start, n = us, 1
        else:
            n += 1
        last = us
    want[sn] = (n, start // 10**6, (last - start) // 10**6)
    assert latest == want


@given(
    st.lists(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        min_size=1,
        max_size=20,
    ),
    st.lists(st.integers(1, 3), min_size=1, max_size=3),
    st.integers(min_value=1, max_value=4),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_bigram_keeper_matches_mirror_under_any_batching(
    types, sizes, n_batches, rnd
):
    events = [(i + 1, 1000 * (i + 1), t) for i, t in enumerate(types)]
    per = max(1, len(events) // n_batches)
    batches = [
        events[i : i + per] for i in range(0, len(events), per)
    ]
    state = FakeState()
    got = {}
    for b, batch in enumerate(batches):
        pdf = pd.DataFrame(
            [
                {"event_id": e, "us": us, "event_type": t}
                for e, us, t in batch
            ],
            columns=["event_id", "us", "event_type"],
        )
        for df in _update_seq_bigrams((9,), iter(_chunked(pdf, sizes, rnd)), state):
            for r in df.itertuples(index=False):
                got[int(r.event_id)] = r.pattern
    # mirror: NULL-propagating contiguous bigrams over the full stream
    want = {}
    prev = None
    for e, _, t in events:
        if prev is not None and t is not None:
            want[e] = f"{prev}>{t}"
        prev = t
    assert got == want


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=-(10**6), max_value=10**6),  # value
        ),
        min_size=0,
        max_size=30,
    ),
    st.integers(min_value=1, max_value=5),  # batch count
    st.lists(st.integers(1, 3), min_size=1, max_size=3),  # chunk sizes
    st.randoms(use_true_random=False),
    st.data(),
)
@settings(max_examples=60, deadline=None)
def test_topk_keeper_matches_sorted_mirror_under_any_batching(
    values, n_batches, sizes, rnd, data
):
    """The top-k keeper's kept set after ANY batching / chunk order /
    duplicate re-delivery must equal the top-5 of the full stream under
    the batch comparator (value DESC, event_id ASC) — top-k is
    order-insensitive, so unlike the sessionize keeper there is no
    source-order contract to respect and the property quantifies over
    arbitrary splits AND re-deliveries."""
    from kinesis_stream_consumer_spark.streaming.stateful import (
        _TOPK_K,
        _update_topk,
    )

    events = [(i + 1, v[0]) for i, v in enumerate(values)]
    # arbitrary split into batches + re-deliver a random prefix of some
    # earlier batch (at-least-once)
    batches = [[] for _ in range(n_batches)]
    for e in events:
        batches[data.draw(st.integers(0, n_batches - 1))].append(e)
    if events and n_batches > 1:
        src = data.draw(st.integers(0, n_batches - 2))
        if batches[src]:
            batches[src + 1] = batches[src][:2] + batches[src + 1]
    state = FakeState()
    out = None
    for batch in batches:
        pdf = pd.DataFrame(
            [{"event_id": e, "value_milli": v} for e, v in batch],
            columns=["event_id", "value_milli"],
        )
        out = list(
            _update_topk(("t",), iter(_chunked(pdf, sizes, rnd)), state)
        )
    want = sorted(events, key=lambda ev: (-ev[1], ev[0]))[:_TOPK_K]
    got_state = list(zip(state.get[1], state.get[0]))  # (id, val)
    assert got_state == [(e, v) for e, v in want]
    # and the last emission is the ranked frame of the same set
    rows = [
        (int(r.rank), int(r.event_id), int(r.value_milli))
        for df in out
        for r in df.itertuples(index=False)
    ]
    assert rows == [
        (i + 1, e, v) for i, (e, v) in enumerate(want)
    ]
