"""Property test: the window identity behind events_cusum_drift.

The registered query computes Page's CUSUM S_t = max(0, S_{t-1} + d_t)
NOT by recursion (window functions can't) but by the prefix-sum identity
S_t = P_t - min(0, min_{i<=t} P_i). The oracle-parity test pins Spark
against DuckDB computing the SAME identity — this test pins the identity
itself against the textbook recursion, on arbitrary integer series."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


def _recursive(ds: list[int]) -> list[int]:
    s, out = 0, []
    for d in ds:
        s = max(0, s + d)
        out.append(s)
    return out


def _window_identity(ds: list[int]) -> list[int]:
    out, pfx, mn = [], 0, 0
    for d in ds:
        pfx += d
        mn = min(mn, pfx)
        out.append(pfx - min(mn, 0))
    return out


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=-10**9, max_value=10**9), max_size=200))
def test_cusum_prefix_identity_equals_recursion(ds):
    assert _window_identity(ds) == _recursive(ds)
