"""Property-based tests (hypothesis) for the invariant-heavy corners:
the sequencing sort-key encoding and the KPL aggregate codec."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from kinesis_stream_consumer_spark.sources.kpl import (
    kpl_aggregate,
    kpl_deaggregate,
)

# --- KPL codec: encode ∘ decode == identity ---------------------------------

pk = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF), min_size=1, max_size=40
)
payload = st.binary(min_size=0, max_size=200)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(pk, payload), min_size=1, max_size=20))
def test_kpl_roundtrip_property(urs):
    out = kpl_deaggregate(kpl_aggregate(urs))
    assert [(u["partitionKey"], u["data"]) for u in out] == urs
    assert [u["subSequenceNumber"] for u in out] == list(range(len(urs)))


# --- Sort-key encoding: encoded order == semantic order ----------------------
# The engine encodes each seqNo part into one sortable string
# (streaming/sequencing.py). Property: for values of the same SortType,
# lexicographic order of encodings == semantic order of values. Verified
# via Spark once per type class over hypothesis-generated batches.


def _encoded(spark, values):
    from pyspark.sql import functions as F

    from kinesis_stream_consumer_spark.streaming.sequencing import encode_part

    df = spark.createDataFrame([(str(v),) for v in values], "part string")
    rows = df.select(F.col("part"), encode_part(F.col("part")).alias("enc")).collect()
    return {r["part"]: r["enc"] for r in rows}


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.floats(
            min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
        ),
        min_size=2,
        max_size=30,
        unique=True,
    )
)
def test_number_encoding_orders_like_numbers(spark, xs):
    vals = [f"{x:.4f}" for x in xs]
    enc = _encoded(spark, vals)
    semantic = sorted(vals, key=lambda v: float(v))
    lexicographic = sorted(vals, key=lambda v: enc[v])
    assert semantic == lexicographic


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.integers(min_value=10**16, max_value=10**56 - 1),
        min_size=2,
        max_size=30,
        unique=True,
    )
)
def test_bigint_encoding_orders_like_integers(spark, xs):
    vals = [str(x) for x in xs]
    enc = _encoded(spark, vals)
    assert sorted(vals, key=lambda v: int(v)) == sorted(vals, key=lambda v: enc[v])


@settings(max_examples=1, deadline=None)
@given(
    st.lists(
        st.datetimes(
            min_value=dt.datetime(1990, 1, 1), max_value=dt.datetime(2030, 1, 1)
        ),
        min_size=2,
        max_size=30,
        unique=True,
    )
)
def test_datetime_encoding_orders_like_timestamps(spark, xs):
    vals = [x.strftime("%Y-%m-%dT%H:%M:%S.%f") for x in xs]
    enc = _encoded(spark, vals)
    assert sorted(vals) == sorted(vals, key=lambda v: enc[v])


def test_mixed_type_tags_keep_classes_apart(spark):
    """Type tags partition the encoding space: dates < numbers < strings
    never interleave (deterministic cross-type ordering for the rare
    mixed-position case the reference tolerates)."""
    enc = _encoded(
        spark, ["2020-01-02", "123.5", "20000000000000000000002", "zebra"]
    )
    assert enc["2020-01-02"].startswith("T")
    assert enc["123.5"].startswith("N")
    assert enc["20000000000000000000002"].startswith("N")
    assert enc["zebra"].startswith("S")


# --- Connected components == union-find -------------------------------------
# The Spark fixpoint min-label propagation must agree with a reference
# union-find on arbitrary graphs. One Spark run validates a disjoint union
# of hypothesis-generated graphs (ids offset per graph).

edge = st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda e: e[0] != e[1])


@settings(max_examples=1, deadline=None)
@given(st.lists(st.lists(edge, min_size=1, max_size=40), min_size=3, max_size=8))
def test_connected_components_matches_union_find(spark, graphs):
    from kinesis_stream_consumer_spark.operators.dedup import connected_components

    all_edges = [
        (a + 1000 * i, b + 1000 * i)
        for i, es in enumerate(graphs)
        for a, b in es
    ]
    parent: dict[int, int] = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in all_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}
    # union-find roots are path-dependent; normalize to min-of-component
    comp_min: dict[int, int] = {}
    for n, r in expected.items():
        comp_min[r] = min(comp_min.get(r, n), n)
    expected = {n: comp_min[find(n)] for n in parent}

    pairs = spark.createDataFrame(all_edges, "doc_a long, doc_b long")
    got = {
        r["node"]: r["component_id"]
        for r in connected_components(pairs).collect()
    }
    assert got == expected


def test_winnowing_guarantee_shared_substring_shared_fingerprint(spark):
    """The winnowing guarantee (Schleimer et al. §2): two documents
    sharing any substring of length >= k + w - 1 MUST share at least one
    selected fingerprint — checked against a pure-Python reference
    implementation of rightmost-min-per-window selection on constructed
    near-dups and on the disjoint-text negative case."""
    import hashlib

    from kinesis_stream_consumer_spark.operators.text import (
        winnowing_fingerprints,
    )

    k, w = 5, 4

    def py_hash40(gram: str) -> int:
        d = hashlib.md5(gram.encode()).hexdigest()
        le = "".join(d[p - 1 : p + 1] for p in (15, 13, 11, 9, 7))
        return int(le, 16)

    def py_winnow(text: str) -> set[int]:
        n = len(text)
        hs = [py_hash40(text[p : p + k]) for p in range(n - k + 1)]
        out = set()
        for j in range(len(hs) - w + 1):
            window = hs[j : j + w]
            m = min(window)
            # rightmost minimal
            out.add(window[len(window) - 1 - window[::-1].index(m)])
        return out

    shared = "SHAREDSEGMENTXYZ123"  # len 19 >= k + w - 1 = 8
    docs = [
        (0, "aaaa bbbb cccc " + shared + " dddd eeee"),
        (1, "ffff gggg " + shared + " hhhh iiii jjjj kkkk"),
        (2, "llll mmmm nnnn oooo pppp qqqq rrrr ssss"),
    ]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {}
    for r in winnowing_fingerprints(df, "text", "doc_id", k=k, w=w).collect():
        got.setdefault(r["doc_id"], set()).add(r["hv"])
    # Spark matches the reference implementation exactly
    for doc_id, text in docs:
        assert got.get(doc_id, set()) == py_winnow(text), doc_id
    # the guarantee: near-dups share, the disjoint doc shares nothing
    assert got[0] & got[1], "shared substring must yield a shared fingerprint"
    assert not (got[0] & got[2])
    assert not (got[1] & got[2])


def test_histogram_quantile_recovery_error_is_bounded_by_bin_width():
    """Pure-arithmetic pin of the histogram quantile recovery used by
    agg_histogram_quantiles / events_rfm_segments: for ANY data and bin
    width, the interpolated estimate differs from the exact rank-k value
    by at most one bin width (the sketch's whole error contract), and the
    integer formula never divides by zero or misses a rank."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=10_000), min_size=1,
                 max_size=300),
        st.integers(min_value=1, max_value=500),
        st.integers(min_value=1, max_value=100),
    )
    def check(values, width, q):
        n = len(values)
        k = (n * q + 99) // 100
        sv = sorted(values)
        exact = sv[k - 1]
        # histogram recovery, mirroring the SQL: bin counts, cumulative,
        # within-bin integer interpolation
        from collections import Counter

        hist = sorted(Counter(v // width for v in values).items())
        cum = 0
        est = None
        for b, cnt in hist:
            if cum < k <= cum + cnt:
                est = b * width + (width * (k - cum)) // cnt
                break
            cum += cnt
        assert est is not None, "every rank must land in exactly one bin"
        assert abs(est - exact) <= width

    check()
