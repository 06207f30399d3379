"""Misra-Gries / SpaceSaving frequent-items summary
(operators/sketches.py mg_*, VERDICT r8 #5): the deterministic
undercount/presence guarantees on the full-data summary, the
counter-sum-then-re-truncate merge rule (Spark == python mirror;
bound preserved under arbitrary merge trees, hypothesis-checked), and
the streaming twin (applyInPandasWithState k-counter keeper) pinned
equal to the driver-side fold over the same micro-batch sequence."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators import sketches as SK
from kinesis_stream_consumer_spark.operators import text as T
from tests.conftest import SF_SMOKE

_K = 4


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang", "text"
    )


def _toks(docs):
    return docs.select(
        F.col("lang").alias("g"), F.explode(T.tokens(F.col("text"))).alias("key")
    )


def _mirror_truncate(counts: dict, k: int) -> dict:
    """Python mirror of mg_truncate's offset form."""
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    dec = ranked[k][1] if len(ranked) > k else 0
    return {t: w - dec for t, w in ranked[:k] if w - dec > 0}


def _mirror_merge(a: dict, b: dict, k: int) -> dict:
    s = Counter(a)
    for t, w in b.items():
        s[t] += w
    return _mirror_truncate(dict(s), k)


def _summary_dicts(df):
    """{g: {key: w_mg}} from a summary frame."""
    out: dict = {}
    for r in df.collect():
        out.setdefault(r["g"], {})[r["key"]] = r["w_mg"]
    return out


def test_mg_summary_guarantees_and_mirror(spark):
    """Full-data summary: w_mg undercounts by exactly dec = c_(k+1),
    dec <= N/(k+1), every key with true count > N/(k+1) is present —
    and the whole summary equals the python mirror bit-for-bit."""
    toks = _toks(_docs(spark))
    summary = SK.mg_summary(toks, "g", "key", F.lit(1), _K)
    exact: dict = {}
    totals: Counter = Counter()
    for r in toks.groupBy("g", "key").count().collect():
        exact.setdefault(r["g"], {})[r["key"]] = r["count"]
        totals[r["g"]] += r["count"]
    rows = summary.collect()
    assert rows, "summary must not be empty on the smoke corpus"
    seen: dict = {}
    for r in rows:
        g, key = r["g"], r["key"]
        seen.setdefault(g, set()).add(key)
        assert r["cnt"] == exact[g][key]
        assert r["w_mg"] == r["cnt"] - r["dec"] > 0
        assert r["dec"] <= totals[g] // (_K + 1)
    for g, cnts in exact.items():
        for key, c in cnts.items():
            if c > totals[g] // (_K + 1):
                assert key in seen.get(g, set()), (g, key, c)
    # bit-for-bit vs the mirror
    for g, cnts in exact.items():
        got = {
            r["key"]: r["w_mg"] for r in rows if r["g"] == g
        }
        assert got == _mirror_truncate(cnts, _K)


def test_mg_spark_merge_matches_mirror(spark):
    """mg_merge over two partial summaries == the python mirror's
    counter-sum-then-re-truncate, group by group (deterministic for a
    given split)."""
    docs = _docs(spark)
    lo = SK.mg_summary(
        _toks(docs.where(F.col("doc_id") % 2 == 0)), "g", "key", F.lit(1), _K
    )
    hi = SK.mg_summary(
        _toks(docs.where(F.col("doc_id") % 2 == 1)), "g", "key", F.lit(1), _K
    )
    cols = ["g", "key", "w_mg"]
    merged = _summary_dicts(
        SK.mg_merge(lo.select(cols).unionByName(hi.select(cols)), _K)
    )
    lo_d, hi_d = _summary_dicts(lo), _summary_dicts(hi)
    for g in set(lo_d) | set(hi_d):
        assert merged.get(g, {}) == _mirror_merge(
            lo_d.get(g, {}), hi_d.get(g, {}), _K
        )


@settings(max_examples=200, deadline=None)
@given(
    items=st.lists(
        st.tuples(st.sampled_from("abcdefgh"), st.integers(1, 20)),
        min_size=1,
        max_size=60,
    ),
    cuts=st.lists(st.integers(0, 59), min_size=0, max_size=3),
    k=st.integers(1, 4),
    data=st.data(),
)
def test_mg_merge_tree_preserves_bound(items, cuts, k, data):
    """Mergeable-summaries guarantee under ARBITRARY merge trees: split
    the weighted stream at random cut points, summarize each part, merge
    in a random tree order — every key's weight still undercounts its
    true total by at most N/(k+1), never overcounts, and every key
    heavier than N/(k+1) survives. (Exact associativity does NOT hold
    for MG — only the bound composes; that's the documented contrast
    with the min-merge registers.)"""
    bounds = sorted({c for c in cuts if c < len(items)})
    parts, prev = [], 0
    for c in bounds + [len(items)]:
        if c > prev:
            parts.append(items[prev:c])
            prev = c
    summaries = [
        _mirror_truncate(dict(sum((Counter({t: w}) for t, w in p), Counter())), k)
        for p in parts
    ]
    while len(summaries) > 1:
        i = data.draw(st.integers(0, len(summaries) - 2))
        merged = _mirror_merge(summaries[i], summaries[i + 1], k)
        summaries[i : i + 2] = [merged]
    final = summaries[0]
    true = Counter()
    for t, w in items:
        true[t] += w
    n = sum(true.values())
    for t, w in final.items():
        assert 0 < w <= true[t]
        assert true[t] - w <= n // (k + 1)
    for t, c in true.items():
        if c > n // (k + 1):
            assert t in final, (t, c, n, k, final)


def test_streaming_mg_twin_matches_fold(spark, tmp_path):
    """The applyInPandasWithState k-counter keeper ends exactly equal to
    the driver-side fold of the merge rule over the same micro-batch
    sequence, and the final state respects the N/(k+1) bound against the
    exact stream totals. (Additive summary: the twin pins determinism
    for a given batch order, not replay idempotence — that contrast with
    the reservoir keeper is documented on the operator.)"""
    from kinesis_stream_consumer_spark.streaming.stateful import (
        streaming_misra_gries,
    )

    docs = _docs(spark)
    toks = _toks(docs).withColumn("w", F.lit(1).cast("long"))
    batches = []
    for i in range(3):
        part = _toks(docs.where(F.col("doc_id") % 3 == i))
        batch_counts: dict = {}
        for r in part.groupBy("g", "key").count().collect():
            batch_counts.setdefault(r["g"], {})[r["key"]] = r["count"]
        batches.append(batch_counts)
        part.withColumn("w", F.lit(1).cast("long")).coalesce(1).write.mode(
            "append"
        ).json(str(tmp_path / "in"))
    stream = (
        spark.readStream.schema("g string, key string, w bigint")
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    q = (
        streaming_misra_gries(stream, _K)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("mg_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed: dict = {}
    for r in spark.sql(
        """
        SELECT g, key, w_mg FROM (
          SELECT *, MAX(b) OVER (PARTITION BY g) AS maxb FROM mg_stream
        ) WHERE b = maxb
        """
    ).collect():
        streamed.setdefault(r["g"], {})[r["key"]] = r["w_mg"]
    # driver-side fold in write order (the file source replays files in
    # modification-time order = the append order above)
    groups = {g for b in batches for g in b}
    for g in groups:
        state: dict = {}
        for b in batches:
            state = _mirror_merge(state, b.get(g, {}), _K)
        assert streamed.get(g, {}) == state, g
    # and the bound against exact totals over the whole stream
    exact: dict = {}
    totals: Counter = Counter()
    for r in toks.groupBy("g", "key").count().collect():
        exact.setdefault(r["g"], {})[r["key"]] = r["count"]
        totals[r["g"]] += r["count"]
    for g, kept in streamed.items():
        for key, w in kept.items():
            assert 0 < w <= exact[g][key]
            assert exact[g][key] - w <= totals[g] // (_K + 1)
