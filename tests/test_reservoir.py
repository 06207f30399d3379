"""Mergeable weighted-reservoir (priority) sampling sketch
(operators/sketches.py reservoir_*, VERDICT r7 #5): min-merge
idempotence/associativity, exactness for register-sized groups, the
python mirror of the md5-priority arithmetic, and the streaming twin
(applyInPandasWithState register keeper) pinned equal to batch."""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators import sketches as SK
from kinesis_stream_consumer_spark.operators import text as T
from tests.conftest import SF_SMOKE

_N = 8


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "lang", "text"
    )


def _regs(df, n=_N):
    return SK.reservoir_registers(
        df, "lang", "doc_id", T.bpe_ish_token_count(F.col("text")), n
    )


def test_reservoir_merge_recovers_whole_and_is_idempotent(spark):
    """Sketching two disjoint halves and MIN-merging the registers gives
    exactly the whole-corpus register; merging a register with itself
    (at-least-once replay of a partial) changes nothing."""
    docs = _docs(spark)
    whole = _regs(docs)
    lo = _regs(docs.where(F.col("doc_id") % 2 == 0))
    hi = _regs(docs.where(F.col("doc_id") % 2 == 1))
    merged = SK.reservoir_merge(lo.unionByName(hi), _N)
    assert _rows(whole) == _rows(merged)
    # idempotence: replaying one partial into the merge is a no-op
    remerged = SK.reservoir_merge(lo.unionByName(hi).unionByName(lo), _N)
    assert _rows(whole) == _rows(remerged)
    # and the recovered samples (with estimator) agree too
    assert _rows(SK.reservoir_sample(whole, _N)) == _rows(
        SK.reservoir_sample(merged, _N)
    )


def test_reservoir_small_group_is_exact(spark):
    """A group that fits the register entirely (<= n items) is sampled
    in full with w_est = w — the subset-sum estimate is EXACT."""
    docs = _docs(spark)
    big_n = 10_000_000
    sample = SK.reservoir_sample(_regs(docs, big_n), big_n)
    got = sample.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("w_est").alias("est_total"),
    )
    expected = docs.select(
        F.col("lang").alias("g"),
        T.bpe_ish_token_count(F.col("text")).cast("long").alias("w"),
    ).groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("est_total")
    )
    assert _rows(got) == _rows(expected)


def _u56(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little") >> 8


def _mirror_register(items, n):
    """Pure-python mirror: items = [(id, w)], returns the n+1 smallest
    (pri, id) as [(id, w, pri, rank)]."""
    keyed = [
        (i, w, _u56(str(i)) // max(w, 1)) for i, w in items
    ]
    keyed.sort(key=lambda t: (t[2], t[0]))
    return [
        (i, w, p, r + 1) for r, (i, w, p) in enumerate(keyed[: n + 1])
    ]


def test_reservoir_python_mirror_matches_spark(spark):
    """The mirror used by the hypothesis property test computes the same
    md5 priorities, selection, and estimator as the Spark/SQL twins."""
    items = [(i, (i * 7) % 40 + 1) for i in range(60)]
    df = spark.createDataFrame(
        [(i, w) for i, w in items], "id bigint, w bigint"
    ).select(F.lit("g").alias("lang"), "id", "w")
    regs = SK.reservoir_registers(df, "lang", "id", F.col("w"), _N)
    got = sorted(
        (r["id"], r["w"], r["pri"], r["rank"]) for r in regs.collect()
    )
    assert got == sorted(_mirror_register(items, _N))
    # estimator: w_est = max(w, 2^56 div pri_(n+1)) on the first n rows
    mirror = _mirror_register(items, _N)
    tpri = mirror[_N][2]
    want_est = sorted(
        (i, max(w, SK.RSV_SCALE // max(tpri, 1))) for i, w, p, r in mirror[:_N]
    )
    got_est = sorted(
        (r["id"], r["w_est"])
        for r in SK.reservoir_sample(regs, _N).collect()
    )
    assert got_est == want_est


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**9),
            st.integers(min_value=1, max_value=10**6),
        ),
        min_size=1,
        max_size=120,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=16),
)
def test_reservoir_properties(items, n):
    """For ANY item set: the register is the n+1 smallest keys; the
    sample is weight-monotone deterministic; w_est >= w always; and a
    group that fits the register estimates its total EXACTLY. Merging
    any two-way split of the items reproduces the whole-set register
    (the property the Spark min-merge relies on)."""
    reg = _mirror_register(items, n)
    assert len(reg) == min(len(items), n + 1)
    sample = reg[:n]
    tpri = reg[n][2] if len(reg) > n else None
    ests = [
        max(w, SK.RSV_SCALE // max(tpri, 1)) if tpri is not None else w
        for i, w, p, r in sample
    ]
    assert all(e >= w for e, (_, w, _, _) in zip(ests, sample))
    if len(items) <= n:
        assert sum(ests) == sum(w for _, w in items)
    # merge = re-select over the union of partial registers
    half_a = [t for t in items if t[0] % 2 == 0]
    half_b = [t for t in items if t[0] % 2 == 1]
    union = [
        (i, w)
        for i, w, p, r in _mirror_register(half_a, n)
        + _mirror_register(half_b, n)
    ]
    assert _mirror_register(union, n) == reg


def test_streaming_reservoir_matches_batch(spark, tmp_path):
    """The applyInPandasWithState register keeper ends exactly equal to
    the batch sketch over the same rows: bounded per-group state (the
    register itself), min-merge per micro-batch, replay-idempotent."""
    from kinesis_stream_consumer_spark.streaming.stateful import (
        streaming_reservoir,
    )

    docs = _docs(spark).select(
        "lang",
        "doc_id",
        T.bpe_ish_token_count(F.col("text")).cast("long").alias("n_tok"),
    )
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).json(str(tmp_path / "in"))
    stream = (
        spark.readStream.schema("lang string, doc_id bigint, n_tok bigint")
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    keyed = SK.reservoir_keys(stream, "lang", "doc_id", F.col("n_tok"))
    q = (
        streaming_reservoir(keyed, _N)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("rsv_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = _rows(
        spark.sql(
            """
            SELECT g, id, w, pri, rank FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY g, rank
                                           ORDER BY b DESC) AS rn
              FROM rsv_stream
            ) WHERE rn = 1
            """
        )
    )
    batch = _rows(
        SK.reservoir_registers(
            _docs(spark), "lang", "doc_id",
            T.bpe_ish_token_count(F.col("text")), _N,
        ).select("g", "id", "w", "pri", "rank")
    )
    assert streamed == batch


# --- KMV set-algebra sketch (shares the min-merge machinery) ---------------


def test_kmv_registers_min_merge_and_exactness(spark):
    """KMV: sketching two halves and re-taking the k smallest of the
    union reproduces the whole-set register (min-merge); a set with
    fewer than k distinct values is estimated EXACTLY; and the
    intersection estimator is exact when the union register holds
    everything."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    k = 64
    src = ev.select(
        F.lit("u").alias("g"), F.col("user_id").cast("string").alias("v")
    )
    whole = SK.kmv_registers(src, "g", F.col("v"), k)
    lo = SK.kmv_registers(
        src.where(F.col("v").cast("long") % 2 == 0), "g", F.col("v"), k
    )
    hi = SK.kmv_registers(
        src.where(F.col("v").cast("long") % 2 == 1), "g", F.col("v"), k
    )
    from pyspark.sql.window import Window

    merged = (
        lo.unionByName(hi).select("g", "h").dropDuplicates(["g", "h"])
        .withColumn(
            "rank",
            F.row_number().over(Window.partitionBy("g").orderBy("h")),
        )
        .where(F.col("rank") <= k)
    )
    assert _rows(whole) == _rows(merged)
    n_dist = src.select("v").distinct().count()
    if n_dist < k:
        est = SK.kmv_estimate(whole, k).collect()[0]
        assert est["dv_estimate"] == n_dist
    # small-set exactness + set ops: halves as A and B (disjoint)
    ops = SK.kmv_set_ops(lo, hi, k).collect()[0]
    n_lo = src.where(F.col("v").cast("long") % 2 == 0).select("v").distinct().count()
    n_hi = src.where(F.col("v").cast("long") % 2 == 1).select("v").distinct().count()
    if n_lo + n_hi < k:
        assert ops["union_estimate"] == n_lo + n_hi
        assert ops["n_both"] == 0 and ops["intersection_estimate"] == 0


def test_streaming_kmv_register_matches_batch(spark, tmp_path):
    """The stateful register keeper is sketch-agnostic: feeding it KMV
    keys (pri = h, w = 1 over distinct values) maintains a live KMV
    register per group across micro-batches that ends exactly equal to
    the batch sketch — streaming distinct-cardinality AND set algebra
    from the same bounded state."""
    from kinesis_stream_consumer_spark.streaming.stateful import (
        streaming_reservoir,
    )

    k = 16
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        F.lit("users").alias("g"), F.col("user_id").cast("string").alias("u")
    )
    for i in range(3):
        ev.where(F.col("u").cast("long") % 3 == i).coalesce(1).write.mode(
            "append"
        ).json(str(tmp_path / "in"))
    stream = (
        spark.readStream.schema("g string, u string")
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    from kinesis_stream_consumer_spark.operators.dedup import md5_u56_le

    keyed = stream.select(
        "g",
        md5_u56_le(F.col("u")).alias("id"),
        F.lit(1).cast("long").alias("w"),
        md5_u56_le(F.col("u")).alias("pri"),
    )
    q = (
        streaming_reservoir(keyed, k - 1)  # keeper holds n+1 = k rows
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("kmv_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = _rows(
        spark.sql(
            """
            SELECT g, pri, rank FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY g, rank
                                           ORDER BY b DESC) AS rn
              FROM kmv_stream
            ) WHERE rn = 1
            """
        )
    )
    batch = _rows(
        SK.kmv_registers(ev, "g", F.col("u"), k).select(
            "g", F.col("h").alias("pri"), "rank"
        )
    )
    assert streamed == batch
