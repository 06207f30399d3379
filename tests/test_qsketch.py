"""Log-linear mergeable quantile sketch (operators/sketches.py qsketch_*,
VERDICT r6 #5): merge linearity, the ≤1/K relative-error guarantee vs
exact rank-k, and the streaming twin pinned equal to batch."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators import sketches as SK
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_qsketch_registers_merge_linearly(spark):
    """Sketching two halves separately and ADDING the registers gives
    exactly the registers of sketching the whole — the linearity that
    lets partial sketches compose across partitions / micro-batches."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    val = F.floor(F.col("l_extendedprice") * 100 + 0.5).cast("long")
    src = li.select("l_returnflag", val.alias("v"), "l_orderkey")
    whole = SK.qsketch_buckets(src, "l_returnflag", F.col("v"))
    lo = SK.qsketch_buckets(
        src.where(F.col("l_orderkey") % 2 == 0), "l_returnflag", F.col("v")
    )
    hi = SK.qsketch_buckets(
        src.where(F.col("l_orderkey") % 2 == 1), "l_returnflag", F.col("v")
    )
    merged = (
        lo.unionByName(hi).groupBy("g", "qid").agg(F.sum("cnt").alias("cnt"))
    )
    assert _rows(whole) == _rows(merged)
    # and therefore the recovered quantiles agree too
    assert _rows(SK.qsketch_quantiles(whole)) == _rows(
        SK.qsketch_quantiles(merged)
    )


# pure-python mirror of the bucket/decode arithmetic for the property
# test (no Spark in the hypothesis inner loop — the engine parity is
# pinned separately by the oracle gate, which runs the exact same
# formulas as SQL on both engines)
def _qid(v: int) -> int:
    if v == 0:
        return 0
    b = v.bit_length()
    lo2 = 1 << (b - 1)
    return (b - 1) * SK.QSK_K + ((v - lo2) * SK.QSK_K) // lo2 + 1


def _lower(qid: int) -> int:
    if qid == 0:
        return 0
    b = (qid - 1) // SK.QSK_K + 1
    f = (qid - 1) % SK.QSK_K
    lo2 = 1 << (b - 1)
    return lo2 + (f * lo2 + SK.QSK_K - 1) // SK.QSK_K


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=SK.QSK_MAX - 1),
        min_size=1,
        max_size=200,
    ),
    st.integers(min_value=1, max_value=100),
)
def test_qsketch_error_bound_vs_exact_rank(values, pct):
    """For ANY value set in the int64 envelope — including wildly skewed
    domains no fixed-width histogram could bin — the recovered quantile
    is a lower bound of the exact rank-k value with relative error ≤ 1/K:
    est ≤ v_k and (v_k − est)·K ≤ v_k."""
    n = len(values)
    k = -(-pct * n // 100)  # ceil(q·n), 1-based
    exact = sorted(values)[k - 1]
    # sketch: counts per qid; recover = min qid with cum ≥ k
    from collections import Counter

    cnt = Counter(_qid(v) for v in values)
    cum = 0
    for qid in sorted(cnt):
        cum += cnt[qid]
        if cum >= k:
            est = _lower(qid)
            break
    assert est <= exact
    assert (exact - est) * SK.QSK_K <= exact


def test_qsketch_python_mirror_matches_spark(spark):
    """The property test's python mirror and the Spark/SQL formulas are
    the same arithmetic — pin them against each other on a domain that
    spans many octaves plus the v=0 edge."""
    vals = [0, 1, 2, 3, 15, 16, 17, 255, 1 << 20, (1 << 57) + 12345]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r["qid"]
        for r in SK.qsketch_buckets(
            df.select(F.lit("g").alias("gg"), "v"), "gg", F.col("v")
        ).collect()
    }
    assert got == {_qid(v) for v in vals}
    qd = spark.createDataFrame(
        [(q,) for q in sorted(got)], "qid long"
    ).select(SK.qsketch_lower_bound("qid").alias("lo"), "qid")
    assert {(r["qid"], r["lo"]) for r in qd.collect()} == {
        (q, _lower(q)) for q in got
    }


def test_streaming_qsketch_matches_batch(spark, tmp_path):
    """Incremental quantile-sketch maintenance under Structured
    Streaming: registers are a LINEAR aggregate, so a streaming
    groupBy(g, qid) count over micro-batched lines must end exactly
    equal to the batch sketch — live percentiles at 100 TB without ever
    re-scanning the corpus."""
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_orderkey",
        "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100 + 0.5)
        .cast("long")
        .alias("cents"),
    )
    for i in range(3):
        li.where(F.col("l_orderkey") % 3 == i).coalesce(1).write.mode(
            "append"
        ).json(str(tmp_path / "in"))
    stream = (
        spark.readStream.schema(
            "l_orderkey bigint, l_returnflag string, cents bigint"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(tmp_path / "in"))
    )
    sketch_stream = SK.qsketch_buckets(stream, "l_returnflag", F.col("cents"))
    q = (
        sketch_stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("qsk_sketch")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["g"], r["qid"]): r["cnt"]
        for r in spark.sql("SELECT * FROM qsk_sketch").collect()
    }
    batch = {
        (r["g"], r["qid"]): r["cnt"]
        for r in SK.qsketch_buckets(
            li, "l_returnflag", F.col("cents")
        ).collect()
    }
    assert streamed == batch
    # sketch stays sketch-sized: ≤ 63·K+1 buckets per group
    per_group = {}
    for (g, _), _c in batch.items():
        per_group[g] = per_group.get(g, 0) + 1
    assert all(v <= 63 * SK.QSK_K + 1 for v in per_group.values())
