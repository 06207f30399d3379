"""Engine-native per-shard log-linear QUANTILE sketch
(EngineConfig.track_quantile_sketch): the additive-register replay
contract shared with the CMS twin (test_engine_cms), applied to the
qsketch registers — cross-batch composition, same-batch_id replay
exactness via delta subtraction, the new-batch_id overcount bound, and
compaction keeping cumulative rows while aging out stale deltas. Plus
the recovery check: per-shard quantiles decoded from the ENGINE-held
registers equal those from the single-pass batch sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.config import EngineConfig
from kinesis_stream_consumer_spark.operators.sketches import (
    qsketch_buckets,
    qsketch_quantiles,
)
from kinesis_stream_consumer_spark.sources import events_as_kinesis_records
from kinesis_stream_consumer_spark.streaming import Engine, TaskDef

from tests.conftest import SF_SMOKE


def _mk_engine(spark, tmp_path):
    def noop(message, task):
        return None

    cfg = EngineConfig(
        sequencing_per_key=True,
        key_property_names=["k1", "k2"],
        id_property_names=["id1"],
        seq_no_property_names=["n1", "n2"],
        track_quantile_sketch=True,
    )
    return Engine(
        spark,
        cfg,
        state_path=str(tmp_path / "state"),
        drq_path=str(tmp_path / "drq"),
        dmq_path=str(tmp_path / "dmq"),
        process_one_defs=[TaskDef("noop", noop)],
    )


def _batches(spark, n=600, k=3):
    from kinesis_stream_consumer_spark.plans.queries import _t

    ev = _t(spark, SF_SMOKE, "events").where(F.col("event_id") < n)
    return [
        events_as_kinesis_records(
            ev.where(F.col("event_id") % k == i)
        ).localCheckpoint(eager=True)
        for i in range(k)
    ], ev


def _expected(ev):
    """Single-pass batch registers over ALL messages' (shard, seqNo tail).
    The record builder zero-pads event_id to the 56-digit Kinesis seqNo,
    so the 15-digit tail the engine sketches is event_id itself."""
    src = ev.select(
        F.concat(
            F.lit("S|shardId-"),
            F.lpad((F.col("user_id") % 4).cast("string"), 12, "0"),
        ).alias("shard"),
        F.col("event_id").alias("v"),
    )
    return qsketch_buckets(src, "shard", F.col("v"))


def _qsk_rows(eng, kind="qsk"):
    return (
        eng.state.read_all()
        .where(F.col("kind") == kind)
        .select(
            F.col("shardOrEventID").alias("g"),
            F.col("sketch_bucket").alias("qid"),
            F.col("sketch_r").alias("cnt"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_engine_qsketch_composes_and_recovers(spark, tmp_path):
    batches, ev = _batches(spark)
    eng = _mk_engine(spark, tmp_path)
    for i, b in enumerate(batches):
        eng.process_batch(b, batch_id=i)
    got = _rows(_qsk_rows(eng))
    assert got == _rows(_expected(ev))
    # recovery: per-shard quantiles from the ENGINE-held registers equal
    # the single-pass sketch's
    assert _rows(qsketch_quantiles(_qsk_rows(eng))) == _rows(
        qsketch_quantiles(_expected(ev))
    )


def test_engine_qsketch_same_batch_id_replay_is_exact(spark, tmp_path):
    batches, ev = _batches(spark)
    eng = _mk_engine(spark, tmp_path)
    for i, b in enumerate(batches):
        eng.process_batch(b, batch_id=i)
    merged = _rows(_qsk_rows(eng))
    eng.process_batch(batches[2], batch_id=2)
    assert _rows(_qsk_rows(eng)) == merged
    # cold engine (no saved-state cache): subtraction off the parquet slice
    eng2 = _mk_engine(spark, tmp_path)
    eng2.process_batch(batches[2], batch_id=2)
    assert _rows(_qsk_rows(eng2)) == merged


def test_engine_qsketch_new_batch_id_overcount_bound(spark, tmp_path):
    batches, ev = _batches(spark)
    eng = _mk_engine(spark, tmp_path)
    for i, b in enumerate(batches):
        eng.process_batch(b, batch_id=i)
    eng.process_batch(batches[1], batch_id=10)
    doubled = (
        _expected(ev)
        .unionByName(_expected(ev.where(F.col("event_id") % 3 == 1)))
        .groupBy("g", "qid")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert _rows(_qsk_rows(eng)) == _rows(doubled)


def test_engine_qsketch_compaction(spark, tmp_path):
    batches, ev = _batches(spark)
    eng = _mk_engine(spark, tmp_path)
    for i, b in enumerate(batches):
        eng.process_batch(b, batch_id=i)
    before = _rows(_qsk_rows(eng))
    dropped = eng.state.compact(before_batch_id=100)
    assert dropped > 0
    assert _rows(_qsk_rows(eng)) == before
    assert _qsk_rows(eng, "qsk_delta").count() == 0
