"""Engine-native per-shard HLL distinct-message sketch
(EngineConfig.track_distinct_sketch, VERDICT r5 #6).

Pins the three properties that make a sketch — and not a counter — the
right engine-held duplicate-rate signal:
- cross-batch composition: registers max-merged over N micro-batches equal
  the single-pass batch sketch over the union of the messages;
- replay idempotence: re-processing a batch leaves the registers unchanged
  (at-least-once delivery safe);
- compaction survival: sketch rows are cumulative and never age out.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.config import EngineConfig
from kinesis_stream_consumer_spark.operators.sketches import hll_registers
from kinesis_stream_consumer_spark.sources import events_as_kinesis_records
from kinesis_stream_consumer_spark.streaming import Engine, TaskDef

from tests.conftest import SF_SMOKE


def _mk_engine(spark, tmp_path, **cfg_extra):
    def noop(message, task):
        return None

    cfg = EngineConfig(
        sequencing_per_key=True,
        key_property_names=["k1", "k2"],
        id_property_names=["id1"],
        seq_no_property_names=["n1", "n2"],
        track_distinct_sketch=True,
        **cfg_extra,
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


def _sketch_regs(eng):
    return (
        eng.state.read_all()
        .where(F.col("kind") == "sketch")
        .select(
            F.col("shardOrEventID").alias("g"),
            F.col("sketch_bucket").alias("bucket"),
            F.col("sketch_r").alias("r"),
        )
    )


def _expected_regs(ev):
    """Single-pass batch sketch over ALL messages' identities/shards —
    the composition target the engine's incremental merge must hit."""
    src = ev.select(
        F.concat(
            F.lit("S|shardId-"),
            F.lpad((F.col("user_id") % 4).cast("string"), 12, "0"),
        ).alias("shard"),
        F.concat(F.lit("id1:"), F.col("event_id").cast("string")).alias("ident"),
    )
    return hll_registers(src, "shard", F.col("ident"))


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_sketch_composes_across_batches_and_replay(spark, tmp_path):
    batches, ev = _batches(spark)
    eng = _mk_engine(spark, tmp_path)
    for i, b in enumerate(batches):
        eng.process_batch(b, batch_id=i)
    merged = _rows(_sketch_regs(eng))
    assert merged == _rows(_expected_regs(ev))
    # at-least-once replay: re-delivering any batch is a register no-op
    eng.process_batch(batches[1], batch_id=10)
    assert _rows(_sketch_regs(eng)) == merged


def test_sketch_survives_restart_and_compaction(spark, tmp_path):
    batches, ev = _batches(spark)
    eng = _mk_engine(spark, tmp_path)
    eng.process_batch(batches[0], batch_id=0)
    # fresh Engine on the same state dir (no warm saved-state cache):
    # the merge path must read prior registers back from parquet
    eng2 = _mk_engine(spark, tmp_path)
    eng2.process_batch(batches[1], batch_id=1)
    eng2.process_batch(batches[2], batch_id=2)
    assert _rows(_sketch_regs(eng2)) == _rows(_expected_regs(ev))
    # compaction drops old finalised message rows but NEVER sketch rows
    before = _rows(_sketch_regs(eng2))
    dropped = eng2.state.compact(before_batch_id=100)
    assert dropped > 0
    assert _rows(_sketch_regs(eng2)) == before


def test_sketch_off_by_default(spark, tmp_path):
    batches, _ = _batches(spark, n=60)

    def noop(message, task):
        return None

    eng = Engine(
        spark,
        EngineConfig(
            sequencing_per_key=True,
            key_property_names=["k1", "k2"],
            id_property_names=["id1"],
            seq_no_property_names=["n1", "n2"],
        ),
        state_path=str(tmp_path / "state"),
        drq_path=str(tmp_path / "drq"),
        dmq_path=str(tmp_path / "dmq"),
        process_one_defs=[TaskDef("noop", noop)],
    )
    eng.process_batch(batches[0], batch_id=0)
    assert (
        eng.state.read_all().where(F.col("kind") == "sketch").count() == 0
    )
