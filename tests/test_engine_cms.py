"""Engine-native per-shard Count-Min KEY-frequency sketch
(EngineConfig.track_frequency_sketch, VERDICT r6 #7).

Counters merge by ADDITION — linear across micro-batches, but not
idempotent like the HLL max-merge. These tests pin the replay story:
- cross-batch composition: cumulative counters over N micro-batches equal
  the single-pass batch counters over the union of the messages;
- same-batch_id replay is EXACT: the engine subtracts its own saved delta
  (kind='cms_delta' keyed by batch_id) before re-folding — the F1
  commit-or-replay path re-runs a failed micro-batch under the same id;
- re-delivery under a NEW batch_id overcounts by EXACTLY that batch's
  contribution — the honest additive-counter bound (the reason the
  distinct sketch is HLL), pinned, not hidden;
- compaction keeps cumulative 'cms' rows forever, ages out stale deltas.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.config import EngineConfig
from kinesis_stream_consumer_spark.operators.sketches import cms_counters
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
        track_frequency_sketch=True,
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


def _src(ev):
    return ev.select(
        F.concat(
            F.lit("S|shardId-"),
            F.lpad((F.col("user_id") % 4).cast("string"), 12, "0"),
        ).alias("shard"),
        F.concat(
            F.lit("k1:"),
            F.col("user_id").cast("string"),
            F.lit("|k2:"),
            F.col("event_type"),
        ).alias("key"),
    )


def _expected(ev):
    """Single-pass batch counters over ALL messages' (shard, key)."""
    return cms_counters(_src(ev), "shard", F.col("key"))


def _cms_rows(eng, kind="cms"):
    return (
        eng.state.read_all()
        .where(F.col("kind") == kind)
        .select(
            F.col("shardOrEventID").alias("g"),
            F.col("sketch_bucket").alias("idx"),
            F.col("sketch_r").alias("cnt"),
        )
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cms_composes_across_batches(spark, tmp_path):
    batches, ev = _batches(spark)
    eng = _mk_engine(spark, tmp_path)
    for i, b in enumerate(batches):
        eng.process_batch(b, batch_id=i)
    assert _rows(_cms_rows(eng)) == _rows(_expected(ev))


def test_cms_same_batch_id_replay_is_exact(spark, tmp_path):
    batches, ev = _batches(spark)
    eng = _mk_engine(spark, tmp_path)
    for i, b in enumerate(batches):
        eng.process_batch(b, batch_id=i)
    merged = _rows(_cms_rows(eng))
    # F1 replay: the same micro-batch re-runs under the SAME batch_id
    # (its earlier save committed before the failure) — the engine must
    # subtract the saved delta so counts stay single-counted
    eng.process_batch(batches[2], batch_id=2)
    assert _rows(_cms_rows(eng)) == merged
    # and again, from a cold engine (no saved-state cache): the
    # subtraction must work off the parquet slice too
    eng2 = _mk_engine(spark, tmp_path)
    eng2.process_batch(batches[2], batch_id=2)
    assert _rows(_cms_rows(eng2)) == merged


def test_cms_new_batch_id_redelivery_overcount_bound(spark, tmp_path):
    batches, ev = _batches(spark)
    eng = _mk_engine(spark, tmp_path)
    for i, b in enumerate(batches):
        eng.process_batch(b, batch_id=i)
    # upstream at-least-once duplicate: same records, NEW batch_id — an
    # additive counter cannot dedup this; the overcount is EXACTLY the
    # re-delivered batch's own counter contribution, no more
    eng.process_batch(batches[1], batch_id=10)
    ev1 = ev.where(F.col("event_id") % 3 == 1)
    doubled = (
        _expected(ev)
        .unionByName(_expected(ev1))
        .groupBy("g", "idx")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert _rows(_cms_rows(eng)) == _rows(doubled)


def test_cms_restart_and_compaction(spark, tmp_path):
    batches, ev = _batches(spark)
    eng = _mk_engine(spark, tmp_path)
    eng.process_batch(batches[0], batch_id=0)
    # fresh Engine on the same state dir: merge reads prior from parquet
    eng2 = _mk_engine(spark, tmp_path)
    eng2.process_batch(batches[1], batch_id=1)
    eng2.process_batch(batches[2], batch_id=2)
    assert _rows(_cms_rows(eng2)) == _rows(_expected(ev))
    before = _rows(_cms_rows(eng2))
    dropped = eng2.state.compact(before_batch_id=100)
    assert dropped > 0
    # cumulative counters survive any compaction horizon…
    assert _rows(_cms_rows(eng2)) == before
    # …stale deltas (batch_id < horizon) do not — they are only needed
    # while their batch_id can still replay
    assert _cms_rows(eng2, "cms_delta").count() == 0


def test_cms_off_by_default(spark, tmp_path):
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
        eng.state.read_all()
        .where(F.col("kind").isin("cms", "cms_delta"))
        .count()
        == 0
    )


def test_cms_within_batch_duplicate_counts_once(spark, tmp_path):
    """The delta sources from the post-exec finalised frame, AFTER the D1
    within-batch dedup — a record delivered twice inside ONE micro-batch
    counts once (it is processed once). Only cross-batch re-delivery
    under a new batch_id overcounts (the pinned additive bound)."""
    batches, ev = _batches(spark, n=300, k=1)
    b = batches[0]
    dup = b.unionByName(b.limit(40)).localCheckpoint(eager=True)
    eng = _mk_engine(spark, tmp_path)
    eng.process_batch(dup, batch_id=0)
    assert _rows(_cms_rows(eng)) == _rows(_expected(ev))
