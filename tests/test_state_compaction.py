"""StateStore.compact(): retention reaping of fully-finalised rows.

The reference leans on Kinesis/DynamoDB retention to age state out
(SURVEY §2.1 T3); a parquet state table needs an explicit compactor or
finalised rows accumulate forever. Contract: age alone never drops an
incomplete row; finalisation alone never drops a fresh row."""

from __future__ import annotations

import json

from kinesis_stream_consumer_spark.streaming.state import STATE_SCHEMA, StateStore


def _row(identity, batch_id, statuses, kind="message", shard="shard-0"):
    tasks = (
        {f"t{i}": {"status": s, "subtasks": {}} for i, s in enumerate(statuses)}
        if statuses is not None
        else None
    )
    return {
        "streamConsumerId": "con|str|dev",
        "shardOrEventID": shard,
        "kind": kind,
        "identity": identity,
        "id": identity,
        "key": "k",
        "seqNo": "1",
        "event_id": identity,
        "event_seq_no": "1",
        "event_sub_seq_no": 0,
        "msg_md5": "m",
        "rec_md5": "r",
        "data_md5": "d",
        "tasks_json": json.dumps(tasks) if tasks is not None else None,
        "reason": None,
        "batch_id": batch_id,
    }


def test_compact_drops_only_old_finalised(spark, tmp_path):
    store = StateStore(spark, str(tmp_path / "state"))
    rows = [
        _row("old-done", 1, ["Completed", "Succeeded"]),
        _row("old-terminal", 1, ["Discarded", "Rejected", "Abandoned"]),
        _row("old-incomplete", 1, ["Completed", "Failed"]),
        _row("old-started", 1, ["Started"]),
        _row("old-unusable-null", 1, None, kind="unusable"),
        _row("fresh-done", 5, ["Completed"]),
        _row("fresh-incomplete", 5, ["Unstarted"]),
    ]
    store.save(spark.createDataFrame(rows, STATE_SCHEMA))

    dropped = store.compact(before_batch_id=3)

    left = {r["identity"] for r in store.read_all().collect()}
    assert dropped == 3  # old-done, old-terminal, old-unusable-null
    assert left == {
        "old-incomplete",  # Failed anywhere ⇒ kept at any age
        "old-started",
        "fresh-done",  # fresh ⇒ kept even though finalised
        "fresh-incomplete",
    }


def test_compact_result_still_loads_and_merges(spark, tmp_path):
    """A compacted table keeps working as the T1 load source."""
    store = StateStore(spark, str(tmp_path / "state"))
    store.save(
        spark.createDataFrame(
            [_row("a", 1, ["Completed"]), _row("b", 1, ["Failed"])], STATE_SCHEMA
        )
    )
    store.compact(before_batch_id=10)
    out = store.load("con|str|dev", ["shard-0"]).collect()
    assert [r["identity"] for r in out] == ["b"]
    # a later save still upserts into the compacted table; a DIFFERENT
    # shard partition must not disturb the surviving one (save() rewrites
    # whole touched partitions by design — the engine saves fully-merged
    # partition content)
    store.save(
        spark.createDataFrame(
            [_row("c", 11, ["Started"], shard="shard-1")], STATE_SCHEMA
        )
    )
    assert {r["identity"] for r in store.read_all().collect()} == {"b", "c"}


def test_engine_auto_compacts_on_schedule(spark, tmp_path):
    """compact_every_n_batches wires the reaper into the finalise phase:
    after the scheduled batch, finalised rows older than the retention
    window are gone while the newest batch's rows remain."""
    from pyspark.sql import functions as F

    from kinesis_stream_consumer_spark.config import EngineConfig
    from kinesis_stream_consumer_spark.plans.queries import _t
    from kinesis_stream_consumer_spark.sources import events_as_kinesis_records
    from kinesis_stream_consumer_spark.streaming.engine import Engine
    from kinesis_stream_consumer_spark.streaming.tasks import TaskDef
    from tests.conftest import SF_SMOKE

    cfg = EngineConfig(
        sequencing_per_key=True,
        key_property_names=["k1", "k2"],
        id_property_names=["id1"],
        seq_no_property_names=["n1", "n2"],
    )
    eng = Engine(
        spark,
        cfg,
        state_path=str(tmp_path / "state"),
        drq_path=str(tmp_path / "drq"),
        dmq_path=str(tmp_path / "dmq"),
        process_one_defs=[TaskDef("ok", lambda message, task: None)],
        compact_every_n_batches=2,
        compact_retention_batches=1,
    )
    ev = _t(spark, SF_SMOKE, "events")
    for b, lo in ((1, 0), (2, 5)):
        recs = events_as_kinesis_records(
            ev.where((F.col("event_id") >= lo) & (F.col("event_id") < lo + 5))
        )
        eng.process_batch(recs, batch_id=b)
    left = {r["batch_id"] for r in eng.state.read_all().collect()}
    # batch 2 triggered compact(before_batch_id=1): batch-1 finalised rows
    # reaped, batch-2 rows intact
    assert left == {2}
