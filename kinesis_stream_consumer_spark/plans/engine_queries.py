"""Engine-feature queries: operators that live INSIDE the consumer engine
(streaming/engine.py) exposed through the driver's oracle gate.

These run the real engine (multi-micro-batch, with replay) against the
``events`` table wrapped as Kinesis records, then verify the engine-held
state against a declarative DuckDB prediction — the same pattern as
stream_parity.engine_end_to_end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators import sketches as SK
from kinesis_stream_consumer_spark.plans.queries import _t, register


@register(
    "engine_hll_distinct_sketch",
    f"""
    WITH src AS (
      SELECT 'S|shardId-' || lpad(CAST(CAST(user_id % 4 AS INTEGER) AS VARCHAR), 12, '0') AS shard,
             'id1:' || CAST(event_id AS VARCHAR) AS ident
      FROM events WHERE event_id < 3000
    ),
    {SK.hll_oracle_cte("src", "shard", "ident").lstrip()}
    SELECT g AS shardOrEventID, CAST(hll_estimate AS BIGINT) AS distinct_estimate
    FROM hll_est ORDER BY 1
    """,
    doc="Engine-native per-shard HLL distinct-message sketch "
    "(EngineConfig.track_distinct_sketch): the engine maintains one "
    "register row per (consumer, shard, md5 bucket) in the state table, "
    "max-merged at every save. This query runs the REAL engine over 3 "
    "micro-batches (one of them processed twice — an at-least-once "
    "replay), reads the registers back from the state table, and the "
    "estimate must equal the oracle's SINGLE-PASS sketch over all events: "
    "register max-merge composes across micro-batches and is idempotent "
    "under replay, which is why a sketch (and not an additive counter) is "
    "the only duplicate-rate signal that stays exact at at-least-once "
    "delivery. The reference's per-batch DynamoDB item (persisting.js) "
    "can never accumulate this. At 100 TB the state carries m registers "
    "per shard regardless of message volume.",
)
def engine_hll_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from kinesis_stream_consumer_spark.config import EngineConfig
    from kinesis_stream_consumer_spark.sources import events_as_kinesis_records
    from kinesis_stream_consumer_spark.streaming import Engine, TaskDef
    from kinesis_stream_consumer_spark.streaming.tasks import TaskRejectedError

    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 3000)
    batches = [
        events_as_kinesis_records(
            ev.where(F.col("event_id") % 3 == i)
        ).localCheckpoint(eager=True)
        for i in range(3)
    ]

    def validate(message, task):
        if message["k2"] == "error":
            raise TaskRejectedError("error events rejected")

    tmp = tempfile.mkdtemp(prefix="ksc-hll-")
    eng = Engine(
        spark,
        EngineConfig(
            sequencing_per_key=True,
            key_property_names=["k1", "k2"],
            id_property_names=["id1"],
            seq_no_property_names=["n1", "n2"],
            track_distinct_sketch=True,
        ),
        state_path=f"{tmp}/state",
        drq_path=f"{tmp}/drq",
        dmq_path=f"{tmp}/dmq",
        process_one_defs=[TaskDef("validate", validate)],
    )
    for i in range(3):
        eng.process_batch(batches[i], batch_id=i)
    # at-least-once replay: batch 1 re-delivered — max-merge must be a no-op
    eng.process_batch(batches[1], batch_id=3)
    regs = (
        eng.state.read_all()
        .where(F.col("kind") == "sketch")
        .select(
            F.col("shardOrEventID").alias("g"),
            F.col("sketch_bucket").alias("bucket"),
            F.col("sketch_r").alias("r"),
        )
    )
    return (
        SK.hll_estimate(regs)
        .select(
            F.col("g").alias("shardOrEventID"),
            F.col("hll_estimate").cast("long").alias("distinct_estimate"),
        )
        .orderBy("shardOrEventID")
    )
