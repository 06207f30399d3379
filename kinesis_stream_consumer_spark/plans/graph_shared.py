"""Shared co-purchase graph construction (edge frame + oracle CTE).

Lives outside plans/relational.py so modules that register BEFORE
relational in plans/queries.py (plans/r10.py) can import it at module
level without triggering relational's registrations first — import order
IS driver-window order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.plans.queries import _t


_COEDGES_SQL = """li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM li a JOIN li b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2
    )"""


# Same session-scoped cache discipline as llm_pipeline's trained-model
# cache: the co-purchase edge build (order-pair join + support filter,
# ~2.4 s warm at sf0.1) is shared by four graph queries; the cached value
# is the checkpointed slim edge frame, bit-identical to a rebuild.
_EDGE_CACHE: dict = {}


def _co_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _EDGE_CACHE.get(key)
    if hit is None:
        li = _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        ).distinct()
        a = li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("u")
        )
        b = li.select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("v")
        )
        hit = (
            a.join(b, "ok")
            .where(F.col("u") < F.col("v"))
            .groupBy("u", "v")
            .agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") >= 2)
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        _EDGE_CACHE[key] = hit
    return hit


_LPA_ROUNDS = 3


def _lpa_round_sql(i: int) -> str:
    prev = f"l{i - 1}" if i > 1 else "l0"
    return f"""
    c{i} AS (
      SELECT b.d AS node, p.label, COUNT(*) AS c
      FROM bidir b JOIN {prev} p ON p.node = b.s
      GROUP BY 1, 2
    ),
    l{i} AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY c DESC, label) AS rn
        FROM c{i}) WHERE rn = 1
    )"""
