"""Bucketed co-located joins: the join must run with NO Exchange (and no
per-task Sort) on either side once both tables are bucketed+sorted on the
join key with equal bucket counts — the plan-shape contract that makes
fact⋈fact joins shuffle-free at 100 TB."""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators import bucketing as B
from tests.conftest import SF_CORRECT


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture()
def bucketed_pair(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
    B.write_bucketed(
        orders, "t_orders_b", "o_orderkey", 8, path=str(tmp_path / "ob")
    )
    B.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b", "o_orderkey", 8, path=str(tmp_path / "lb"),
    )
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_colocated_join_has_no_exchange(spark, bucketed_pair):
    lt, rt = bucketed_pair
    # force the SMJ path so the assertion is about bucketing, not broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = B.colocated_join(spark, lt, rt, "o_orderkey").select(
            "o_orderkey", "o_totalprice", "l_quantity"
        )
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan
        # bucket-sorted at write time: no Sort operator either
        assert "(Sort" not in plan.replace("SortMergeJoin", "SMJ"), plan
        # and it computes the right thing
        n = joined.count()
        expected = (
            spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
            .join(
                spark.read.parquet(f"{SF_CORRECT}/orders.parquet"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .count()
        )
        assert n == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")


def test_unbucketed_baseline_does_shuffle(spark):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
        l = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
        plan = _plan(o.join(l, o.o_orderkey == l.l_orderkey))
        assert "Exchange" in plan  # the cost bucketing removes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")


def test_bucketed_groupby_skips_exchange(spark, bucketed_pair):
    lt, _ = bucketed_pair
    # aggregation on the bucket key also reuses the bucketing layout
    plan = _plan(
        spark.table(lt).groupBy("o_orderkey").agg(F.sum("o_totalprice"))
    )
    assert "Exchange" not in plan, plan
