"""Salted aggregation: exact equality with the unsalted plan on a
deliberately skewed key distribution, and the two-phase plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_stream_consumer_spark.operators.skew import salted_agg, with_salt
from tests.conftest import SF_CORRECT


def _skewed(spark):
    from kinesis_stream_consumer_spark.plans.queries import _t

    ev = _t(spark, SF_CORRECT, "events")
    # collapse 90% of rows onto one hot key
    return ev.withColumn(
        "k", F.when(F.col("event_id") % 10 != 0, "HOT").otherwise(F.col("event_type"))
    )


def test_salted_agg_equals_plain(spark):
    df = _skewed(spark)
    phase1 = {
        "n": F.count(F.lit(1)),
        "total": F.sum("value"),
        "mx": F.max("value"),
        "mn": F.min("value"),
    }
    specs = {
        "n": (phase1["n"], "sum"),
        "total": (phase1["total"], "sum"),
        "mx": (phase1["mx"], "max"),
        "mn": (phase1["mn"], "min"),
    }
    plain = {
        r["k"]: (r["n"], round(r["total"], 6), r["mx"], r["mn"])
        for r in df.groupBy("k")
        .agg(*[c.alias(n) for n, c in phase1.items()])
        .collect()
    }
    salted = {
        r["k"]: (r["n"], round(r["total"], 6), r["mx"], r["mn"])
        for r in salted_agg(df, "k", specs, n_salts=8).collect()
    }
    assert plain == salted


def test_salt_is_deterministic_and_spread(spark):
    df = _skewed(spark)
    a = with_salt(df, 8).select("event_id", "_salt").collect()
    b = with_salt(df, 8).select("event_id", "_salt").collect()
    assert {(r[0], r[1]) for r in a} == {(r[0], r[1]) for r in b}  # retry-safe
    hot_salts = (
        with_salt(df.where(F.col("k") == "HOT"), 8)
        .select("_salt")
        .distinct()
        .count()
    )
    assert hot_salts == 8  # hot key actually spreads over all salt buckets


def test_salted_plan_has_two_aggregates(spark):
    df = _skewed(spark)
    plan = salted_agg(
        df, "k", {"n": (F.count(F.lit(1)), "sum")}, n_salts=8
    )._jdf.queryExecution().executedPlan().toString()
    # (partial+final) × two phases; the phase-1 exchange is on (k, salt)
    assert plan.count("HashAggregate") >= 4


def test_salted_agg_rejects_non_decomposable(spark):
    """A bare aggregate Column (e.g. F.avg) must raise — summing per-salt
    averages would silently return a wrong answer."""
    import pytest

    df = _skewed(spark)
    with pytest.raises(TypeError, match="phase1_column, combiner"):
        salted_agg(df, "k", {"a": F.avg("value")})
    with pytest.raises(ValueError, match="unsupported combiner"):
        salted_agg(df, "k", {"a": (F.avg("value"), "avg")})
    # custom callable combiners stay allowed (user owns correctness)
    out = salted_agg(df, "k", {"n": (F.count(F.lit(1)), lambda c: F.sum(c))})
    assert out.count() > 0
