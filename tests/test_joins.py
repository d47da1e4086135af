"""As-of and range join operator tests (operators/joins.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from olake_spark.operators.joins import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "a"),
         (1, _ts("2024-01-01 12:00:00"), "b"),
         (2, _ts("2024-01-01 09:00:00"), "c")],
        "k int, lt timestamp, payload string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:30:00"), 10.0),
         (1, _ts("2024-01-01 11:00:00"), 20.0),
         (2, _ts("2024-01-01 09:30:00"), 30.0)],
        "k int, rt timestamp, v double",
    )
    return left, right


def test_asof_backward_picks_newest_prior(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "lt", "rt", ["v"])
    got = {r["payload"]: r["v"] for r in out.collect()}
    # a: only 09:30 row precedes 10:00; b: 11:00 wins; c: no prior row → NULL
    assert got == {"a": 10.0, "b": 20.0, "c": None}


def test_asof_exact_tie_matches(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01 09:30:00"), "x")],
                                 "k int, lt timestamp, payload string")
    _, right = _frames(spark)
    out = asof_join(left, right, ["k"], "lt", "rt", ["v"])
    # right row at the exact same instant is visible (<= semantics)
    assert out.first()["v"] == 10.0


def test_asof_tolerance(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "lt", "rt", ["v"], tolerance_seconds=1800)
    got = {r["payload"]: r["v"] for r in out.collect()}
    # a: 10:00-09:30=30min ok; b: 12:00-11:00=60min > 30min → NULL
    assert got == {"a": 10.0, "b": None, "c": None}


def test_asof_no_cross_key_leak(spark):
    left = spark.createDataFrame([(9, _ts("2024-01-02 00:00:00"), "z")],
                                 "k int, lt timestamp, payload string")
    _, right = _frames(spark)
    out = asof_join(left, right, ["k"], "lt", "rt", ["v"])
    assert out.first()["v"] is None


def test_range_join_window(spark):
    left, right = _frames(spark)
    out = range_join(
        left, right, ["k"],
        F.col("rt"), F.col("lt"), F.col("lt") + F.expr("INTERVAL 2 HOURS"),
    )
    got = sorted((r["payload"], r["v"]) for r in out.collect())
    # a@10:00 window [10,12): captures 11:00/20.0 only; b@12:00 [12,14): none
    # c@09:00 [9,11): captures 09:30/30.0
    assert got == [("a", 20.0), ("c", 30.0)]


def test_range_join_plan_is_equi_join(spark):
    left, right = _frames(spark)
    out = range_join(
        left, right, ["k"],
        F.col("rt"), F.col("lt"), F.col("lt") + F.expr("INTERVAL 2 HOURS"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
