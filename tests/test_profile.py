"""Column profiling operator tests."""

from __future__ import annotations

from olake_spark.operators.profile import profile_numeric, top_values


def test_profile_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1.0,), (3.0,), (None,), (2.0,)], "v double"
    )
    r = profile_numeric(df, ["v"]).first()
    assert r["col"] == "v"
    assert r["n"] == 3 and r["n_nulls"] == 1
    assert r["min_v"] == 1.0 and r["max_v"] == 3.0
    assert r["mean_v"] == 2.0 and r["median_v"] == 2.0


def test_profile_multi_column_single_pass(spark):
    df = spark.createDataFrame([(1.0, 10.0), (2.0, 20.0)], "a double, b double")
    rows = {r["col"]: r for r in profile_numeric(df, ["a", "b"]).collect()}
    assert rows["a"]["mean_v"] == 1.5 and rows["b"]["mean_v"] == 15.0


def test_top_values_ties_deterministic(spark):
    df = spark.createDataFrame(
        [("x",), ("x",), ("y",), ("y",), ("z",)], "t string"
    )
    got = [(r["value"], r["n"], r["rnk"]) for r in top_values(df, "t", k=2).collect()]
    # x and y tie at 2; value asc breaks the tie
    assert got == [("x", 2, 1), ("y", 2, 2)]
