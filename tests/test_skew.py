"""Salting operators: result-equivalence with unsalted plans."""

from __future__ import annotations

from pyspark.sql import functions as F

from olake_spark.operators.skew import salted_join, two_phase_distinct_count, with_salt


def _skewed(spark):
    # key 1 is hot (80 rows), keys 2-9 sparse
    hot = spark.range(80).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(2, 10).select(F.col("id").alias("k"), (F.col("id") * 100).alias("v"))
    return hot.unionByName(cold)


def _dim(spark):
    return spark.range(1, 6).select(F.col("id").alias("k"), F.concat(F.lit("n"), F.col("id")).alias("name"))


def test_salted_inner_equals_plain(spark):
    big, small = _skewed(spark), _dim(spark)
    plain = big.join(small, ["k"], "inner")
    salted = salted_join(big, small, ["k"], n=8)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_keeps_unmatched(spark):
    big, small = _skewed(spark), _dim(spark)
    plain = big.join(small, ["k"], "left")
    salted = salted_join(big, small, ["k"], n=4, how="left")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
    # unmatched keys (6-9) survive exactly once
    assert salted.filter(F.col("name").isNull()).count() == plain.filter(F.col("name").isNull()).count()


def test_salt_range(spark):
    df = with_salt(_skewed(spark), 8, "v")
    vals = {r["_salt"] for r in df.select("_salt").distinct().collect()}
    assert vals <= set(range(8)) and len(vals) > 1


def test_two_phase_distinct_count(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (1, "b"), (2, "a")], "k int, v string"
    )
    got = {r["k"]: r["n_distinct"] for r in two_phase_distinct_count(df, ["k"], "v").collect()}
    assert got == {1: 2, 2: 1}


def test_salted_join_spreads_hot_key(spark):
    big, small = _skewed(spark), _dim(spark)
    out = salted_join(big.withColumn("_rid", F.col("v")), small, ["k"], n=8, salt_from="_rid")
    # the hot key's rows really do carry several distinct salt values before
    # the join drops the column — verify via the pre-join frame
    b = with_salt(big, 8, "v")
    n_salts = b.filter(F.col("k") == 1).select("_salt").distinct().count()
    assert n_salts > 1
    assert out.count() == big.join(small, ["k"]).count()
