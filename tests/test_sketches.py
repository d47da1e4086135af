"""KMV / HLL sketches: accuracy envelope, merge property, invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from olake_spark.operators import sketches as sk

SF = "/root/testdata/sf0.01"


def test_kmv_small_groups_are_exact(spark):
    df = spark.createDataFrame(
        [("a", i % 10) for i in range(100)] + [("b", i) for i in range(30)],
        "g string, v int",
    )
    out = {r.g: r for r in sk.kmv_sketch(df, "v", ["g"], k=64).collect()}
    # below k the sketch holds every distinct hash -> estimate is exact
    assert out["a"].n_kept == 10 and out["a"].est_distinct == 10.0
    assert out["b"].n_kept == 30 and out["b"].est_distinct == 30.0


def test_kmv_estimate_within_envelope(spark):
    # 2000 distinct values, k=64 -> relative std err ~ 1/sqrt(62) ~ 13%
    df = spark.createDataFrame(
        [("g", i) for i in range(2000)], "g string, v int"
    )
    r = sk.kmv_sketch(df, "v", ["g"], k=64).collect()[0]
    assert r.n_kept == 64
    assert 0.5 * 2000 <= r.est_distinct <= 2.0 * 2000


def test_kmv_union_merges_sketches(spark):
    # groups share values; union estimate ~ true union distinct (800)
    rows = [("a", i) for i in range(500)] + [("b", i) for i in range(300, 800)]
    df = spark.createDataFrame(rows, "g string, v int")
    r = sk.kmv_union_estimate(df, "v", ["g"], k=64).collect()[0]
    assert 0.5 * 800 <= r.est_union_distinct <= 2.0 * 800


def test_hll_envelope_and_partition_invariance(spark):
    df = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", "user_id"
    )
    exact = {
        r.event_type: r.n
        for r in df.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    a = {r.event_type: r for r in sk.hll_sketch(df, "user_id", ["event_type"]).collect()}
    b = {
        r.event_type: r
        for r in sk.hll_sketch(
            df.repartition(17, "user_id"), "user_id", ["event_type"]
        ).collect()
    }
    for et, n in exact.items():
        # m=32 -> ~18% rel std err; raw estimate (no LC correction) -> 3x belt
        assert a[et].est_distinct > 0
        assert 0.33 * n <= a[et].est_distinct <= 3.0 * n
        assert (
            a[et].harmonic_scaled == b[et].harmonic_scaled
            and a[et].est_distinct == b[et].est_distinct
        )
        assert 0 <= a[et].n_zero_regs <= sk.HLL_M
