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


def test_kmv_overlap_estimates_jaccard(spark):
    # A = 0..599, B = 300..899 -> union 900, intersection 300, J = 1/3
    rows = [("a", i) for i in range(600)] + [("b", i) for i in range(300, 900)]
    df = spark.createDataFrame(rows, "g string, v int")
    r = sk.kmv_overlap(df, "v", "g", "a", "b", k=64).collect()[0]
    assert r.n_merged == 64
    assert 0.10 <= r.est_jaccard <= 0.60  # true 0.333, k=64 noise belt
    assert 0.4 * 900 <= r.est_union <= 2.2 * 900
    assert 0.2 * 300 <= r.est_intersection <= 3.0 * 300


def test_kmv_overlap_disjoint_and_identical(spark):
    rows = [("a", i) for i in range(200)] + [("b", i + 10_000) for i in range(200)]
    r = sk.kmv_overlap(
        spark.createDataFrame(rows, "g string, v int"), "v", "g", "a", "b", k=64
    ).collect()[0]
    assert r.n_both == 0 and r.est_jaccard == 0.0 and r.est_intersection == 0.0
    same = [("a", i) for i in range(200)] + [("b", i) for i in range(200)]
    r2 = sk.kmv_overlap(
        spark.createDataFrame(same, "g string, v int"), "v", "g", "a", "b", k=64
    ).collect()[0]
    assert r2.est_jaccard == 1.0


def test_hll_null_group_key_gets_real_estimate(spark):
    # regression: the dense-grid join must be null-safe — a NULL group's
    # registers previously all coalesced to 0 (bogus fixed estimate)
    df = spark.createDataFrame(
        [(None, i) for i in range(500)] + [("a", i % 5) for i in range(50)],
        "g string, v int",
    )
    out = {r.g: r for r in sk.hll_sketch(df, "v", ["g"]).collect()}
    assert set(out) == {None, "a"}
    assert out[None].n_zero_regs < sk.HLL_M  # registers actually populated
    assert 0.3 * 500 <= out[None].est_distinct <= 3.0 * 500


def test_cms_estimate_upper_bounds_and_exact_when_sparse(spark):
    # 50 distinct values in a 4x256 grid: collisions possible but the
    # min-over-rows must never UNDER-estimate, and a value absent from
    # the stream must estimate near zero (only collision mass)
    rows = [(i % 50,) for i in range(1000)]
    df = spark.createDataFrame(rows, "v int")
    state = sk.cms_sketch(df, "v")
    cand = spark.createDataFrame([(i,) for i in range(60)], "v int")
    est = {r.v: r.est_count for r in sk.cms_point_estimate(state, cand, "v").collect()}
    for v in range(50):
        assert est[v] >= 20  # true count
    for v in range(50, 60):
        assert est[v] < 1000  # absent values see only collision mass


def test_cms_merge_is_union(spark):
    a = spark.createDataFrame([(i % 10,) for i in range(100)], "v int")
    b = spark.createDataFrame([(i % 7,) for i in range(70)], "v int")
    merged = sk.cms_merge(sk.cms_sketch(a, "v"), sk.cms_sketch(b, "v"))
    whole = sk.cms_sketch(a.unionByName(b), "v")
    m = {(r.r, r.c): r.cnt for r in merged.collect()}
    w = {(r.r, r.c): r.cnt for r in whole.collect()}
    assert m == w  # merge(state(A), state(B)) == state(A ∪ B), cell-exact


def test_cms_per_group_keys(spark):
    df = spark.createDataFrame(
        [("g1", 1)] * 5 + [("g2", 1)] * 3, "g string, v int"
    )
    state = sk.cms_sketch(df, "v", keys=["g"])
    by_g = {}
    for r in state.collect():
        by_g.setdefault(r.g, set()).add((r.r, r.c, r.cnt))
    cells_g1 = {cnt for _, _, cnt in by_g["g1"]}
    cells_g2 = {cnt for _, _, cnt in by_g["g2"]}
    assert cells_g1 == {5} and cells_g2 == {3}
