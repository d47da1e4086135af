"""Mergeable rollup state: merge == full rebuild (incl. registers),
N-way merges, empty-side identity."""

from __future__ import annotations

from pyspark.sql import functions as F

from olake_spark.operators import incremental_agg as ia

KEYS = ["g"]


def _df(spark, lo, hi):
    return spark.createDataFrame(
        [(f"g{i % 3}", float(i) / 7.0, i % 40) for i in range(lo, hi)],
        "g string, value double, uid int",
    )


def _state_rows(state):
    return sorted(
        (r.g, r.n, r.sum_micros, r.min_micros, r.max_micros, list(r.hll_regs))
        for r in state.collect()
    )


def test_two_way_merge_equals_full_rebuild(spark):
    full = ia.agg_state(_df(spark, 0, 500), KEYS, "value", "uid")
    a = ia.agg_state(_df(spark, 0, 200), KEYS, "value", "uid")
    b = ia.agg_state(_df(spark, 200, 500), KEYS, "value", "uid")
    merged = ia.agg_state_merge(a.unionByName(b), KEYS)
    assert _state_rows(merged) == _state_rows(full)
    # finalized views agree too
    fa = sorted(map(tuple, ia.agg_finalize(merged, KEYS).collect()))
    fb = sorted(map(tuple, ia.agg_finalize(full, KEYS).collect()))
    assert fa == fb


def test_four_way_merge_any_split(spark):
    full = ia.agg_state(_df(spark, 0, 400), KEYS, "value", "uid")
    parts = [
        ia.agg_state(_df(spark, i * 100, (i + 1) * 100), KEYS, "value", "uid")
        for i in range(4)
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = ia.agg_state_merge(u, KEYS)
    assert _state_rows(merged) == _state_rows(full)


def test_overlapping_distinct_values_dont_double_count(spark):
    # both halves contain the SAME uids: distinct estimate must not grow
    a = ia.agg_state(_df(spark, 0, 100), KEYS, "value", "uid")
    b = ia.agg_state(_df(spark, 0, 100), KEYS, "value", "uid")
    merged = ia.agg_state_merge(a.unionByName(b), KEYS)
    fa = {r.g: r for r in ia.agg_finalize(merged, KEYS).collect()}
    fs = {r.g: r for r in ia.agg_finalize(a, KEYS).collect()}
    for g in fs:
        assert fa[g].harmonic_scaled == fs[g].harmonic_scaled
        assert fa[g].est_distinct == fs[g].est_distinct
        assert fa[g].n == 2 * fs[g].n  # counts do add


def test_merge_single_state_is_identity(spark):
    s = ia.agg_state(_df(spark, 0, 150), KEYS, "value", "uid")
    assert _state_rows(ia.agg_state_merge(s, KEYS)) == _state_rows(s)


def test_null_group_key_survives_state_and_merge(spark):
    # regression (r5 ADVICE): agg_state/agg_state_merge joins must be
    # null-safe — a NULL-key group was silently dropped from the rollup
    df = spark.createDataFrame(
        [(None, 1.5, 1), (None, 2.5, 2), ("a", 1.0, 3)],
        "g string, value double, uid int",
    )
    s = ia.agg_state(df, ["g"], "value", "uid")
    rows = {r.g: r for r in s.collect()}
    assert set(rows) == {None, "a"}
    assert rows[None].n == 2 and rows[None].sum_micros == 4_000_000
    merged = ia.agg_state_merge(s.unionByName(s), ["g"])
    m = {r.g: r for r in merged.collect()}
    assert m[None].n == 4 and m[None].sum_micros == 8_000_000
    fin = {r.g: r for r in ia.agg_finalize(merged, ["g"]).collect()}
    assert fin[None].est_distinct > 0
