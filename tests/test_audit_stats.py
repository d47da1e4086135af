"""Round-7 audit statistics: Benford, Gini, chi-square, seasonal baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from olake_spark.operators.anomaly import seasonal_baseline_outliers
from olake_spark.operators.audit import (
    benford_first_digit,
    chi_square_independence,
    gini_concentration,
)


def test_benford_digits_and_shares(spark):
    # values 1..9 once each plus one extra leading-1 value; zero dropped
    rows = [(float(d),) for d in range(1, 10)] + [(100.0,), (0.0,)]
    df = spark.createDataFrame(rows, "v double")
    out = {r.digit: r for r in benford_first_digit(df, "v").collect()}
    assert set(out) == set(range(1, 10))
    assert out[1].n == 2 and out[2].n == 1
    assert out[1].share == 0.2  # 2 of 10 nonzero values
    assert out[1].benford_share == 0.30103
    assert abs(out[1].abs_dev - round(abs(0.2 - 0.30103), 6)) < 1e-12


def test_gini_extremes(spark):
    # perfectly equal -> gini 0; fully concentrated -> (n-1)/n
    eq = spark.createDataFrame([(i, 10.0) for i in range(4)], "k int, v double")
    r = gini_concentration(eq, "k", "v").first()
    assert r.n_keys == 4 and float(r.gini) == 0.0
    conc = spark.createDataFrame(
        [(0, 100.0), (1, 0.0), (2, 0.0), (3, 0.0)], "k int, v double"
    )
    r2 = gini_concentration(conc, "k", "v").first()
    assert float(r2.gini) == 0.75  # (n-1)/n


def test_chi2_independent_table_is_zero(spark):
    # perfectly independent 2x2 contingency: chi2 == 0 exactly
    rows = (
        [("a", "x")] * 10 + [("a", "y")] * 30
        + [("b", "x")] * 20 + [("b", "y")] * 60
    )
    df = spark.createDataFrame(rows, "r string, c string")
    out = chi_square_independence(df, "r", "c").collect()
    assert len(out) == 4
    assert all(r.cell_chi2_micro == 0 for r in out)
    assert out[0].chi2_total_micro == 0
    # skew one cell -> positive statistic
    df2 = df.unionByName(
        spark.createDataFrame([("a", "x")] * 20, "r string, c string")
    )
    out2 = chi_square_independence(df2, "r", "c").collect()
    assert out2[0].chi2_total_micro > 0


def test_seasonal_baseline_flags_slot_outlier(spark):
    # hour 0: tight cluster around 10 with one 100-spike; hour 1: all 100s
    # (the spike is normal FOR HOUR 1 — only the hour-0 one must flag)
    h0 = [(i * 60_000_000, 10.0 + (i % 3) * 0.5) for i in range(20)]
    h0.append((50 * 60_000_000, 100.0))
    h1 = [(3_600_000_000 + i * 60_000_000, 100.0) for i in range(15)]
    df = spark.createDataFrame(h0 + h1, "ts_us long, value double")
    out = seasonal_baseline_outliers(df, "ts_us", [], "value", k=3, min_n=10)
    flagged = [(r.ts_us, r.hod) for r in out.collect() if r.is_anomaly]
    assert flagged == [(50 * 60_000_000, 0)]


def test_trend_slope_exact_line_and_degenerates(spark):
    from olake_spark.operators.timeseries import trend_slope

    h = 3_600_000_000
    rows = (
        # key 'up': y = 2.5x + 1 exactly (slope 2.5/hour)
        [("up", i * h, 1.0 + 2.5 * i) for i in range(6)]
        # key 'flat': constant
        + [("flat", i * h, 7.0) for i in range(4)]
        # key 'one': single point -> NULL slope
        + [("one", 0, 3.0)]
        # key 'same_t': two points at the same time -> zero time variance
        + [("same_t", h, 1.0), ("same_t", h, 9.0)]
    )
    df = spark.createDataFrame(rows, "k string, ts_us long, v double")
    out = {r.k: r for r in trend_slope(df, "ts_us", ["k"], "v").collect()}
    assert out["up"].slope == 2.5
    assert out["flat"].slope == 0.0
    assert out["one"].slope is None
    assert out["same_t"].slope is None
    # partition invariance (exact integer moments)
    out2 = {
        r.k: r.slope
        for r in trend_slope(df.repartition(7), "ts_us", ["k"], "v").collect()
    }
    assert out2 == {k: r.slope for k, r in out.items()}


def test_chi2_sparse_table_materializes_zero_cells(spark):
    # (b, y) never observed: the grid must still carry it with o=0 and
    # cell statistic e = r*c/g — omitting it biases chi2 low
    rows = [("a", "x")] * 5 + [("a", "y")] * 5 + [("b", "x")] * 10
    df = spark.createDataFrame(rows, "r string, c string")
    out = {(r.r, r.c): r for r in chi_square_independence(df, "r", "c").collect()}
    assert set(out) == {("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")}
    zero = out[("b", "y")]
    assert zero.n == 0 and zero.expected == 2.5
    # (0*20 - 10*5)^2 * 1e6 div (20*10*5) = 2_500_000 (= e in micro)
    assert zero.cell_chi2_micro == 2_500_000
    # full hand-computed total: 833_333 + 2_500_000 + 833_333 + 2_500_000
    assert zero.chi2_total_micro == 6_666_666


def test_benford_first_significant_digit_exact(spark):
    # near-power-of-10 doubles stay with their true leading digit and
    # sub-micro values are bucketed, not dropped; 0/NaN/inf/NULL drop
    rows = [(9.9999996,), (1.0e-7,), (0.0,), (float("nan",),),
            (float("inf"),), (None,), (-0.25,)]
    df = spark.createDataFrame(rows, "v double")
    out = {r.digit: r.n for r in benford_first_digit(df, "v").collect()}
    assert out == {9: 1, 1: 1, 2: 1}


def test_gini_negative_total_fails_loudly(spark):
    import pytest

    df = spark.createDataFrame(
        [(0, 10.0), (1, -3.0)], "k int, v double"
    )
    with pytest.raises(Exception, match="non-negative"):
        gini_concentration(df, "k", "v").collect()
