"""Round-8 batch: rank statistics (Mann-Whitney U, Spearman) + ACF."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from olake_spark.operators.abtest import mann_whitney_u
from olake_spark.operators.correlation import spearman_matrix
from olake_spark.operators.forecast import acf


def _groups(spark, a_vals, b_vals):
    rows = [("a", float(v)) for v in a_vals] + [("b", float(v)) for v in b_vals]
    return spark.createDataFrame(rows, "g string, v double")


def test_mann_whitney_hand_computed_with_ties(spark):
    # a=[1,2,3], b=[2,3,4,5]; pooled avg ranks 1, 2.5, 2.5, 4.5, 4.5, 6, 7
    # W_a = 1 + 2.5 + 4.5 = 8 -> U_a = 8 - 6 = 2 -> u2_a = 4
    # tie term = (2^3-2)+(2^3-2) = 12
    out = mann_whitney_u(_groups(spark, [1, 2, 3], [2, 3, 4, 5]), "g", "v", "a", "b").first()
    assert (out.n_a, out.n_b) == (3, 4)
    assert out.u2_a == 4
    assert out.tie_correction == 12
    assert out.auc == pytest.approx(2 / 12, abs=1e-6)
    var = 3 * 4 * (7**3 - 7 - 12) / (12 * 7 * 6)
    assert out.z == pytest.approx((2 - 6) / math.sqrt(var), abs=1e-6)


def test_mann_whitney_symmetry_and_separation(spark):
    df = _groups(spark, [1, 2, 3, 4], [10, 11, 12])
    ab = mann_whitney_u(df, "g", "v", "a", "b").first()
    ba = mann_whitney_u(df, "g", "v", "b", "a").first()
    # complete separation: every b beats every a
    assert ab.u2_a == 0 and ab.auc == 0.0
    assert ba.u2_a == 2 * 4 * 3 and ba.auc == 1.0
    # swapping the groups flips the statistic around its mean
    assert ab.z == pytest.approx(-ba.z, abs=1e-6)
    assert ab.auc + ba.auc == pytest.approx(1.0, abs=1e-9)


def test_mann_whitney_partition_invariant(spark):
    df = _groups(spark, [3, 1, 4, 1, 5], [9, 2, 6, 5, 3, 5])
    one = mann_whitney_u(df, "g", "v", "a", "b").first()
    two = mann_whitney_u(df.repartition(7), "g", "v", "a", "b").first()
    assert tuple(one) == tuple(two)


def test_spearman_monotone_extremes(spark):
    # nonlinear but strictly monotone -> rho = +/-1 where Pearson wouldn't be
    rows = [(float(i), float(i) ** 3, float(-i)) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "a double, b double, c double")
    out = {(r.col_a, r.col_b): r.rho for r in spearman_matrix(df, ["a", "b", "c"]).collect()}
    assert out[("a", "b")] == 1.0
    assert out[("a", "c")] == -1.0
    assert out[("b", "c")] == -1.0


def test_spearman_ties_match_pandas_rank_corr(spark):
    import pandas as pd

    a = [1, 2, 2, 3, 3, 3, 4, 7, 7, 9]
    b = [2, 1, 4, 4, 5, 7, 7, 7, 8, 8]
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(a, b)], "a double, b double"
    )
    got = spearman_matrix(df, ["a", "b"]).first()
    pdf = pd.DataFrame({"a": a, "b": b})
    want = pdf["a"].rank().corr(pdf["b"].rank())  # Pearson over average ranks
    assert got.n == 10
    assert got.rho == pytest.approx(want, abs=1e-6)


def test_spearman_null_rows_dropped_listwise(spark):
    rows = [(1.0, 1.0), (2.0, 2.0), (3.0, None), (None, 4.0), (5.0, 5.0)]
    df = spark.createDataFrame(rows, "a double, b double")
    got = spearman_matrix(df, ["a", "b"]).first()
    assert got.n == 3
    assert got.rho == 1.0


def _daily(spark, vals):
    t0 = dt.datetime(2024, 1, 1)
    rows = [(t0 + dt.timedelta(days=i), float(v)) for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "ts timestamp, v double")


def test_acf_matches_direct_computation(spark):
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9]
    n = len(vals)
    x = [round(v * 1_000_000) for v in vals]
    s = sum(x)
    dev = [n * xi - s for xi in x]
    den = sum(d * d for d in dev)
    out = {r.lag: (r.n_pairs, r.r) for r in acf(_daily(spark, vals), "ts", "v", max_lag=3).collect()}
    for k in (1, 2, 3):
        want = sum(dev[t] * dev[t + k] for t in range(n - k)) / den
        assert out[k][0] == n - k
        assert out[k][1] == pytest.approx(want, abs=1e-6)


def test_acf_constant_series_is_null_and_lag_validated(spark):
    out = acf(_daily(spark, [5] * 10), "ts", "v", max_lag=2).collect()
    assert all(r.r is None for r in out)
    with pytest.raises(ValueError):
        acf(_daily(spark, [1, 2]), "ts", "v", max_lag=0)


def test_acf_gap_drops_only_touched_pairs(spark):
    # days 0,1,2,4 (day 3 missing): lag-1 pairs are (0,1),(1,2) -> 2 pairs;
    # lag-2 pairs are (0,2),(2,4) -> 2 pairs
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (t0 + dt.timedelta(days=d), float(v))
        for d, v in [(0, 1), (1, 2), (2, 4), (4, 8)]
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = {r.lag: r.n_pairs for r in acf(df, "ts", "v", max_lag=2).collect()}
    assert out == {1: 2, 2: 2}


def test_zipf_slope_exact_power_law(spark):
    from olake_spark.operators.text import zipf_slope

    # construct counts following an exact c = 1024 / r law for r in 1..8:
    # token t_r appears 1024//r times -> slope of ln c vs ln r == -1 ...
    # use powers of two so ln ratios are exact multiples of ln 2
    docs = []
    for r in range(1, 9):
        c = 2 ** (9 - r)  # strictly decreasing, unique counts
        docs.extend([f"tok{r:02d}"] * c)
    df = spark.createDataFrame([(" ".join(docs),)], "text string")
    out = zipf_slope(df, "text", top_v=8).first()
    assert out.v == 8
    # regression of y = ln(2^(9-r)) on x = ln(r): not exactly -1 (x is
    # ln-spaced) — compare against the direct least-squares fit
    import math

    xs = [math.log(r) for r in range(1, 9)]
    ys = [math.log(2 ** (9 - r)) for r in range(1, 9)]
    n = 8
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    inter = (sy - slope * sx) / n
    assert out.slope == pytest.approx(slope, abs=1e-6)
    assert out.intercept == pytest.approx(inter, abs=1e-6)


def test_zipf_slope_degenerate_and_validation(spark):
    from olake_spark.operators.text import zipf_slope

    # a single distinct token -> den = 0 -> NULLs, never a crash
    df = spark.createDataFrame([("a a a a",)], "text string")
    out = zipf_slope(df, "text", top_v=10).first()
    assert out.v == 1 and out.slope is None and out.intercept is None
    with pytest.raises(ValueError):
        zipf_slope(df, "text", top_v=1)


def test_mann_kendall_monotone_and_flat(spark):
    from olake_spark.operators.robust_trend import mann_kendall_theil_sen

    t0 = dt.datetime(2024, 1, 1)

    def series(vals):
        return spark.createDataFrame(
            [(t0 + dt.timedelta(days=i), float(v)) for i, v in enumerate(vals)],
            "ts timestamp, v double",
        )

    # strictly increasing: S = C(n,2), Sen slope = the constant step
    up = mann_kendall_theil_sen(series([1, 2, 3, 4, 5]), "ts", "v").first()
    assert up.s_stat == 10  # C(5,2)
    assert up.sen_slope == pytest.approx(1.0, abs=1e-6)
    assert up.z > 0
    # constant: S = 0, variance fully tie-corrected to 0 -> z NULL
    flat = mann_kendall_theil_sen(series([7] * 6), "ts", "v").first()
    assert flat.s_stat == 0
    assert flat.var_s == 0.0
    assert flat.z is None


def test_mann_kendall_outlier_robust_slope(spark):
    from olake_spark.operators.robust_trend import mann_kendall_theil_sen

    t0 = dt.datetime(2024, 1, 1)
    # slope-2 line with one wild spike: Sen slope stays ~2
    vals = [2.0 * i for i in range(15)]
    vals[7] = 1e6
    df = spark.createDataFrame(
        [(t0 + dt.timedelta(days=i), v) for i, v in enumerate(vals)],
        "ts timestamp, v double",
    )
    out = mann_kendall_theil_sen(df, "ts", "v").first()
    assert out.sen_slope == pytest.approx(2.0, abs=0.01)
    assert out.n_buckets == 15


def test_kth_smallest_double_matches_sorted(spark):
    """The bisection selector must return EXACTLY sorted(vals)[k-1] —
    including ties, negatives, denormal-close values, and k at both
    ends — since the Theil-Sen contract is the exact rank-⌈m/2⌉ slope."""
    import random

    from olake_spark.operators.robust_trend import _kth_smallest_double

    rng = random.Random(9)
    cases = [
        [0.0] * 7,
        [-3.5, -3.5, 2.0, 2.0, 2.0, 9.25],
        [rng.uniform(-1e6, 1e6) for _ in range(101)],
        [rng.choice([1.0, 1.0 + 2**-40, 1.0 + 2**-39]) for _ in range(25)],
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "x double")
        s = sorted(vals)
        for k in (1, (len(vals) + 1) // 2, len(vals)):
            got = _kth_smallest_double(df, "x", k)
            assert got == s[k - 1], (vals, k, got)
    # out-of-range ranks and empty input -> None
    df = spark.createDataFrame([(1.0,)], "x double")
    assert _kth_smallest_double(df, "x", 0) is None
    assert _kth_smallest_double(df, "x", 2) is None


def test_mann_kendall_plan_has_no_global_rank_window(spark):
    """The r9 rework: the Sen median is selected by histogram bisection,
    so the RETURNED plan must contain no Window at all (the old global
    row_number over the pair relation was a single-partition exchange
    that dies at 100k buckets)."""
    import datetime as dt

    from olake_spark.operators.robust_trend import mann_kendall_theil_sen

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(t0 + dt.timedelta(days=i), float(i)) for i in range(10)],
        "ts timestamp, v double",
    )
    out = mann_kendall_theil_sen(df, "ts", "v")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert out.first().sen_slope == pytest.approx(1.0, abs=1e-6)


def test_mann_kendall_by_key_fleet(spark):
    """Per-key fleet: a monotone key recovers its constant step, a
    constant key reports S=0 with fully-tie-corrected zero variance
    (z NULL), and a single-bucket key yields n_buckets=1 with NULL
    slope — all from ONE plan, windows partitioned on the key."""
    import datetime as dt

    from olake_spark.operators.robust_trend import mann_kendall_by_key

    t0 = dt.datetime(2024, 1, 1)
    rows = (
        [("up", t0 + dt.timedelta(days=i), float(2 * i)) for i in range(6)]
        + [("flat", t0 + dt.timedelta(days=i), 7.0) for i in range(5)]
        + [("lone", t0, 3.0)]
    )
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = {r.k: r for r in mann_kendall_by_key(df, "ts", ["k"], "v").collect()}
    assert set(out) == {"up", "flat", "lone"}
    assert out["up"].s_stat == 15  # C(6,2)
    assert out["up"].sen_slope == pytest.approx(2.0, abs=1e-6)
    assert out["up"].z > 0
    assert out["flat"].s_stat == 0
    assert out["flat"].var_s == 0.0 and out["flat"].z is None
    assert out["lone"].n_buckets == 1
    assert out["lone"].s_stat == 0
    assert out["lone"].sen_slope is None and out["lone"].z is None


def test_wilson_ci_edges(spark):
    """Wilson interval at p ∈ {0, 1} stays strictly inside [0, 1] (the
    Wald interval collapses to zero width there — the operator's whole
    reason to exist) and NULL successes are excluded from n."""
    from olake_spark.operators.abtest import proportion_wilson_ci

    rows = (
        [("all", True)] * 10
        + [("none", False)] * 10
        + [("mixed", True)] * 3
        + [("mixed", False)] * 7
        + [("mixed", None)] * 4
    )
    df = spark.createDataFrame(rows, "g string, s boolean")
    out = {r.g: r for r in proportion_wilson_ci(df, ["g"], "s").collect()}
    assert out["all"].p_hat == 1.0
    assert 0.0 < out["all"].ci_lo < 1.0 and out["all"].ci_hi <= 1.0 + 1e-9
    assert out["none"].p_hat == 0.0
    assert -1e-9 <= out["none"].ci_lo and 0.0 < out["none"].ci_hi < 1.0
    assert out["mixed"].n == 10  # NULLs excluded
    assert out["mixed"].ci_lo < 0.3 < out["mixed"].ci_hi


def test_ols2_recovers_exact_plane_and_guards(spark):
    """y = 3x1 − 2x2 + 5 exactly → b1≈3, b2≈−2, intercept≈5, R²=1;
    collinear regressors (x2 = 2·x1) → det 0 → NULL coefficients."""
    import itertools

    from olake_spark.operators.correlation import ols2

    pts = [
        (float(x1), float(x2), 3.0 * x1 - 2.0 * x2 + 5.0)
        for x1, x2 in itertools.product(range(5), range(4))
    ]
    df = spark.createDataFrame(pts, "x1 double, x2 double, y double")
    fit = ols2(df, "y", "x1", "x2").first()
    assert fit.b1 == pytest.approx(3.0, abs=1e-4)
    assert fit.b2 == pytest.approx(-2.0, abs=1e-4)
    assert fit.intercept == pytest.approx(5.0, abs=1e-4)
    assert fit.r2 == pytest.approx(1.0, abs=1e-6)

    col = spark.createDataFrame(
        [(float(i), float(2 * i), float(i)) for i in range(8)],
        "x1 double, x2 double, y double",
    )
    degen = ols2(col, "y", "x1", "x2").first()
    assert degen.b1 is None and degen.b2 is None and degen.r2 is None


def test_cuped_preserves_means_and_reduces_nothing_when_uncorrelated(spark):
    """θ with a pre-metric that's pure noise w.r.t. Y ≈ its sample cov;
    the structural contracts: (a) zero pre-variance → θ=0 and
    mean_adj == mean_post exactly; (b) X == Y per unit → θ=1 and each
    arm's adjusted mean collapses toward the pooled mean."""
    from olake_spark.operators.abtest import cuped_adjust

    # (a) constant pre-period covariate
    rows = [(i % 2, 5.0, float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "arm int, pre double, post double")
    out = {r.arm: r for r in cuped_adjust(df, "arm", "pre", "post").collect()}
    assert out[0].theta == 0.0
    assert out[0].mean_adj == out[0].mean_post
    # (b) perfectly correlated covariate
    rows = [(i % 2, float(i), float(i)) for i in range(10)]
    df = spark.createDataFrame(rows, "arm int, pre double, post double")
    out = {r.arm: r for r in cuped_adjust(df, "arm", "pre", "post").collect()}
    pooled = sum(range(10)) / 10.0
    assert out[0].theta == pytest.approx(1.0, abs=1e-9)
    assert out[0].mean_adj == pytest.approx(pooled, abs=1e-6)
    assert out[1].mean_adj == pytest.approx(pooled, abs=1e-6)


def test_ratio_metric_delta_matches_python(spark):
    """Ratio and delta-method SE against a plain Python reference; a
    single-unit arm reports NULL se."""
    import math

    rows = [
        (0, 10.0, 2.0), (0, 30.0, 4.0), (0, 20.0, 4.0),
        (1, 7.0, 1.0),
    ]
    from olake_spark.operators.abtest import ratio_metric_delta

    df = spark.createDataFrame(rows, "arm int, y double, d double")
    out = {r.arm: r for r in ratio_metric_delta(df, "arm", "y", "d").collect()}
    ys = [10.0, 30.0, 20.0]
    ds = [2.0, 4.0, 4.0]
    n = 3
    r = sum(ys) / sum(ds)
    mean_d = sum(ds) / n
    vary = sum((v - sum(ys) / n) ** 2 for v in ys) / (n - 1)
    vard = sum((v - mean_d) ** 2 for v in ds) / (n - 1)
    cov = sum(
        (y - sum(ys) / n) * (v - mean_d) for y, v in zip(ys, ds)
    ) / (n - 1)
    se = math.sqrt((vary + r * r * vard - 2 * r * cov) / (n * mean_d**2))
    assert out[0].ratio == pytest.approx(r, abs=1e-6)
    assert out[0].se == pytest.approx(se, abs=1e-5)
    assert out[1].n == 1 and out[1].se is None
    assert out[1].ratio == pytest.approx(7.0, abs=1e-6)


def test_seasonal_decompose_identity_and_flat_series(spark):
    """Structural identities: x == trend + seasonal + residual is exact
    on every bucket (integer arithmetic), and a constant series yields
    zero seasonal and zero residual everywhere."""
    import datetime as dt

    from olake_spark.operators.timeseries import seasonal_decompose

    t0 = dt.datetime(2024, 1, 1)
    # weekly sawtooth + constant: decompose should put the sawtooth in
    # seasonal, residual small
    rows = [
        (t0 + dt.timedelta(days=i), 100.0 + 10.0 * (i % 7))
        for i in range(28)
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = seasonal_decompose(df, "ts", "v", step="1 day", period=7).collect()
    assert len(out) == 28
    for r in out:
        assert (
            r.x_micro == r.trend_micro + r.seasonal_micro + r.residual_micro
        )
    flat = spark.createDataFrame(
        [(t0 + dt.timedelta(days=i), 5.0) for i in range(14)],
        "ts timestamp, v double",
    )
    for r in seasonal_decompose(flat, "ts", "v", step="1 day").collect():
        assert r.seasonal_micro == 0 and r.residual_micro == 0
