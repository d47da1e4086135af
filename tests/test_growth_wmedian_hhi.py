"""Round-8 batch: growth accounting, weighted median, HHI concentration."""

from __future__ import annotations

import datetime as dt

import pytest

from olake_spark.operators.audit import hhi_concentration
from olake_spark.operators.quantiles import weighted_median
from olake_spark.operators.timeseries import growth_accounting


def _activity(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [(u, t0 + dt.timedelta(days=d)) for u, d in rows],
        "u string, ts timestamp",
    )


def test_growth_accounting_classification(spark):
    rows = [
        ("u1", 0), ("u1", 1),          # new on 0, retained on 1
        ("u2", 0), ("u2", 10),         # new on 0, resurrected on 10 (gap 10 > 7)
        ("u3", 5),                     # new on 5
        ("u1", 8),                     # gap 7 -> still retained (<= 7)
    ]
    out = {
        r.bucket - 19723: (r.n_active, r.n_new, r.n_retained, r.n_resurrected)
        for r in growth_accounting(
            _activity(spark, rows), "ts", "u", resurrect_after=7
        ).collect()
    }
    assert out[0] == (2, 2, 0, 0)
    assert out[1] == (1, 0, 1, 0)
    assert out[5] == (1, 1, 0, 0)
    assert out[8] == (1, 0, 1, 0)
    assert out[10] == (1, 0, 0, 1)
    with pytest.raises(ValueError):
        growth_accounting(_activity(spark, rows), "ts", "u", resurrect_after=0)


def test_growth_accounting_partition_sums(spark):
    rows = [(f"u{i % 5}", d) for i, d in enumerate(range(40))]
    out = growth_accounting(_activity(spark, rows), "ts", "u").collect()
    assert all(
        r.n_active == r.n_new + r.n_retained + r.n_resurrected for r in out
    )
    assert sum(r.n_new for r in out) == 5  # each user is new exactly once


def test_weighted_median_pinned_semantics(spark):
    # values 1,2,3 with weights 1,1,10: W=12, cum(1)=1, cum(2)=2, cum(3)=12
    # -> min v with 2*cum >= 12 is 3 (the unweighted median would be 2)
    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 10.0)],
        "g string, v double, w double",
    )
    out = weighted_median(df, ["g"], "v", "w").first()
    assert out.wmedian_micro == 3_000_000
    assert out.wmedian == 3.0
    assert out.w_total_micro == 12_000_000


def test_weighted_median_even_split_takes_lower(spark):
    # two values with equal weight: 2*cum(lower) == W -> lower wins
    df = spark.createDataFrame(
        [("g", 10.0, 5.0), ("g", 20.0, 5.0)], "g string, v double, w double"
    )
    out = weighted_median(df, ["g"], "v", "w").first()
    assert out.wmedian_micro == 10_000_000


def test_weighted_median_partition_invariant(spark):
    rows = [("g", float(v), float((v * 7) % 5 + 1)) for v in range(1, 200)]
    df = spark.createDataFrame(rows, "g string, v double, w double")
    a = weighted_median(df, ["g"], "v", "w").first()
    b = weighted_median(df.repartition(13), ["g"], "v", "w").first()
    assert tuple(a) == tuple(b)


def test_hhi_extremes(spark):
    # monopoly: one key owns everything -> HHI = 1, normalized = 1
    mono = spark.createDataFrame(
        [("m", "k1", 10.0), ("m", "k1", 5.0)], "g string, k string, v double"
    )
    out = hhi_concentration(mono, "g", "k", "v").first()
    assert out.hhi == 1.0
    assert out.hhi_normalized is None  # single key: normalization undefined
    # perfect equality over 4 keys -> HHI = 1/4, normalized = 0
    eq = spark.createDataFrame(
        [("e", f"k{i}", 10.0) for i in range(4)], "g string, k string, v double"
    )
    out = hhi_concentration(eq, "g", "k", "v").first()
    assert out.n_keys == 4
    assert out.hhi == 0.25
    assert out.hhi_normalized == 0.0


def test_hhi_matches_direct(spark):
    vals = {"a": 50.0, "b": 30.0, "c": 20.0}
    df = spark.createDataFrame(
        [("g", k, v) for k, v in vals.items()], "g string, k string, v double"
    )
    out = hhi_concentration(df, "g", "k", "v").first()
    shares = [v / 100.0 for v in vals.values()]
    want = sum(s * s for s in shares)
    assert out.hhi == pytest.approx(want, abs=1e-6)


def test_ltv_cohort_curve_triangle(spark):
    from olake_spark.operators.timeseries import ltv_cohort_curve

    t = dt.datetime
    rows = [
        # cohort Jan-2024: u1 spends 10 in Jan, 20 in Feb; u2 spends 5 in Jan
        ("u1", t(2024, 1, 5), 10.0), ("u1", t(2024, 2, 9), 20.0),
        ("u2", t(2024, 1, 20), 5.0),
        # cohort Feb-2024: u3 spends 7 in Feb
        ("u3", t(2024, 2, 1), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, amt double")
    out = {
        (r.cohort_month, r.age_months): (r.n_customers, r.rev_micro, r.cum_rev_micro)
        for r in ltv_cohort_curve(df, "k", "ts", "amt").collect()
    }
    jan = 2024 * 12 + 0
    feb = jan + 1
    assert out[(jan, 0)] == (2, 15_000_000, 15_000_000)
    assert out[(jan, 1)] == (2, 20_000_000, 35_000_000)
    assert out[(feb, 0)] == (1, 7_000_000, 7_000_000)


def test_event_path_ngrams_counts(spark):
    from olake_spark.operators.sessions import event_path_ngrams

    t0 = dt.datetime(2024, 1, 1)
    seq = {
        "u1": ["a", "b", "c", "a", "b", "c"],  # a>b>c twice... (and b>c>a once)
        "u2": ["a", "b", "c"],
    }
    rows = [
        (u, t0 + dt.timedelta(minutes=i), e)
        for u, es in seq.items()
        for i, e in enumerate(es)
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp, et string")
    out = {
        r.path: r.n_occurrences
        for r in event_path_ngrams(df, "ts", "u", "et", n=3, min_count=2).collect()
    }
    assert out["a>b>c"] == 3  # u1 twice + u2 once
    # below min_count paths pruned (b>c>a and c>a>b occur once each)
    assert "b>c>a" not in out
    with pytest.raises(ValueError):
        event_path_ngrams(df, "ts", "u", "et", n=1)


def test_theil_extremes_and_direct(spark):
    import math

    from olake_spark.operators.audit import theil_index

    # perfect equality -> theil 0, normalized 0
    eq = spark.createDataFrame(
        [("e", f"k{i}", 10.0) for i in range(5)], "g string, k string, v double"
    )
    out = theil_index(eq, "g", "k", "v").first()
    assert out.theil == 0.0 and out.theil_normalized == 0.0
    # monopoly among n keys -> theil = ln(n) (zero-value keys contribute 0)
    mono = spark.createDataFrame(
        [("m", "k1", 100.0)] + [("m", f"k{i}", 0.0) for i in range(2, 5)],
        "g string, k string, v double",
    )
    out = theil_index(mono, "g", "k", "v").first()
    assert out.n_keys == 4
    assert out.theil == pytest.approx(math.log(4), abs=1e-6)
    assert out.theil_normalized == pytest.approx(1.0, abs=1e-6)
    # direct check on an uneven split
    vals = {"a": 60.0, "b": 30.0, "c": 10.0}
    df = spark.createDataFrame(
        [("g", k, v) for k, v in vals.items()], "g string, k string, v double"
    )
    out = theil_index(df, "g", "k", "v").first()
    want = sum((v / 100) * math.log((v / 100) * 3) for v in vals.values())
    assert out.theil == pytest.approx(want, abs=1e-6)


def test_seasonal_naive_backtest_hand_computed(spark):
    from olake_spark.operators.forecast import seasonal_naive_backtest

    t0 = dt.datetime(2024, 1, 1)
    # daily totals: days 0..9 with season 2 -> pairs (t, t-2) for t=2..9
    vals = [10.0, 20.0, 12.0, 18.0, 14.0, 16.0, 10.0, 20.0, 12.0, 18.0]
    df = spark.createDataFrame(
        [(t0 + dt.timedelta(days=i), v) for i, v in enumerate(vals)],
        "ts timestamp, v double",
    )
    out = seasonal_naive_backtest(df, "ts", "v", season=2).first()
    errs = [abs(vals[t] - vals[t - 2]) for t in range(2, 10)]
    assert out.n_pairs == 8
    assert out.mae_micro == round(
        sum(int(e * 1e6) for e in errs) // 8
    )
    assert out.mae == pytest.approx(sum(errs) / 8, abs=1e-6)
    mape = sum(e / v for e, v in zip(errs, vals[2:])) / 8
    assert out.mape == pytest.approx(mape, abs=1e-6)
    with pytest.raises(ValueError):
        seasonal_naive_backtest(df, "ts", "v", season=0)
