"""Round-8 batch: winsorized stats, item-item neighbors, RFM segments."""

from __future__ import annotations

import datetime as dt

import pytest

from olake_spark.operators.basket import item_neighbors_topk
from olake_spark.operators.features import rfm_segments
from olake_spark.operators.quantiles import winsorized_stats


def _vals(spark, vals, g="x"):
    return spark.createDataFrame(
        [(g, float(v)) for v in vals], "g string, v double"
    )


def test_winsorized_clamps_outliers(spark):
    # 20 ones plus one huge outlier; p05 cutoff = rank ceil(.05*21)=2 -> 1,
    # p95 cutoff = rank ceil(.95*21)=20 -> 1, so the outlier clamps to 1
    df = _vals(spark, [1.0] * 20 + [10_000.0])
    out = winsorized_stats(df, ["g"], "v", p_lo=0.05, p_hi=0.95).first()
    assert out.n == 21
    assert out.n_clipped_lo == 0
    assert out.n_clipped_hi == 1
    assert out.win_mean == 1.0
    assert out.win_sd == 0.0


def test_winsorized_interior_data_untouched(spark):
    # uniform 1..100: cutoffs are the 5th and 95th order statistics
    df = _vals(spark, range(1, 101))
    out = winsorized_stats(df, ["g"], "v", p_lo=0.05, p_hi=0.95).first()
    assert out.n == 100
    assert out.n_clipped_lo == 4  # values 1..4 clamp up to 5
    assert out.n_clipped_hi == 5  # values 96..100 clamp down to 95
    w = [max(5, min(95, x)) for x in range(1, 101)]
    mean = sum(w) / 100
    sd = (sum((x - mean) ** 2 for x in w) / 100) ** 0.5
    assert out.win_mean == pytest.approx(mean, abs=1e-6)
    assert out.win_sd == pytest.approx(sd, abs=1e-6)


def test_winsorized_validates_ps(spark):
    df = _vals(spark, [1, 2, 3])
    with pytest.raises(ValueError):
        winsorized_stats(df, ["g"], "v", p_lo=0.9, p_hi=0.1)


def _baskets(spark, baskets):
    rows = [(b, i) for b, items in baskets for i in items]
    return spark.createDataFrame(rows, "b long, i long")


def test_item_neighbors_cosine_and_rank(spark):
    # items 1,2 co-occur in 3 baskets; 1,3 in 2; supports: 1->5, 2->3, 3->4
    df = _baskets(
        spark,
        [
            (10, [1, 2]), (11, [1, 2]), (12, [1, 2, 3]),
            (13, [1, 3]), (14, [1]), (15, [3]), (16, [3]),
        ],
    )
    rows = item_neighbors_topk(df, "b", "i", k=2, min_count=2).collect()
    got = {(r.item, r.rnk): (r.neighbor, r.n_co, r.cosine) for r in rows}
    cos12 = 3 / (5 * 3) ** 0.5
    cos13 = 2 / (5 * 4) ** 0.5
    assert got[(1, 1)] == (2, 3, round(cos12, 6))
    assert got[(1, 2)] == (3, 2, round(cos13, 6))
    # symmetric direction exists too
    assert got[(2, 1)][0] == 1
    assert got[(3, 1)][0] == 1
    # pair (2,3) co-occurs only once -> pruned by min_count
    assert (2, 2) not in got


def test_item_neighbors_dedups_within_basket_and_validates(spark):
    # duplicate (basket,item) rows must not inflate counts
    df = _baskets(spark, [(1, [7, 8, 8, 7]), (2, [7, 8])])
    rows = item_neighbors_topk(df, "b", "i", k=1, min_count=2).collect()
    assert {(r.item, r.n_co) for r in rows} == {(7, 2), (8, 2)}
    with pytest.raises(ValueError):
        item_neighbors_topk(df, "b", "i", k=0)


def _orders(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    data = [
        (cust, t0 + dt.timedelta(days=day), float(amt))
        for cust, day, amt in rows
    ]
    return spark.createDataFrame(data, "cust long, ts timestamp, amt double")


def test_rfm_matches_sql_ntile_exactly(spark):
    # 7 customers, k=3 tiles -> tile sizes 3,2,2 (NTILE front-loads)
    rows = []
    for c in range(1, 8):
        # customer c: last order day c, c orders, total spend 10*c
        for j in range(c):
            rows.append((c, j if j < c - 1 else c, 10.0 * c / c))
    df = _orders(spark, rows)
    out = {r.segment: r.n_customers for r in rfm_segments(df, "cust", "ts", "amt", n_tiles=3).collect()}
    # all three metrics order customers identically (1..7), so segments are
    # iii for tile i with NTILE sizes 3,2,2
    assert out == {111: 3, 222: 2, 333: 2}


def test_rfm_segment_census_totals(spark):
    df = _orders(spark, [(c, c, 100.0) for c in range(1, 11)])
    res = rfm_segments(df, "cust", "ts", "amt", n_tiles=5).collect()
    assert sum(r.n_customers for r in res) == 10
    assert sum(r.monetary_micro for r in res) == 10 * 100 * 1_000_000


def test_quantile_normalize_aligns_distributions(spark):
    from olake_spark.operators.features import quantile_normalize

    # group a: 1..8, group b: 101..108 (same shape, shifted) -> after
    # normalization both groups carry the SAME multiset of pooled values
    rows = [("a", float(v)) for v in range(1, 9)] + [
        ("b", float(v)) for v in range(101, 109)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    out = quantile_normalize(df, "g", "v").collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.group, []).append(r.norm_micro)
    assert sorted(by_group["a"]) == sorted(by_group["b"])
    # position preserved: the max of each group maps to the pooled max
    amax = max(r.norm_micro for r in out if r.group == "a")
    assert amax == 108 * 1_000_000


def test_quantile_normalize_identity_on_single_group(spark):
    from olake_spark.operators.features import quantile_normalize

    rows = [("only", float(v)) for v in [5, 1, 9, 3, 3, 7]]
    df = spark.createDataFrame(rows, "g string, v double")
    out = quantile_normalize(df, "g", "v").collect()
    # one group = pooled distribution: ties map within their own run, so
    # every row normalizes to its own value
    assert all(r.norm_micro == r.v_micro for r in out)
    assert len(out) == 6
