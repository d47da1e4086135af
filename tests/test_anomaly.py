"""Anomaly operators: CUSUM closed form ≡ textbook recurrence; z-score
flags hand-checked and partition-order-free (operators/anomaly.py)."""

from __future__ import annotations

from olake_spark.operators.anomaly import cusum_changepoints, rolling_zscore


def _series(spark, values, key="k"):
    rows = [(key, i, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "k string, t long, value double")


def _cusum_reference(values, target, slack, scale=100):
    """The textbook S_i = max(0, S_{i-1} + d_i) fold, in exact ints."""
    s, out = 0, []
    for v in values:
        d = round(v * scale) - round(target * scale) - round(slack * scale)
        s = max(0, s + d)
        out.append(s / scale)
    return out


def test_cusum_closed_form_matches_recurrence(spark):
    vals = [10, 12, 9, 30, 35, 40, 8, 7, 50, 5, 60, 61, 62, 3]
    df = _series(spark, vals)
    got = (
        cusum_changepoints(df, "t", ["k"], "value", target=15.0, slack=2.0, threshold=40.0)
        .orderBy("t")
        .collect()
    )
    want = _cusum_reference(vals, 15.0, 2.0)
    assert [r.cusum for r in got] == want
    assert [r.alarm for r in got] == [w > 40.0 for w in want]


def test_cusum_partition_order_free(spark):
    vals = [10, 12, 9, 30, 35, 40, 8, 7, 50, 5]
    df = _series(spark, vals)
    a = sorted(
        map(tuple, cusum_changepoints(df, "t", ["k"], "value", 15.0, 2.0, 40.0).collect())
    )
    b = sorted(
        map(
            tuple,
            cusum_changepoints(
                df.repartition(7), "t", ["k"], "value", 15.0, 2.0, 40.0
            ).collect(),
        )
    )
    assert a == b


def test_zscore_flags_spike_not_warmup(spark):
    # stable series, then one huge spike: the spike is the only anomaly,
    # and warm-up rows (n < min_n) are never flagged
    vals = [10.0, 10.1, 9.9, 10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 10.1, 99.0, 10.0]
    df = _series(spark, vals)
    rows = (
        rolling_zscore(df, "t", ["k"], "value", window=8, k=3, min_n=5)
        .orderBy("t")
        .collect()
    )
    flags = [r.is_anomaly for r in rows]
    assert flags[10] is True  # the spike
    assert sum(flags[:10]) == 0  # stable prefix never flags
    assert all(f is False for f in flags[:4])  # warm-up (n < min_n)
    assert rows[10].zscore > 3
    # the spike sits in row 11's trailing window but row 11 itself is normal
    assert flags[11] is False


def test_zscore_zero_variance_window_never_flags(spark):
    df = _series(spark, [5.0] * 12)
    rows = rolling_zscore(df, "t", ["k"], "value", window=6, k=3, min_n=3).collect()
    assert all(r.is_anomaly is False for r in rows)
    assert all(r.zscore is None for r in rows)
