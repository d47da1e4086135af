"""Round-8 batch: PSI drift + cumulative first-seen users."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from pyspark.sql import functions as F

from olake_spark.operators.features import psi_drift
from olake_spark.operators.timeseries import cumulative_first_seen


def _pop(spark, ref_vals, cur_vals):
    rows = [(False, float(v)) for v in ref_vals] + [
        (True, float(v)) for v in cur_vals
    ]
    return spark.createDataFrame(rows, "cur boolean, v double")


def _psi_expected(ref_vals, cur_vals, lo, hi, nbins):
    def binof(v):
        return min(nbins - 1, max(0, math.floor((v - lo) / (hi - lo) * nbins)))

    cr = [0] * nbins
    cc = [0] * nbins
    for v in ref_vals:
        cr[binof(v)] += 1
    for v in cur_vals:
        cc[binof(v)] += 1
    tr, tc = sum(cr), sum(cc)
    total = 0.0
    for i in range(nbins):
        p = (cr[i] + 1) / (tr + nbins)
        q = (cc[i] + 1) / (tc + nbins)
        total += (p - q) * math.log(p / q)
    return total


def test_psi_identical_populations_near_zero(spark):
    vals = list(range(100))
    out = psi_drift(_pop(spark, vals, vals), "v", F.col("cur"), 0, 100, 10)
    rows = out.collect()
    assert len(rows) == 10
    assert all(r.psi_total == 0.0 for r in rows)


def test_psi_shifted_population_matches_direct(spark):
    ref = list(range(100))
    cur = [v + 40 for v in range(100)]  # mass shifts right, clamps at edge
    out = psi_drift(_pop(spark, ref, cur), "v", F.col("cur"), 0, 100, 10)
    rows = {r.bin: r for r in out.collect()}
    want = _psi_expected(ref, cur, 0, 100, 10)
    assert rows[0].psi_total == pytest.approx(want, abs=1e-6)
    assert rows[0].psi_total > 0.25  # a 40% shift is a loud alarm
    # clamp: current values >= 100 land in the top bin
    assert rows[9].n_cur == sum(1 for v in cur if v >= 90)


def test_psi_materializes_empty_bins(spark):
    # all mass in bin 0 both sides -> bins 1..9 still present with the
    # smoothed zero-count contribution (which is 0 only if totals match)
    out = psi_drift(_pop(spark, [1] * 10, [1] * 20), "v", F.col("cur"), 0, 100, 10)
    rows = {r.bin: r for r in out.collect()}
    assert set(rows) == set(range(10))
    assert rows[5].n_ref == 0 and rows[5].n_cur == 0
    want = _psi_expected([1] * 10, [1] * 20, 0, 100, 10)
    assert rows[0].psi_total == pytest.approx(want, abs=1e-6)
    with pytest.raises(ValueError):
        psi_drift(_pop(spark, [1], [1]), "v", F.col("cur"), 0, 100, 1)
    with pytest.raises(ValueError):
        psi_drift(_pop(spark, [1], [1]), "v", F.col("cur"), 5, 5, 10)


def test_cumulative_first_seen_counts_each_key_once(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", t0),
        ("u1", t0 + dt.timedelta(days=3)),  # repeat visit: not a new user
        ("u2", t0),
        ("u3", t0 + dt.timedelta(days=1)),
        ("u4", t0 + dt.timedelta(days=3)),
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    out = {r.bucket - 19723: (r.new_keys, r.cum_keys)
           for r in cumulative_first_seen(df, "ts", "u").collect()}
    # day numbers relative to 2024-01-01 (epoch day 19723)
    assert out == {0: (2, 2), 1: (1, 3), 3: (1, 4)}


def test_cumulative_first_seen_partition_invariant(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (f"u{i % 7}", t0 + dt.timedelta(hours=i * 5)) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "u string, ts timestamp")
    a = cumulative_first_seen(df, "ts", "u").collect()
    b = cumulative_first_seen(df.repartition(9), "ts", "u").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert a[-1].cum_keys == 7 or sorted(r.cum_keys for r in a)[-1] == 7
