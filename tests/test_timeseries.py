"""Gap-fill LOCF: grid completeness, fill semantics, partition invariance."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from olake_spark.operators.timeseries import gapfill_locf


def _ev(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        # user 1: events in hours 0, 1, 4 — hours 2 and 3 are gaps
        (1, t0, 10.0),
        (1, t0 + dt.timedelta(hours=1), 2.5),
        (1, t0 + dt.timedelta(hours=1, minutes=10), 1.5),
        (1, t0 + dt.timedelta(hours=4), 7.0),
        # user 2: single event — no grid beyond its own bucket
        (2, t0 + dt.timedelta(hours=2), 3.0),
    ]
    return spark.createDataFrame(
        rows, "user_id int, ts timestamp, value double"
    )


def test_gapfill_locf_fills_interior_gaps(spark):
    out = gapfill_locf(_ev(spark), "ts", ["user_id"], "value").collect()
    u1 = sorted(
        [r for r in out if r.user_id == 1], key=lambda r: r.bucket_start_ms
    )
    assert len(u1) == 5  # hours 0..4 inclusive
    assert [r.n_events for r in u1] == [1, 2, 0, 0, 1]
    assert [r.filled for r in u1] == [False, False, True, True, False]
    # LOCF: gap buckets carry hour-1's sum (2.5 + 1.5)
    assert [r.sum_value for r in u1] == [10.0, 4.0, 4.0, 4.0, 7.0]
    u2 = [r for r in out if r.user_id == 2]
    assert len(u2) == 1 and not u2[0].filled and u2[0].sum_value == 3.0


def test_gapfill_partition_invariant(spark):
    ev = _ev(spark)
    a = sorted(map(tuple, gapfill_locf(ev, "ts", ["user_id"], "value").collect()))
    b = sorted(
        map(
            tuple,
            gapfill_locf(
                ev.repartition(7, F.col("value")), "ts", ["user_id"], "value"
            ).collect(),
        )
    )
    assert a == b


def test_gapfill_plan_two_exchanges_no_join(spark):
    # the lead()+explode formulation: raw rows shuffle ONCE (map-side
    # combined agg on (key, bucket)); the lead() window regroups only the
    # aggregated frame on (key). The old grid-join formulation's third
    # exchange (span groupBy) and its join must not reappear.
    plan = (
        gapfill_locf(_ev(spark), "ts", ["user_id"], "value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert "Join" not in plan, plan


def test_gapfill_null_group_key_keeps_real_data(spark):
    # regression: grid join must be null-safe — a NULL-key group's buckets
    # previously all reported n_events=0 / filled=true despite real data
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [(None, t0, 1.0), (None, t0 + dt.timedelta(hours=2), 2.0)]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, value double")
    out = sorted(
        gapfill_locf(df, "ts", ["user_id"], "value").collect(),
        key=lambda r: r.bucket_start_ms,
    )
    assert [r.user_id for r in out] == [None, None, None]
    assert [r.n_events for r in out] == [1, 0, 1]
    assert [r.filled for r in out] == [False, True, False]
    assert [r.sum_value for r in out] == [1.0, 1.0, 2.0]


def test_gapfill_all_null_bucket_carries_last_nonnull(spark):
    # an observed bucket whose values are ALL NULL must inherit the
    # previous non-null aggregate (and hand it through its gap), matching
    # the oracle's last_value(... IGNORE NULLS); leading buckets before
    # any non-null stay NULL
    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        # u1: hour0 = 5.0, hour1 observed but NULL value, gap hour2,
        #     hour3 = 7.0
        (1, t0, 5.0),
        (1, t0 + dt.timedelta(hours=1), None),
        (1, t0 + dt.timedelta(hours=3), 7.0),
        # u2: leading NULL-valued bucket, then 2.0
        (2, t0, None),
        (2, t0 + dt.timedelta(hours=1), 2.0),
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, value double")
    out = gapfill_locf(df, "ts", ["user_id"], "value").collect()
    u1 = sorted([r for r in out if r.user_id == 1], key=lambda r: r.bucket_start_ms)
    assert [r.n_events for r in u1] == [1, 1, 0, 1]
    assert [r.filled for r in u1] == [False, False, True, False]
    assert [r.sum_value for r in u1] == [5.0, 5.0, 5.0, 7.0]
    u2 = sorted([r for r in out if r.user_id == 2], key=lambda r: r.bucket_start_ms)
    assert [r.sum_value for r in u2] == [None, 2.0]
