"""Sessionization tests: batch gap logic + streaming session_window parity."""

from __future__ import annotations

import datetime as dt

from olake_spark.operators.sessions import session_stats, sessionize, stream_session_stats


def _events(spark):
    base = dt.datetime(2024, 1, 1, 10, 0)
    rows = [
        # user 1: two sessions split by a 45-min gap
        (1, base),
        (1, base + dt.timedelta(minutes=10)),
        (1, base + dt.timedelta(minutes=55)),
        (1, base + dt.timedelta(minutes=60)),
        # user 2: one session (gap < 30 min; exactly-at-gap differs between
        # the batch `>` rule and session_window's right-open window)
        (2, base),
        (2, base + dt.timedelta(minutes=25)),
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


def test_sessionize_ordinals(spark):
    out = sessionize(_events(spark), "ts", ["user_id"], gap="30 minutes")
    base = dt.datetime(2024, 1, 1, 10, 0)
    minutes = lambda r: int((r["ts"] - base).total_seconds() // 60)  # noqa: E731
    got = {(r["user_id"], minutes(r)): r["session_id"] for r in out.collect()}
    assert got == {(1, 0): 1, (1, 10): 1, (1, 55): 2, (1, 60): 2, (2, 0): 1, (2, 25): 1}


def test_session_stats(spark):
    out = session_stats(_events(spark), "ts", ["user_id"], gap="30 minutes")
    got = {(r["user_id"], r["session_id"]): (r["n_events"], r["duration_us"])
           for r in out.collect()}
    assert got == {
        (1, 1): (2, 600_000_000),
        (1, 2): (2, 300_000_000),
        (2, 1): (2, 1_500_000_000),
    }


def test_stream_session_window_matches_batch(spark, tmp_path):
    df = _events(spark)
    src = str(tmp_path / "src")
    df.write.parquet(src)
    batch = session_stats(df, "ts", ["user_id"], gap="30 minutes")
    streamed = stream_session_stats(
        spark, src, df.schema, "ts", ["user_id"],
        str(tmp_path / "ckpt"), gap="30 minutes", watermark="2 hours",
    )
    b = sorted((r["user_id"], r["n_events"]) for r in batch.collect())
    s = sorted((r["user_id"], r["n_events"]) for r in streamed.collect())
    assert b == s


def test_funnel_first_match_and_gap_semantics(spark):
    import datetime as dt

    from olake_spark.operators.sessions import funnel_report, funnel_users

    t0 = dt.datetime(2024, 1, 1)

    def ev(u, typ, hours):
        return (u, typ, t0 + dt.timedelta(hours=hours))

    rows = [
        # u1 completes all three in order
        ev(1, "view", 0), ev(1, "click", 1), ev(1, "purchase", 2),
        # u2: click BEFORE view never counts; no click after view
        ev(2, "click", 0), ev(2, "view", 1), ev(2, "purchase", 2),
        # u3: click after view but outside the 1-hour gap
        ev(3, "view", 0), ev(3, "click", 5),
        # u4: first-match — the EARLIEST view anchors; the later, closer
        # view must not rescue the funnel
        ev(4, "view", 0), ev(4, "view", 10), ev(4, "click", 10.5),
    ]
    df = spark.createDataFrame(rows, "user_id int, event_type string, ts timestamp")
    out = {
        r.user_id: (r.step0_us, r.step1_us, r.step2_us)
        for r in funnel_users(
            df, "user_id", "event_type", "ts",
            ["view", "click", "purchase"], max_gap="1 hour",
        ).collect()
    }
    assert out[1][2] is not None
    assert out[2][0] is not None and out[2][1] is None and out[2][2] is None
    assert out[3][1] is None
    assert out[4][1] is None  # anchored to the first view
    rep = {r.step: r for r in funnel_report(
        df, "user_id", "event_type", "ts",
        ["view", "click", "purchase"], max_gap="1 hour",
    ).collect()}
    assert [rep[i].n_users for i in (1, 2, 3)] == [4, 1, 1]
    assert rep[3].conv_from_first == 0.25 and rep[3].conv_from_prev == 1.0


def test_funnel_single_shuffle_on_user(spark):
    """The k step windows must share ONE exchange on user_id."""
    import datetime as dt

    from olake_spark.operators.sessions import funnel_users

    df = spark.createDataFrame(
        [(1, "view", dt.datetime(2024, 1, 1))],
        "user_id int, event_type string, ts timestamp",
    )
    plan = funnel_users(
        df, "user_id", "event_type", "ts", ["view", "click", "purchase"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning(user_id") == 1
