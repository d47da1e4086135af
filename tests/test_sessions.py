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
