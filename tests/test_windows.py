"""Windowed aggregation: batch/streaming equivalence + watermark behavior."""

from __future__ import annotations

import datetime as dt

from olake_spark.streaming.windows import stream_windowed_agg, windowed_agg


def _events(spark):
    rows = [
        (1, dt.datetime(2024, 1, 1, 10, 5), "click", 1.0),
        (2, dt.datetime(2024, 1, 1, 10, 55), "click", 2.0),
        (3, dt.datetime(2024, 1, 1, 11, 5), "view", 4.0),
        (4, dt.datetime(2024, 1, 1, 11, 59), "click", 8.0),
        (5, dt.datetime(2024, 1, 1, 12, 0), "view", 16.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


def test_windowed_agg_batch(spark):
    out = windowed_agg(_events(spark), "ts", "1 hour", ["event_type"], value_col="value")
    got = {(r["window_start_ms"], r["event_type"]): (r["n_events"], r["sum_value"])
           for r in out.collect()}
    h10 = int(dt.datetime(2024, 1, 1, 10, tzinfo=dt.UTC).timestamp() * 1000)
    h11 = h10 + 3_600_000
    h12 = h11 + 3_600_000
    assert got == {
        (h10, "click"): (2, 3.0),
        (h11, "view"): (1, 4.0),
        (h11, "click"): (1, 8.0),
        (h12, "view"): (1, 16.0),
    }


def test_stream_matches_batch(spark, tmp_path):
    df = _events(spark)
    src = str(tmp_path / "src")
    df.repartition(3).write.parquet(src)  # several files → several micro-batches
    batch = windowed_agg(df, "ts", "1 hour", ["event_type"], value_col="value")
    streamed = stream_windowed_agg(
        spark, src, df.schema, "ts", "1 hour", ["event_type"],
        str(tmp_path / "ckpt"), watermark="30 minutes", value_col="value",
    )
    key = lambda r: (r["window_start_ms"], r["event_type"])  # noqa: E731
    assert sorted(map(key, batch.collect())) == sorted(map(key, streamed.collect()))
    assert batch.count() == streamed.count()
