"""SyncStats observation counters + streaming drain listener."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from olake_spark.stats import DrainListener, SyncStats


def test_observe_counts_without_extra_actions(spark, tmp_path):
    stats = SyncStats()
    df = spark.range(1000).withColumn("v", F.col("id") % 10)
    df = stats.observe(df, "read")
    df = df.filter(F.col("v") < 3)
    df = stats.observe(df, "written")
    df.write.mode("overwrite").parquet(str(tmp_path / "out"))  # ONE action
    rep = stats.report()
    assert rep["records_read"] == 1000
    assert rep["records_written"] == 300
    assert rep["records_filtered"] == 700
    assert rep["elapsed_sec"] >= 0


def test_report_skips_unrun_points(spark):
    stats = SyncStats()
    stats.observe(spark.range(5), "read")  # never executed
    rep = stats.report()
    assert "records_read" not in rep


def test_drain_listener_captures_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    spark.range(100).withColumn("v", F.col("id") * 2).repartition(2).write.parquet(src)
    dl = DrainListener()
    listener = dl.listener(spark)
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema("id long, v long").parquet(src)
        (
            stream.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        # listener callbacks are async — give the bus a moment
        for _ in range(50):
            if sum(b["num_input_rows"] for b in dl.batches) >= 100:
                break
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    assert sum(b["num_input_rows"] for b in dl.batches) == 100
