"""Stream-stream interval join: stream result == batch twin, incremental."""

import tempfile

from pyspark.sql import functions as F

from olake_spark.streaming.windows import stream_event_join

VIEW_SCHEMA = "view_id BIGINT, user_id BIGINT, view_ts TIMESTAMP"
CLICK_SCHEMA = "click_id BIGINT, user_id BIGINT, click_ts TIMESTAMP"


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _events(spark, sf_dir):
    from olake_spark.sources.files import read_table

    return read_table(spark, sf_dir, "events")


def _views(spark, sf_dir):
    return _events(spark, sf_dir).filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", F.col("ts").alias("view_ts")
    )


def _clicks(spark, sf_dir):
    return _events(spark, sf_dir).filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )


def _batch_twin(views, clicks, gap="1 hour"):
    cond = (
        (views["user_id"] == clicks["user_id"])
        & (clicks["click_ts"] >= views["view_ts"])
        & (clicks["click_ts"] <= F.expr(f"view_ts + INTERVAL {gap}"))
    )
    return views.join(clicks, cond, "inner").drop(clicks["user_id"])


def _case_join_matches_batch(spark, sf_dir):
    views, clicks = _views(spark, sf_dir), _clicks(spark, sf_dir)
    ld, rd, ck = (tempfile.mkdtemp(prefix=f"olake_ssj_{x}_") for x in "lrc")
    views.write.mode("overwrite").parquet(ld)
    clicks.write.mode("overwrite").parquet(rd)

    got = stream_event_join(
        spark, ld, rd,
        views.schema, clicks.schema,
        "user_id", "view_ts", "click_ts",
        checkpoint_dir=ck, query_name="ssj_t1",
    )
    expect = _batch_twin(views, clicks)
    a = {(r.view_id, r.click_id) for r in got.collect()}
    b = {(r.view_id, r.click_id) for r in expect.collect()}
    assert a == b and len(a) > 0


def _case_join_incremental_no_duplicates(spark):
    ld, rd, ck, od = (tempfile.mkdtemp(prefix=f"olake_ssj2_{x}_") for x in "lrco")
    v1 = _mk(spark, [(1, 7, "2024-01-01 10:00:00")], VIEW_SCHEMA.replace("TIMESTAMP", "STRING"))
    v1 = v1.withColumn("view_ts", F.to_timestamp("view_ts"))
    c1 = _mk(spark, [(100, 7, "2024-01-01 10:30:00")], CLICK_SCHEMA.replace("TIMESTAMP", "STRING"))
    c1 = c1.withColumn("click_ts", F.to_timestamp("click_ts"))
    v1.write.mode("append").parquet(ld)
    c1.write.mode("append").parquet(rd)

    out1 = stream_event_join(
        spark, ld, rd, v1.schema, c1.schema,
        "user_id", "view_ts", "click_ts",
        checkpoint_dir=ck, output_dir=od, query_name="ssj_t2",
    ).collect()
    assert {(r.view_id, r.click_id) for r in out1} == {(1, 100)}

    # second drop: a matching click for the SAME buffered view, plus one
    # outside the interval; the RESUMED query (same checkpoint + durable
    # sink) adds only the new valid pair — no re-emit, no duplicate
    c2 = _mk(
        spark,
        [(101, 7, "2024-01-01 10:45:00"), (102, 7, "2024-01-01 12:30:00")],
        CLICK_SCHEMA.replace("TIMESTAMP", "STRING"),
    ).withColumn("click_ts", F.to_timestamp("click_ts"))
    c2.write.mode("append").parquet(rd)

    out2 = stream_event_join(
        spark, ld, rd, v1.schema, c1.schema,
        "user_id", "view_ts", "click_ts",
        checkpoint_dir=ck, output_dir=od, query_name="ssj_t2b",
    ).collect()
    assert {(r.view_id, r.click_id) for r in out2} == {(1, 100), (1, 101)}
