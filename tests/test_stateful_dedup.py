"""applyInPandasWithState streaming dedup: first-wins across micro-batches."""

from __future__ import annotations

from olake_spark.streaming.stateful_dedup import stream_dedup_first_wins


def _case_dedup_across_micro_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # two file drops with overlapping keys; maxFilesPerTrigger=1 forces the
    # duplicates to arrive in SEPARATE micro-batches → keyed state, not
    # within-batch dedup, must drop them
    spark.createDataFrame(
        [("a", 1), ("b", 2), ("a", 3)], "k string, v int"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("a", 4), ("c", 5)], "k string, v int"
    ).coalesce(1).write.mode("append").parquet(src)

    out = stream_dedup_first_wins(
        spark, src, spark.read.parquet(src).schema, "k",
        str(tmp_path / "ckpt"), max_files_per_trigger=1,
    )
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["b"] == 2 and rows["c"] == 5
    assert rows["a"] in (1, 3, 4)  # exactly one survivor for the hot key


def test_dedup_no_duplicates_emitted(spark, tmp_path):
    src = str(tmp_path / "src")
    df = spark.range(50).selectExpr("cast(id % 10 as string) k", "id v")
    df.repartition(4).write.parquet(src)
    out = stream_dedup_first_wins(
        spark, src, spark.read.parquet(src).schema, "k", str(tmp_path / "ckpt")
    )
    assert out.count() == 10
    assert out.select("k").distinct().count() == 10


def _have_protobuf() -> bool:
    # the transformWithState Python worker speaks a protobuf protocol to the
    # JVM state server; without google.protobuf the driver worker crashes
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


needs_protobuf = __import__("pytest").mark.skipif(
    not _have_protobuf(), reason="transformWithState requires google.protobuf"
)


@needs_protobuf
def test_tws_dedup_across_micro_batches(spark, tmp_path):
    """transformWithStateInPandas form: same first-wins semantics, keyed
    ValueState, duplicates forced into separate micro-batches."""
    from olake_spark.streaming.stateful_dedup import stream_dedup_first_wins_tws

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("a", 1), ("b", 2), ("a", 3)], "k string, v int"
    ).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("a", 4), ("c", 5)], "k string, v int"
    ).coalesce(1).write.mode("append").parquet(src)

    out = stream_dedup_first_wins_tws(
        spark, src, spark.read.parquet(src).schema, "k",
        str(tmp_path / "ckpt_tws"), max_files_per_trigger=1,
    )
    rows = {r["k"]: r["v"] for r in out.collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["b"] == 2 and rows["c"] == 5


@needs_protobuf
def test_tws_dedup_with_ttl(spark, tmp_path):
    """TTL path compiles and runs end-to-end (state bounded by the
    redelivery window); with a generous TTL the dedup behavior matches."""
    from olake_spark.streaming.stateful_dedup import stream_dedup_first_wins_tws

    src = str(tmp_path / "src")
    df = spark.range(30).selectExpr("cast(id % 6 as string) k", "id v")
    df.repartition(3).write.parquet(src)
    out = stream_dedup_first_wins_tws(
        spark, src, spark.read.parquet(src).schema, "k",
        str(tmp_path / "ckpt_ttl"), ttl_ms=3_600_000,
    )
    assert out.count() == 6
    assert out.select("k").distinct().count() == 6
