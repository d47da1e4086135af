"""Event-time windowed aggregation — batch and streaming forms.

The reference has no windowed aggregation (SURVEY.md §2.12 — its only
"window" is the bounded drain); this is a beyond-parity operator for
stream analytics over ingested event tables.

One definition serves both executions:

- batch: ``windowed_agg(df, ...)`` — a plain groupBy on ``F.window`` (two
  exchange-free map-side partial aggs + one shuffle on the window/key).
- streaming: ``stream_windowed_agg(...)`` — the same expression under
  ``readStream`` with a watermark, so Spark bounds the aggregation state
  and closes windows once event time passes ``watermark`` behind the max
  seen — the standard late-data contract. ``Trigger.AvailableNow`` drains
  what exists and stops (the engine's bounded-run semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["windowed_agg", "stream_windowed_agg", "stream_event_join"]


def _aggs(value_col: str | None) -> list[Column]:
    out = [F.count(F.lit(1)).alias("n_events")]
    if value_col:
        out.append(F.round(F.sum(value_col), 4).alias("sum_value"))
    return out


def windowed_agg(
    df: DataFrame,
    time_col: str,
    window: str,
    keys: list[str],
    value_col: str | None = None,
) -> DataFrame:
    """Tumbling-window aggregate: (window_start, *keys) → count / sum."""
    return (
        df.groupBy(F.window(time_col, window).alias("_w"), *keys)
        .agg(*_aggs(value_col))
        .select(
            F.unix_millis(F.col("_w.start")).alias("window_start_ms"),
            *keys,
            "n_events",
            *(["sum_value"] if value_col else []),
        )
    )


def stream_windowed_agg(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    time_col: str,
    window: str,
    keys: list[str],
    checkpoint_dir: str,
    watermark: str = "1 hour",
    value_col: str | None = None,
) -> DataFrame:
    """Run the same windowed aggregate as a bounded Structured Streaming job
    over a file-drop source; returns the final aggregated snapshot.

    Complete output mode + in-memory sink is test plumbing; production
    would ``foreachBatch`` into a ManagedTable/Iceberg sink instead.
    """
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("_w"), *keys)
        .agg(*_aggs(value_col))
        .select(
            F.unix_millis(F.col("_w.start")).alias("window_start_ms"),
            *keys,
            "n_events",
            *(["sum_value"] if value_col else []),
        )
    )
    name = "olake_stream_windowed_agg"
    (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(name)


def stream_event_join(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    left_schema: T.StructType,
    right_schema: T.StructType,
    key_col: str,
    left_time: str,
    right_time: str,
    checkpoint_dir: str,
    max_gap: str = "1 hour",
    watermark: str = "1 hour",
    query_name: str = "olake_stream_event_join",
    output_dir: str | None = None,
) -> DataFrame:
    """Watermarked stream-stream INNER join on key + event-time interval:
    a right event matches a left event of the same key arriving in
    ``[left_time, left_time + max_gap]`` (the attribution-join shape:
    click joins the view that preceded it).

    Both sides carry watermarks and the join condition bounds the
    event-time distance, so Spark can EXPIRE buffered state once the
    watermark passes — the state-boundedness contract that makes a
    stream-stream join survive an unbounded run (without the interval
    bound, both sides buffer forever). Append output mode: each matched
    pair is emitted exactly once, when the watermark proves no earlier
    match can still arrive. Column names must be disjoint apart from
    ``key_col`` (standard Spark join hygiene; the key is equi-joined and
    deduplicated in the output).
    """
    left = (
        spark.readStream.schema(left_schema)
        .parquet(left_dir)
        .withWatermark(left_time, watermark)
    )
    right = (
        spark.readStream.schema(right_schema)
        .parquet(right_dir)
        .withWatermark(right_time, watermark)
    )
    cond = (
        (left[key_col] == right[key_col])
        & (right[right_time] >= left[left_time])
        & (right[right_time] <= F.expr(f"{left_time} + INTERVAL {max_gap}"))
    )
    joined = left.join(right, cond, "inner").drop(right[key_col])
    writer = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
    if output_dir is not None:
        # durable sink: supports checkpoint RECOVERY, so later file drops
        # resume the same query and emit only the new matches
        writer.format("parquet").option("path", output_dir).start().awaitTermination()
        return spark.read.schema(joined.schema).parquet(output_dir)
    # memory sink: one-shot drains only (Spark refuses checkpoint recovery)
    writer.format("memory").queryName(query_name).start().awaitTermination()
    return spark.table(query_name)
