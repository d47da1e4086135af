"""Gap-based sessionization — batch (window functions) + streaming
(native ``session_window``).

A training-pipeline staple the reference lacks (beyond parity): split each
key's event stream into sessions wherever the inter-event gap exceeds a
threshold.

Batch formulation: lag → new-session flag → running sum = session ordinal.
Two window passes over one shuffle partition-by-key — no self-join, no
driver state; DuckDB reproduces it verbatim (the oracle). Streaming uses
Spark's ``session_window`` with a watermark, which implements the same gap
semantics with managed state.

Scale note: both passes share the single hash partitioning on ``keys``, so
the whole operator is ONE shuffle; skewed keys (one user with billions of
events) should be pre-split by day before sessionizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["sessionize", "session_stats", "stream_session_stats"]

_UNITS = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60, "hour": 3600, "hours": 3600}


def _gap_seconds(gap: str) -> float:
    qty, unit = gap.split()
    return float(qty) * _UNITS[unit]


def sessionize(
    df: DataFrame, time_col: str, keys: list[str], gap: str = "30 minutes"
) -> DataFrame:
    """Attach a per-key ``session_id`` ordinal (1-based); a new session
    starts when the gap from the previous event exceeds ``gap``."""
    w = W.partitionBy(*keys).orderBy(time_col)
    prev = F.lag(time_col).over(w)
    is_new = (
        prev.isNull()
        | ((F.col(time_col).cast("double") - prev.cast("double")) > _gap_seconds(gap))
    ).cast("int")
    run = W.partitionBy(*keys).orderBy(time_col).rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn("session_id", F.sum(is_new).over(run))


def session_stats(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    gap: str = "30 minutes",
) -> DataFrame:
    """Per-session aggregate: (keys, session_id) → event count, start/end
    epoch-ms, duration seconds."""
    s = sessionize(df, time_col, keys, gap)
    return s.groupBy(*keys, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.unix_millis(F.min(time_col)).alias("start_ms"),
        F.unix_millis(F.max(time_col)).alias("end_ms"),
        # integer micros, not float seconds — exact in every engine
        (F.unix_micros(F.max(time_col)) - F.unix_micros(F.min(time_col))).alias(
            "duration_us"
        ),
    )


def stream_session_stats(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType,
    time_col: str,
    keys: list[str],
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """The same session aggregate under Structured Streaming using the
    native ``session_window`` (stateful, watermark-bounded), drained with
    ``Trigger.AvailableNow``."""
    stream = spark.readStream.schema(schema).parquet(source_dir)
    agg = (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.session_window(F.col(time_col), gap).alias("_sw"), *keys)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            *keys,
            F.unix_millis(F.col("_sw.start")).alias("start_ms"),
            "n_events",
        )
    )
    name = "olake_stream_sessions"
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
