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

__all__ = [
    "sessionize",
    "session_stats",
    "stream_session_stats",
    "funnel_users",
    "funnel_report",
    "conversion_delay_histogram",
    "event_path_ngrams",
]

_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


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


def funnel_users(
    df: "DataFrame",
    user_col: str,
    type_col: str,
    time_col: str,
    steps: list[str],
    max_gap: str = "7 days",
) -> "DataFrame":
    """Per-user ordered funnel (first-match semantics): step i's timestamp
    is the EARLIEST event of type ``steps[i]`` strictly after step i−1's
    timestamp and within ``max_gap`` of it; a user stops at the first
    step they never complete. Returns one row per user with
    ``step{i}_us`` epoch-microsecond columns (NULL = step not reached).

    One hash shuffle on the user: the k step columns are k chained Window
    operators over the SAME partitioning (each step's min-over-condition
    references the previous step's materialized column), so Catalyst
    plans a single exchange followed by k window passes — no joins, no
    per-step re-shuffle, the shape that survives a 100 TB events table.
    """
    from pyspark.sql import Window as W

    gap_us = int(_gap_seconds(max_gap) * 1_000_000)
    w = W.partitionBy(user_col)
    cur = df.select(
        user_col, type_col, F.unix_micros(F.col(time_col)).alias("_us")
    )
    prev = None
    for i, s in enumerate(steps):
        cond = F.col(type_col) == s
        if prev is not None:
            cond = (
                cond
                & (F.col("_us") > F.col(prev))
                & (F.col("_us") <= F.col(prev) + F.lit(gap_us))
            )
        name = f"step{i}_us"
        cur = cur.withColumn(name, F.min(F.when(cond, F.col("_us"))).over(w))
        prev = name
    names = [f"step{i}_us" for i in range(len(steps))]
    return cur.groupBy(user_col).agg(
        *[F.max(n).alias(n) for n in names]  # per-user constants: dedup
    )


def funnel_report(
    df: "DataFrame",
    user_col: str,
    type_col: str,
    time_col: str,
    steps: list[str],
    max_gap: str = "7 days",
) -> "DataFrame":
    """The funnel rollup: one row per step with the user count that
    reached it and conversion rates vs the first step and the previous
    step (exact counts; rates = one double division rounded late, NULL
    when the denominator is empty). Columns: (step, event_type, n_users,
    conv_from_first, conv_from_prev)."""
    per_user = funnel_users(df, user_col, type_col, time_col, steps, max_gap)
    counts = per_user.groupBy().agg(
        *[
            F.count(f"step{i}_us").alias(f"_n{i}")
            for i in range(len(steps))
        ]
    )
    structs = []
    for i, s in enumerate(steps):
        n_i = F.col(f"_n{i}")
        first = F.when(
            F.col("_n0") > 0,
            F.round(n_i.cast("double") / F.col("_n0").cast("double"), 6),
        )
        prev = (
            F.lit(1.0)
            if i == 0
            else F.when(
                F.col(f"_n{i-1}") > 0,
                F.round(n_i.cast("double") / F.col(f"_n{i-1}").cast("double"), 6),
            )
        )
        structs.append(
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(s).alias("event_type"),
                n_i.alias("n_users"),
                first.alias("conv_from_first"),
                prev.alias("conv_from_prev"),
            )
        )
    return counts.select(F.explode(F.array(*structs)).alias("_s")).select("_s.*")


def conversion_delay_histogram(
    df: DataFrame,
    time_col: str,
    user_col: str,
    type_col: str,
    from_event: str,
    to_event: str,
    bucket: str = "1 hour",
) -> DataFrame:
    """Time-to-convert distribution: for each user, the delay from their
    FIRST ``from_event`` to their first ``to_event`` at-or-after it,
    bucketed onto a fixed grid — the "how long from first view to first
    purchase" histogram that funnel counts (funnel_report) deliberately
    don't answer.

    Semantics pinned for the oracle: users without a ``from_event``, or
    whose every ``to_event`` precedes it, produce no row; a conversion
    in the same microsecond counts as bucket 0. Delays are exact
    microsecond BIGINTs; the bucket is an integer floor division —
    no doubles anywhere.

    Plan shape: one shuffle keys everything by user (the min-from
    aggregation); the to-events join back co-partitioned on the same
    key (no second exchange of the big side in the sort-merge plan),
    reduce to their per-user min, and the histogram is a map-side-
    combinable count over the bucket grid. Per-user cost is bounded by
    the user's own events — the sessionize skew contract.

    Returns (delay_bucket, n_users).
    """
    us = F.unix_micros(F.col(time_col))
    step_us = int(_gap_seconds(bucket) * 1_000_000)
    firsts = (
        df.filter(F.col(type_col) == from_event)
        .select(F.col(user_col).alias("_u"), us.alias("_us"))
        .groupBy("_u")
        .agg(F.min("_us").alias("_t_from"))
    )
    tos = df.filter(F.col(type_col) == to_event).select(
        F.col(user_col).alias("_u"), us.alias("_us")
    )
    converted = (
        tos.join(firsts, "_u")
        .filter(F.col("_us") >= F.col("_t_from"))
        .groupBy("_u")
        .agg(F.min(F.col("_us") - F.col("_t_from")).alias("_delay_us"))
    )
    return (
        converted.groupBy(
            F.floor(F.col("_delay_us") / F.lit(step_us)).alias("delay_bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def event_path_ngrams(
    df: DataFrame,
    time_col: str,
    user_col: str,
    type_col: str,
    n: int = 3,
    min_count: int = 2,
) -> DataFrame:
    """Most-travelled length-n event paths ("view→click→purchase"):
    consecutive event-type n-grams per user, counted corpus-wide — the
    path-analysis primitive behind Sankey funnels, generalizing the
    2-step transition matrix to arbitrary n.

    One shuffle keys users; the n−1 lag columns share a single window
    spec (one exchange + one sort, per-user cost bounded by the user's
    own events — the sessionize skew contract); the path census
    reduces map-side. Ordering ties (same-microsecond events) break on
    the event type itself, pinned identically in the oracle.

    Returns (path, n_occurrences) for paths seen >= ``min_count``
    times, path rendered as 'a>b>c'.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    w = W.partitionBy(F.col(user_col)).orderBy(
        F.unix_micros(F.col(time_col)), F.col(type_col)
    )
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    path = F.concat_ws(">", *steps)
    complete = F.lead(type_col, n - 1).over(w).isNotNull()
    return (
        df.select(path.alias("path"), complete.alias("_ok"))
        .filter(F.col("_ok"))
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
