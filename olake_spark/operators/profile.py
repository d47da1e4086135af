"""Column profiling — the stats layer planning and data QA both need.

The reference pulls table statistics (row counts, min/max, avg row size)
from source catalogs to size its chunk plans (SURVEY §4: pkg/jdbc/jdbc.go
stats queries). A Spark-native engine computes the same statistics from the
data itself — and a training-data pipeline reuses them as dataset QA
(null rates, cardinalities, distribution shape before training).

One aggregation pass per call: all metrics ride a single groupBy/agg, so
profiling a 100 TB table is one scan + one (tiny) shuffle. Exact
percentiles use ``percentile`` (exact sort-based, oracle-reproducible);
swap to ``percentile_approx`` when an approximation is acceptable at
extreme scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["profile_numeric", "top_values"]


def profile_numeric(df: DataFrame, cols: list[str], round_to: int = 4) -> DataFrame:
    """Per-column stats in ONE pass: count, nulls, min/max, mean, exact
    median. Output: one row per column (stacked for stable comparison)."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            F.round(F.avg(c), round_to).alias(f"{c}__mean"),
            F.round(F.expr(f"percentile({c}, 0.5)"), round_to).alias(f"{c}__median"),
        ]
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(f"{c}__n").cast("long").alias("n"),
                        F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
                        F.col(f"{c}__min").cast("double").alias("min_v"),
                        F.col(f"{c}__max").cast("double").alias("max_v"),
                        F.col(f"{c}__mean").cast("double").alias("mean_v"),
                        F.col(f"{c}__median").cast("double").alias("median_v"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.*")


def top_values(df: DataFrame, col: str, k: int = 10) -> DataFrame:
    """Top-k most frequent values with counts (ties break by value asc) —
    the hot-key detector that feeds ``operators.skew`` decisions."""
    from pyspark.sql import Window as W

    counted = df.groupBy(col).agg(F.count(F.lit(1)).alias("n"))
    w = W.orderBy(F.col("n").desc(), F.col(col).asc())
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col(col).alias("value"), "n", "rnk")
    )
