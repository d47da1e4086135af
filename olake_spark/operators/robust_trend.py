"""Robust trend inference: the Mann-Kendall test + Theil-Sen slope.

The classic nonparametric pairing for "is this series trending, and how
fast" when outliers and non-normal noise make least-squares lie: the
Mann-Kendall S statistic counts concordant-minus-discordant bucket pairs
(pure sign arithmetic — a single spike moves S by at most n−1, where it
can move an OLS slope arbitrarily), and the Theil-Sen estimator is the
median of all pairwise slopes (breakdown point ~29%).

Exactness discipline: S, its tie-corrected variance numerator, and the
tie table are exact integers; the Theil-Sen median is the value at rank
ceil(m/2) of the pairwise-slope relation, where every slope double is
one identical IEEE divide of exact micro-unit integers in any engine —
so the rank order (ties broken by the pair key) and therefore the
selected slope hash identically.

Scale contract: the pair relation is BUCKET-sized squared — C(n, 2)
pairs over the aggregated series, not the raw rows (30 days → 435
pairs; even 5k buckets → 12.5M pairs across the cluster). The raw rows
are touched once by the bucketize shuffle. For longer series, bucket
coarser upstream; this is the few-thousand-buckets trend test, not a
per-row operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["mann_kendall_theil_sen"]


def mann_kendall_theil_sen(
    df: DataFrame,
    time_col: str,
    value_col: str,
    step: str = "1 day",
) -> DataFrame:
    """One-row report (n_buckets, s_stat, var_s, z, sen_slope_micro,
    sen_slope): S = Σ sign(y_j − y_i) over ordered bucket pairs,
    variance with the tie correction

        var(S) = [n(n−1)(2n+5) − Σ_ties t(t−1)(2t+5)] / 18,

    the continuity-corrected z, and the Theil-Sen lower-median slope in
    micro-units per bucket (``sen_slope`` divides by 10^6 once).
    """
    from olake_spark.operators.timeseries import bucketize

    daily = bucketize(df, time_col, [], value_col, step=step).select(
        F.col("_bucket").alias("_t"), F.col("_v_micros").alias("_y")
    )
    a = daily.select(F.col("_t").alias("_ta"), F.col("_y").alias("_ya"))
    b = daily.select(F.col("_t").alias("_tb"), F.col("_y").alias("_yb"))
    pairs = a.join(b, F.col("_ta") < F.col("_tb")).select(
        "_ta",
        "_tb",
        F.signum((F.col("_yb") - F.col("_ya")).cast("double"))
        .cast("long")
        .alias("_sgn"),
        (
            (F.col("_yb") - F.col("_ya")).cast("double")
            / (F.col("_tb") - F.col("_ta")).cast("double")
        ).alias("_slope"),
    )
    m_w = W.partitionBy()
    ranked = pairs.select(
        "_sgn",
        "_slope",
        F.row_number().over(
            W.orderBy(F.col("_slope"), F.col("_ta"), F.col("_tb"))
        ).alias("_r"),
        F.count(F.lit(1)).over(m_w).alias("_m"),
    )
    median_slope = F.max(
        F.when(
            F.col("_r") == F.ceil(F.col("_m") / 2), F.col("_slope")
        )
    )
    stats = ranked.agg(
        F.sum("_sgn").alias("_s"),
        F.count(F.lit(1)).alias("_m"),
        median_slope.alias("_sen"),
    )
    # tie table over the bucketed series values
    ties = daily.groupBy("_y").agg(F.count(F.lit(1)).alias("_t"))
    t = F.col("_t").cast("decimal(38,0)")
    tie_sum = ties.agg(
        F.sum(t * (t - 1) * (F.lit(2) * t + 5)).alias("_tie_term"),
        F.sum(t).cast("decimal(38,0)").alias("_n"),
    )
    j = stats.crossJoin(F.broadcast(tie_sum))
    n = F.col("_n")
    var_s = (
        (n * (n - 1) * (F.lit(2) * n + 5) - F.col("_tie_term")).cast("double")
        / 18.0
    )
    s = F.col("_s").cast("double")
    z = (
        F.when(F.col("_s") > 0, (s - 1.0) / F.sqrt(var_s))
        .when(F.col("_s") < 0, (s + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        n.cast("long").alias("n_buckets"),
        F.col("_s").cast("long").alias("s_stat"),
        F.round(var_s, 6).alias("var_s"),
        F.when(var_s > 0, F.round(z, 6)).alias("z"),
        F.round(F.col("_sen"), 4).alias("sen_slope_micro"),
        F.round(F.col("_sen") / 1_000_000.0, 6).alias("sen_slope"),
    )
