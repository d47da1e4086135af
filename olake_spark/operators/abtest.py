"""Two-sample distribution comparison — exact Kolmogorov-Smirnov.

The A/B-test primitive ("did the experiment shift the metric's
DISTRIBUTION, not just its mean?"), built so the statistic is EXACT:

    D = max over pooled values |F_a(v) − F_b(v)|
      = max |c_a(v)·n_b − c_b(v)·n_a| / (n_a·n_b)

with c_x(v) the cumulative count of group x at value v. The numerator
max runs over exact integers (DECIMAL(38,0) cross-multiplication — no
float ECDF subtraction whose rounding could flip the argmax), and the
single division happens once at the end.

Plan shape: per-value group counts (one map-side-combinable shuffle on
the value), then a cumulative window over the DISTINCT-VALUE relation —
values-sized, not rows-sized; documented single-partition ordering cost
is |distinct values| (bucket the value upstream if its domain is raw
doubles at 100 TB scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["ks_two_sample"]

_D38 = "decimal(38,0)"


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a,
    group_b,
    scale: int = 1_000_000,
) -> DataFrame:
    """One-row report (n_a, n_b, d_num, d_den, ks): ``ks`` =
    d_num/d_den rounded to 6, with d_num = max |c_a·n_b − c_b·n_a| and
    d_den = n_a·n_b exact. Values quantize to ``round(v·scale)``
    integers so ties are well-defined across engines."""
    g = F.col(group_col)
    v = F.round(F.col(value_col) * scale).cast("long")
    per_val = (
        df.filter(g.isin([group_a, group_b]))
        .select(g.alias("_g"), v.alias("_v"))
        .groupBy("_v")
        .agg(
            F.sum(F.when(F.col("_g") == group_a, 1).otherwise(0)).alias("_a"),
            F.sum(F.when(F.col("_g") == group_b, 1).otherwise(0)).alias("_b"),
        )
    )
    w = W.orderBy("_v").rowsBetween(W.unboundedPreceding, W.currentRow)
    tot = W.partitionBy()
    cum = per_val.select(
        F.sum("_a").over(w).cast(_D38).alias("_ca"),
        F.sum("_b").over(w).cast(_D38).alias("_cb"),
        F.sum("_a").over(tot).cast(_D38).alias("_na"),
        F.sum("_b").over(tot).cast(_D38).alias("_nb"),
    )
    diff = F.abs(F.col("_ca") * F.col("_nb") - F.col("_cb") * F.col("_na"))
    return cum.agg(
        F.first("_na").cast("long").alias("n_a"),
        F.first("_nb").cast("long").alias("n_b"),
        F.max(diff).cast("long").alias("d_num"),
        (F.first("_na") * F.first("_nb")).cast("long").alias("d_den"),
        F.round(
            F.max(diff).cast("double")
            / (F.first("_na") * F.first("_nb")).cast("double"),
            6,
        ).alias("ks"),
    )
