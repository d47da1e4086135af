"""Pairwise Pearson correlation matrix from ONE exact-moment aggregation.

For k numeric columns, every pairwise correlation derives from the k(k+3)/2
moments {n, S_i, S_ii, S_ij}; all of them accumulate in a SINGLE map-side-
combinable aggregation over exact micro-unit DECIMAL(38,0) integers, so one
pass over the fact table yields the whole matrix — the shape a 100 TB
profiling job needs (k passes, or anything windowed, would not survive).

Cross-engine exactness: the moments are exact integers; each pairwise
statistic combines them as (n*S_ij - S_i*S_j) / (sqrt(n*S_ii - S_i^2) *
sqrt(n*S_jj - S_j^2)) with the integer numerator/radicands computed
EXACTLY in 38-digit decimals, converted to double once, and finished with
IEEE sqrt (correctly rounded by spec) and one division — the identical
float sequence in any engine, so round(.,6) is hash-stable. Headroom
contract: exact while n * max|x_i * x_j| < 10^38 in micro-units (~10^12
rows of ~10^13-micro values); beyond that, pre-scale the inputs.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corr_matrix"]

_D38 = "decimal(38,0)"


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_a, col_b, n, corr) for every unordered column pair, from one
    aggregation pass. ``corr`` is NULL for a zero-variance column (the
    radicand is 0), mirroring SQL semantics of 0/0.

    NULL contract: ``n`` is count(*) over ALL rows while the moment sums
    skip NULLs — so a column with NULLs biases its pairs (the standard
    one-pass trade-off; pairwise-complete would need a pass per pair).
    Callers with NULLs should filter first; the audit family's
    completeness checks exist to catch exactly this upstream."""
    if len(cols) < 2:
        raise ValueError(f"need at least 2 columns, got {cols!r}")
    x = {
        c: F.round(F.col(c) * 1_000_000).cast("long").cast(_D38)
        for c in cols
    }
    aggs = [F.count(F.lit(1)).cast(_D38).alias("_n")]
    for c in cols:
        aggs.append(F.sum(x[c]).alias(f"_s_{c}"))
        aggs.append(F.sum(x[c] * x[c]).alias(f"_q_{c}"))
    for a, b in combinations(cols, 2):
        aggs.append(F.sum(x[a] * x[b]).alias(f"_p_{a}_{b}"))
    m = df.agg(*aggs)

    def _corr(a: str, b: str):
        n = F.col("_n")
        num = (n * F.col(f"_p_{a}_{b}") - F.col(f"_s_{a}") * F.col(f"_s_{b}")).cast(
            "double"
        )
        ra = (n * F.col(f"_q_{a}") - F.col(f"_s_{a}") * F.col(f"_s_{a}")).cast(
            "double"
        )
        rb = (n * F.col(f"_q_{b}") - F.col(f"_s_{b}") * F.col(f"_s_{b}")).cast(
            "double"
        )
        val = F.round(num / (F.sqrt(ra) * F.sqrt(rb)), 6)
        return F.struct(
            F.lit(a).alias("col_a"),
            F.lit(b).alias("col_b"),
            F.when((ra > 0) & (rb > 0), val).alias("corr"),
        )

    pairs = F.array(*[_corr(a, b) for a, b in combinations(cols, 2)])
    return m.select(
        F.col("_n").cast("long").alias("n"), F.explode(pairs).alias("_c")
    ).select("_c.col_a", "_c.col_b", "n", "_c.corr")
