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
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["corr_matrix", "spearman_matrix"]

_D38 = "decimal(38,0)"


def _pairwise_pearson(
    df: DataFrame, x: dict, out_col: str, by: list[str] | None = None
) -> DataFrame:
    """Shared exact-moment core: ``x`` maps column name → an exact
    integer Column (already D38-castable); emits (col_a, col_b, n,
    <out_col>) for every unordered pair from ONE aggregation pass.
    With ``by``, the same single pass produces one matrix PER GROUP
    (the 100 TB fleet shape — per-nation, per-SKU, per-cohort): the
    moments groupBy the keys instead of a global agg, still map-side
    combinable, still one scan."""
    cols = list(x)
    by = list(by or [])
    aggs = [F.count(F.lit(1)).cast(_D38).alias("_n")]
    for c in cols:
        aggs.append(F.sum(x[c]).alias(f"_s_{c}"))
        aggs.append(F.sum(x[c] * x[c]).alias(f"_q_{c}"))
    for a, b in combinations(cols, 2):
        aggs.append(F.sum(x[a] * x[b]).alias(f"_p_{a}_{b}"))
    m = df.groupBy(*by).agg(*aggs) if by else df.agg(*aggs)

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
            F.when((ra > 0) & (rb > 0), val).alias(out_col),
        )

    pairs = F.array(*[_corr(a, b) for a, b in combinations(cols, 2)])
    return m.select(
        *by, F.col("_n").cast("long").alias("n"), F.explode(pairs).alias("_c")
    ).select(*by, "_c.col_a", "_c.col_b", "n", f"_c.{out_col}")


def corr_matrix(
    df: DataFrame, cols: list[str], by: list[str] | None = None
) -> DataFrame:
    """(col_a, col_b, n, corr) for every unordered column pair, from one
    aggregation pass. ``corr`` is NULL for a zero-variance column (the
    radicand is 0), mirroring SQL semantics of 0/0. With ``by``, one
    matrix per group key from the SAME single pass (the moments simply
    groupBy the keys — per-group cost is a handful of integer adds).

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
    return _pairwise_pearson(df, x, "corr", by=by)


def spearman_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Spearman rank correlation = Pearson over average ranks,
    kept exact by ranking in DOUBLED ranks (a tie group's average rank
    is half-integer; twice it is always the integer 2m + t − 1 for min
    rank m and tie count t, and correlation is scale-invariant so the
    doubling cancels).

    Distributed rank assignment — the part a naive ROW_NUMBER-over-
    everything gets wrong at scale: each column's ranks derive from its
    DISTINCT-VALUE relation (per-value counts → one cumulative window
    over values, not rows) and join back to the fact rows on the value.
    For the low-cardinality columns this is built for (quantities,
    discount/tax grids, bucketed metrics) the rank map broadcasts;
    high-cardinality doubles should be quantized upstream — the same
    contract as ks_two_sample. Rows with a NULL in ANY ranked column
    are dropped first (listwise completeness, so every column ranks the
    identical row set — rank maps built per column would otherwise
    disagree with the pairwise moments).

    After join-back the whole matrix is the same single-pass exact-
    moment aggregation as :func:`corr_matrix` (rank2 values are already
    integers — no micro-scaling; headroom n·(2n)² < 10^38 → exact to
    ~10^12 rows)."""
    if len(cols) < 2:
        raise ValueError(f"need at least 2 columns, got {cols!r}")
    base = df.dropna(subset=cols).select(*cols)
    for c in cols:
        per_val = base.groupBy(F.col(c).alias("_v")).agg(
            F.count(F.lit(1)).alias("_t")
        )
        w = W.orderBy("_v").rowsBetween(W.unboundedPreceding, W.currentRow)
        rank_map = per_val.select(
            F.col("_v").alias(c),
            (
                F.lit(2) * (F.sum("_t").over(w) - F.col("_t"))
                + F.col("_t") + F.lit(1)
            ).cast("long").alias(f"_r2_{c}"),
        )
        base = base.join(F.broadcast(rank_map), on=c, how="inner")
    x = {c: F.col(f"_r2_{c}").cast(_D38) for c in cols}
    return _pairwise_pearson(base, x, "rho")
