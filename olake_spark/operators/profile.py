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

__all__ = ["profile_numeric", "power_means", "top_values", "histogram", "dataset_card", "profile_cardinality"]


def profile_numeric(
    df: DataFrame,
    cols: list[str],
    round_to: int = 4,
    scale_to_int: bool = False,
    approx: bool = False,
) -> DataFrame:
    """Per-column stats in ONE pass: count, nulls, min/max, mean, median.
    Output: one row per column (stacked for stable comparison).

    ``scale_to_int`` emits mean/median as round(x*10^round_to) BIGINTs —
    bit-stable across engines (a float's last-ulp drift survives rounding and
    breaks exact value hashes; a scaled integer doesn't).
    ``approx`` swaps the exact sort-based ``percentile`` for
    ``percentile_approx`` — at 100 TB an exact median is a full sort per
    column, the approx sketch is a single map-side-combinable aggregate.
    """
    pctl = "percentile_approx" if approx else "percentile"
    aggs = []
    for c in cols:
        mean = F.avg(c)
        median = F.expr(f"{pctl}({c}, 0.5)")
        if scale_to_int:
            scale = 10**round_to
            mean = F.round(mean * scale, 0).cast("long")
            median = F.round(median * scale, 0).cast("long")
        else:
            mean = F.round(mean, round_to)
            median = F.round(median, round_to)
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.min(c).alias(f"{c}__min"),
            F.max(c).alias(f"{c}__max"),
            mean.alias(f"{c}__mean"),
            median.alias(f"{c}__median"),
        ]
    stat_t = "long" if scale_to_int else "double"
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
                        F.col(f"{c}__mean").cast(stat_t).alias("mean_v"),
                        F.col(f"{c}__median").cast(stat_t).alias("median_v"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    )
    return stacked.select("s.*")


def histogram(
    df: DataFrame, col: str, lo: float, hi: float, nbins: int
) -> DataFrame:
    """Fixed-range equi-width histogram: one groupBy over a closed-form bin
    expression (no sort, no sketch — bit-reproducible in ANSI SQL, unlike
    ``approx_percentile``-style profiles whose sketches differ per engine).

    Values land in ``floor((x - lo) / (hi - lo) * nbins)`` clamped to
    [0, nbins-1]; out-of-range rows clamp into the edge bins so the counts
    always sum to the non-NaN non-null row count. NaN is excluded outright
    (it is neither in nor out of any range; without the filter it would
    silently inflate bin 0). Empty bins are absent (sparse output — at
    100 TB the result is still ≤ nbins rows).
    """
    if not (hi > lo and nbins > 0):
        raise ValueError(f"need hi > lo and nbins > 0, got [{lo}, {hi}) x {nbins}")
    x = F.col(col).cast("double")
    raw_bin = F.floor((x - F.lit(float(lo))) / F.lit(float(hi - lo)) * F.lit(nbins))
    bin_id = F.least(F.lit(nbins - 1), F.greatest(F.lit(0), raw_bin)).cast("int")
    return (
        df.filter(x.isNotNull() & ~F.isnan(x))
        .groupBy(bin_id.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


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


def dataset_card(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang_col: str | None = None,
) -> DataFrame:
    """The dataset-card metric block a corpus release publishes: one
    (metric, value) row per headline number — document count, token
    totals/means, exact-duplicate rate, and per-language share (from
    ``lang_col`` when given). Everything rides two aggregation passes over
    one scan shape: a global aggregate (count/sum/distinct-fingerprint)
    and, optionally, a language groupBy — no joins, no Python.

    ``value`` is always double (counts cast exactly); ratios round to 6
    decimals so the card is engine-stable.
    """
    from olake_spark.operators.dedup import normalize_text
    from olake_spark.operators.text import tokens

    n_toks = F.size(tokens(F.col(text_col))).cast("long")
    fp = F.md5(normalize_text(F.col(text_col)))
    base = df.select(F.col(id_col), n_toks.alias("_nt"), fp.alias("_fp"))
    g = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_nt").alias("tot"),
        F.countDistinct("_fp").alias("nfp"),
    )
    card = g.select(
        F.explode(
            F.array(
                F.struct(F.lit("n_docs").alias("metric"), F.col("n").cast("double").alias("value")),
                F.struct(F.lit("total_tokens").alias("metric"), F.col("tot").cast("double").alias("value")),
                F.struct(
                    F.lit("mean_doc_tokens").alias("metric"),
                    F.round(F.col("tot") / F.col("n"), 6).alias("value"),
                ),
                F.struct(
                    F.lit("exact_dup_rate").alias("metric"),
                    F.round(F.lit(1.0) - F.col("nfp") / F.col("n"), 6).alias("value"),
                ),
            )
        ).alias("kv")
    ).select("kv.metric", "kv.value")
    if lang_col is None:
        return card
    # denominator via a global window over the k-language counts frame
    # (tiny by construction) — query building stays fully lazy, no action
    from pyspark.sql import Window as W

    counts = df.groupBy(lang_col).agg(F.count(F.lit(1)).alias("c"))
    shares = counts.select(
        F.concat(F.lit("lang_share_"), F.col(lang_col)).alias("metric"),
        F.round(F.col("c") / F.sum("c").over(W.partitionBy()), 6).alias("value"),
    )
    return card.unionByName(shares)


def profile_cardinality(df: DataFrame, cols: list[str], approx: bool = False) -> DataFrame:
    """Per-column cardinality block: (col, n, n_nulls, n_distinct,
    distinct_frac) — the profiler output that drives join-strategy and
    bucketing decisions (a column with distinct_frac ≈ 1 is a key; ≈ 0 is
    a category worth dictionary/broadcast treatment).

    One aggregation pass for ALL columns. ``approx`` swaps exact
    count-distinct for the HLL++ sketch (`approx_count_distinct`) — at
    100 TB an exact distinct per column is a full shuffle each, the
    sketch is one map-side-combinable aggregate; keep exact for oracles.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    cd = F.approx_count_distinct if approx else F.countDistinct
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            cd(c).alias(f"{c}__nd"),
        ]
    wide = df.agg(*aggs)
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col"),
                        F.col(f"{c}__n").cast("long").alias("n"),
                        F.col(f"{c}__nulls").cast("long").alias("n_nulls"),
                        F.col(f"{c}__nd").cast("long").alias("n_distinct"),
                        F.round(
                            F.col(f"{c}__nd")
                            / F.greatest(F.col(f"{c}__n") - F.col(f"{c}__nulls"), F.lit(1)),
                            6,
                        ).alias("distinct_frac"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.*")


def power_means(
    df: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Per-group arithmetic / geometric / harmonic means of a POSITIVE
    metric — the three Pythagorean means in one pass (growth rates want
    the geometric mean, rate averages want the harmonic one; reporting
    the arithmetic mean for either is the classic dashboard bug, and
    AM ≥ GM ≥ HM is a free sanity invariant on every output row).

    Exactness: values quantize to micro BIGINTs. The arithmetic sum is
    an exact DECIMAL(38,0). The harmonic reciprocal sum is EXACT
    integer arithmetic end to end — 1/v in atto-units is the pure
    integer division 10¹⁵ div v_micro, no float ever. The geometric
    log-sum nano-floors each row's IEEE ln (the surprisal/MI
    discipline: order-free, bias ≤ n·1e-9 in log space). Non-positive
    values are EXCLUDED (no real log/reciprocal) and counted in
    ``n_nonpositive`` so the exclusion is auditable.

    Returns (keys..., n, n_nonpositive, mean_arith, mean_geom,
    mean_harm).
    """
    d38 = "decimal(38,0)"
    vm = F.round(F.col(value_col) * 1_000_000).cast("long")
    base = df.select(*keys, vm.alias("_vm")).filter(F.col("_vm").isNotNull())
    pos = F.col("_vm") > 0
    ln_nano = F.floor(
        F.log(F.col("_vm").cast("double") / 1e6) * 1e9
    ).cast("long")
    inv_atto = F.expr("1000000000000000 div _vm")  # 10^15 div micro = atto
    agg = base.groupBy(*keys).agg(
        F.sum(pos.cast("long")).alias("n"),
        F.sum((~pos).cast("long")).alias("n_nonpositive"),
        F.sum(F.when(pos, F.col("_vm")).otherwise(0).cast(d38)).alias("_s"),
        F.sum(F.when(pos, ln_nano).otherwise(0).cast(d38)).alias("_ln"),
        F.sum(F.when(pos, inv_atto).otherwise(0).cast(d38)).alias("_inv"),
    )
    n = F.col("n").cast("double")
    arith = F.try_divide(F.col("_s").cast("double"), n * 1e6)
    geom = F.when(
        F.col("n") > 0,
        F.exp(F.col("_ln").cast("double") / (n * 1e9)),
    )
    # Σ_inv is in nano-reciprocal units ((1/v)·10⁹ per row), so
    # HM = n / (Σ_inv/10⁹) = n·10⁹ / Σ_inv — no further scaling. (The
    # first cut divided Σ_inv by 10⁶ again and read HM a million times
    # too large; the mirrored oracle was green on the same wrong
    # algebra and the plain-Python reference pin caught it — the exact
    # bug class tests/test_stats_reference_pins.py exists for.)
    harm = F.try_divide(n * 1e9, F.col("_inv").cast("double"))
    return agg.select(
        *keys,
        "n",
        "n_nonpositive",
        F.round(arith, 6).alias("mean_arith"),
        F.round(geom, 6).alias("mean_geom"),
        F.round(harm, 6).alias("mean_harm"),
    )
