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
one identical IEEE divide of exact micro-unit integers in any engine.
The rank-k VALUE is insensitive to how equal slopes are tie-broken, so
it is selected WITHOUT any global sort: an iterative histogram
bisection over the slope doubles (the exact_quantiles recipe — each
round one map-side-combinable aggregation over the pair relation,
narrowing to the ACTUAL min/max inside the rank-k bin; ~7 rounds close
a 64-bit double range at 1024 bins). No single-partition exchange
appears anywhere in the plan.

Scale contract: the pair relation is BUCKET-sized squared — C(n, 2)
pairs over the aggregated series, never the raw rows (30 days → 435
pairs; 100k buckets → 5·10^9 pairs SPREAD ACROSS THE CLUSTER, with
each bisection round a filter + tiny-histogram aggregation over them —
fine on a real cluster, where the old rank-everything window would
funnel all 5·10^9 rows through one task). The raw rows are touched
once by the bucketize shuffle; the bucket relation is locally
checkpointed so the per-round jobs never rescan the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from olake_spark.materialize import materialize

__all__ = ["mann_kendall_by_key", "mann_kendall_theil_sen", "runs_test"]

_D38 = "decimal(38,0)"


def _kth_smallest_double(
    values: DataFrame,
    col: str,
    k: int,
    bins: int = 1024,
    max_rounds: int = 64,
) -> float | None:
    """Exact k-th smallest (1-indexed) of a double column — iterative
    histogram bisection, no sort, no single-partition exchange. Each
    round filters to the open [lo, hi] value range, histograms it into
    ``bins`` equal-width bins, and descends into the bin holding rank
    k, narrowing to the bin's ACTUAL min/max (so clustered domains
    collapse immediately). Correctness needs no cross-engine float
    reasoning: this runs entirely inside Spark and returns the exact
    double the rank-k element holds.

    Driver-state bound (the quantiles.py DRIVER_STATE_MAX_ROWS concern
    does not arise here): the seed is a global ``.agg()`` — exactly one
    row by construction — and each round's histogram groups by a bin
    index in [0, bins), so the per-round collect is ≤ ``bins`` (1024)
    rows regardless of data size. Both collects are structurally
    bounded; no row-count guard is needed."""
    seed = values.agg(
        F.count(col).alias("_n"), F.min(col).alias("_lo"), F.max(col).alias("_hi")
    ).collect()[0]
    if seed["_n"] == 0 or k < 1 or k > seed["_n"]:
        return None
    lo, hi = seed["_lo"], seed["_hi"]
    k_rem = k
    v = F.col(col)
    for _ in range(max_rounds):
        if lo >= hi:
            return lo
        width = hi - lo
        bin_col = F.least(
            F.lit(bins - 1),
            F.greatest(F.lit(0), F.floor((v - lo) / width * bins).cast("int")),
        )
        rows = (
            values.filter(v.between(lo, hi))
            .groupBy(bin_col.alias("_b"))
            .agg(
                F.count(F.lit(1)).alias("_c"),
                F.min(v).alias("_bmin"),
                F.max(v).alias("_bmax"),
            )
            .collect()
        )
        hist = {r["_b"]: (r["_c"], r["_bmin"], r["_bmax"]) for r in rows}
        acc = 0
        for b in range(bins):
            c, bmin, bmax = hist.get(b, (0, None, None))
            if acc + c >= k_rem:
                k_rem -= acc
                lo, hi = bmin, bmax
                break
            acc += c
    if lo >= hi:
        return lo
    raise RuntimeError(
        f"_kth_smallest_double: unconverged after {max_rounds} rounds"
    )


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
    micro-units per bucket (``sen_slope`` divides by 10^6 once). The
    median is the exact rank-ceil(m/2) slope, selected by histogram
    bisection at operator-call time (eager driver loop, the
    exact_quantiles precedent) — never a global rank window.
    """
    from olake_spark.operators.timeseries import bucketize

    daily = (
        bucketize(df, time_col, [], value_col, step=step)
        .select(F.col("_bucket").alias("_t"), F.col("_v_micros").alias("_y"))
        .transform(materialize)
    )
    a = daily.select(F.col("_t").alias("_ta"), F.col("_y").alias("_ya"))
    b = daily.select(F.col("_t").alias("_tb"), F.col("_y").alias("_yb"))
    # try_divide, not /: Catalyst may merge a downstream _slope filter
    # into the join condition and evaluate it on the ta == tb diagonal
    # before the ta < tb check — ANSI mode would raise there. For every
    # genuine pair the divisor is nonzero and try_divide is the same
    # IEEE division.
    pairs = a.join(b, F.col("_ta") < F.col("_tb")).select(
        F.signum((F.col("_yb") - F.col("_ya")).cast("double"))
        .cast("long")
        .alias("_sgn"),
        F.try_divide(
            (F.col("_yb") - F.col("_ya")).cast("double"),
            (F.col("_tb") - F.col("_ta")).cast("double"),
        ).alias("_slope"),
    )
    m = pairs.count()
    sen = _kth_smallest_double(pairs, "_slope", (m + 1) // 2) if m else None
    stats = pairs.agg(F.sum("_sgn").alias("_s"))
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
    sen_col = F.lit(sen).cast("double")
    return j.select(
        n.cast("long").alias("n_buckets"),
        F.col("_s").cast("long").alias("s_stat"),
        F.round(var_s, 6).alias("var_s"),
        F.when(var_s > 0, F.round(z, 6)).alias("z"),
        F.round(sen_col, 4).alias("sen_slope_micro"),
        F.round(sen_col / 1_000_000.0, 6).alias("sen_slope"),
    )


def mann_kendall_by_key(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    value_col: str,
    step: str = "1 day",
    max_buckets_per_key: int = 5000,
) -> DataFrame:
    """Per-key Mann-Kendall + Theil-Sen FLEET — one trend test per key
    (per-SKU, per-tenant, per-metric) from a single plan; the
    many-small-groups complement to :func:`mann_kendall_theil_sen`'s
    one-huge-series bisection.

    Same exact arithmetic per key (integer S, tie-corrected variance,
    rank-⌈m/2⌉ lower-median slope with (slope, ta, tb) tie-break), but
    the regime differs: each key's pair relation is C(n_key, 2) over its
    OWN buckets, so the rank window partitions on the keys — per-key
    work is bounded by that key's series length and the whole fleet
    shuffles on the key hash, no single-partition exchange, no driver
    loop. Use the global operator when one series has ≫10³ buckets; use
    this when there are many keys of modest length.

    ``max_buckets_per_key`` (default 5000, mirroring the global
    operator's pre-bisection contract) bounds the per-key pair blowup:
    a single hot key with 100k buckets would otherwise materialize
    5×10⁹ pairs in one rank-window partition. The cap is enforced
    LAZILY inside the plan — a per-key bucket count joins back onto the
    series and a ``raise_error`` guard fires on the first over-cap
    input row, BEFORE its C(n,2) pair relation exists — so no extra
    driver job and no silent truncation. Route genuinely long series
    through :func:`mann_kendall_theil_sen`'s histogram bisection.

    Returns (keys..., n_buckets, s_stat, var_s, z, sen_slope_micro,
    sen_slope).
    """
    from olake_spark.operators.timeseries import bucketize

    daily = bucketize(df, time_col, keys, value_col, step=step).select(
        *keys, F.col("_bucket").alias("_t"), F.col("_v_micros").alias("_y")
    )
    nk = daily.groupBy(*keys).agg(F.count(F.lit(1)).alias("_nk"))
    guard = F.when(
        F.col("_nk") <= F.lit(max_buckets_per_key), F.col("_y")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "mann_kendall_by_key: a key exceeds "
                    f"max_buckets_per_key={max_buckets_per_key} buckets "
                    "(got "
                ),
                F.col("_nk").cast("string"),
                F.lit(
                    "); use mann_kendall_theil_sen's histogram "
                    "bisection for long series or raise the cap"
                ),
            )
        )
    )
    daily = daily.join(nk, keys).select(
        *keys, "_t", guard.alias("_y")
    )
    a = daily.select(
        *keys, F.col("_t").alias("_ta"), F.col("_y").alias("_ya")
    )
    b = daily.select(
        *[F.col(k).alias(f"_k2_{k}") for k in keys],
        F.col("_t").alias("_tb"),
        F.col("_y").alias("_yb"),
    )
    cond = F.col("_ta") < F.col("_tb")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"_k2_{k}"))
    pairs = a.join(b, cond).select(
        *keys,
        "_ta",
        "_tb",
        F.signum((F.col("_yb") - F.col("_ya")).cast("double"))
        .cast("long")
        .alias("_sgn"),
        F.try_divide(
            (F.col("_yb") - F.col("_ya")).cast("double"),
            (F.col("_tb") - F.col("_ta")).cast("double"),
        ).alias("_slope"),
    )
    wrank = W.partitionBy(*keys).orderBy("_slope", "_ta", "_tb")
    wall = W.partitionBy(*keys)
    ranked = pairs.select(
        *keys,
        "_sgn",
        "_slope",
        F.row_number().over(wrank).alias("_rn"),
        F.count(F.lit(1)).over(wall).alias("_m"),
    )
    stats = ranked.groupBy(*keys).agg(
        F.sum("_sgn").alias("_s"),
        F.max(
            F.when(
                F.col("_rn") == F.ceil(F.col("_m") / 2), F.col("_slope")
            )
        ).alias("_sen"),
    )
    ties = daily.groupBy(*keys, "_y").agg(F.count(F.lit(1)).alias("_t"))
    t = F.col("_t").cast("decimal(38,0)")
    tie_sum = ties.groupBy(*keys).agg(
        F.sum(t * (t - 1) * (F.lit(2) * t + 5)).alias("_tie_term"),
        F.sum(t).cast("decimal(38,0)").alias("_n"),
    )
    j = tie_sum.join(stats, keys, "left")
    n = F.col("_n")
    var_s = (
        (n * (n - 1) * (F.lit(2) * n + 5) - F.col("_tie_term")).cast("double")
        / 18.0
    )
    s = F.coalesce(F.col("_s"), F.lit(0)).cast("double")
    z = (
        F.when(F.col("_s") > 0, (s - 1.0) / F.sqrt(var_s))
        .when(F.col("_s") < 0, (s + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0))
    )
    return j.select(
        *keys,
        n.cast("long").alias("n_buckets"),
        F.coalesce(F.col("_s"), F.lit(0)).cast("long").alias("s_stat"),
        F.round(var_s, 6).alias("var_s"),
        F.when(var_s > 0, F.round(z, 6)).alias("z"),
        F.round(F.col("_sen"), 4).alias("sen_slope_micro"),
        F.round(F.col("_sen") / 1_000_000.0, 6).alias("sen_slope"),
    )


def runs_test(
    df: DataFrame,
    time_col: str,
    value_col: str,
    step: str = "1 day",
) -> DataFrame:
    """Wald–Wolfowitz runs test on the UP/DOWN moves of the bucketed
    total series — "is the day-over-day direction random, or does it
    streak?" (the randomness screen run before any trend claim;
    complements Mann-Kendall which asks about monotone drift).

    The series is the exact micro-unit bucket sums; moves are
    sign(x_t − x_{t−1}) with zero moves dropped (a tie has no
    direction). With n₁ ups, n₂ downs and R observed runs:

        μ  = 2n₁n₂/(n₁+n₂) + 1
        σ² = 2n₁n₂(2n₁n₂ − n₁ − n₂) / ((n₁+n₂)²(n₁+n₂ − 1))
        z  = (R − μ)/σ

    R, n₁, n₂ are exact integers from two lag windows over the
    BUCKET-sized relation (values-sized, never rows-sized — the
    ks/acf contract); μ/σ²/z are one fixed IEEE sequence over single
    casts of exact DECIMAL(38,0) products, hash-stable at round 6.
    Degenerate series (n₁+n₂ < 2 or σ² ≤ 0) report NULL z.

    Returns one row (n_up, n_down, runs, z).
    """
    from olake_spark.operators.timeseries import bucketize

    daily = bucketize(df, time_col, [], value_col, step=step).select(
        F.col("_bucket").alias("_t"), F.col("_v_micros").alias("_x")
    )
    wlag = W.orderBy("_t")
    moves = (
        daily.select(
            "_t",
            F.signum(
                (F.col("_x") - F.lag("_x").over(wlag)).cast("double")
            ).cast("int").alias("_s"),
        )
        .filter(F.col("_s").isNotNull() & (F.col("_s") != 0))
    )
    runs_flag = F.when(
        F.lag("_s").over(wlag).isNull() | (F.col("_s") != F.lag("_s").over(wlag)),
        1,
    ).otherwise(0)
    zero = F.lit(0).cast(_D38)
    # coalesce: an all-tied series has ZERO moves and empty-input sums
    # are NULL, but the report should read (0, 0, 0, NULL z)
    agg = moves.select("_t", "_s", runs_flag.alias("_new_run")).agg(
        F.coalesce(
            F.sum(F.when(F.col("_s") > 0, 1).otherwise(0)).cast(_D38), zero
        ).alias("_n1"),
        F.coalesce(
            F.sum(F.when(F.col("_s") < 0, 1).otherwise(0)).cast(_D38), zero
        ).alias("_n2"),
        F.coalesce(F.sum("_new_run").cast(_D38), zero).alias("_r"),
    )
    n1, n2, r = F.col("_n1"), F.col("_n2"), F.col("_r")
    n = n1 + n2
    two = F.lit(2).cast(_D38)
    mu = F.try_divide((two * n1 * n2).cast("double"), n.cast("double")) + 1.0
    var_num = (two * n1 * n2 * (two * n1 * n2 - n)).cast("double")
    var_den = (n * n * (n - 1)).cast("double")
    var = F.try_divide(var_num, var_den)
    z = F.when((n >= 2) & (var > 0), (r.cast("double") - mu) / F.sqrt(var))
    return agg.select(
        n1.cast("long").alias("n_up"),
        n2.cast("long").alias("n_down"),
        r.cast("long").alias("runs"),
        F.round(z, 6).alias("z"),
    )
