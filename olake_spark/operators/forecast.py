"""Forecasting primitives: Holt linear (double exponential) smoothing.

Holt's method extends EWMA with a trend term:

    l_t = alpha * v_t + (1 - alpha) * (l_{t-1} + b_{t-1})
    b_t = beta * (l_t - l_{t-1}) + (1 - beta) * b_{t-1}

— the level chases the series, the trend chases the level's motion, and
the h-step forecast is l + h*b. Like EWMA (operators/timeseries.ewma_last)
the recursion is inherently sequential per key, so each key's ordered
values fold through the ``aggregate`` higher-order function with a
struct(level, trend) accumulator — whole-stage codegen, no Python. With
alpha and beta as exact binary fractions (default 1/4) the fold executes
the identical IEEE-754 double sequence in any engine, so results are
bit-identical to the oracle's ``list_reduce`` over an identically
ordered struct list.

Scale: one hash shuffle on the keys; the collected sequence is bounded
by each key's own row count (the sessionize/SCD2 per-key-sequence
contract — skew bounded by the hottest key, not data volume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["acf", "holt_linear", "ljung_box", "seasonal_naive_backtest"]

_D38 = "decimal(38,0)"


def holt_linear(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    value_col: str,
    alpha: float = 0.25,
    beta: float = 0.25,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key Holt linear smoothing: returns each key's observation
    count, final level, final trend, and 1-step-ahead forecast
    (level + trend), all rounded to 6.

    Initialization: l_0 = v_0, b_0 = 0 — the first element IS the
    initial state (its pair is [v_0, 0]), which is exactly how the
    oracle's init-less ``list_reduce`` starts, so no sentinel is needed
    on the SQL side. ``alpha``/``beta`` should be exact binary
    fractions (k/2^m) for cross-engine bit-reproducibility.

    The update is pinned in its FLAT linear-combination form — the
    algebraic expansion of the textbook two-step recursion:

        l' = (alpha*v + (1-alpha)*l) + (1-alpha)*b
        b' = (beta*alpha)*(v - l) + (1 - beta*alpha)*b

    (substitute l'-l = alpha*(v-l) + (1-alpha)*b into the b update).
    Pinning one flat op order makes the IEEE sequence engine-portable —
    and each new field reads each old field exactly once, which matters
    for the oracle: DuckDB 1.0.0's ``list_reduce`` evaluates a STRUCT
    accumulator's fields sequentially and mutates the accumulator in
    place (field 2 would see field 1's NEW value), so the oracle holds
    state as a 2-element LIST, which folds correctly.
    """
    order_cols = list(order_cols or [])
    ordkey = F.struct(
        F.unix_micros(F.col(time_col)).alias("_t"),
        *[F.col(c).alias(f"_o{i}") for i, c in enumerate(order_cols)],
        F.col(value_col).cast("double").alias("_v"),
    )
    per_key = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.array_sort(F.collect_list(ordkey)).alias("_seq"),
    )
    vals = F.transform(F.col("_seq"), lambda s: s["_v"])
    a, b1 = F.lit(float(alpha)), F.lit(1.0 - alpha)
    ga = F.lit(float(beta * alpha))
    g1a = F.lit(1.0 - beta * alpha)

    def _step(acc, v):
        # flat form, op order pinned to match the oracle char-for-char:
        # (a*v + (1-a)*l) + (1-a)*b  /  (b*a)*(v-l) + (1-b*a)*b
        return F.struct(
            ((a * v + b1 * acc["l"]) + b1 * acc["b"]).alias("l"),
            (ga * (v - acc["l"]) + g1a * acc["b"]).alias("b"),
        )

    init = F.struct(
        F.element_at(vals, 1).alias("l"), F.lit(0.0).alias("b")
    )
    st = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        init,
        _step,
    )
    return per_key.select(
        *keys,
        "n",
        F.round(st["l"], 6).alias("level"),
        F.round(st["b"], 6).alias("trend"),
        F.round(st["l"] + st["b"], 6).alias("forecast_1"),
    )


def _centered_lag_pairs(
    df: DataFrame,
    time_col: str,
    value_col: str,
    step: str,
    max_lag: int,
    by: list[str],
) -> DataFrame:
    """Shared plan of :func:`acf` and :func:`ljung_box`: the bucketed
    series' n-scaled centered deviations paired at lags 1..max_lag.
    Returns one row per (by…, lag, pair) carrying (_n, _dev, _dev2,
    _den) — the caller aggregates its own statistic."""
    from olake_spark.operators.timeseries import bucketize

    daily = bucketize(df, time_col, by, value_col, step=step).select(
        *by,
        F.col("_bucket").alias("_t"),
        F.col("_v_micros").cast(_D38).alias("_x"),
    )
    w = W.partitionBy(*by).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    centered = daily.select(
        *by,
        "_t",
        F.count(F.lit(1)).over(w).cast(_D38).alias("_n"),
        (F.count(F.lit(1)).over(w).cast(_D38) * F.col("_x")
         - F.sum("_x").over(w)).alias("_dev"),
    )
    den = centered.select(
        *by, "_t", "_n", "_dev",
        F.sum(F.col("_dev") * F.col("_dev")).over(w).alias("_den"),
    )
    lags = F.explode(F.array(*[F.lit(k) for k in range(1, max_lag + 1)]))
    left = den.select(*by, "_t", "_n", "_dev", "_den", lags.alias("lag"))
    right = centered.select(
        *[F.col(k).alias(f"_k2_{k}") for k in by],
        F.col("_t").alias("_t2"),
        F.col("_dev").alias("_dev2"),
    )
    cond = left["_t"] + left["lag"] == right["_t2"]
    for k in by:
        cond = cond & (left[k] == right[f"_k2_{k}"])
    return left.join(right, cond, "inner")


def acf(
    df: DataFrame,
    time_col: str,
    value_col: str,
    step: str = "1 day",
    max_lag: int = 7,
    by: list[str] | None = None,
) -> DataFrame:
    """Autocorrelation function of a bucketed total-value series at lags
    1..max_lag — the seasonality probe that tells a forecaster WHICH lag
    (daily? weekly?) carries signal before fitting anything.

    The series is the per-bucket exact micro-unit sum (the bucketize
    contract). With S = Σx and n buckets, every factor is centered by
    the whole-series mean via the n-scaled identity
    n²·(x−μ)(y−μ) = (n·x − S)(n·y − S), so

        r_k = Σ_pairs (n·x_t − S)(n·x_{t+k} − S)
            / Σ_all   (n·x_t − S)²

    is a ratio of two exact DECIMAL(38,0) sums — one cast-to-double each
    and one divide, hash-stable at round(·, 6). Pairs at lag k are the
    buckets where BOTH t and t+k were observed (on a gapless series this
    is the textbook Σ_{t=1..n−k}; gaps drop only the pairs they touch).

    Plan shape: one map-side-combinable shuffle onto the bucket, then
    everything runs on the BUCKET-SIZED relation: S and the denominator
    come from an unpartitioned window over buckets (values-sized, the
    ks_two_sample contract), and the lag pairing is an equi-join of the
    bucket relation with itself on bucket+k — never a row-level
    operation. Headroom: n·max|x_micros| < 10^19 per deviation and
    n·dev² < 10^38 overall — exact to ~10^5 buckets of ~10^13-micro
    totals.

    With ``by``, one ACF PER GROUP from the same plan (the fleet shape:
    per-metric / per-tenant seasonality sweeps): the windows partition
    on the keys (never a single-partition exchange), the lag self-join
    adds the keys to its equi-condition, and the centering constants
    (n, S, den) are each group's own."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    by = list(by or [])
    paired = _centered_lag_pairs(df, time_col, value_col, step, max_lag, by)
    return (
        paired.groupBy(*by, "lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            # a constant series has zero variance -> NULL, never NaN
            F.when(
                F.first("_den") > 0,
                F.round(
                    F.sum(F.col("_dev") * F.col("_dev2")).cast("double")
                    / F.first("_den").cast("double"),
                    6,
                ),
            ).alias("r"),
        )
        .orderBy("lag")
    )


def seasonal_naive_backtest(
    df: DataFrame,
    time_col: str,
    value_col: str,
    step: str = "1 day",
    season: int = 7,
) -> DataFrame:
    """Seasonal-naive backtest: predict each bucket with the value one
    season earlier (ŷ_t = y_{t−s}) and score the whole series — the
    no-parameter baseline every real forecaster must beat (if Holt
    can't beat lag-7 on daily data, ship lag-7).

    Exact arithmetic end to end: per-bucket micro sums, absolute errors
    as BIGINT micros, MAE as one late divide; MAPE accumulates each
    bucket's |e|/y ratio nano-floored (order-free float-sum
    discipline). Pairs exist where both t and t−s were observed — the
    acf gap rule. Plan: one bucket shuffle, then a season-lag equi-self-
    join on the bucket relation (bucket-sized).

    Returns one row: (n_pairs, mae_micro, mae, mape).
    """
    if season < 1:
        raise ValueError(f"season must be >= 1, got {season}")
    from olake_spark.operators.timeseries import bucketize

    daily = bucketize(df, time_col, [], value_col, step=step).select(
        F.col("_bucket").alias("_t"), F.col("_v_micros").alias("_y")
    )
    pred = daily.select(
        (F.col("_t") + season).alias("_t"), F.col("_y").alias("_yhat")
    )
    j = daily.join(pred, "_t")
    err = F.abs(F.col("_y") - F.col("_yhat"))
    nano = 1_000_000_000
    ratio = F.when(
        F.col("_y") != 0,
        F.floor(
            err.cast("double") / F.abs(F.col("_y")).cast("double") * nano
        ).cast("long"),
    )
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(err.cast("decimal(38,0)")).alias("_ae"),
        F.sum(ratio).alias("_mape_nano"),
        F.sum((F.col("_y") != 0).cast("long")).alias("_n_nonzero"),
    )
    return agg.select(
        "n_pairs",
        ((F.col("_ae") - F.pmod(F.col("_ae"), F.col("n_pairs")))
         / F.col("n_pairs")).cast("long").alias("mae_micro"),
        F.round(
            F.col("_ae").cast("double") / (F.col("n_pairs").cast("double") * 1_000_000.0),
            6,
        ).alias("mae"),
        F.when(
            F.col("_n_nonzero") > 0,
            F.round(
                (F.col("_mape_nano") / float(nano))
                / F.col("_n_nonzero").cast("double"),
                6,
            ),
        ).alias("mape"),
    )


def ljung_box(
    df: DataFrame,
    time_col: str,
    value_col: str,
    step: str = "1 day",
    max_lag: int = 7,
    by: list[str] | None = None,
) -> DataFrame:
    """Ljung–Box portmanteau test on the bucketed series' first
    ``max_lag`` autocorrelations — "is there ANY serial dependence?",
    the one-number companion to :func:`acf` (which says where) and
    ``durbin_watson`` (lag-1 only):

        Q = n·(n+2) · Σ_{k=1..m} r_k² / (n − k)    ~ χ²_m under iid

    The r_k are the EXACT-ratio autocorrelations from the same
    bucket-relation plan as :func:`acf` (unrounded here — rounding
    first would square the rounding error into Q); each lag's term is
    one IEEE sequence over the exact DECIMAL sums, FLOOR-nano quantized
    before the Σ over lags (order-free float-sum discipline, ≤ m terms).
    n is the observed bucket count; lags with no pairs (short or gapped
    series, n ≤ k) contribute nothing and m_used reports how many lags
    actually entered. Per ``by`` group from one plan, like acf.
    Returns (by..., n, m_used, q_lb).
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    by = list(by or [])
    paired = _centered_lag_pairs(df, time_col, value_col, step, max_lag, by)
    per_lag = paired.groupBy(*by, "lag").agg(
        F.first("_n").alias("_nn"),
        F.when(
            F.first("_den") > 0,
            F.sum(F.col("_dev") * F.col("_dev2")).cast("double")
            / F.first("_den").cast("double"),
        ).alias("_r"),
    )
    nd = F.col("_nn").cast("double")
    term = (F.col("_r") * F.col("_r")) / (nd - F.col("lag").cast("double"))
    nano = 1_000_000_000
    m = per_lag.filter(
        F.col("_r").isNotNull() & (F.col("_nn") > F.col("lag"))
    ).groupBy(*by).agg(
        F.first("_nn").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("m_used"),
        F.sum(F.floor(term * nano).cast("long")).alias("_st"),
    )
    q = (
        F.col("n").cast("double")
        * (F.col("n").cast("double") + 2.0)
        * (F.col("_st").cast("double") / nano)
    )
    return m.select(*by, "n", "m_used", F.round(q, 6).alias("q_lb"))
