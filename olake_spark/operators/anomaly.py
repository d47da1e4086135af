"""Time-series anomaly detection — rolling z-score + CUSUM change points.

Monitoring staples for an ingestion engine (beyond parity; the reference
stops at replication — `utils/logger/stats.go` counts rows, it never judges
them). Both operators are single-window-pass, per-key sequential, and run
on EXACT integer arithmetic so the anomaly/changepoint flags are
partition-order-free and engine-reproducible (the DuckDB oracle recomputes
them bit-for-bit).

- ``rolling_zscore``: flag points whose deviation from the trailing-window
  mean exceeds ``k`` trailing standard deviations. The test
  ``(n·x − s)² > k²·(n·q − s²)`` is evaluated on scaled-integer
  DECIMAL(38,0) terms — no float ever decides a flag; the reported
  ``zscore`` is derived from the same exact integers and rounded late.
- ``cusum_changepoints``: one-sided CUSUM drift detector. The textbook
  recurrence ``S_i = max(0, S_{i−1} + (x_i − target) − slack)`` is not a
  plain window aggregate, but it has a closed form over prefix sums:
  with ``C_i = Σ_{j≤i} d_j``,  ``S_i = C_i − min(0, min_{j≤i} C_j)``.
  Both terms are cumulative window functions — one ordered pass per key,
  exact BIGINT throughout.

Scale: one hash shuffle on the keys; within a key the window is
sequential (bounded by the hottest key, the same skew profile as every
sessionize/LOCF operator in this repo). All expressions are built-in
column ops — whole-stage codegen, zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["rolling_zscore", "cusum_changepoints", "seasonal_baseline_outliers", "shewhart_individuals"]

_D38 = "decimal(38,0)"


def rolling_zscore(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    value_col: str,
    window: int = 20,
    k: int = 3,
    min_n: int = 8,
    scale: int = 100,
) -> DataFrame:
    """Per-key trailing-window z-score outlier flags.

    The window is the previous ``window`` rows EXCLUDING the current one
    (so a spike never suppresses itself), ordered by (time, value) for a
    deterministic total order. ``scale`` must make ``value·scale`` exact
    integers (centi-units for 2-decimal data). ``k`` is an integer number
    of standard deviations; the flag compares
    ``(n·x − s)² > k²·(n·q − s²)`` in DECIMAL(38,0) — exact. ``zscore``
    = (n·x − s)/√(n·q − s²) is reported (rounded to 4) for humans — since
    ``n·q − s² = n²·σ²_pop`` this is exactly ``(x − mean)/σ_pop``, the
    population z-score, consistent with the flag (``|z| > k`` ⇔ flagged).
    The boolean is the contract.
    """
    v = F.round(F.col(value_col) * scale).cast("long")
    order = [F.col(time_col).asc(), F.col(value_col).asc()]
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(-window, -1)
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum(v).over(w).cast(_D38)
    q = F.sum((v * v).cast(_D38)).over(w)
    x = v.cast(_D38)
    nn = n.cast(_D38)
    num = nn * x - s  # n·x − s
    var_term = nn * q - s * s  # n·q − s²  (= n²·σ²_pop)
    flagged = (num * num) > (F.lit(k * k).cast(_D38) * var_term)
    z = F.when(
        var_term > 0,
        F.round(
            num.cast("double") / F.sqrt(var_term.cast("double")),
            4,
        ),
    )
    return df.select(
        *keys,
        F.col(time_col),
        F.col(value_col),
        n.alias("n_window"),
        z.alias("zscore"),
        ((n >= min_n) & (var_term > 0) & flagged).alias("is_anomaly"),
    )


def cusum_changepoints(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    value_col: str,
    target: float,
    slack: float,
    threshold: float,
    scale: int = 100,
) -> DataFrame:
    """One-sided (upward) CUSUM per key, exact closed form.

    ``d_i = scaled(x_i) − scaled(target) − scaled(slack)``;
    ``S_i = C_i − min(0, running_min(C_i))`` where ``C`` is the running
    sum of ``d`` — algebraically identical to the max(0, …) recurrence,
    but expressible as two cumulative window aggregates. A row is an
    ``alarm`` when ``S_i`` crosses ``threshold`` (scaled). Everything is
    BIGINT; ``cusum`` is reported back in value units.
    """
    d = (
        F.round(F.col(value_col) * scale).cast("long")
        - F.lit(int(round(target * scale)))
        - F.lit(int(round(slack * scale)))
    )
    order = [F.col(time_col).asc(), F.col(value_col).asc()]
    w = (
        W.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # two projections: a window function cannot nest inside another one
    with_c = df.select(
        *keys, F.col(time_col), F.col(value_col), F.sum(d).over(w).alias("_c")
    )
    run_min = F.least(F.lit(0).cast("long"), F.min("_c").over(w))
    s_i = F.col("_c") - run_min
    thr = int(round(threshold * scale))
    return with_c.select(
        *keys,
        F.col(time_col),
        F.col(value_col),
        (s_i / F.lit(float(scale))).alias("cusum"),
        (s_i > F.lit(thr)).alias("alarm"),
    )


def seasonal_baseline_outliers(
    df: DataFrame,
    time_micros_col: str,
    keys: list[str],
    value_col: str,
    k: int = 3,
    min_n: int = 12,
    scale: int = 100,
) -> DataFrame:
    """Seasonal-profile outliers: flag points that deviate from THEIR
    SLOT's distribution — the hour-of-day baseline every ops dashboard
    fits first (a 3am spike is judged against 3am traffic, not the
    daily mean). Slots are (keys..., hour-of-day); the flag test is the
    same exact-integer identity as ``rolling_zscore`` —
    ``(n·x − s)² > k²·(n·q − s²)`` on DECIMAL(38,0) slot aggregates —
    so no float decides a flag and the oracle reproduces it
    bit-for-bit.

    Plan: one map-side-combinable groupBy builds the |keys|·24-row slot
    profile, which BROADCASTS back onto the raw rows — the raw relation
    never shuffles (contrast the trailing-window form, which must).
    Slots with fewer than ``min_n`` points or zero variance never flag.
    ``time_micros_col`` is epoch MICROS (a long — the convention the
    anomaly family shares; convert timestamps with ``unix_micros``).
    """
    hod = (
        F.pmod(F.col(time_micros_col), F.lit(86_400_000_000))
        / F.lit(3_600_000_000)
    ).cast("int")
    v = F.round(F.col(value_col) * scale).cast("long")
    tagged = df.select(
        *keys,
        F.col(time_micros_col),
        F.col(value_col),
        hod.alias("hod"),
        v.alias("_v"),
    )
    prof = tagged.groupBy(*keys, "hod").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_v").cast(_D38).alias("_s"),
        F.sum((F.col("_v") * F.col("_v")).cast(_D38)).alias("_q"),
    )
    j = tagged.join(F.broadcast(prof), [*keys, "hod"])
    x = F.col("_v").cast(_D38)
    nn = F.col("_n").cast(_D38)
    num = nn * x - F.col("_s")
    var_term = nn * F.col("_q") - F.col("_s") * F.col("_s")
    return j.select(
        *keys,
        F.col(time_micros_col),
        F.col(value_col),
        "hod",
        F.round(F.col("_s").cast("double") / F.col("_n") / scale, 4).alias(
            "slot_mean"
        ),
        (
            (F.col("_n") >= min_n)
            & (var_term > 0)
            & ((num * num) > (F.lit(k * k).cast(_D38) * var_term))
        ).alias("is_anomaly"),
    )


def shewhart_individuals(
    df: DataFrame,
    time_col: str,
    value_col: str,
    step: str = "1 day",
    sigma_factor: float = 2.66,
) -> DataFrame:
    """Shewhart individuals/moving-range (I-MR) control chart summary
    over the bucketed total series — the SPC answer to "is this metric
    in statistical control, and which days broke the limits?":

        center = x̄,   M̄R = Σ|xₜ − xₜ₋₁| / (n−1)
        UCL/LCL = x̄ ± 2.66·M̄R     (2.66 = 3/d₂ for n=2 subgroups)

    The series is the bucketize micro-sum relation; moving ranges are
    exact integer |Δ| from one lag window over buckets (values-sized —
    the ks/acf contract). center and M̄R are each one cast + one divide
    of exact DECIMAL(38,0) sums; the limit comparisons re-derive each
    bucket's verdict from the SAME exact integers (xₜ·(n−1)·n vs the
    integer-cleared limit expression is overkill here — the shared IEEE
    sequence on identical doubles is engine-stable, the repo's standard
    contract). Degenerate series (n < 2) report NULL limits and zero
    violations.

    Returns one row (n_buckets, center, mr_bar, ucl, lcl, n_above,
    n_below).
    """
    from olake_spark.operators.timeseries import bucketize

    d38 = "decimal(38,0)"
    daily = bucketize(df, time_col, [], value_col, step=step).select(
        F.col("_bucket").alias("_t"), F.col("_v_micros").alias("_x")
    )
    wall = W.partitionBy().orderBy("_t")
    with_mr = daily.select(
        "_t",
        "_x",
        F.abs(F.col("_x") - F.lag("_x").over(wall)).alias("_mr"),
    )
    wtot = W.partitionBy()
    m = with_mr.select(
        "_x",
        "_mr",
        F.count(F.lit(1)).over(wtot).cast(d38).alias("_n"),
        F.sum(F.col("_x").cast(d38)).over(wtot).alias("_s"),
        F.sum(F.col("_mr").cast(d38)).over(wtot).alias("_smr"),
    )
    n = F.col("_n")
    center = F.col("_s").cast("double") / n.cast("double")
    mrbar = F.try_divide(
        F.col("_smr").cast("double"), (n - 1).cast("double")
    )
    ucl = center + F.lit(sigma_factor) * mrbar
    lcl = center - F.lit(sigma_factor) * mrbar
    x = F.col("_x").cast("double")
    agg = m.agg(
        F.first(n).alias("_nn"),
        F.first(center).alias("_c"),
        F.first(mrbar).alias("_mb"),
        F.first(ucl).alias("_u"),
        F.first(lcl).alias("_l"),
        F.sum(F.when(x > ucl, 1).otherwise(0)).alias("_above"),
        F.sum(F.when(x < lcl, 1).otherwise(0)).alias("_below"),
    )
    ok = F.col("_nn") > 1
    return agg.select(
        # empty series: first() over zero rows is NULL — report 0
        F.coalesce(F.col("_nn"), F.lit(0).cast(d38))
        .cast("long").alias("n_buckets"),
        F.round(F.col("_c") / 1e6, 6).alias("center"),
        F.when(ok, F.round(F.col("_mb") / 1e6, 6)).alias("mr_bar"),
        F.when(ok, F.round(F.col("_u") / 1e6, 6)).alias("ucl"),
        F.when(ok, F.round(F.col("_l") / 1e6, 6)).alias("lcl"),
        F.when(ok, F.col("_above").cast("long")).otherwise(F.lit(0)).alias(
            "n_above"
        ),
        F.when(ok, F.col("_below").cast("long")).otherwise(F.lit(0)).alias(
            "n_below"
        ),
    )
