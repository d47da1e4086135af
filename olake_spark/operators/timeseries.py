"""Time-series gap filling — fixed-step resample + LOCF carry-forward.

A hypertable-rollup staple (beyond parity; the reference stops at row
replication): bucket each key's events onto a fixed time grid, materialize
the missing buckets between the key's first and last observation, and
carry the last observed aggregate forward (LOCF) into the gaps.

Dataflow (raw rows shuffle once, map-side combined):
  1. bucket = floor(epoch_us / step_us)  — pure projection, no shuffle
  2. per-(key, bucket) aggregate         — THE raw-row shuffle
  3. ``lead(bucket)`` over (key) — regroups only the aggregated frame
     (rows ≤ distinct (key, bucket), tiny vs raw) — finds each observed
     bucket's gap extent
  4. ``sequence``/``explode`` emits the gap rows already carrying the
     observed row's aggregate — the LOCF fill IS the explode; no grid
     frame, no join, no second window

Scale: a key with a pathological span (years of gap at 1-second step)
bounds its own grid rows, and the window in step 3 is per-key
sequential — skew is bounded by the widest key span, not by data
volume. Values carried by LOCF are exact micro-unit BIGINT sums divided
late, so the fill is bit-exact and partition-order-free
(oracle-reproducible in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from olake_spark.operators.sessions import _gap_seconds

from olake_spark.materialize import materialize

__all__ = [
    "durbin_watson",
    "changepoint_mean_shift",
    "seasonal_decompose",
    "seasonal_strength",
    "dispersion_index",
    "bucketize",
    "gapfill_locf",
    "retention_cohorts",
    "sweepline_concurrency",
    "ewma_last",
    "trend_slope",
    "cumulative_first_seen",
    "new_vs_returning",
    "growth_accounting",
    "ltv_cohort_curve",
]

_MICROS = 1_000_000
_D38 = "decimal(38,0)"


def bucketize(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Per-(key, bucket) count + exact micro-unit sum on a fixed-step
    grid. The sum is over round(value*10^6) BIGINTs (the incremental_agg
    pattern) — a raw double sum would be partition-order-dependent and
    could flip a rounding boundary between runs/engines."""
    step_us = int(_gap_seconds(step) * 1_000_000)
    return (
        df.withColumn(
            "_bucket", F.floor(F.unix_micros(F.col(time_col)) / F.lit(step_us))
        )
        .groupBy(*keys, "_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.round(F.col(value_col) * _MICROS).cast("long")
            ).alias("_v_micros"),
        )
    )


def gapfill_locf(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    value_col: str,
    step: str = "1 hour",
) -> DataFrame:
    """Resample to ``step`` buckets per key and fill interior gaps with the
    last NON-NULL (rounded) aggregate — classic LOCF: a bucket whose
    observed values are all NULL also carries the previous non-null
    aggregate forward (leading buckets before any non-null stay NULL);
    ``filled`` marks synthesized rows.

    Returns (keys..., bucket_start_ms, n_events, sum_value, filled) with
    one row per grid bucket between each key's first and last event.
    """
    step_us = int(_gap_seconds(step) * 1_000_000)
    per = bucketize(df, time_col, keys, value_col, step)
    # grid + LOCF in ONE pass, no join: each observed bucket OWNS the gap
    # up to the next observed bucket — lead() finds it, sequence/explode
    # materializes the filled rows already carrying the LOCF value. The
    # carried value is last(_v_micros, ignorenulls=True), NOT the owning
    # bucket's own aggregate: an observed bucket whose values are all
    # NULL must inherit the previous non-null aggregate (and hand that
    # on through its gap) rather than propagate NULL. Both windows share
    # one (keys, _bucket) sort, so this is still one hash shuffle
    # (bucketize) + one window stage on the same partitioning (exchange
    # reused); NULL keys are ordinary window partitions, so the
    # NULL-group data-loss bug the old grid-join formulation needed
    # ns_eq_join for cannot occur at all.
    w = W.partitionBy(*keys).orderBy("_bucket")
    nxt = F.lead("_bucket").over(w)
    locf = F.last("_v_micros", ignorenulls=True).over(
        w.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        per.withColumn("_stop", F.coalesce(nxt - 1, F.col("_bucket")))
        .withColumn("_locf", locf)
        .select(
            *keys,
            "n_events",
            "_locf",
            F.col("_bucket").alias("_obs"),
            F.explode(F.sequence("_bucket", "_stop")).alias("_bucket"),
        )
        .select(
            *keys,
            (F.col("_bucket") * F.lit(step_us // 1000)).alias("bucket_start_ms"),
            F.when(F.col("_bucket") == F.col("_obs"), F.col("n_events"))
            .otherwise(F.lit(0))
            .alias("n_events"),
            F.round(F.col("_locf") / F.lit(float(_MICROS)), 4).alias(
                "sum_value"
            ),
            (F.col("_bucket") != F.col("_obs")).alias("filled"),
        )
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    time_col: str,
    period_us: int = 7 * 86_400 * 1_000_000,
) -> DataFrame:
    """Cohort retention grid: users bucketed by first-seen period, counted
    per (cohort, periods_since) with retention vs the cohort's size.

    The analytics staple behind every "week-N retention" dashboard. Plan
    shape: one hash shuffle on the user (first-seen min + per-(user,
    period) distinct share it), then one map-side-combinable groupBy on
    the tiny (cohort, delta) grid; cohort sizes come from the grid itself
    (delta=0 row) via a broadcast self-join — raw events shuffle once.

    Returns (cohort_period, periods_since, n_users, retention) where
    ``retention`` = n_users / cohort size rounded to 6 (delta 0 row = 1.0
    by construction; a cohort's later periods can never exceed it).
    """
    period = F.floor(F.unix_micros(F.col(time_col)) / F.lit(period_us)).cast("long")
    up = df.select(F.col(user_col).alias("_u"), period.alias("_p")).distinct()
    first = up.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    grid = (
        up.join(first, "_u")
        .groupBy(
            F.col("_cohort").alias("cohort_period"),
            (F.col("_p") - F.col("_cohort")).alias("periods_since"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    base = grid.filter(F.col("periods_since") == 0).select(
        "cohort_period", F.col("n_users").alias("_cohort_size")
    )
    return grid.join(F.broadcast(base), "cohort_period").select(
        "cohort_period",
        "periods_since",
        "n_users",
        F.round(
            F.col("n_users").cast("double") / F.col("_cohort_size").cast("double"), 6
        ).alias("retention"),
    )


def sweepline_concurrency(
    intervals: DataFrame,
    start_col: str,
    end_col: str,
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Interval sweep-line: how many intervals are simultaneously open at
    every boundary instant ("max concurrent sessions" / room-occupancy).

    An interval is open on the CLOSED span [start, end] (both in epoch
    micros): +1 lands at ``start``, -1 at ``end + 1µs``, and the running
    sum of net deltas over the globally ordered distinct boundary
    timestamps is the concurrency right after each boundary.

    A naive running sum is a single-partition window over ALL boundaries —
    the classic global-prefix-sum scale trap. This uses the two-level
    decomposition instead (same shape as the WebDataset offset planner):

      1. net delta per distinct boundary timestamp — one hash shuffle,
         map-side combinable;
      2. level 1: per-bucket (default 1 h) delta totals — tiny frame,
         |buckets| rows;
      3. level 2: exclusive running sum OVER the bucket totals — a window
         over the tiny frame only (single task over |buckets| rows, never
         over raw boundaries);
      4. within-bucket running sum, window PARTITIONED BY bucket — fully
         parallel — plus the bucket's carried-in offset.

    At 100 TB the only global sequential work is step 3's |buckets|-row
    scan (≈ 9k rows for a year of hourly buckets); every raw-data stage
    is hash-partitioned. Returns (ts_us, concurrency) per boundary.
    """
    # one explode instead of a two-branch union: a union re-executes the
    # (often expensive — sessionize windows) interval derivation once per
    # branch; the explode emits both boundary deltas from a single pass
    # (guide §2.1 — r11 audit: events_concurrency's plan scanned events 8×)
    deltas = intervals.select(
        F.explode(
            F.array(
                F.struct(
                    F.col(start_col).alias("ts_us"), F.lit(1).alias("_d")
                ),
                F.struct(
                    (F.col(end_col) + F.lit(1)).alias("ts_us"),
                    F.lit(-1).alias("_d"),
                ),
            )
        ).alias("_b")
    ).select(F.col("_b.ts_us").alias("ts_us"), F.col("_b._d").alias("_d"))
    net = deltas.groupBy("ts_us").agg(F.sum("_d").alias("_net"))
    bucketed = net.withColumn("_bkt", F.floor(F.col("ts_us") / F.lit(int(bucket_us))))
    # bucketed feeds the per-bucket totals AND the final within-bucket
    # window; materialize the (distinct-boundary-sized, 3-column) relation
    # once instead of re-running the boundary aggregation per consumer
    bucketed = bucketed.transform(materialize)
    lvl1 = bucketed.groupBy("_bkt").agg(F.sum("_net").alias("_bkt_sum"))
    w_excl = W.orderBy("_bkt").rowsBetween(W.unboundedPreceding, -1)
    offsets = lvl1.select(
        "_bkt", F.coalesce(F.sum("_bkt_sum").over(w_excl), F.lit(0)).alias("_carry")
    )
    w_in = (
        W.partitionBy("_bkt")
        .orderBy("ts_us")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        bucketed.withColumn("_run", F.sum("_net").over(w_in))
        .join(F.broadcast(offsets), "_bkt")
        .select(
            "ts_us",
            (F.col("_carry") + F.col("_run")).cast("long").alias("concurrency"),
        )
    )


def ewma_last(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    value_col: str,
    alpha: float = 0.25,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key exponentially-weighted moving average, exact recursive
    semantics: ewma_0 = v_0, ewma_t = (1-α)·ewma_{t-1} + α·v_t, returning
    each key's FINAL smoothed value plus its observation count.

    The recursion is inherently sequential per key, so it cannot be a
    window aggregate; instead each key's ordered value list folds through
    ``aggregate`` (a higher-order function — whole-stage codegen, no
    Python). The fold runs the SAME IEEE-754 double sequence any other
    engine's sequential fold runs, so the result is reproducible
    bit-for-bit given the same order (the gate's DuckDB oracle folds via
    ``list_reduce`` over an identically ordered list).

    Scale: one hash shuffle on the keys; per-key cost is linear and the
    collected list is bounded by the key's own row count — the same
    per-key-sequence contract as sessionize/SCD2 (skew bounded by the
    hottest key, not data volume). For per-ROW ewma trails, prefer
    re-emitting inside ``transform`` — this variant returns one row per
    key for bounded output.
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
    folded = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, v: acc * F.lit(1.0 - alpha) + v * F.lit(alpha),
    )
    return per_key.select(
        *keys, "n", F.round(folded, 6).alias("ewma")
    )


def trend_slope(
    df: DataFrame,
    time_micros_col: str,
    keys: list[str],
    value_col: str,
    time_unit_us: int = 3_600_000_000,
    scale: int = 100,
) -> DataFrame:
    """Per-key least-squares trend slope — "is this metric drifting and
    how fast" — in ONE map-side-combinable aggregation:

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    with x = time in ``time_unit_us`` units RELATIVE to the key's first
    observation wouldn't be map-side computable — so x is absolute time
    in units (the slope is translation-invariant: shifting x changes Σx
    and Σxy together and cancels in the formula; only the magnitudes
    grow, which DECIMAL(38,0) absorbs). All five moments are exact
    integers (y in ``scale`` units); the one division happens at the
    end. Keys with < 2 points or zero time variance report NULL.

    Returns (keys..., n, slope) with slope in value-units per
    time-unit, rounded to 6.
    """
    x = F.floor(F.col(time_micros_col) / F.lit(time_unit_us)).cast(_D38)
    y = F.round(F.col(value_col) * scale).cast("long").cast(_D38)
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
    )
    nn = F.col("n").cast(_D38)
    num = nn * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = nn * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    return agg.select(
        *keys,
        "n",
        F.when(
            (F.col("n") >= 2) & (den != 0),
            F.round(num.cast("double") / den.cast("double") / scale, 6),
        ).alias("slope"),
    )


def cumulative_first_seen(
    df: DataFrame,
    time_col: str,
    key_col: str,
    step: str = "1 day",
) -> DataFrame:
    """Cumulative-distinct-keys-to-date curve (the DAU-to-date / user
    acquisition chart): for each time bucket, how many new keys appeared
    and how many distinct keys have EVER appeared by then.

    count(DISTINCT key) per cumulative window is quadratic done naively;
    the linear form is first-touch attribution: every key reduces to its
    min bucket (one map-side-combinable shuffle on the key), new-key
    counts reduce to the bucket relation, and the running sum is a
    window over BUCKETS — rows-sized work never reaches the window.

    Returns (bucket, new_keys, cum_keys).
    """
    step_us = int(_gap_seconds(step) * 1_000_000)
    first = (
        df.select(
            F.col(key_col).alias("_k"),
            F.floor(F.unix_micros(F.col(time_col)) / F.lit(step_us)).alias("_b"),
        )
        .groupBy("_k")
        .agg(F.min("_b").alias("bucket"))
    )
    per_bucket = first.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("new_keys")
    )
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    return per_bucket.select(
        "bucket",
        F.col("new_keys").cast("long").alias("new_keys"),
        F.sum("new_keys").over(w).cast("long").alias("cum_keys"),
    )


def new_vs_returning(
    df: DataFrame,
    time_col: str,
    key_col: str,
    step: str = "1 day",
) -> DataFrame:
    """Per-bucket active/new/returning key split — the growth-vs-
    retention lens on the same first-touch linearization as
    :func:`cumulative_first_seen`: a key is NEW in its min bucket and
    RETURNING in every later bucket it appears in.

    Two shuffles total: distinct (key, bucket), then the per-key min
    joins back CO-PARTITIONED on the key (no extra exchange of the big
    side); the final census reduces map-side onto the bucket grid.

    Returns (bucket, n_active, n_new, n_returning).
    """
    step_us = int(_gap_seconds(step) * 1_000_000)
    kb = (
        df.select(
            F.col(key_col).alias("_k"),
            F.floor(F.unix_micros(F.col(time_col)) / F.lit(step_us)).alias(
                "bucket"
            ),
        )
        .distinct()
    )
    first = kb.groupBy("_k").agg(F.min("bucket").alias("_first"))
    return (
        kb.join(first, "_k")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_active"),
            F.sum((F.col("bucket") == F.col("_first")).cast("long")).alias(
                "n_new"
            ),
            F.sum((F.col("bucket") > F.col("_first")).cast("long")).alias(
                "n_returning"
            ),
        )
    )


def growth_accounting(
    df: DataFrame,
    time_col: str,
    key_col: str,
    step: str = "1 day",
    resurrect_after: int = 7,
) -> DataFrame:
    """Growth-accounting census (the new / retained / resurrected
    decomposition every growth dashboard runs on MAU/DAU): for each
    bucket, every active key is exactly one of

        new         — first bucket the key ever appeared in,
        retained    — last appearance within ``resurrect_after`` buckets,
        resurrected — came back after > ``resurrect_after`` buckets away.

    The whole classification is ONE window: distinct (key, bucket), a
    per-key lag over the key's own (skew-bounded) appearance sequence,
    then a map-side-combinable census onto the bucket grid — no
    self-join of activity against history.

    Returns (bucket, n_active, n_new, n_retained, n_resurrected).
    """
    if resurrect_after < 1:
        raise ValueError(
            f"resurrect_after must be >= 1, got {resurrect_after}"
        )
    step_us = int(_gap_seconds(step) * 1_000_000)
    kb = (
        df.select(
            F.col(key_col).alias("_k"),
            F.floor(F.unix_micros(F.col(time_col)) / F.lit(step_us)).alias(
                "bucket"
            ),
        )
        .distinct()
    )
    w = W.partitionBy("_k").orderBy("bucket")
    gap = F.col("bucket") - F.lag("bucket", 1).over(w)
    classified = kb.select(
        "bucket",
        F.when(gap.isNull(), "new")
        .when(gap <= resurrect_after, "retained")
        .otherwise("resurrected")
        .alias("_cls"),
    )
    return classified.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum((F.col("_cls") == "new").cast("long")).alias("n_new"),
        F.sum((F.col("_cls") == "retained").cast("long")).alias("n_retained"),
        F.sum((F.col("_cls") == "resurrected").cast("long")).alias(
            "n_resurrected"
        ),
    )


def ltv_cohort_curve(
    df: DataFrame,
    key_col: str,
    date_col: str,
    amount_col: str,
) -> DataFrame:
    """Cohort LTV triangle: customers grouped by first-purchase month,
    revenue accumulated by month-age — the "how much is a cohort worth
    by month N" curve finance builds payback models on (the revenue
    twin of retention_cohorts' activity counts).

    Month arithmetic is engine-portable integers: month_num = 12·year +
    (month − 1) from the DATE (no tz, no epoch division). Plan: one
    shuffle keys customers (first-month aggregation), the fact rows
    join back co-partitioned on the key, reduce to the (cohort, age)
    grid map-side, and the cumulative window runs over that tiny grid.
    Revenue stays exact micro-unit BIGINT end to end.

    Returns (cohort_month, age_months, n_customers, rev_micro,
    cum_rev_micro): ``n_customers`` is the cohort's size (constant
    across its ages — the LTV denominator).
    """
    d = F.col(date_col).cast("date")
    mnum = (F.year(d) * 12 + F.month(d) - 1).cast("long")
    vm = F.round(F.col(amount_col) * _MICROS).cast("long")
    facts = df.select(
        F.col(key_col).alias("_k"), mnum.alias("_m"), vm.alias("_vm")
    )
    first = facts.groupBy("_k").agg(F.min("_m").alias("cohort_month"))
    sizes = first.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    grid = (
        facts.join(first, "_k")
        .groupBy(
            "cohort_month",
            (F.col("_m") - F.col("cohort_month")).alias("age_months"),
        )
        .agg(F.sum("_vm").alias("rev_micro"))
    )
    w = W.partitionBy("cohort_month").orderBy("age_months").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        grid.join(F.broadcast(sizes), "cohort_month")
        .select(
            "cohort_month",
            "age_months",
            F.col("n_customers").cast("long").alias("n_customers"),
            F.col("rev_micro").cast("long").alias("rev_micro"),
            F.sum("rev_micro").over(w).cast("long").alias("cum_rev_micro"),
        )
    )


def seasonal_decompose(
    df: DataFrame,
    time_col: str,
    value_col: str,
    step: str = "1 day",
    period: int = 7,
    trend_window: int = 3,
) -> DataFrame:
    """Additive seasonal decomposition of the bucketed total series —
    x_t = trend + seasonal + residual, the classical-decomposition
    shape (moving-average trend, per-phase seasonal means) that answers
    "is this movement trend, weekday effect, or actually anomalous?"
    before any forecast or alert fires.

    Exact integer discipline end to end (truncating div, identical in
    Spark `div` and DuckDB `//`):

        trend_t    = Σ x_{t-w..t+w} div count        (ragged edges use
                                                      available buckets)
        seasonal_p = Σ_t∈phase (x_t − trend_t) div count(phase)
        residual_t = x_t − trend_t − seasonal_p

    Plan: one bucketize shuffle builds the micro-sum series; every
    window/aggregate after runs on the BUCKET-SIZED relation (the
    ks/acf contract — the ordered window over buckets is values-sized,
    never rows-sized). Seasonal phase = bucket % period, identical
    integer arithmetic in both engines (buckets are non-negative epoch
    steps).

    Returns (bucket, phase, x_micro, trend_micro, seasonal_micro,
    residual_micro).
    """
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    if trend_window < 1:
        raise ValueError(f"trend_window must be >= 1, got {trend_window}")
    daily = bucketize(df, time_col, [], value_col, step=step).select(
        F.col("_bucket").alias("bucket"), F.col("_v_micros").alias("_x")
    )
    trended = daily.select(
        "bucket",
        "_x",
        F.expr(
            f"sum(_x) OVER (ORDER BY bucket ROWS BETWEEN {trend_window} "
            f"PRECEDING AND {trend_window} FOLLOWING) div "
            f"count(1) OVER (ORDER BY bucket ROWS BETWEEN {trend_window} "
            f"PRECEDING AND {trend_window} FOLLOWING)"
        ).alias("_trend"),
    )
    phase = (F.col("bucket") % period).cast("int")
    det = trended.select(
        "bucket", "_x", "_trend", phase.alias("phase"),
        (F.col("_x") - F.col("_trend")).alias("_det"),
    )
    return det.select(
        "bucket",
        "phase",
        F.col("_x").alias("x_micro"),
        F.col("_trend").alias("trend_micro"),
        F.expr(
            "sum(_det) OVER (PARTITION BY phase) div "
            "count(1) OVER (PARTITION BY phase)"
        ).alias("seasonal_micro"),
        (
            F.col("_x") - F.col("_trend")
            - F.expr(
                "sum(_det) OVER (PARTITION BY phase) div "
                "count(1) OVER (PARTITION BY phase)"
            )
        ).alias("residual_micro"),
    )


def dispersion_index(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    value_col: str,
    step: str = "1 day",
) -> DataFrame:
    """Per-key variance-to-mean ratio (Fano factor) of the bucketed
    EVENT COUNTS — the overdispersion screen run before any Poisson
    assumption ("are arrivals bursty or Poisson-like?"; VMR ≈ 1 is
    Poisson, ≫ 1 is clumped, < 1 is regular).

    Only OBSERVED buckets enter the census (the bucketize contract —
    gapfill upstream if silent periods should count as zeros). Per key:
    n buckets, Σc, Σc² accumulate as exact DECIMAL(38,0) integers in
    one map-side-combinable pass over the bucket relation; mean,
    sample variance and VMR are each one cast + one IEEE divide
    (try_divide — single-bucket or zero-mean keys report NULL),
    hash-stable at round 6.

    Returns (keys..., n_buckets, n_events, mean, var, vmr).
    """
    b = bucketize(df, time_col, keys, value_col, step=step)
    c = F.col("n_events").cast(_D38)
    agg = b.groupBy(*keys).agg(
        F.count(F.lit(1)).cast(_D38).alias("_nb"),
        F.sum(c).alias("_s"),
        F.sum(c * c).alias("_q"),
    )
    nb = F.col("_nb")
    mean = F.try_divide(F.col("_s").cast("double"), nb.cast("double"))
    var = F.try_divide(
        (nb * F.col("_q") - F.col("_s") * F.col("_s")).cast("double"),
        (nb * (nb - 1)).cast("double"),
    )
    return agg.select(
        *keys,
        nb.cast("long").alias("n_buckets"),
        F.col("_s").cast("long").alias("n_events"),
        F.round(mean, 6).alias("mean"),
        F.round(var, 6).alias("var"),
        F.round(F.try_divide(var, mean), 6).alias("vmr"),
    )


def seasonal_strength(
    df: DataFrame,
    time_col: str,
    value_col: str,
    step: str = "1 day",
    period: int = 7,
    trend_window: int = 3,
) -> DataFrame:
    """Trend/seasonality strength of the bucketed total series — the
    Hyndman F-statistics over the :func:`seasonal_decompose` components:

        F_trend    = max(0, 1 − Var(resid)/Var(trend + resid))
        F_seasonal = max(0, 1 − Var(resid)/Var(seasonal + resid))

    Both variance ratios use UNNORMALIZED variance numerators
    n·Σx² − (Σx)² (the shared n cancels in the ratio), accumulated as
    exact DECIMAL(38,0) integers over the decomposition's micro-unit
    components (trend+resid = x − seasonal and seasonal+resid = x −
    trend are exact integer subtractions) — so the only doubles are one
    cast per numerator and the final divide, hash-stable at round 6.
    Plan: the decompose's bucket-sized relation feeds one more
    aggregation; nothing rows-sized is touched again. A flat series
    (zero Var(s+r)) reports NULL for that strength — guarded on the
    EXACT integer numerator, never greatest()-over-NULL (whose NULL
    handling differs between engines).

    Returns one row (n_buckets, strength_trend, strength_seasonal).
    """
    dec = seasonal_decompose(
        df, time_col, value_col, step=step, period=period,
        trend_window=trend_window,
    )
    r = F.col("residual_micro").cast(_D38)
    sr = (F.col("x_micro") - F.col("trend_micro")).cast(_D38)
    tr = (F.col("x_micro") - F.col("seasonal_micro")).cast(_D38)
    agg = dec.agg(
        F.count(F.lit(1)).cast(_D38).alias("_n"),
        F.sum(r).alias("_sr"), F.sum(r * r).alias("_qr"),
        F.sum(sr).alias("_ss"), F.sum(sr * sr).alias("_qs"),
        F.sum(tr).alias("_st"), F.sum(tr * tr).alias("_qt"),
    )
    n = F.col("_n")

    def vnum_exact(s_col, q_col):
        return n * F.col(q_col) - F.col(s_col) * F.col(s_col)

    def strength(den_s, den_q):
        den = vnum_exact(den_s, den_q)
        return F.when(
            den > 0,
            F.round(
                F.greatest(
                    F.lit(0.0),
                    1.0
                    - vnum_exact("_sr", "_qr").cast("double")
                    / den.cast("double"),
                ),
                6,
            ),
        )

    return agg.select(
        n.cast("long").alias("n_buckets"),
        strength("_st", "_qt").alias("strength_trend"),
        strength("_ss", "_qs").alias("strength_seasonal"),
    )


def changepoint_mean_shift(
    df: DataFrame,
    time_col: str,
    value_col: str,
    step: str = "1 day",
) -> DataFrame:
    """Single mean-shift changepoint over the bucketed total series —
    the first split of binary segmentation: choose the split k that
    maximizes the between-segment sum-of-squares reduction

        R(k) = S_k²/k + (S_n − S_k)²/(n − k) − S_n²/n

    (equivalently, the k minimizing the two-segment SSE). Prefix sums
    S_k are exact micro-unit DECIMAL(38,0) integers from one cumulative
    window over the BUCKET-sized relation (values-sized, never
    rows-sized); each candidate k costs three IEEE divides of single
    casts, and the argmax takes the ordered-limit form (reduction DESC,
    bucket ASC — the deterministic tie-break) so both engines pick the
    identical split. Degenerate series (n < 2) return zero rows.

    Returns one row (split_bucket — the LAST bucket of the left
    segment, n_buckets, mean_left, mean_right, reduction), means in
    human units, reduction in human² units (micro²/10¹²), round 6.
    """
    daily = bucketize(df, time_col, [], value_col, step=step).select(
        F.col("_bucket").alias("_t"), F.col("_v_micros").cast(_D38).alias("_x")
    )
    w = W.orderBy("_t").rowsBetween(W.unboundedPreceding, W.currentRow)
    tot = W.partitionBy()
    pre = daily.select(
        "_t",
        F.count(F.lit(1)).over(w).cast(_D38).alias("_k"),
        F.sum("_x").over(w).alias("_sk"),
        F.count(F.lit(1)).over(tot).cast(_D38).alias("_n"),
        F.sum("_x").over(tot).alias("_sn"),
    ).filter(F.col("_k") < F.col("_n"))
    k, n = F.col("_k"), F.col("_n")
    sk, sn = F.col("_sk"), F.col("_sn")
    red = (
        F.try_divide((sk * sk).cast("double"), k.cast("double"))
        + F.try_divide(
            ((sn - sk) * (sn - sk)).cast("double"), (n - k).cast("double")
        )
        - F.try_divide((sn * sn).cast("double"), n.cast("double"))
    )
    scored = pre.select(
        "_t",
        n.cast("long").alias("n_buckets"),
        F.round(
            F.try_divide(sk.cast("double"), k.cast("double")) / 1e6, 6
        ).alias("mean_left"),
        F.round(
            F.try_divide((sn - sk).cast("double"), (n - k).cast("double"))
            / 1e6,
            6,
        ).alias("mean_right"),
        red.alias("_red"),
    )
    return (
        scored.orderBy(F.col("_red").desc(), F.col("_t"))
        .limit(1)
        .select(
            F.col("_t").alias("split_bucket"),
            "n_buckets",
            "mean_left",
            "mean_right",
            F.round(F.col("_red") / 1e12, 6).alias("reduction"),
        )
    )


def revenue_bridge(
    df: DataFrame,
    keys: list[str],
    period_col: str,
    price_col: str,
    qty_col: str,
    period_a,
    period_b,
) -> DataFrame:
    """Price/volume revenue bridge between two periods, per segment —
    the BI decomposition behind every "why did revenue move?" slide:

        drev = dp*q0  +  dq*p0  +  dp*dq
               (price)   (volume)  (joint residual)

    with p = revenue/quantity (the period's realized unit price) and q
    the period's total quantity. Revenue and quantity accumulate as
    exact micro-unit DECIMAL(38,0) integers in ONE pass (rev =
    sum(price*qty) in micro-squared units, the per-row product formed
    in DECIMAL); p and the three effects are one IEEE sequence each,
    hash-stable at round 6. The three effects sum to drev exactly in
    real arithmetic (a free reconciliation invariant). Segments missing
    either period report NULL effects (a bridge needs both endpoints).
    Returns (keys..., rev_a, rev_b, delta_rev, price_effect,
    volume_effect, joint_effect).
    """
    p = F.col(period_col)
    pm = F.round(F.col(price_col) * 1_000_000).cast("long").cast(_D38)
    qm = F.round(F.col(qty_col) * 1_000_000).cast("long").cast(_D38)
    base = df.filter(
        p.isin([period_a, period_b])
        & F.col(price_col).isNotNull()
        & F.col(qty_col).isNotNull()
    )
    agg = base.groupBy(*keys).agg(
        *[
            a
            for tag, per in (("a", period_a), ("b", period_b))
            for a in (
                F.sum(F.when(p == per, qm).otherwise(F.lit(0).cast(_D38)))
                .alias(f"_q{tag}"),
                F.sum(
                    F.when(p == per, pm * qm).otherwise(F.lit(0).cast(_D38))
                ).alias(f"_r{tag}"),
                F.sum(F.when(p == per, 1).otherwise(0)).alias(f"_n{tag}"),
            )
        ]
    )
    # rev in value units (micro-squared -> /1e12); q in units (/1e6)
    ra = F.col("_ra").cast("double") / 1e12
    rb = F.col("_rb").cast("double") / 1e12
    qa = F.col("_qa").cast("double") / 1e6
    qb = F.col("_qb").cast("double") / 1e6
    pa = F.try_divide(ra, qa)
    pb = F.try_divide(rb, qb)
    both = (F.col("_na") > 0) & (F.col("_nb") > 0)
    price_eff = F.when(both, (pb - pa) * qa)
    vol_eff = F.when(both, (qb - qa) * pa)
    joint_eff = F.when(both, (pb - pa) * (qb - qa))
    return agg.select(
        *keys,
        F.round(ra, 6).alias("rev_a"),
        F.round(rb, 6).alias("rev_b"),
        F.round(rb - ra, 6).alias("delta_rev"),
        F.round(price_eff, 6).alias("price_effect"),
        F.round(vol_eff, 6).alias("volume_effect"),
        F.round(joint_eff, 6).alias("joint_effect"),
    )


def durbin_watson(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
) -> DataFrame:
    """Durbin–Watson statistic per key series — the lag-1
    autocorrelation diagnostic (≈2 none, →0 positive, →4 negative)
    over the mean-centered series:

        DW = Σ_{t≥2}(e_t − e_{t−1})² / Σ e_t²,   e = v − v̄

    The mean CANCELS in the numerator's differences, so with values
    micro-quantized both moments are exact integers — numerator from
    one lag window per key (Σd², d = v_t − v_{t−1}), denominator from
    the exact-moment identity n·Σv² − (Σv)² — and DW is one divide:

        DW = n·Σd² / (n·Σv² − (Σv)²)

    Per-key windows only (the series per key must fit a partition —
    the ACF/seasonal contract shared by every operator here).
    Constant series (zero variance) and n < 2 report NULL. Returns
    (keys..., n, dw).
    """
    vm = F.round(F.col(value_col) * 1_000_000).cast("long").cast(_D38)
    wk = W.partitionBy(*key_cols).orderBy(order_col)
    staged = df.filter(F.col(value_col).isNotNull()).select(
        *key_cols,
        vm.alias("_v"),
        (vm - F.lag(vm, 1).over(wk)).alias("_d"),
    )
    m = staged.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast(_D38).alias("_n"),
        F.sum("_v").alias("_s"),
        F.sum(F.col("_v") * F.col("_v")).alias("_q"),
        F.sum(F.col("_d") * F.col("_d")).alias("_sd2"),
    )
    n = F.col("_n")
    den = n * F.col("_q") - F.col("_s") * F.col("_s")
    dw = F.when(
        (n > 1) & (den > 0),
        (n * F.col("_sd2")).cast("double") / den.cast("double"),
    )
    return m.select(
        *key_cols,
        n.cast("long").alias("n"),
        F.round(dw, 6).alias("dw"),
    )
