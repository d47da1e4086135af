"""ML feature engineering: leakage-safe target encoding and per-key lag
feature matrices.

Both operators keep the repo's exactness discipline — targets and values
move as round(v * 10^6) BIGINT micro-units, encodings are exact integer
floor divisions — so results are partition-order-free and hash-identical
to the SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    "target_encode_loo", "lag_features", "rfm_segments", "psi_drift",
    "quantile_normalize",
]

_MICROS = 1_000_000


def target_encode_loo(
    df: DataFrame,
    category_col: str,
    target_col: str,
) -> DataFrame:
    """Leave-one-out target encoding: each row's encoding is the mean
    target of its category EXCLUDING the row itself — the standard
    leakage guard (a plain category mean lets every row see its own
    label; LOO is what production feature stores ship for train-time
    encodings). Singleton categories (no peers to average) fall back to
    the global leave-one-out mean.

    Exact arithmetic: te_micro = (sum_micro - own_micro) div (cnt - 1)
    over BIGINT micro-units — iterated floor division, deterministic in
    any engine.

    Scale shape: the per-category (sum, cnt) relation is categorical-
    tiny and BROADCASTS onto the fact rows; the global (sum, cnt) is a
    1-row broadcast. The fact table never shuffles and never meets a
    window — the plan is scan -> two broadcast joins -> project, which
    survives any fact-table size (a partitionBy(category) window would
    shuffle everything and serialize on hot categories).

    NULL handling: rows with a NULL target are excluded from BOTH the
    leave-one-out sums and the peer counts (the encoding is the mean of
    the non-null peers; a count(*) denominator would silently dilute
    it), and their own te_micro is NULL. Rows with a NULL category drop
    out of the output entirely (equi-join semantics in every engine) —
    impute a sentinel category upstream if they matter.
    """
    own = F.round(F.col(target_col) * _MICROS).cast("long")
    facts = df.withColumn("_own", own)
    cat = facts.groupBy(category_col).agg(
        F.sum("_own").alias("_csum"), F.count("_own").alias("_ccnt")
    )
    glob = facts.groupBy().agg(
        F.sum("_own").alias("_gsum"), F.count("_own").alias("_gcnt")
    )
    num = F.when(
        F.col("_ccnt") > 1, F.col("_csum") - F.col("_own")
    ).otherwise(F.col("_gsum") - F.col("_own"))
    den = F.when(F.col("_ccnt") > 1, F.col("_ccnt") - 1).otherwise(
        F.col("_gcnt") - 1
    )
    # exact BIGINT floor division (num >= 0 by construction for
    # non-negative targets; negative targets floor toward -inf in both
    # engines via the subtract-pmod identity). den == 0 (the table's only
    # non-null target asking for a leave-one-out mean of nobody) yields
    # NULL, never an ANSI division error.
    te = F.when(
        den > 0,
        (
            (num - F.pmod(num, den)).cast("decimal(38,0)")
            / den.cast("decimal(38,0)")
        ).cast("long"),
    )
    return (
        facts.join(F.broadcast(cat), category_col)
        .join(F.broadcast(glob))
        .withColumn("te_micro", te)
        .drop("_own", "_csum", "_ccnt", "_gsum", "_gcnt")
    )


def lag_features(
    df: DataFrame,
    keys: list[str],
    time_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key lag/rolling feature matrix — the classic time-series
    training-row builder: for every event, the previous two values, the
    rolling sum/count of the preceding three, and the gap to the
    previous event. All exact BIGINT micro-units; NULL where history is
    short (the model pipeline imputes downstream, the feature builder
    must not invent values).

    One hash shuffle on the keys; every feature is a window over the
    SAME (keys, order) spec, so Catalyst plans a single exchange + one
    sort feeding all the window functions. Per-key cost is linear in
    the key's own rows — skew bounded by the hottest key.

    ``time_col`` must be non-null (engines disagree on NULL placement
    in ORDER BY, so a NULL timestamp would reorder the lag sequence
    cross-engine); NULL values are fine — they ride the windows as
    NULLs and the rolling count simply skips them (F.sum ignores NULL,
    roll3_n counts ROWS in the frame, both mirrored by the oracle).
    """
    order_cols = list(order_cols or [])
    us = F.unix_micros(F.col(time_col))
    vm = F.round(F.col(value_col) * _MICROS).cast("long")
    w = W.partitionBy(*keys).orderBy(
        F.col("_us"), *[F.col(c) for c in order_cols]
    )
    roll = w.rowsBetween(-3, -1)
    return (
        df.withColumn("_us", us)
        .withColumn("v_micro", vm)
        .select(
            *keys,
            *order_cols,
            F.col("_us").alias("ts_us"),
            "v_micro",
            F.lag("v_micro", 1).over(w).alias("lag1_micro"),
            F.lag("v_micro", 2).over(w).alias("lag2_micro"),
            F.sum("v_micro").over(roll).alias("roll3_sum_micro"),
            F.count(F.lit(1)).over(roll).cast("long").alias("roll3_n"),
            (F.col("_us") - F.lag("_us", 1).over(w)).alias("dt_us"),
        )
    )


def rfm_segments(
    df: DataFrame,
    customer_col: str,
    date_col: str,
    amount_col: str,
    n_tiles: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation: each
    customer scores 1..n_tiles on all three axes (n_tiles = most recent
    / most frequent / highest spend) and lands in a segment like 555;
    output is the per-segment census (n_customers, monetary_micro).

    The scores are EXACT SQL NTILE semantics — n rows split into tiles
    of size q=n//k (+1 for the first n%k tiles) — but computed WITHOUT
    the single-partition ORDER-BY-everything window NTILE implies:
    each axis ranks via operators/ids.dense_ids (range-partition +
    per-partition offsets, the distributed ROW_NUMBER), and the tile
    falls out of the rank by closed-form arithmetic with the 1-row
    customer count broadcast back. Three customer-dimension-sized
    passes; fact rows are touched once by the groupBy.

    Ties rank by (metric, customer id) — fully deterministic, the
    same total order an oracle's NTILE(... ORDER BY metric, id) uses.
    Requires n_customers >= n_tiles (fewer rows than tiles would make
    the later tiles empty; NTILE defines that case but no segmentation
    wants it — the q=0 division surfaces it as NULL scores).
    """
    from olake_spark.operators.ids import dense_ids

    # date-based day number: tz-free, works for TIMESTAMP and TIMESTAMP_NTZ
    day = F.datediff(
        F.col(date_col).cast("date"), F.lit("1970-01-01").cast("date")
    ).cast("long")
    per = df.groupBy(F.col(customer_col).alias("_cust")).agg(
        F.max(day).alias("_r_day"),
        F.count(F.lit(1)).alias("_freq"),
        F.sum(F.round(F.col(amount_col) * 1_000_000).cast("long")).alias("_mon"),
    )
    n_row = per.agg(F.count(F.lit(1)).alias("_n_cust"))
    scored = per
    for metric, s in [("_r_day", "r"), ("_freq", "f"), ("_mon", "m")]:
        scored = dense_ids(scored, [metric, "_cust"], id_col=f"_rid_{s}")
    scored = scored.crossJoin(F.broadcast(n_row))

    def _tile(rid_col: str):
        rid = F.col(rid_col)
        n = F.col("_n_cust")
        k = F.lit(n_tiles)
        q = F.floor(n / k)
        r = n % k
        big = r * (q + F.lit(1))
        return (
            F.when(rid <= big, F.floor((rid - 1) / (q + 1)) + 1)
            .otherwise(r + F.floor((rid - big - 1) / q) + 1)
            .cast("int")
        )

    seg = scored.select(
        (
            _tile("_rid_r") * 100 + _tile("_rid_f") * 10 + _tile("_rid_m")
        ).alias("segment"),
        F.col("_mon"),
    )
    return seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("_mon").alias("monetary_micro"),
    )


def psi_drift(
    df: DataFrame,
    value_col: str,
    is_current,
    lo: float,
    hi: float,
    nbins: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    population of ``value_col`` — the train/serve drift metric model
    monitors alert on (PSI < 0.1 stable, > 0.25 shifted).

    ``is_current`` is a boolean Column splitting the rows (False =
    reference period; rows where it evaluates NULL belong to neither
    population and are excluded); both populations bin through the SAME
    fixed
    equi-width grid (the profile.histogram expression, out-of-range
    clamped into the edge bins), so

        PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)

    with add-one (Laplace) smoothing p_i = (c_ref_i + 1)/(n_ref + B):
    an empty bin on either side contributes a finite, engine-identical
    term instead of ±∞ — and CRUCIALLY the full B-bin spine is
    materialized (range join + coalesce 0), because a zero-count bin
    absent from the groupBy output still carries smoothed mass (the
    chi-square zero-cell lesson).

    One pass over the rows (conditional counts, map-side combinable);
    everything after runs on the B-row bin relation — the totals are
    bins-sized window sums, never a fact-table reshuffle. Doubles
    appear only in the final p/q/ln step, the identical IEEE sequence
    in any engine (round 6).

    Returns (bin, n_ref, n_cur, psi_contrib, psi_total).
    """
    if nbins < 2:
        raise ValueError(f"nbins must be >= 2, got {nbins}")
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    v = F.col(value_col)
    span = float(hi) - float(lo)
    bin_expr = F.least(
        F.lit(nbins - 1),
        F.greatest(
            F.lit(0), F.floor((v - float(lo)) / span * nbins).cast("int")
        ),
    )
    # rows where the is_current predicate is NULL (e.g. a predicate over
    # a nullable column) belong to neither population — drop them rather
    # than silently counting them as reference rows.
    obs = (
        df.filter(v.isNotNull())
        .filter(is_current.isNotNull())
        .select(bin_expr.alias("bin"), is_current.alias("_cur"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("_cur"), 0).otherwise(1)).alias("n_ref"),
            F.sum(F.when(F.col("_cur"), 1).otherwise(0)).alias("n_cur"),
        )
    )
    spine = df.sparkSession.range(nbins).select(F.col("id").cast("int").alias("bin"))
    full = spine.join(obs, "bin", "left").select(
        "bin",
        F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
        F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
    )
    all_rows = W.partitionBy().rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    p = (F.col("n_ref") + 1).cast("double") / (
        F.sum("n_ref").over(all_rows) + nbins
    ).cast("double")
    q = (F.col("n_cur") + 1).cast("double") / (
        F.sum("n_cur").over(all_rows) + nbins
    ).cast("double")
    contrib = (p - q) * F.log(p / q)
    # each per-bin term is ONE identical IEEE sequence in any engine, but a
    # SUM of doubles is order-sensitive — so the total accumulates the
    # nano-floored integer terms (the chi2 floor-micro pattern): exact,
    # order-free, and bias-bounded by B·1e-9
    contrib_nano = F.floor(contrib * 1_000_000_000).cast("long")
    return full.select(
        "bin",
        F.col("n_ref").cast("long").alias("n_ref"),
        F.col("n_cur").cast("long").alias("n_cur"),
        F.round(contrib, 6).alias("psi_contrib"),
        F.round(
            F.sum(contrib_nano).over(all_rows) / 1_000_000_000.0, 6
        ).alias("psi_total"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Quantile normalization: map every group's value distribution onto
    the POOLED distribution — the batch-effect corrector (microarray
    normalization, cross-tenant score calibration, feature alignment
    across data sources). A value at quantile p within its group becomes
    the pooled order statistic at the same p; after it, every group has
    an identical distribution.

    Entirely exact integer arithmetic: within-group positions use
    DOUBLED average ranks (the Spearman machinery — per-group
    distinct-value cumulative windows, broadcast back), and the pooled
    target rank is the exact rational ceiling

        target = ceil(rank2 · N / (2 · n_g))
               = (rank2·N + 2·n_g − 1) div (2·n_g)

    so no float quantile can round differently across engines. The
    pooled order statistics come from operators/ids.dense_ids (the
    distributed ROW_NUMBER — ties get arbitrary ids but the VALUE at a
    rank is tie-invariant), and the final lookup is a plain equi-join
    on the rank — shuffle-bounded by the row count, never quadratic.

    Returns (group, v_micro, norm_micro): the original and the
    normalized micro-unit value per input row (NULL values drop).
    """
    from olake_spark.operators.ids import dense_ids

    vm = F.round(F.col(value_col) * _MICROS).cast("long")
    base = df.select(
        F.col(group_col).alias("group"), vm.alias("v_micro")
    ).filter(F.col("v_micro").isNotNull())

    # per-(group, value) rank2 map on the distinct-value relation
    per_val = base.groupBy("group", "v_micro").agg(
        F.count(F.lit(1)).alias("_t")
    )
    wg = W.partitionBy("group").orderBy("v_micro").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    rank_map = per_val.select(
        "group",
        "v_micro",
        (
            F.lit(2) * (F.sum("_t").over(wg) - F.col("_t"))
            + F.col("_t") + F.lit(1)
        ).alias("_rank2"),
        F.sum("_t").over(
            W.partitionBy("group").rowsBetween(
                W.unboundedPreceding, W.unboundedFollowing
            )
        ).alias("_ng"),
    )
    # the target rank depends only on (group, value) — compute it on the
    # VALUES relation (1-row total broadcast there, not onto the rows)
    totals = base.agg(F.count(F.lit(1)).cast("decimal(38,0)").alias("_n_total"))
    vm_map = rank_map.crossJoin(F.broadcast(totals))
    num = (
        F.col("_rank2").cast("decimal(38,0)") * F.col("_n_total")
        + F.lit(2) * F.col("_ng").cast("decimal(38,0)") - 1
    )
    den = (F.lit(2) * F.col("_ng")).cast("decimal(38,0)")
    target = (
        ((num - F.pmod(num, den)) / den).cast("long").alias("_target")
    )
    vm_map = vm_map.select("group", "v_micro", target)
    ranked = base.join(vm_map, ["group", "v_micro"])

    pooled = dense_ids(
        base.select(F.col("v_micro").alias("_pv")), ["_pv"], id_col="_prank"
    ).select(F.col("_prank").alias("_target"), F.col("_pv").alias("norm_micro"))
    return ranked.join(pooled, "_target").select(
        "group", "v_micro", "norm_micro"
    )
