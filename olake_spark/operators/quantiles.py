"""Exact distributed order statistics — iterative histogram bisection,
no global sort, no per-group sort buffer.

Spark's own exact ``percentile`` aggregate materializes every group's
values in an executor buffer (OOM at 100 TB groups) and
``approx_percentile`` is, by contract, approximate. The scale-correct
exact path is the classic selection-by-bisection: the k-th order
statistic of a bounded integer domain is found by repeatedly
histogramming the candidate range into B bins and descending into the
bin that contains rank k — log_B(domain) passes, each a map-side
combinable aggregation, never a shuffle of raw rows, never a sort.

Shape per round (all (group, p) searches advance TOGETHER in one job):
  data ⋈ broadcast(states) on group → filter v ∈ [lo, hi] (plus a
  LITERAL global bound derived on the driver, so parquet min/max row
  groups prune) → bin = (v − lo)·B/(hi − lo + 1) → count by
  (group, p, bin) → collect ≤ |states|·B tiny rows → narrow each state.

Values are exact round(v·10^6) BIGINT micro-units, so ranks and ties
are well-defined and the result is bit-equal to the oracle's
row_number-at-rank-k. NULL values are excluded (SQL order-statistic
semantics). Driver state is |groups|·|ps| rows — the operator targets
FEW groups over HUGE data (the window/row_number path covers the
many-tiny-groups regime instead).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["exact_quantiles", "winsorized_stats", "weighted_median"]

MICROS = 1_000_000


def exact_quantiles(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    ps: list[float],
    bins: int = 1024,
    max_rounds: int = 12,
) -> DataFrame:
    """Exact per-group quantiles of ``value_col`` at probabilities ``ps``.

    Returns (keys..., p, q, q_micros): ``q_micros`` is the EXACT
    micro-unit BIGINT order statistic at 1-indexed rank ``ceil(p·n)`` of
    the group's non-null values; ``q`` = round(q_micros/10^6, 4) is the
    human-readable double (lossy past 4 decimals — downstream exact
    arithmetic must use ``q_micros``, mirroring view_finalize's
    late-divide pattern). Group keys must be non-null (filter/bucket
    NULLs upstream).

    Each bisection round aggregates per-bin (count, min, max); the
    narrowed bounds are the ACTUAL min/max inside the chosen bin, not
    its arithmetic boundaries — sparse or clustered domains collapse in
    one round instead of log_B(domain) rounds, and a single-value bin
    closes the search immediately.
    """
    spark: SparkSession = df.sparkSession
    v = F.round(F.col(value_col) * MICROS).cast("long")
    base = df.select(*keys, v.alias("_vm")).filter(F.col("_vm").isNotNull())

    seed = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("_vm").alias("_lo"),
        F.max("_vm").alias("_hi"),
    )
    # states: one (group, p) search — tiny by contract (few groups)
    states = []
    for row in seed.collect():
        key_vals = tuple(row[k] for k in keys)
        for p in ps:
            k_rank = max(1, math.ceil(p * row["_n"]))
            states.append([*key_vals, float(p), int(k_rank), row["_lo"], row["_hi"]])

    state_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in seed.select(*keys).schema.fields
    )
    for rnd in range(max_rounds):
        open_states = [s for s in states if s[-2] < s[-1]]
        if not open_states:
            break
        glo = min(s[-2] for s in open_states)
        ghi = max(s[-1] for s in open_states)
        scoped = base.filter(F.col("_vm").between(F.lit(glo), F.lit(ghi)))
        if len(open_states) <= 64:
            # few-states fast path (the operator's contract regime): inline
            # the search bounds as a literal CASE → array<struct> and
            # explode — pure whole-stage codegen, no per-round broadcast
            # exchange or createDataFrame job
            by_group: dict[tuple, list] = {}
            for s in open_states:
                by_group.setdefault(tuple(s[: len(keys)]), []).append(s)
            branch = None
            for gk, group_states in by_group.items():
                cond = None
                for k, kv in zip(keys, gk):
                    c = F.col(k) == F.lit(kv)
                    cond = c if cond is None else cond & c
                arr = F.array(
                    *[
                        F.struct(
                            F.lit(float(s[len(keys)])).alias("p"),
                            F.lit(int(s[-2])).alias("lo"),
                            F.lit(int(s[-1])).alias("hi"),
                        )
                        for s in group_states
                    ]
                )
                branch = (
                    F.when(cond, arr) if branch is None else branch.when(cond, arr)
                )
            matched = (
                scoped.withColumn("_st", F.explode(branch))
                .filter(F.col("_vm").between(F.col("_st.lo"), F.col("_st.hi")))
                .select(
                    *keys,
                    F.col("_st.p").alias("p"),
                    "_vm",
                    F.col("_st.lo").alias("_lo"),
                    F.col("_st.hi").alias("_hi"),
                )
            )
        else:
            sdf = spark.createDataFrame(
                open_states, f"{state_schema}, p double, k long, lo long, hi long"
            )
            matched = (
                scoped.join(F.broadcast(sdf), keys)
                .filter(F.col("_vm").between(F.col("lo"), F.col("hi")))
                .select(
                    *keys,
                    "p",
                    "_vm",
                    F.col("lo").alias("_lo"),
                    F.col("hi").alias("_hi"),
                )
            )
        binned = (
            matched.select(
                *keys,
                "p",
                "_vm",
                # integer div, NOT /: double division could misplace a
                # boundary value into the neighboring bin, breaking the
                # driver's exact inverse bin-bound arithmetic
                F.expr(f"((_vm - _lo) * {bins}) div (_hi - _lo + 1)").alias("_bin"),
            )
            .groupBy(*keys, "p", "_bin")
            .agg(
                F.count(F.lit(1)).alias("_c"),
                F.min("_vm").alias("_bmin"),
                F.max("_vm").alias("_bmax"),
            )
        )
        hist: dict[tuple, dict[int, tuple[int, int, int]]] = {}
        for r in binned.collect():
            hist.setdefault(tuple(r[c] for c in keys) + (r["p"],), {})[
                r["_bin"]
            ] = (r["_c"], r["_bmin"], r["_bmax"])
        for s in states:
            sk, k_rank, lo, hi = tuple(s[: len(keys)]) + (s[len(keys)],), s[-3], s[-2], s[-1]
            if lo >= hi:
                continue
            acc = 0
            for b in range(bins):
                c, bmin, bmax = hist.get(sk, {}).get(b, (0, None, None))
                if acc + c >= k_rank:
                    # narrow to the values ACTUALLY present in the bin —
                    # exact (the rank-k value is one of them) and far
                    # tighter than the arithmetic bin boundaries
                    s[-3] = k_rank - acc
                    s[-2] = bmin
                    s[-1] = bmax
                    break
                acc += c
    bad = [s for s in states if s[-2] < s[-1]]
    if bad:
        raise RuntimeError(
            f"exact_quantiles: {len(bad)} searches unconverged after "
            f"{max_rounds} rounds — raise max_rounds or bins"
        )
    out = [
        [*s[: len(keys)], s[len(keys)], round(s[-2] / MICROS, 4), int(s[-2])]
        for s in states
    ]
    return spark.createDataFrame(
        out, f"{state_schema}, p double, q double, q_micros long"
    )


def winsorized_stats(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    p_lo: float = 0.05,
    p_hi: float = 0.95,
    bins: int = 1024,
) -> DataFrame:
    """Per-group winsorized mean and population stddev: values below the
    exact p_lo order statistic (rank ceil(p·n)) clamp up to it, values
    above the p_hi one clamp down — the robust-mean recipe that, unlike
    trimming, keeps n stable and unlike a raw mean is immune to fat
    tails (price glitches, refund spikes).

    Both cutoffs come from :func:`exact_quantiles` (histogram-bisection
    order statistics — never a per-group sort), broadcast back onto the
    fact rows, and the clamped micro-unit values fold through ONE
    map-side-combinable aggregation of exact DECIMAL(38,0) sums; the
    mean/sd divide-and-sqrt happens once at the end (round 6). The
    few-groups driver-state contract of exact_quantiles applies.

    Returns (keys..., n, n_clipped_lo, n_clipped_hi, win_mean, win_sd).
    """
    if not 0.0 < p_lo < p_hi < 1.0:
        raise ValueError(f"need 0 < p_lo < p_hi < 1, got {p_lo}, {p_hi}")
    qs = exact_quantiles(df, keys, value_col, [p_lo, p_hi], bins=bins)
    cuts = qs.groupBy(*keys).agg(
        F.max(F.when(F.col("p") == p_lo, F.col("q_micros"))).alias("_qlo"),
        F.max(F.when(F.col("p") == p_hi, F.col("q_micros"))).alias("_qhi"),
    )
    vm = F.round(F.col(value_col) * MICROS).cast("long")
    base = df.select(*keys, vm.alias("_vm")).filter(F.col("_vm").isNotNull())
    j = base.join(F.broadcast(cuts), keys)
    w = F.greatest(
        F.col("_qlo"), F.least(F.col("_qhi"), F.col("_vm"))
    ).cast("decimal(38,0)")
    agg = j.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("_vm") < F.col("_qlo")).cast("long")).alias("n_clipped_lo"),
        F.sum((F.col("_vm") > F.col("_qhi")).cast("long")).alias("n_clipped_hi"),
        F.sum(w).alias("_s"),
        F.sum(w * w).alias("_q"),
    )
    n_d38 = F.col("n").cast("decimal(38,0)")
    mean = F.col("_s").cast("double") / (F.col("n").cast("double") * float(MICROS))
    # population sd in value units: sqrt(n·Σw² − (Σw)²) / (n · 10^6)
    sd = F.sqrt((n_d38 * F.col("_q") - F.col("_s") * F.col("_s")).cast("double")) / (
        F.col("n").cast("double") * float(MICROS)
    )
    return agg.select(
        *keys,
        "n",
        "n_clipped_lo",
        "n_clipped_hi",
        F.round(mean, 6).alias("win_mean"),
        F.round(sd, 6).alias("win_sd"),
    )


def weighted_median(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-group weighted median: the smallest value whose cumulative
    weight reaches half the group's total — "the price at which half
    the QUANTITY trades", which an unweighted median misstates whenever
    weight correlates with value.

    Lower-weighted-median semantics pinned exactly: with W = Σw and
    cum(v) = Σ_{x≤v} w, the median is min{v : 2·cum(v) ≥ W} — all
    integer comparisons (weights quantized to micro-units), no ½·W
    float. Plan: one map-side-combinable shuffle onto (keys, value),
    then the cumulative window runs over the per-group DISTINCT-VALUE
    relation (values-sized); the winner is a min_by over that relation.
    Never a per-group sort of raw rows.

    Returns (keys..., w_total_micro, wmedian_micro, wmedian).
    """
    vm = F.round(F.col(value_col) * MICROS).cast("long")
    wm = F.round(F.col(weight_col) * MICROS).cast("long")
    per_val = (
        df.select(*keys, vm.alias("_vm"), wm.alias("_wm"))
        .filter(F.col("_vm").isNotNull() & F.col("_wm").isNotNull())
        .groupBy(*keys, "_vm")
        .agg(F.sum("_wm").cast("decimal(38,0)").alias("_w"))
    )
    wcum = W.partitionBy(*keys).orderBy("_vm").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    wall = W.partitionBy(*keys).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    cum = per_val.select(
        *keys,
        "_vm",
        F.sum("_w").over(wcum).alias("_cum"),
        F.sum("_w").over(wall).alias("_wtot"),
    )
    hit = cum.filter(F.lit(2) * F.col("_cum") >= F.col("_wtot"))
    return hit.groupBy(*keys).agg(
        F.first(F.col("_wtot")).cast("long").alias("w_total_micro"),
        F.min("_vm").alias("wmedian_micro"),
        F.round(F.min("_vm") / 1_000_000.0, 4).alias("wmedian"),
    )
