"""Survival analysis: exact-integer Kaplan-Meier estimator.

The KM product-limit estimator S(t) = Π_{t_i <= t} (1 - d_i / n_i) is a
running product — inherently sequential over the ordered period relation,
the same shape as the EWMA recursion (operators/timeseries.ewma_last). The
repo-wide answer applies: fold the ordered sequence through the
``aggregate`` higher-order function in EXACT integer micro-units, so the
result is partition-order-free and bit-identical to the oracle's
``list_reduce`` over an identically ordered list.

Exactness contract: survival is iterated integer floor division,
    S_0 = 10^6;   S_i = (S_{i-1} * (n_i - d_i)) div n_i
losing < 10^-6 per period to the floor (documented, deterministic, and
identical in any engine — a float product is neither). The intermediate
S * (n - d) is at most 10^6 * n, so BIGINT holds it for any n below
~9 * 10^12 subjects per analysis.

Scale shape: subjects aggregate once (one hash shuffle on the subject
key); the per-period relation is tiny by construction (bounded by the
distinct duration grid — hours/days of the study span, NOT subjects), so
the ordered windows and prefix folds that follow run on a
few-hundred-row relation. Raw rows never see a global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["kaplan_meier", "logrank_test", "nelson_aalen"]


def kaplan_meier(
    subjects: DataFrame,
    duration_col: str,
    observed_col: str,
) -> DataFrame:
    """Kaplan-Meier survival curve over (duration, event-observed)
    subject rows: one output row per distinct duration with the number
    at risk, the event count, and the exact-integer product-limit
    survival estimate in micro-units.

    ``duration_col`` is an integral period index (hours/days since
    enrollment); ``observed_col`` is true when the terminal event was
    observed at that duration, false when the subject was censored
    there. Censored-only durations still appear as rows (d=0 keeps S
    unchanged exactly: (S * n) div n == S) and still deplete the
    at-risk count after their period, per standard KM convention.

    Plan: one map-side-combinable groupBy on duration (the only shuffle
    over subject rows if the caller pre-aggregated; otherwise the
    caller's subject agg shuffles once), then ordered windows + a
    prefix fold on the tiny period relation. The prefix arrays make the
    fold O(k^2) in the period count k — bounded by the duration grid,
    not by subjects.

    NULL durations are EXCLUDED (SQL order-statistic semantics, and the
    engines disagree on NULL placement in ORDER BY — Spark sorts NULLS
    FIRST ascending, most SQL engines NULLS LAST — so a NULL period
    would silently diverge cross-engine); filter or impute upstream if
    they carry meaning.
    """
    per = subjects.filter(F.col(duration_col).isNotNull()).groupBy(
        F.col(duration_col).alias("duration")
    ).agg(
        F.sum(
            F.when(F.col(observed_col), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    # at-risk: everyone whose duration has not yet elapsed. Single-
    # partition windows are safe HERE because `per` is the tiny period
    # relation, never subject rows.
    wall = W.partitionBy().orderBy("duration")
    n_at_risk = (
        F.sum("c").over(W.partitionBy())
        - F.coalesce(
            F.sum("c").over(
                wall.rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        )
    ).cast("long")
    staged = per.select(
        "duration",
        "d",
        n_at_risk.alias("n_at_risk"),
    )
    pre = F.collect_list(F.struct("n_at_risk", "d")).over(
        wall.rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # exact BIGINT floor division inside the lambda: (a - a % n) is
    # exactly divisible by n, and the DECIMAL division of an exact
    # multiple is the exact integer quotient (a bare long `/` would
    # detour through DOUBLE and lose exactness past 2^53)
    d38 = "decimal(38,0)"

    def _step(acc, x):
        a = acc * (x["n_at_risk"] - x["d"])
        return (
            (a - a % x["n_at_risk"]).cast(d38)
            / x["n_at_risk"].cast(d38)
        ).cast("long")

    # window expr materialized as a column first — a window function
    # nested inside a higher-order-function argument is not analyzable
    return staged.withColumn("_pre", pre).select(
        F.col("duration"),
        F.col("n_at_risk"),
        F.col("d").alias("n_events"),
        F.aggregate(
            F.col("_pre"), F.lit(1_000_000).cast("long"), _step
        ).alias("survival_micro"),
    )


def logrank_test(
    subjects: DataFrame,
    duration_col: str,
    observed_col: str,
    group_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Two-sample log-rank (Mantel–Cox) test — "do these two survival
    curves differ?", the hypothesis test that pairs with
    :func:`kaplan_meier`'s estimate (churn A/B tests, retention
    experiments, time-to-conversion comparisons):

        O₁ = Σ_t d₁ₜ                         (observed events, arm A)
        E₁ = Σ_t dₜ·n₁ₜ/nₜ                   (expected under H₀)
        V  = Σ_t dₜ·(n₁ₜ/nₜ)·(1−n₁ₜ/nₜ)·(nₜ−dₜ)/(nₜ−1)
        z  = (O₁ − E₁)/√V,   χ² = z²

    summed over the distinct EVENT times t (censor-only times shift the
    risk sets but contribute no term; times with nₜ = 1 contribute no
    variance). Risk sets n₁ₜ/nₜ are reverse-cumulative exact integers
    over the pooled duration grid — the same tiny period relation KM
    folds over, so every window is period-sized, never subject-sized.
    Each time's E and V doubles are nano-floored before the integer sum
    (the chi2/MI discipline — order-free, bias ≤ |times|·1e-9,
    identical in any engine); O₁ stays an exact integer. Degenerate
    inputs (V = 0: no events, or one arm empty at every event time)
    report NULL z/χ². NULL durations drop, as in kaplan_meier.

    Returns one row (n_a, n_b, observed_a, expected_a, variance, z,
    chi2).
    """
    g = F.col(group_col)
    per = (
        subjects.filter(
            F.col(duration_col).isNotNull() & g.isin([group_a, group_b])
        )
        .groupBy(F.col(duration_col).alias("_t"))
        .agg(
            F.sum(
                F.when(g == group_a, 1).otherwise(0)
            ).cast("long").alias("_ca"),
            F.sum(
                F.when(g == group_b, 1).otherwise(0)
            ).cast("long").alias("_cb"),
            F.sum(
                F.when((g == group_a) & F.col(observed_col), 1).otherwise(0)
            ).cast("long").alias("_da"),
            F.sum(
                F.when((g == group_b) & F.col(observed_col), 1).otherwise(0)
            ).cast("long").alias("_db"),
        )
    )
    wall = W.partitionBy().orderBy("_t")
    wtot = W.partitionBy()
    # at risk at t = subjects with duration >= t, per arm: total minus
    # the strict-prefix sum — period-relation windows only
    def _risk(c):
        return (
            F.sum(c).over(wtot)
            - F.coalesce(
                F.sum(c).over(wall.rowsBetween(W.unboundedPreceding, -1)),
                F.lit(0),
            )
        ).cast("long")

    staged = per.select(
        "_t",
        "_da",
        "_db",
        _risk("_ca").alias("_n1"),
        _risk("_cb").alias("_n2"),
        F.sum("_ca").over(wtot).cast("long").alias("_na"),
        F.sum("_cb").over(wtot).cast("long").alias("_nb"),
    )
    d = (F.col("_da") + F.col("_db")).cast("double")
    nt = (F.col("_n1") + F.col("_n2")).cast("double")
    p1 = F.col("_n1").cast("double") / nt
    e_term = d * p1
    v_term = F.when(
        F.col("_n1") + F.col("_n2") > 1,
        d * p1 * (F.lit(1.0) - p1) * (nt - d) / (nt - F.lit(1.0)),
    ).otherwise(F.lit(0.0))
    nano = 1_000_000_000
    has_event = (F.col("_da") + F.col("_db")) > 0
    agg = staged.agg(
        F.first("_na").alias("_fa"),
        F.first("_nb").alias("_fb"),
        F.sum(F.col("_da")).alias("_o1"),
        F.sum(
            F.when(has_event, F.floor(e_term * nano).cast("long"))
            .otherwise(F.lit(0))
        ).alias("_e_nano"),
        F.sum(
            F.when(has_event, F.floor(v_term * nano).cast("long"))
            .otherwise(F.lit(0))
        ).alias("_v_nano"),
    )
    # empty input: every sum/first above is NULL — coalesce the counts
    # so the degenerate report is (0, 0, 0, 0.0, 0.0, NULL, NULL), the
    # kendall empty-input convention
    e1 = F.coalesce(F.col("_e_nano"), F.lit(0)).cast("double") / nano
    v = F.coalesce(F.col("_v_nano"), F.lit(0)).cast("double") / nano
    o1 = F.coalesce(F.col("_o1"), F.lit(0))
    z = F.when(
        F.col("_v_nano") > 0,
        (o1.cast("double") - e1) / F.sqrt(v),
    )
    return agg.select(
        F.coalesce(F.col("_fa"), F.lit(0)).alias("n_a"),
        F.coalesce(F.col("_fb"), F.lit(0)).alias("n_b"),
        o1.cast("long").alias("observed_a"),
        F.round(e1, 6).alias("expected_a"),
        F.round(v, 6).alias("variance"),
        F.round(z, 6).alias("z"),
        F.round(z * z, 6).alias("chi2"),
    )


def nelson_aalen(
    subjects: DataFrame,
    duration_col: str,
    observed_col: str,
) -> DataFrame:
    """Nelson–Aalen cumulative-hazard curve — :func:`kaplan_meier`'s
    additive sibling (KM multiplies survival fractions; NA sums the
    per-period hazards d_i/n_i, the better-behaved estimate when risk
    sets get small, and −ln S for free):

        H(t) = Σ_{t_i ≤ t} d_i/n_i,
        var(H) ≈ Σ_{t_i ≤ t} d_i/n_i²    (Klein's form)

    Same plan as KM: one groupBy on duration, at-risk counts and the
    cumulative sums from ordered windows over the tiny PERIOD relation.
    Exactness convention mirrors KM's integer micro-units: each
    period's hazard is the exact floor (d·10⁶) div n — identically
    defined integers in any engine — and the cumulative H is an exact
    integer prefix sum of those (no float accumulation anywhere); the
    variance term floors (d·10¹²) div n² the same way. NULL durations
    are excluded for the same cross-engine ORDER BY reason as KM.
    Returns (duration, n_at_risk, d, h_micro, cum_hazard_micro,
    var_micro2).
    """
    per = subjects.filter(F.col(duration_col).isNotNull()).groupBy(
        F.col(duration_col).alias("duration")
    ).agg(
        F.sum(
            F.when(F.col(observed_col), F.lit(1)).otherwise(F.lit(0))
        ).cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    wall = W.partitionBy().orderBy("duration")
    n_at_risk = (
        F.sum("c").over(W.partitionBy())
        - F.coalesce(
            F.sum("c").over(wall.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        )
    ).cast("long")
    d38 = "decimal(38,0)"
    staged = per.select(
        "duration",
        "d",
        n_at_risk.alias("n_at_risk"),
    ).select(
        "duration",
        "n_at_risk",
        "d",
        # exact integer floor division: BIGINT div in micro (hazard)
        # and micro² (variance) units
        F.expr("CAST(d AS BIGINT) * 1000000 DIV n_at_risk").alias(
            "h_micro"
        ),
        F.expr(
            "CAST(d AS BIGINT) * 1000000000000 DIV "
            "(CAST(n_at_risk AS BIGINT) * n_at_risk)"
        ).alias("_var1"),
    )
    return staged.select(
        "duration",
        "n_at_risk",
        "d",
        "h_micro",
        F.sum(F.col("h_micro").cast(d38)).over(
            wall.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).cast("long").alias("cum_hazard_micro"),
        F.sum(F.col("_var1").cast(d38)).over(
            wall.rowsBetween(W.unboundedPreceding, W.currentRow)
        ).cast("long").alias("var_micro2"),
    )
