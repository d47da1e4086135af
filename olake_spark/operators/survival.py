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

__all__ = ["kaplan_meier"]


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
