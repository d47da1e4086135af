"""Time-series joins Spark lacks natively: as-of join and range join.

Beyond-parity operators (the reference has no joins at all — SURVEY.md
§2.12); these are the building blocks a training-data pipeline needs to
align event streams with snapshots (feature lookups, label attachment).

Both are expressed so Catalyst picks distributed physical plans:

- ``asof_join`` uses the union + partitioned-window ``last(ignorenulls)``
  formulation: one shuffle on the join key, no driver-side state, no
  broadcast requirement — works when both sides are 100 TB. (The naive
  formulation — join on key + time inequality, then max() — explodes into
  |L|×|R| intermediate rows per key before aggregating; this one is
  O(|L|+|R|) rows through the shuffle.)
- ``range_join`` keeps an equality key in the join condition so Spark plans
  a shuffled hash/sort-merge join (NOT a broadcast-nested-loop, which is
  what a pure inequality join degenerates to), with the interval predicate
  applied as a post-join filter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join", "range_join", "ns_eq_join"]


def ns_eq_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    extra: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """NULL-safe equi-join: ``keys`` compare with ``<=>`` so a NULL group
    key matches its NULL counterpart instead of silently dropping the
    group (the classic rollup-state data-loss bug); ``extra`` columns
    join with plain ``=`` (known non-null, e.g. a dense grid ordinal).

    Catalyst extracts ``EqualNullSafe`` as an equi-join key, so this
    still plans as a shuffled hash / sort-merge join — never a
    nested-loop — and costs the same as the unsafe form at 100 TB.
    Output carries the LEFT side's key columns once, plus both sides'
    non-key columns.

    ``<=>`` is only emitted for a key that is NULLABLE on either side
    (schema check); provably non-null keys join with plain ``=``, which
    is semantically identical there but lets Catalyst keep its
    null-filtering/reorder optimizations — so callers can use this
    unconditionally without paying for the null-safety they don't need.
    """
    extra = list(extra or [])
    lnull = {f.name: f.nullable for f in left.schema.fields}
    rnull = {f.name: f.nullable for f in right.schema.fields}
    lhs, rhs = left.alias("_nsl"), right.alias("_nsr")
    cond = None
    for k in keys:
        if lnull.get(k, True) or rnull.get(k, True):
            c = F.col(f"_nsl.{k}").eqNullSafe(F.col(f"_nsr.{k}"))
        else:
            c = F.col(f"_nsl.{k}") == F.col(f"_nsr.{k}")
        cond = c if cond is None else cond & c
    for k in extra:
        c = F.col(f"_nsl.{k}") == F.col(f"_nsr.{k}")
        cond = c if cond is None else cond & c
    dropped = set(keys) | set(extra)
    out = [F.col(f"_nsl.{c}") for c in left.columns] + [
        F.col(f"_nsr.{c}") for c in right.columns if c not in dropped
    ]
    return lhs.join(rhs, cond, how).select(*out)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach the newest right row with
    ``right_time <= left_time`` sharing the join key (backward as-of).

    Rows with no prior right row keep NULL value columns (left-outer
    semantics). If several right rows share the exact same key+time the
    last one in ``value_cols``-projection order wins — pre-dedup the right
    side for full determinism.

    ``tolerance_seconds`` additionally requires
    ``left_time - right_time <= tolerance`` (matches pandas ``merge_asof``).
    """
    clash = set(value_cols) & {c for c in left.columns if c not in on}
    if clash:
        raise ValueError(
            f"value_cols {sorted(clash)} collide with left columns — rename one side"
        )
    lt, rt = F.col(left_time), F.col(right_time)
    tagged_r = right.select(
        *on,
        rt.alias("_asof_t"),
        F.lit(0).alias("_asof_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in on],
    )
    tagged_l = left.select(
        *on,
        lt.alias("_asof_t"),
        F.lit(1).alias("_asof_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
        *[F.col(c) for c in left.columns if c not in on],
    )
    # right rows sort before left rows at equal timestamps, so an exactly-
    # coincident right row is visible to the left row (asof <= semantics)
    w = (
        W.partitionBy(*on)
        .orderBy(F.col("_asof_t").asc(), F.col("_asof_side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = tagged_r.unionByName(tagged_l)
    for c in value_cols:
        filled = filled.withColumn(f"_r_{c}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    if tolerance_seconds is not None:
        filled = filled.withColumn(
            "_asof_rt", F.last(F.when(F.col("_asof_side") == 0, F.col("_asof_t")), ignorenulls=True).over(w)
        )
    out = filled.filter(F.col("_asof_side") == 1)
    if tolerance_seconds is not None:
        in_tol = (
            F.col("_asof_rt").isNotNull()
            & (F.col("_asof_t").cast("double") - F.col("_asof_rt").cast("double") <= tolerance_seconds)
        )
        for c in value_cols:
            out = out.withColumn(f"_r_{c}", F.when(in_tol, F.col(f"_r_{c}")))
        out = out.drop("_asof_rt")
    keep = (
        [F.col(c) for c in on]
        + [F.col("_asof_t").alias(left_time)]
        + [F.col(c) for c in left.columns if c not in on and c != left_time]
        + [F.col(f"_r_{c}").alias(c) for c in value_cols]
    )
    return out.select(*keep)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str | tuple[str, str]],
    point: Column,
    range_start: Column,
    range_end: Column,
) -> DataFrame:
    """Inner join where ``range_start <= point < range_end`` AND the equality
    keys match. The equality keys make this a shuffled equi-join with a
    residual range filter — never a nested-loop cross product.

    ``on`` entries are either a shared column name or a
    ``(left_name, right_name)`` pair.
    """
    cond = None
    for k in on:
        lk, rk = (k, k) if isinstance(k, str) else k
        c = left[lk] == right[rk]
        cond = c if cond is None else (cond & c)
    cond = cond & (point >= range_start) & (point < range_end)
    return left.join(right, cond, "inner")
