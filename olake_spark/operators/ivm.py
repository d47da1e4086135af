"""Incremental materialized-view maintenance over a CDC changelog —
retraction-aware aggregate refresh, the Flink-retract-stream /
Materialize shape built from the repo's own MERGE primitives.

The reference stops at replicating the TABLE (equality-delete upsert,
BaseDeltaTaskWriter.java:51-68); any aggregate view over it must be
recomputed from scratch after every sync. This operator maintains a
grouped aggregate view (n / sum / min / max) directly from the change
batch, with cost proportional to the BATCH, never the base table:

1. Collapse the batch to one net op per PK (``latest_state``, tombstones
   kept) — intermediate versions cancel algebraically for distributive
   aggregates, so only initial-vs-final matters.
2. Fetch the before-images of touched PKs only (a semi-join against the
   base snapshot — at scale a Bloom/DPP-prunable point lookup, cost ∝
   touched keys, not table size).
3. Emit retract(-1, -v) at the OLD row's group and insert(+1, +v) at the
   NEW row's group. Because the group key is computed from row
   attributes, an UPDATE that changes the attribute migrates the PK
   between groups for free (retract@old-group, insert@new-group).
4. Fold the per-group deltas into the view with a null-safe full outer
   join; groups whose count reaches zero are evicted.
5. min/max are NOT delta-maintainable under deletes (removing the
   extremum needs the runner-up), so they refresh by recomputing ONLY
   the dirty groups from the post-merge table restricted to those
   groups — again a pruned scan, cost ∝ touched groups.

All numeric state is exact: sums over round(v·10^6) BIGINT micro-units
(partition-order-free), counts BIGINT. Invariant (the gate):
``refresh(view(A), A, B) ≡ view(merge(A, B))`` for ANY batch split —
view maintenance is invisible, like replay granularity for the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from olake_spark.functions.olake_columns import OP_TYPE
from olake_spark.operators.merge import latest_state, merge_upsert, not_deleted

__all__ = ["view_state", "incremental_view_refresh", "view_finalize"]

MICROS = 1_000_000


def _micro(col: str):
    return F.round(F.col(col) * MICROS).cast("long")


def view_state(rows: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Bootstrap the view from a snapshot: one row per group with exact
    (n, sum_micros, min_micros, max_micros). groupBy keeps NULL group
    keys as their own group — they survive refresh too (null-safe joins
    throughout)."""
    v = _micro(value_col)
    return rows.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        # 0, not NULL, for an all-NULL-value group: the refresh path folds
        # deltas with +, so the bootstrap must use the same additive zero
        F.coalesce(F.sum(v), F.lit(0)).alias("sum_micros"),
        F.min(v).alias("min_micros"),
        F.max(v).alias("max_micros"),
    )


def _ns_cond(left_alias: str, right_alias: str, keys: list[str]):
    cond = None
    for k in keys:
        c = F.col(f"{left_alias}.{k}").eqNullSafe(F.col(f"{right_alias}.{k}"))
        cond = c if cond is None else cond & c
    return cond


def incremental_view_refresh(
    view: DataFrame,
    base_rows: DataFrame,
    batch: DataFrame,
    pk_cols: list[str],
    order_cols: list[str],
    group_cols: list[str],
    value_col: str,
    op_col: str = OP_TYPE,
) -> DataFrame:
    """Refresh ``view`` (built by ``view_state`` over ``base_rows``) with
    one CDC ``batch``; returns the new view ≡ ``view_state`` over
    ``merge_upsert(base_rows, batch)``.

    ``base_rows`` must be the snapshot the view was built from (one row
    per PK, no tombstones); both it and ``batch`` must already carry the
    ``group_cols`` (computed from row attributes by the caller, so group
    migration on update is visible). PKs are non-null by CDC contract;
    group keys and values may be NULL.
    """
    # 1. net final op per PK — intermediate versions cancel
    collapsed = latest_state(batch, pk_cols, order_cols, op_col, keep_tombstones=True)
    touched = collapsed.select(*pk_cols).distinct()

    # 2. before-images of touched PKs only (prunable point lookup)
    initial = base_rows.join(touched, pk_cols, "leftsemi")

    # 3. signed per-group deltas; sum ignores NULL values, count doesn't
    inserts = collapsed.filter(not_deleted(op_col)).select(
        *group_cols, F.lit(1).alias("_sign"), _micro(value_col).alias("_vm")
    )
    retracts = initial.select(
        *group_cols, F.lit(-1).alias("_sign"), _micro(value_col).alias("_vm")
    )
    deltas = (
        inserts.unionByName(retracts)
        .groupBy(*group_cols)
        .agg(
            F.sum("_sign").alias("_dn"),
            F.sum(F.col("_sign") * F.col("_vm")).alias("_dsum"),
        )
    )

    # 4. null-safe full outer fold; evict groups that reach n = 0
    vw, dl = view.alias("_ivl"), deltas.alias("_ivr")
    folded = vw.join(dl, _ns_cond("_ivl", "_ivr", group_cols), "full_outer").select(
        *[
            F.coalesce(F.col(f"_ivl.{k}"), F.col(f"_ivr.{k}")).alias(k)
            for k in group_cols
        ],
        # right-only groups never have a left row, so coalesce is safe even
        # for groups whose key is genuinely NULL (the join matched on <=>)
        (
            F.coalesce(F.col("_ivl.n"), F.lit(0))
            + F.coalesce(F.col("_ivr._dn"), F.lit(0))
        ).alias("n"),
        (
            F.coalesce(F.col("_ivl.sum_micros"), F.lit(0))
            + F.coalesce(F.col("_ivr._dsum"), F.lit(0))
        ).alias("sum_micros"),
        F.col("_ivl.min_micros").alias("_old_min"),
        F.col("_ivl.max_micros").alias("_old_max"),
    ).filter(F.col("n") > 0)

    # 5. min/max: recompute DIRTY groups from the post-merge rows of
    # those groups only (inner join on a distinct group set ≡ semi-join,
    # but keeps the null-safe <=> equi-key Catalyst extracts)
    dirty = deltas.select(*group_cols).distinct().alias("_dg")
    new_rows = merge_upsert(base_rows, batch, pk_cols, order_cols, op_col).alias("_nr")
    dirty_rows = new_rows.join(
        dirty, _ns_cond("_nr", "_dg", group_cols), "inner"
    ).select([F.col(f"_nr.{c}") for c in base_rows.columns])
    mm = (
        dirty_rows.groupBy(*group_cols)
        .agg(
            F.min(_micro(value_col)).alias("_new_min"),
            F.max(_micro(value_col)).alias("_new_max"),
            F.lit(True).alias("_dirty"),
        )
        .alias("_mm")
    )
    fd = folded.alias("_fd")
    return fd.join(mm, _ns_cond("_fd", "_mm", group_cols), "left").select(
        *[F.col(f"_fd.{k}") for k in group_cols],
        F.col("_fd.n").alias("n"),
        F.col("_fd.sum_micros").alias("sum_micros"),
        F.when(F.coalesce(F.col("_mm._dirty"), F.lit(False)), F.col("_mm._new_min"))
        .otherwise(F.col("_fd._old_min"))
        .alias("min_micros"),
        F.when(F.coalesce(F.col("_mm._dirty"), F.lit(False)), F.col("_mm._new_max"))
        .otherwise(F.col("_fd._old_max"))
        .alias("max_micros"),
    )


def view_finalize(view: DataFrame, group_cols: list[str]) -> DataFrame:
    """Human-facing rollup: value-unit sums/extrema (exact micro-units
    divided late) plus the mean, all rounded to 4."""
    return view.select(
        *group_cols,
        "n",
        F.round(F.col("sum_micros").cast("double") / MICROS, 4).alias("sum_value"),
        F.round(F.col("min_micros").cast("double") / MICROS, 4).alias("min_value"),
        F.round(F.col("max_micros").cast("double") / MICROS, 4).alias("max_value"),
        F.round(
            F.col("sum_micros").cast("double")
            / (F.col("n") * MICROS).cast("double"),
            4,
        ).alias("avg_value"),
    )
