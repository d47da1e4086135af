"""Slowly-changing-dimension (Type 2) history builder over a CDC changelog.

The reference engine lands a changelog as latest-state upserts (Iceberg
equality deletes, destination/iceberg/iceberg.go MERGE path); warehouses that
consume it next almost always re-derive *history* — one row per version of a
key, with validity intervals. This operator produces that SCD Type 2 shape
directly from the ordered changelog, distributed:

- one hash partitioning on the key carries BOTH window passes (the
  change-collapse ``lag`` and the interval ``lead`` share partitioning and
  ordering, so Catalyst plans a single exchange);
- no collect, no iteration — version chains of any length are two window
  functions.

Semantics (the standard Kimball Type 2 contract):

- every create/update event opens a new version effective at its own order
  key, closing the previous open version at the same instant
  (``valid_to == next valid_from``, half-open intervals);
- an update whose *tracked attributes* are unchanged from the immediately
  preceding version is collapsed into it (no spurious version) when
  ``collapse_unchanged`` — comparison is null-safe via ``eqNullSafe``;
- a delete closes the current version and opens nothing; a later re-create
  opens a fresh version even if its attributes equal the pre-delete row;
- ``is_current`` marks the one open (unclosed, undeleted) version per live
  key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

__all__ = ["scd2_history"]


def _attrs_equal(cols: Sequence[str]) -> Column:
    """Null-safe equality of every tracked attribute vs its lag() twin."""
    out = F.lit(True)
    for c in cols:
        out = out & F.col(c).eqNullSafe(F.col(f"_prev_{c}"))
    return out


def scd2_history(
    changelog: DataFrame,
    keys: Sequence[str],
    tracked: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "_op_type",
    delete_op: str = "d",
    collapse_unchanged: bool = True,
) -> DataFrame:
    """Fold an ordered changelog into SCD Type 2 version intervals.

    Parameters
    ----------
    changelog : one row per change event; must carry ``keys``, ``tracked``,
        ``order_cols`` (LSN first, then tie-breakers — together a total
        order per key) and ``op_col`` with create/update/delete markers.
    Returns one row per version: keys + tracked attrs +
    ``valid_from``/``valid_to`` (units of ``order_cols[0]``, ``valid_to``
    NULL while open) + ``is_current``.
    """
    keys = list(keys)
    tracked = list(tracked)
    order_cols = list(order_cols)
    order_col = order_cols[0]
    wk = W.partitionBy(*keys).orderBy(*[F.col(c).asc() for c in order_cols])

    df = changelog
    is_del = F.col(op_col) == F.lit(delete_op)

    if collapse_unchanged:
        lagged = df.select(
            "*",
            F.lag(op_col).over(wk).alias("_prev_op"),
            *[F.lag(c).over(wk).alias(f"_prev_{c}") for c in tracked],
        )
        # keep: first event of the key, any delete, the event that re-opens
        # after a delete, or a genuine attribute change
        keep = (
            F.col("_prev_op").isNull()
            | is_del
            | (F.col("_prev_op") == F.lit(delete_op))
            | ~_attrs_equal(tracked)
        )
        df = lagged.filter(keep).drop("_prev_op", *[f"_prev_{c}" for c in tracked])

    # interval pass: same partitioning+ordering → no second exchange
    closed = df.select(
        "*",
        F.col(order_col).alias("valid_from"),
        F.lead(order_col).over(wk).alias("valid_to"),
    )
    return (
        closed.filter(~is_del)
        .select(
            *keys,
            *tracked,
            "valid_from",
            "valid_to",
            (F.col("valid_to").isNull()).alias("is_current"),
        )
    )
