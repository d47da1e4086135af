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

__all__ = ["scd2_history", "point_in_time_join"]


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


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: Sequence[str],
    fact_time: str,
    tracked: Sequence[str],
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (temporal) join: attach to every fact row the
    dimension version that was valid at the fact's own timestamp — the
    feature-store / audit staple ("what did this customer's record say
    when the order was placed?").

    ``dim`` is an SCD Type 2 interval table (``scd2_history`` output):
    one row per version with half-open ``[valid_from, valid_to)`` spans,
    deleted spans covered by NO version. Semantics: a fact at time t
    matches the version with ``valid_from <= t < valid_to`` (open
    versions have NULL ``valid_to``); a fact inside a deletion gap or
    before the key's first version matches nothing (NULL attributes).

    NOT implemented as an interval join: an equi-join on the key fans
    every fact out by that key's full version count before filtering.
    Instead versions and facts union into ONE window pass per key (the
    ``asof_join`` union+LOCF shape): carry forward the latest version's
    attributes AND its ``valid_to`` onto each fact row, then null out
    carries whose interval closed before the fact (deletion gap). One
    hash shuffle, zero fan-out, version chains of any length.
    """
    keys = list(keys)
    tracked = list(tracked)
    fact_cols = [c for c in facts.columns if c not in keys and c != fact_time]
    clash = set(tracked) & set(fact_cols)
    if clash:
        raise ValueError(
            f"tracked columns {sorted(clash)} collide with fact columns"
        )
    tagged_v = dim.select(
        *keys,
        F.col(valid_from).cast("long").alias("_pit_t"),
        F.lit(0).alias("_pit_side"),
        F.col(valid_to).cast("long").alias("_pit_to"),
        *[F.col(c).alias(f"_d_{c}") for c in tracked],
        *[
            F.lit(None).cast(facts.schema[c].dataType).alias(c)
            for c in fact_cols
        ],
    )
    tagged_f = facts.select(
        *keys,
        F.col(fact_time).cast("long").alias("_pit_t"),
        F.lit(1).alias("_pit_side"),
        F.lit(None).cast("long").alias("_pit_to"),
        *[
            F.lit(None).cast(dim.schema[c].dataType).alias(f"_d_{c}")
            for c in tracked
        ],
        *fact_cols,
    )
    # version rows sort before facts at equal instants → a version
    # effective exactly at the fact's timestamp is visible (>= semantics
    # of the half-open interval's left edge). Among versions tied on
    # valid_from (a burst of changes at one LSN producing zero-width
    # intervals), the live one — larger or open valid_to — must sort
    # LAST so last() carries it, not a zero-width predecessor.
    w = (
        W.partitionBy(*keys)
        .orderBy(
            F.col("_pit_t").asc(),
            F.col("_pit_side").asc(),
            F.col("_pit_to").asc_nulls_last(),
        )
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    filled = tagged_f.unionByName(tagged_v)
    # carry the whole version struct at once so valid_to and attributes
    # always come from the SAME version row (per-column last() could mix
    # versions when an attribute is genuinely NULL in one version)
    ver = F.last(
        F.when(
            F.col("_pit_side") == 0,
            F.struct(
                F.col("_pit_to").alias("_to"),
                *[F.col(f"_d_{c}").alias(c) for c in tracked],
            ),
        ),
        ignorenulls=True,
    ).over(w)
    out = filled.withColumn("_ver", ver).filter(F.col("_pit_side") == 1)
    v = F.col("_ver")
    live = v.isNotNull() & (
        v["_to"].isNull() | (v["_to"] > F.col("_pit_t"))
    )
    return out.select(
        *keys,
        F.col("_pit_t").alias(fact_time),
        *fact_cols,
        *[F.when(live, v[c]).alias(c) for c in tracked],
        live.alias("matched"),
    )
