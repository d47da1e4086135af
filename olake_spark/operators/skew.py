"""Skew mitigation — salting patterns for hot keys.

At 100 TB a single hot key (one user with 1% of all events, one null-ish
default FK) turns a shuffle partition into a straggler that dominates the
stage. Three layered defenses, cheapest first:

1. AQE skew-join splitting (on by default in ``session.get_spark``) —
   handles sort-merge join skew automatically at runtime. Use it; salting
   is for shapes AQE can't fix:
2. ``salted_join`` — explicit salt for joins AQE won't rescue (e.g. the
   skewed side feeds a window right after, or broadcast is impossible and
   one key exceeds a single executor's memory). The big side gets a
   deterministic salt in [0, n); the small side is replicated n× with every
   salt value; joining on (key, salt) spreads each hot key over n tasks.
   Replication multiplies the small side — keep n modest (8-32).
3. ``two_phase_distinct_count`` — exact per-key distinct counts without a
   giant per-key hash set: global (key, value) dedup first (spreads by
   value hash), then a plain count per key.

Salts are DETERMINISTIC (hash of a caller-chosen expression, never rand())
so retried tasks and crash-replayed batches produce identical assignments —
the same reason the reference's chunk ids are deterministic
(drivers/abstract/backfill.go retry semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["with_salt", "salted_join", "two_phase_distinct_count"]


def with_salt(df: DataFrame, n: int, salt_from: Column | str, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt column in [0, n) hashed from ``salt_from`` (pick a
    high-cardinality column — a row id, not the skewed key itself)."""
    src = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    return df.withColumn(col_name, F.pmod(F.hash(src), F.lit(n)))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n: int = 16,
    salt_from: Column | str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join with the big side salted and the small side replicated n×.

    Result is row-identical to ``big.join(small, on, how)`` — the salt only
    changes the physical key distribution, so ANY salt assignment yields the
    same rows. Pass ``salt_from`` (a stable column) when downstream logic
    must also be retry-stable; the default monotonic id is correctness-safe
    but its values depend on partition layout. Supported ``how``:
    inner / left.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    src = salt_from if salt_from is not None else F.monotonically_increasing_id()
    b = with_salt(big, n, src if not isinstance(src, str) else F.col(src))
    s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
    return b.join(s, [*on, "_salt"], how).drop("_salt")


def two_phase_distinct_count(
    df: DataFrame, keys: list[str], value_col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Exact distinct-count per key that survives hot keys: phase 1 dedups
    (key, value) pairs — partitioned by the pair, so a hot key spreads over
    the cluster — phase 2 counts the surviving rows per key."""
    return (
        df.select(*keys, value_col)
        .distinct()
        .groupBy(*keys)
        .agg(F.count(F.lit(1)).alias(out_col))
    )
