"""Portable Bloom-filter semi-join — the runtime-filter pushdown pattern.

The canonical 100 TB join-pruning move (Spark's own InjectRuntimeFilter,
Trino dynamic filters): hash the keys of a SELECTIVE small side into a
bit set, broadcast it, and drop fact rows whose key cannot be in the dim
BEFORE the real join's shuffle. False positives are safe (the real join
re-checks); false negatives are impossible.

This implementation is engine-portable by construction: positions derive
from the repo-wide md5 prefix hash, so the exact bit set — and therefore
the exact false-positive rows — reproduce in the DuckDB oracle. The bit
set is represented as a distinct-position relation (≤ n_bits rows) and
probed via ``n_hashes`` BROADCAST left joins: the fact table scans once,
never shuffles, and each probe is a broadcast hash lookup. (Spark's
native ``might_contain`` bloom is the non-portable fast path; the plan
shape — broadcast tiny state, prune before shuffle — is identical.)

Sizing: fp_rate ≈ (1 - e^(-n_hashes·|dim| / n_bits))^n_hashes; pick
n_bits ≈ 10·|dim| for ~1% at n_hashes=3. The filter relation is at most
n_bits rows regardless of dim cardinality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_prune", "bloom_prune_audit"]


def _pos(key, j: int, n_bits: int):
    h = F.conv(
        F.substring(
            F.md5(F.concat(key.cast("string"), F.lit(f":{j}"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    return F.pmod(h, F.lit(n_bits))


def bloom_build(
    dim: DataFrame, key_col: str, n_bits: int = 1 << 20, n_hashes: int = 3
) -> DataFrame:
    """Distinct set-bit positions of the dim keys — the broadcastable
    filter state (≤ n_bits rows, one BIGINT column ``pos``)."""
    parts = [
        dim.select(_pos(F.col(key_col), j, n_bits).alias("pos"))
        for j in range(n_hashes)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.distinct()


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    bits: DataFrame,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> DataFrame:
    """Fact rows that MAY match the dim (all n_hashes bits set), plus a
    ``_bloom_pass`` column on the un-filtered variant via
    ``bloom_prune_audit``. One fact scan, n_hashes broadcast joins, zero
    fact shuffles."""
    return bloom_prune_audit(fact, key_col, bits, n_bits, n_hashes).filter(
        F.col("_bloom_pass")
    )


def bloom_prune_audit(
    fact: DataFrame,
    key_col: str,
    bits: DataFrame,
    n_bits: int = 1 << 20,
    n_hashes: int = 3,
) -> DataFrame:
    """Fact with a ``_bloom_pass`` flag (true = every probe bit set)."""
    out = fact
    flags = []
    for j in range(n_hashes):
        marked = bits.select(
            F.col("pos").alias(f"_p{j}"), F.lit(True).alias(f"_hit{j}")
        )
        out = out.withColumn(f"_q{j}", _pos(F.col(key_col), j, n_bits)).join(
            F.broadcast(marked), F.col(f"_q{j}") == F.col(f"_p{j}"), "left"
        )
        flags.append(F.coalesce(F.col(f"_hit{j}"), F.lit(False)))
    passed = flags[0]
    for fl in flags[1:]:
        passed = passed & fl
    drop = [c for j in range(n_hashes) for c in (f"_q{j}", f"_p{j}", f"_hit{j}")]
    return out.withColumn("_bloom_pass", passed).drop(*drop)
