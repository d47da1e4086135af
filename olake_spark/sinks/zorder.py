"""Z-order (Morton) clustering for multi-column data skipping.

A 100 TB table is pruned by parquet row-group min/max statistics, but a
plain sort clusters only its LEADING column — a predicate on the second
column still scans everything. Interleaving the bits of several columns'
rank codes (the Morton / Z-order curve) gives every participating column
locality, so point/range predicates on ANY of them prune most files.
This is the layout optimization Delta/Iceberg expose as ``OPTIMIZE ...
ZORDER BY``; here it is a pure-expression key plus a range-partitioned
sorted write.

Everything is exact integer bit arithmetic (`shiftright`/`&`/`shiftleft`)
— codegen'd, engine-independent, oracle-checkable. Quantization bounds are
explicit parameters (feed them from ``operators/profile.py`` stats): a
full-scan min/max inside the expression would make every write re-scan
its input.

Scale shape of ``write_zordered``: one ``repartitionByRange`` on the key
(a range exchange — the same single shuffle any global sort pays) +
in-partition sort, so output file k holds the k-th z-range: file-level
min/max on z (and on each interleaved column) become selective. The write
itself is the sink's normal parallel write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_minmax", "zorder_key", "write_zordered"]


def quantize_minmax(col: Column, lo: float, hi: float, bits: int = 16) -> Column:
    """Clamp + scale a numeric column onto the ``bits``-bit integer grid
    ``[0, 2^bits)``. Values outside [lo, hi] clamp to the edges."""
    if hi <= lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi}]")
    span = float(hi) - float(lo)
    scaled = (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(
        float((1 << bits) - 1)
    )
    clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(float((1 << bits) - 1)))
    return F.floor(clamped).cast("long")


def zorder_key(codes: list[Column], bits: int = 16) -> Column:
    """Morton interleave of ``bits``-bit integer rank codes: output bit
    ``b*D + d`` is bit ``b`` of dimension ``d``. With D dimensions the key
    is ``D*bits`` wide — keep ``D*bits <= 63`` for a long key."""
    d_count = len(codes)
    if d_count == 0:
        raise ValueError("need at least one dimension")
    if d_count * bits > 63:
        raise ValueError(f"{d_count} dims x {bits} bits exceeds a signed long")
    acc = F.lit(0).cast("long")
    for d, v in enumerate(codes):
        vv = v.cast("long")
        for b in range(bits):
            acc = acc + F.shiftleft(F.shiftright(vv, b).bitwiseAND(F.lit(1)), b * d_count + d)
    return acc


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[tuple[str, float, float]],
    bits: int = 16,
    num_files: int | None = None,
    key_col: str = "_z",
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``dims``
    (each a ``(column, lo, hi)`` quantization bound).

    One range exchange on the z key aligns output files with z-ranges;
    the key column itself is dropped from the written schema (it is a
    layout artifact, reconstructible from the dims).
    """
    z = zorder_key([quantize_minmax(F.col(c), lo, hi, bits) for c, lo, hi in dims], bits)
    keyed = df.withColumn(key_col, z)
    part = keyed.repartitionByRange(num_files, key_col) if num_files else (
        keyed.repartitionByRange(key_col)
    )
    part.sortWithinPartitions(key_col).drop(key_col).write.mode("overwrite").parquet(path)
