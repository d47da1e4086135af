"""Source/destination reconciliation — row-level diff and chunk checksums.

A replication engine's end state is "destination == source"; the reference
only verifies this indirectly (per-sync record counts in its stats,
reference `utils/logger/stats.go`-style RPS counters). These operators make
the check first-class and cheap at 100 TB:

- ``chunk_checksums``: one map-side pass computing, per PK-range chunk, a
  row count and an ORDER-FREE 60-bit checksum (bit_xor of a per-row md5
  fingerprint). Comparing two tables costs one narrow scan each plus a
  join of |chunks| tiny rows — no row ever crosses the network. Mismatched
  chunks identify exactly which PK ranges need the row-level pass, the
  same range vocabulary as the chunk planners in ``plans/chunks.py``.
- ``table_diff``: the row-level pass. Each side is projected map-side to
  (pk, fingerprint) — the shuffle carries two thin columns regardless of
  row width — then a single full-outer hash join on pk classifies every
  key as added / removed / changed. Unchanged rows (the overwhelming
  majority) are filtered before any wide-row fetch.

Fingerprints are canonical across engines: every column is rendered to a
type-stable string (integers verbatim, doubles as round(x*1e6) micro-unit
BIGINTs, timestamps as epoch microseconds, NULL as a chr(30) sentinel),
joined with a chr(31) unit separator, and md5-hashed; the first 15 hex
chars (60 bits, always positive in an int64) are the fingerprint. DuckDB
reproduces the exact same bytes (``canonical_sql``), which is what the
oracle gate checks.

``bit_xor`` (not sum) keeps the checksum overflow-free and identical in
both engines (DuckDB promotes SUM(BIGINT) to HUGEINT). XOR cancels PAIRS
of identical rows — harmless under a primary key (no duplicate rows),
which is the operator's stated contract.

At 100 TB: both passes are map-side until a shuffle of |chunks| or
2×|rows| thin (pk, fp) tuples; fingerprinting is whole-stage-codegen
(concat_ws/md5/conv are JVM built-ins — zero Python).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "canonical_repr",
    "canonical_sql",
    "row_fingerprint64",
    "fingerprint_sql",
    "chunk_checksums",
    "table_diff",
]

SEP = "\x1f"  # unit separator between columns
NULLTOK = "\x1e"  # record-separator char stands in for NULL
_MICROS = 1_000_000


def _canon_col(df: DataFrame, name: str) -> Column:
    """Type-stable string rendering of one column (see module doc)."""
    dt = df.schema[name].dataType
    c = F.col(name)
    if isinstance(dt, (T.DoubleType, T.FloatType)):
        s = F.round(c * F.lit(float(_MICROS))).cast("long").cast("string")
    elif isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # NTZ→TZ cast is identity under the session's pinned UTC zone
        s = F.unix_micros(c.cast("timestamp")).cast("string")
    elif isinstance(dt, T.DateType):
        s = F.datediff(c, F.lit("1970-01-01")).cast("string")
    elif isinstance(dt, T.BooleanType):
        s = c.cast("int").cast("string")
    else:
        s = c.cast("string")
    return F.coalesce(s, F.lit(NULLTOK))


def canonical_repr(df: DataFrame, cols: Sequence[str]) -> Column:
    """chr(31)-joined canonical row rendering over ``cols`` (in order)."""
    return F.concat_ws(SEP, *[_canon_col(df, c) for c in cols])


def row_fingerprint64(df: DataFrame, cols: Sequence[str]) -> Column:
    """60-bit (non-negative BIGINT) md5 row fingerprint over ``cols``."""
    return F.conv(
        F.substring(F.md5(canonical_repr(df, cols)), 1, 15), 16, 10
    ).cast("long")


def _canon_sql_col(name: str, duck_type: str) -> str:
    t = duck_type.upper()
    if t in ("DOUBLE", "FLOAT", "REAL"):
        s = f"CAST(round({name} * 1e6) AS BIGINT)::VARCHAR"
    elif t.startswith("TIMESTAMP"):
        s = f"epoch_us({name})::VARCHAR"
    elif t == "DATE":
        s = f"(({name} - DATE '1970-01-01'))::VARCHAR"
    elif t == "BOOLEAN":
        s = f"{name}::INT::VARCHAR"
    else:
        s = f"{name}::VARCHAR"
    return f"coalesce({s}, chr(30))"


def canonical_sql(cols: Sequence[tuple[str, str]]) -> str:
    """DuckDB expression producing byte-identical canonical rows; ``cols``
    is a list of (column_name, duckdb_type)."""
    parts = ", ".join(_canon_sql_col(n, t) for n, t in cols)
    return f"concat_ws(chr(31), {parts})"


def fingerprint_sql(cols: Sequence[tuple[str, str]]) -> str:
    """DuckDB expression for the matching 60-bit fingerprint."""
    return f"('0x' || substring(md5({canonical_sql(cols)}), 1, 15))::BIGINT"


def chunk_checksums(
    df: DataFrame,
    pk_col: str,
    chunk_size: int,
    cols: Sequence[str] | None = None,
) -> DataFrame:
    """Per-chunk (``floor(pk / chunk_size)``) row count + order-free
    bit_xor checksum of row fingerprints. Chunk boundaries are closed-form
    from the numeric PK — the same range vocabulary as the chunk planner
    (plans/chunks.py:57) — so source and destination agree on chunk ids
    without coordination. One narrow map-side pass; the shuffle carries
    |chunks| rows."""
    cols = list(cols or df.columns)
    fp = row_fingerprint64(df, cols)
    return (
        df.select(
            F.floor(F.col(pk_col) / F.lit(int(chunk_size)))
            .cast("long")
            .alias("chunk_id"),
            fp.alias("_fp"),
        )
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.bit_xor("_fp").alias("checksum"),
        )
    )


def table_diff(
    src: DataFrame,
    dst: DataFrame,
    pk: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level drift report: one row per PK present on either side whose
    content differs — ``status`` in ('removed', 'added', 'changed').
    Identical rows are filtered out before the result materializes.

    Both sides project to (pk, fingerprint) map-side, so the full-outer
    hash join shuffles thin tuples regardless of table width. PK columns
    are assumed non-null (it's a primary key); pass them through a
    null-safe sentinel upstream if that contract is violated.
    """
    pk = list(pk)
    compare_cols = list(
        compare_cols
        or [c for c in src.columns if c not in pk]
    )
    a = src.select(
        *pk, row_fingerprint64(src, compare_cols).alias("_fp_src")
    )
    b = dst.select(
        *pk, row_fingerprint64(dst, compare_cols).alias("_fp_dst")
    )
    joined = a.join(b, on=pk, how="full_outer")
    status = (
        F.when(F.col("_fp_dst").isNull(), F.lit("removed"))
        .when(F.col("_fp_src").isNull(), F.lit("added"))
        .when(F.col("_fp_src") != F.col("_fp_dst"), F.lit("changed"))
    )
    return (
        joined.select(*pk, status.alias("status"))
        .where(F.col("status").isNotNull())
    )
