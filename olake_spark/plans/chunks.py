"""Backfill chunk planning — the scan parallelizer.

The reference spends ~60% of its code on per-dialect chunk planners so its
hand-rolled runtime can read snapshots in parallel (SURVEY.md §2.3). On
Spark the whole concept collapses to computing a ``predicates: list[str]``
for ``spark.read.jdbc(..., predicates=...)`` — one predicate per chunk, one
Spark partition per predicate — or to letting the file source split natively
(``spark.sql.files.maxPartitionBytes``). The planning algorithms themselves
stay driver-side and tiny.

Implemented strategies (reference files in parens):

- numeric PK arithmetic split with int64-overflow guard
  (drivers/mysql/internal/backfill.go:222-262, postgres backfill.go:136-155)
- boundary walk via a ``next_boundary`` callback — the ORDER BY/LIMIT/OFFSET
  "next chunk end" pattern for composite/string keys (pkg/jdbc/jdbc.go:76-123)
- string-PK big-int keyspace split (drivers/mysql/internal/backfill.go:264-372)
- greedy file bin-packing into ~target-byte groups
  (drivers/s3/internal/backfill.go:67-126)

Target chunk size mirrors the reference constant: 256 MiB parquet × 8
compression ≈ 2 GiB raw (constants/constants.go:33). At 100 TB that is
~50k chunks — each an independent, retryable Spark partition.
"""

from __future__ import annotations

import math
import string
from collections.abc import Callable, Sequence
from dataclasses import dataclass

__all__ = [
    "Chunk",
    "EFFECTIVE_CHUNK_BYTES",
    "split_numeric_range",
    "walk_boundaries",
    "split_string_keyspace",
    "pack_file_groups",
    "chunks_to_predicates",
]

# 256 MiB parquet * 8 compression factor — raw bytes one chunk should cover
EFFECTIVE_CHUNK_BYTES = 256 * 1024 * 1024 * 8

_INT64_MAX = 2**63 - 1


@dataclass(frozen=True)
class Chunk:
    """Half-open range [min, max); max=None ⇒ unbounded tail chunk."""

    min: object
    max: object | None


def split_numeric_range(lo: int, hi: int, num_chunks: int) -> list[Chunk]:
    """Arithmetic split of [lo, hi] (inclusive) into ≤num_chunks half-open ranges.

    Chunk size is ``ceil(span / num_chunks)``; the final chunk is unbounded to
    absorb rows inserted after planning (parity with the reference's tail
    handling). Guards against int64 overflow on ``lo + k*size``.
    """
    if num_chunks <= 0:
        raise ValueError("num_chunks must be positive")
    if hi < lo:
        return []
    span = hi - lo + 1
    size = max(1, math.ceil(span / num_chunks))
    chunks: list[Chunk] = []
    cur = lo
    while cur <= hi:
        nxt = cur + size
        if nxt > _INT64_MAX or nxt > hi:
            chunks.append(Chunk(cur, None))
            break
        chunks.append(Chunk(cur, nxt))
        cur = nxt
    return chunks


def walk_boundaries(
    first: object,
    next_boundary: Callable[[object], object | None],
    max_chunks: int = 1_000_000,
) -> list[Chunk]:
    """Boundary-walk planner: repeatedly ask the source for the key value
    ``chunk_size`` rows past the current boundary (the reference issues
    ``SELECT pk FROM t WHERE pk > ? ORDER BY pk LIMIT 1 OFFSET n``).

    ``next_boundary(cur)`` returns the next boundary or None at end-of-key-space.
    Walks the *real* key distribution, so skew cannot produce giant chunks.
    """
    chunks: list[Chunk] = []
    cur = first
    for _ in range(max_chunks):
        nxt = next_boundary(cur)
        if nxt is None or nxt == cur:
            chunks.append(Chunk(cur, None))
            return chunks
        chunks.append(Chunk(cur, nxt))
        cur = nxt
    raise RuntimeError("boundary walk exceeded max_chunks")


_ALPHABET = string.digits + string.ascii_lowercase + string.ascii_uppercase


def _str_to_bigint(s: str, width: int, alphabet: str = _ALPHABET) -> int:
    """Map a padded string into an integer keyspace (positional base-N)."""
    base = len(alphabet) + 1
    v = 0
    for i in range(width):
        c = s[i] if i < len(s) else None
        d = (alphabet.index(c) + 1) if c is not None and c in alphabet else 0
        v = v * base + d
    return v


def _bigint_to_str(v: int, width: int, alphabet: str = _ALPHABET) -> str:
    base = len(alphabet) + 1
    digits = []
    for _ in range(width):
        digits.append(v % base)
        v //= base
    out = []
    for d in reversed(digits):
        if d == 0:
            break
        out.append(alphabet[d - 1])
    return "".join(out)


def split_string_keyspace(
    min_key: str,
    max_key: str,
    num_chunks: int,
    width: int = 8,
    align: Callable[[str], str | None] | None = None,
) -> list[Chunk]:
    """String-PK split: embed min/max into a big-int keyspace, generate evenly
    spaced candidate boundaries, optionally align each candidate to a real key
    via ``align`` (the reference runs a collation-aware DISTINCT query).

    Returns half-open string ranges. Candidates that align to the same real
    key are merged, mirroring the reference's acceptance-ratio fallback.
    """
    lo = _str_to_bigint(min_key, width)
    hi = _str_to_bigint(max_key, width)
    if hi <= lo or num_chunks <= 1:
        return [Chunk(min_key, None)]
    step = (hi - lo) // num_chunks
    if step == 0:
        return [Chunk(min_key, None)]
    boundaries: list[str] = []
    for k in range(1, num_chunks):
        cand = _bigint_to_str(lo + k * step, width)
        if align is not None:
            aligned = align(cand)
            if aligned is None:
                continue
            cand = aligned
        if cand and (not boundaries or cand > boundaries[-1]) and cand > min_key:
            boundaries.append(cand)
    chunks: list[Chunk] = []
    cur = min_key
    for b in boundaries:
        chunks.append(Chunk(cur, b))
        cur = b
    chunks.append(Chunk(cur, None))
    return chunks


def pack_file_groups(
    files: Sequence[tuple[str, int]], target_bytes: int = EFFECTIVE_CHUNK_BYTES
) -> list[list[str]]:
    """Greedy bin-pack (path, size) into ~target_bytes groups; oversized files
    go solo. Mirrors the S3 driver's grouping; on Spark this is normally left
    to ``maxPartitionBytes``, but explicit groups let a caller drive
    per-group retry/state exactly like the reference.
    """
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for path, size in sorted(files, key=lambda f: -f[1]):
        if size >= target_bytes:
            groups.append([path])
            continue
        if cur_bytes + size > target_bytes and cur:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(path)
        cur_bytes += size
    if cur:
        groups.append(cur)
    return groups


def _render_value(v: object) -> str:
    import decimal

    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, bool):  # before int: bool is an int subclass and
        return "TRUE" if v else "FALSE"  # repr() would emit Python's True
    if isinstance(v, (int, float, decimal.Decimal)):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def chunks_to_predicates(column: str, chunks: Sequence[Chunk]) -> list[str]:
    """Render chunks as SQL predicates for ``spark.read.jdbc(predicates=...)``.

    One predicate per Spark partition; the first chunk also catches NULL keys
    so no row is lost (parity with reference null handling in scan queries).
    """
    preds: list[str] = []
    for i, ch in enumerate(chunks):
        parts = []
        lo = _render_value(ch.min)
        if ch.max is None:
            parts.append(f"{column} >= {lo}")
        else:
            parts.append(f"{column} >= {lo} AND {column} < {_render_value(ch.max)}")
        if i == 0:
            preds.append(f"({parts[0]}) OR {column} IS NULL")
        else:
            preds.append(parts[0])
    return preds
