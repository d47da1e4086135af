"""MongoDB chunk planning — driver-side boundary math, Spark-ready output.

The reference's three Mongo backfill strategies (drivers/mongodb/internal/
backfill.go:91-300) all reduce to: compute ObjectID boundaries driver-side,
read each [min, max) range as one parallel task. In Spark each planned
chunk becomes one mongo-spark partition (or one ``$match`` range pipeline);
this module reproduces the boundary math without needing a live server:

- ``regroup_split_vector`` — group every 8 splitVector ~1 GiB boundaries
  into ~8 GiB chunks (backfill.go:143-159), tail unbounded
- ``timestamp_chunks`` — time-sliced ObjectID ranges: density of 10 s per
  6 h of collection time-span (backfill.go:217-251), ±10 min extreme pad
  (backfill.go:329-331)
- ``min_objectid_for_time`` — synthetic boundary ObjectID: 4-byte epoch
  seconds + eight 0x00 bytes (backfill.go:383-390)
- ``objectid_timestamp`` — the inverse (ObjectID → datetime), used for
  extremes and the resume cursor

All pure functions over hex strings / datetimes → unit-testable, and the
chunks they emit plug into ``plans.chunks.Chunk`` like every other planner.
"""

from __future__ import annotations

import datetime as dt

from olake_spark.plans.chunks import Chunk

__all__ = [
    "min_objectid_for_time",
    "objectid_timestamp",
    "regroup_split_vector",
    "timestamp_chunks",
    "match_range_pipeline",
]

_GROUP = 8  # splitVector ~1 GiB boundaries per emitted chunk (backfill.go:143)


def min_objectid_for_time(t: dt.datetime) -> str:
    """Boundary ObjectID hex: 4-byte epoch seconds + 8 zero bytes
    (backfill.go:383-390) — the smallest possible id at that second."""
    secs = int(t.timestamp())
    return f"{secs:08x}" + "00" * 8


def objectid_timestamp(oid_hex: str) -> dt.datetime:
    """ObjectID → its embedded creation time (UTC)."""
    return dt.datetime.fromtimestamp(int(oid_hex[:8], 16), dt.UTC).replace(tzinfo=None)


def regroup_split_vector(boundaries: list[str]) -> list[Chunk]:
    """Group splitVector's ~1 GiB boundaries 8-at-a-time into ~8 GiB chunks
    (backfill.go:143-159). ``boundaries`` includes min and max ids; the
    final chunk is unbounded (max=None) exactly like the reference."""
    chunks: list[Chunk] = []
    n = len(boundaries)
    for idx in range(0, n - 1, _GROUP):
        mx = boundaries[idx + _GROUP] if idx < n - _GROUP - 1 else None
        chunks.append(Chunk(boundaries[idx], mx))
    return chunks


def timestamp_chunks(first: dt.datetime, last: dt.datetime) -> list[Chunk]:
    """Time-sliced ObjectID ranges (backfill.go:217-251): pad extremes by
    ±10 minutes, slice at 10 s of id-time per 6 h of span (≥10 s), emit
    [minOID(start), minOID(end)) chunks plus an unbounded tail."""
    first = first - dt.timedelta(minutes=10)
    last = last + dt.timedelta(minutes=10)
    hours_per_6 = (last - first).total_seconds() / 3600 / 6
    density = dt.timedelta(seconds=10 * max(1, int(hours_per_6)))
    chunks: list[Chunk] = []
    start = first
    while start < last:
        end = start + density
        mx = min_objectid_for_time(end)
        if end > last:
            mx = min_objectid_for_time(last + dt.timedelta(seconds=1))
        chunks.append(Chunk(min_objectid_for_time(start), mx))
        start = end
    chunks.append(Chunk(min_objectid_for_time(last), None))
    return chunks


def match_range_pipeline(chunk: Chunk) -> list[dict]:
    """One chunk → the aggregation ``$match`` stage the reference issues per
    chunk scan (backfill.go:335-380, with the ``$type: 7`` ObjectID guard);
    feed to mongo-spark's ``aggregation.pipeline`` read option."""
    cond: dict = {"$and": [{"_id": {"$type": 7}}, {"_id": {"$gte": {"$oid": chunk.min}}}]}
    if chunk.max is not None:
        cond["$and"].append({"_id": {"$lt": {"$oid": chunk.max}}})
    return [{"$match": cond}]
