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
- ``bucket_auto_pipeline`` / ``buckets_to_chunks`` — the non-ObjectID
  fallback: server-side equal-count ``$bucketAuto`` buckets
  (backfill.go:159-216)
- ``build_filter_bson`` — structured/legacy stream filters → the BSON
  ``$match`` document (backfill.go:392-500), with the reference's value
  coercion ladder (ObjectID hex, ISO date, bool, int, float, string)

All pure functions over hex strings / datetimes → unit-testable, and the
chunks they emit plug into ``plans.chunks.Chunk`` like every other planner.

Spark-side reads: ``normalize_mongo_columns`` is the DataFrame counterpart
of ``filterMongoObject`` (mon.go:299-323) — BSON-typed columns landed by a
mongo-spark read get the reference's canonical shapes (ObjectID → hex,
Binary → hex string, Decimal128 → string, BSON Timestamp → seconds int)
as pure Column expressions, plus the engine's lowercase column naming.
"""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.plans.chunks import EFFECTIVE_CHUNK_BYTES, Chunk
from olake_spark.plans.filters import FilterCondition, StreamFilter
from olake_spark.typesys.naming import reformat_column_name

__all__ = [
    "min_objectid_for_time",
    "objectid_timestamp",
    "regroup_split_vector",
    "timestamp_chunks",
    "match_range_pipeline",
    "bucket_auto_pipeline",
    "buckets_to_chunks",
    "build_filter_bson",
    "normalize_mongo_columns",
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


def bucket_auto_pipeline(
    storage_size_bytes: float, multiple_id_types: bool = False
) -> list[dict]:
    """The non-ObjectID chunking fallback (backfill.go:159-216): sort by
    ``_id``, optionally keep only ObjectID-typed ids (mixed-type collections
    sync ObjectIDs only — reference warns about the data loss), then
    server-side equal-count ``$bucketAuto`` with
    ``ceil(storage / 2 GiB raw)`` buckets."""
    buckets = max(1, math.ceil(storage_size_bytes / EFFECTIVE_CHUNK_BYTES))
    pipeline: list[dict] = [{"$sort": {"_id": 1}}]
    if multiple_id_types:
        pipeline.append({"$match": {"_id": {"$type": 7}}})
    pipeline.append({"$bucketAuto": {"groupBy": "$_id", "buckets": buckets}})
    return pipeline


def buckets_to_chunks(buckets: list[dict]) -> list[Chunk]:
    """``$bucketAuto`` result docs (``{"_id": {"min":…, "max":…}}``) →
    Chunks; the final bucket is unbounded (max=None) like backfill.go:200-214
    so rows inserted after planning still land in the tail chunk."""
    chunks: list[Chunk] = []
    for idx, b in enumerate(buckets):
        mx = b["_id"]["max"] if idx != len(buckets) - 1 else None
        chunks.append(Chunk(b["_id"]["min"], mx))
    return chunks


_MONGO_OPS = {">": "$gt", ">=": "$gte", "<": "$lt", "<=": "$lte", "=": "$eq", "!=": "$ne"}


def _coerce_filter_value(column: str, v: object, legacy: bool) -> object:
    """The reference's value-coercion ladder (backfill.go:404-463): quoted
    strings unwrap; 24-hex values on ``_id`` become ``{"$oid": …}``;
    then (legacy path) null / bool / ISO-date / int / float, else string.
    Typed (non-string) values pass through untouched."""
    if not isinstance(v, str):
        return v
    if legacy and v == "null":
        return None
    if legacy and len(v) >= 2 and v[0] == '"' and v[-1] == '"':
        v = v[1:-1]
    if column == "_id" and len(v) == 24:
        try:
            int(v, 16)
            return {"$oid": v.lower()}
        except ValueError:
            pass
    if legacy and v.lower() in ("true", "false"):
        return v.lower() == "true"
    for fmt in ("%Y-%m-%dT%H:%M:%S", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            return {"$date": dt.datetime.strptime(v, fmt).isoformat() + "Z"}
        except ValueError:
            pass
    if legacy:
        try:
            return int(v)
        except ValueError:
            pass
        try:
            return float(v)
        except ValueError:
            pass
    return v


def build_filter_bson(
    flt: StreamFilter | None,
    threshold: list[dict] | None = None,
    legacy: bool = False,
) -> dict:
    """Stream filter (+ incremental threshold conditions) → the ``$match``
    BSON document (backfill.go:474-500): threshold conditions AND the user
    filter; a two-condition filter nests under its ``$and``/``$or``."""
    conds: list[dict] = list(threshold or [])

    def one(c: FilterCondition) -> dict:
        return {c.column: {_MONGO_OPS[c.op]: _coerce_filter_value(c.column, c.value, legacy)}}

    if flt is not None and flt.conditions:
        if len(flt.conditions) == 1:
            conds.append(one(flt.conditions[0]))
        else:
            conds.append(
                {"$" + flt.logical.lower(): [one(c) for c in flt.conditions[:2]]}
            )
    if not conds:
        return {}
    return {"$and": conds}


def normalize_mongo_columns(df: DataFrame, objectid_cols: tuple[str, ...] = ("_id",)) -> DataFrame:
    """DataFrame counterpart of ``filterMongoObject`` (mon.go:299-323): the
    per-BSON-type canonicalization the reference applies to every document,
    as pure Column expressions (no Python in the row path):

    - named ObjectID columns (mongo-spark lands them as string hex or
      fixed-12-byte binary) → lowercase 24-hex string
    - Binary → lowercase hex string (``fmt.Sprintf("%x", data)``)
    - Decimal128/decimal → string (``value.String()``)
    - BSON Timestamp struct ``{t, i}`` → seconds int (``value.T``)
    - column names → engine lowercase/underscore form (utils.go:396-407)
    """
    out = []
    for f in df.schema.fields:
        c = F.col(f.name)
        if f.name in objectid_cols and isinstance(f.dataType, T.BinaryType):
            c = F.lower(F.hex(c))
        elif isinstance(f.dataType, T.BinaryType):
            c = F.lower(F.hex(c))
        elif isinstance(f.dataType, T.DecimalType):
            c = c.cast("string")
        elif isinstance(f.dataType, T.StructType) and {sf.name for sf in f.dataType.fields} == {"t", "i"}:
            c = c.getField("t").cast("long")
        out.append(c.alias(reformat_column_name(f.name)))
    return df.select(*out)
