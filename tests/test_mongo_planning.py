"""Mongo chunk-planning math (sources/mongo.py vs backfill.go semantics)."""

from __future__ import annotations

import datetime as dt

from olake_spark.sources.mongo import (
    match_range_pipeline,
    min_objectid_for_time,
    objectid_timestamp,
    regroup_split_vector,
    timestamp_chunks,
)


def test_min_objectid_shape():
    t = dt.datetime(2024, 1, 1)
    oid = min_objectid_for_time(t)
    assert len(oid) == 24 and oid.endswith("0" * 16)
    assert objectid_timestamp(oid) == t


def test_regroup_every_8():
    bounds = [f"{i:024x}" for i in range(18)]  # 18 boundaries → 17 gaps
    chunks = regroup_split_vector(bounds)
    assert [c.min for c in chunks] == [bounds[0], bounds[8], bounds[16]]
    assert chunks[0].max == bounds[8]
    assert chunks[1].max == bounds[16]
    assert chunks[-1].max is None  # tail unbounded


def test_regroup_small_collection_single_chunk():
    chunks = regroup_split_vector([f"{i:024x}" for i in range(3)])
    assert len(chunks) == 1 and chunks[0].max is None


def test_timestamp_chunks_cover_range():
    first = dt.datetime(2024, 1, 1, 0, 0)
    last = dt.datetime(2024, 1, 1, 12, 0)
    chunks = timestamp_chunks(first, last)
    assert chunks[-1].max is None
    # contiguous: each chunk's max equals the next chunk's min
    for a, b in zip(chunks, chunks[1:]):
        assert a.max == b.min or a.max is None
    # padded start 10 min before first
    assert objectid_timestamp(chunks[0].min) == first - dt.timedelta(minutes=10)


def test_match_pipeline_guards_objectid_type():
    chunks = timestamp_chunks(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))
    p = match_range_pipeline(chunks[0])
    conds = p[0]["$match"]["$and"]
    assert conds[0] == {"_id": {"$type": 7}}
    assert "$gte" in conds[1]["_id"] and "$lt" in conds[2]["_id"]
    tail = match_range_pipeline(chunks[-1])
    assert len(tail[0]["$match"]["$and"]) == 2  # no upper bound
