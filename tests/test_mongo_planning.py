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


def test_bucket_auto_pipeline_shape():
    from olake_spark.sources.mongo import bucket_auto_pipeline

    p = bucket_auto_pipeline(5 * 2**31)  # 10 GiB → ceil(10/2) = 5 buckets
    assert p[0] == {"$sort": {"_id": 1}}
    assert p[-1] == {"$bucketAuto": {"groupBy": "$_id", "buckets": 5}}
    assert len(p) == 2  # no $type guard for single-type _id
    guarded = bucket_auto_pipeline(100, multiple_id_types=True)
    assert guarded[1] == {"$match": {"_id": {"$type": 7}}}
    assert guarded[-1]["$bucketAuto"]["buckets"] == 1  # tiny collection


def test_buckets_to_chunks_tail_unbounded():
    from olake_spark.sources.mongo import buckets_to_chunks

    bks = [{"_id": {"min": "a", "max": "b"}}, {"_id": {"min": "b", "max": "c"}}]
    chunks = buckets_to_chunks(bks)
    assert (chunks[0].min, chunks[0].max) == ("a", "b")
    assert (chunks[1].min, chunks[1].max) == ("b", None)


def test_build_filter_bson_coercions():
    from olake_spark.plans.filters import FilterCondition, StreamFilter
    from olake_spark.sources.mongo import build_filter_bson

    oid = "64a1b2c3d4e5f6a7b8c9d0e1"
    f = StreamFilter(
        (FilterCondition("_id", ">", oid), FilterCondition("n", "<=", 5)), "or"
    )
    out = build_filter_bson(f)
    assert out == {
        "$and": [
            {"$or": [{"_id": {"$gt": {"$oid": oid}}}, {"n": {"$lte": 5}}]}
        ]
    }
    # legacy path: quoted strings unwrap, "null"/bool/int coerce
    legacy = build_filter_bson(
        StreamFilter((FilterCondition("flag", "=", "TRUE"),)), legacy=True
    )
    assert legacy == {"$and": [{"flag": {"$eq": True}}]}
    legacy_n = build_filter_bson(
        StreamFilter((FilterCondition("n", "!=", '"12"'),)), legacy=True
    )
    assert legacy_n == {"$and": [{"n": {"$ne": 12}}]}
    # ISO date strings → $date on both paths
    dated = build_filter_bson(
        StreamFilter((FilterCondition("created", "<", "2024-01-02"),))
    )
    assert dated["$and"][0]["created"]["$lt"] == {"$date": "2024-01-02T00:00:00Z"}
    # threshold conditions AND with the user filter; empty filter → {}
    assert build_filter_bson(None) == {}
    thr = [{"cur": {"$gt": 5}}]
    assert build_filter_bson(StreamFilter(), threshold=thr) == {"$and": thr}


def test_resume_token_optime_and_catchup():
    from olake_spark.streaming.mongo_cdc import caught_up, resume_token_optime

    token = "82" + f"{1704067200:08x}" + f"{7:08x}" + "deadbeef"
    assert resume_token_optime(token) == (1704067200, 7)
    # cluster behind or equal → caught up; ahead → keep draining
    assert caught_up(token, (1704067200, 7))
    assert caught_up(token, (1704067200, 6))
    assert not caught_up(token, (1704067200, 8))
    assert not caught_up(token, (1704067201, 0))


def test_reconcile_resume_token_rules():
    from olake_spark.streaming.mongo_cdc import reconcile_resume_token

    # metadata ahead of state → crash recovery: resume from metadata
    assert reconcile_resume_token("8200000001", "8200000002") == "8200000002"
    # state current or ahead → state stands
    assert reconcile_resume_token("8200000003", "8200000002") == "8200000003"
    assert reconcile_resume_token("8200000003", "8200000003") == "8200000003"
    assert reconcile_resume_token(None, "82aa") == "82aa"
    assert reconcile_resume_token("82aa", None) == "82aa"


def test_normalize_mongo_columns(spark):
    import datetime as _dt
    from decimal import Decimal

    from pyspark.sql import types as T

    from olake_spark.sources.mongo import normalize_mongo_columns

    schema = T.StructType(
        [
            T.StructField("_id", T.BinaryType()),
            T.StructField("Payload", T.BinaryType()),
            T.StructField("Price", T.DecimalType(10, 2)),
            T.StructField(
                "OpTime",
                T.StructType([T.StructField("t", T.IntegerType()), T.StructField("i", T.IntegerType())]),
            ),
            T.StructField("Plain Name", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [(bytes.fromhex("64a1b2c3d4e5f6a7b8c9d0e1"), b"\xab\xcd", Decimal("12.50"), (1704067200, 3), "x")],
        schema,
    )
    out = normalize_mongo_columns(df)
    assert out.columns == ["_id", "payload", "price", "optime", "plain_name"]
    row = out.first()
    assert row["_id"] == "64a1b2c3d4e5f6a7b8c9d0e1"
    assert row["payload"] == "abcd"
    assert row["price"] == "12.50"
    assert row["optime"] == 1704067200


def test_change_stream_config_options():
    from olake_spark.streaming.mongo_cdc import change_stream_config

    opts = change_stream_config("82cafe").to_options()
    assert opts["change.stream.startup.mode"] == "resume_token"
    assert opts["change.stream.startup.mode.resume.token"] == "82cafe"
    assert "insert" in opts["aggregation.pipeline"]
    fresh = change_stream_config(None).to_options()
    assert "change.stream.startup.mode" not in fresh


def test_match_pipeline_guards_objectid_type():
    chunks = timestamp_chunks(dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2))
    p = match_range_pipeline(chunks[0])
    conds = p[0]["$match"]["$and"]
    assert conds[0] == {"_id": {"$type": 7}}
    assert "$gte" in conds[1]["_id"] and "$lt" in conds[2]["_id"]
    tail = match_range_pipeline(chunks[-1])
    assert len(tail[0]["$match"]["$and"]) == 2  # no upper bound
