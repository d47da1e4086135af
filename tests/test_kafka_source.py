"""Kafka source planning layer: wire format, metadata columns, options."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from olake_spark.sources.kafka import (
    KafkaSource,
    avro_available,
    filter_internal_topics,
    kafka_metadata_columns,
    split_confluent_wire,
)


def test_filter_internal_topics():
    topics = ["orders", "__consumer_offsets", "_schemas", "__amazon_msk_canary", "users"]
    assert filter_internal_topics(topics) == ["orders", "users"]


def _kafka_df(spark, values):
    rows = [
        (b"k", bytearray(v), "t", 0, i, dt.datetime(2024, 1, 1))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, offset long, timestamp timestamp",
    )


def test_split_confluent_wire(spark):
    wire = b"\x00" + (1234).to_bytes(4, "big") + b"avro-body"
    plain = b'{"a": 1}'
    df = _kafka_df(spark, [wire, plain])
    is_w, sid, payload = split_confluent_wire("value")
    out = df.select(
        is_w.alias("w"), sid.alias("sid"), payload.cast("string").alias("p"), "offset"
    ).collect()
    rows = {r["offset"]: (r["w"], r["sid"], r["p"]) for r in out}
    assert rows[0] == (True, 1234, "avro-body")
    assert rows[1] == (False, None, '{"a": 1}')


def test_short_value_not_wire(spark):
    df = _kafka_df(spark, [b"\x00\x01"])
    is_w, sid, payload = split_confluent_wire("value")
    r = df.select(is_w.alias("w"), payload.cast("string").alias("p")).first()
    assert r["w"] is False and r["p"] == "\x00\x01"


def test_metadata_columns(spark):
    df = _kafka_df(spark, [b"x"])
    out = kafka_metadata_columns(df).first()
    assert out["_kafka_key"] == "k"
    assert out["_kafka_offset"] == 0
    assert out["_kafka_partition"] == 0


def test_decode_json(spark):
    df = _kafka_df(spark, [b'{"a": 7, "b": "hi"}'])
    src = KafkaSource("broker:9092", ["t"])
    out = src.decode_json(df, "a int, b string").first()
    assert out["a"] == 7 and out["b"] == "hi" and out["_kafka_offset"] == 0


def test_bounded_options():
    src = KafkaSource(
        "b:9092", ["t", "__x"], max_offsets_per_trigger=1000,
        extra_options={"kafka.security.protocol": "SSL"},
    )
    b = src.batch_options()
    assert b["endingOffsets"] == "latest" and b["subscribe"] == "t"
    assert b["kafka.security.protocol"] == "SSL"
    s = src.stream_options()
    assert s["maxOffsetsPerTrigger"] == "1000" and "endingOffsets" not in s


def test_decode_avro_gated(spark):
    if avro_available(spark):
        pytest.skip("spark-avro present — gate not exercised")
    df = _kafka_df(spark, [b"\x00\x00\x00\x00\x01x"])
    src = KafkaSource("b:9092", ["t"])
    with pytest.raises(NotImplementedError):
        src.decode_avro(spark, df, '"int"')


def test_sample_offset_plan_bounds_and_skips_empty():
    from olake_spark.sources.kafka import sample_offset_plan, sample_read_options

    starts = {0: 0, 1: 500, 2: 7}
    ends = {0: 25_000, 1: 500, 2: 1_000}  # partition 1 is empty
    plan = sample_offset_plan("t", starts, ends)
    assert plan is not None
    s, e = plan
    # 10k cap on partition 0, full slice on partition 2, partition 1 skipped
    assert s == {"t": {"0": 0, "2": 7}}
    assert e == {"t": {"0": 10_000, "2": 1_000}}

    opts = sample_read_options("b:9092", "t", starts, ends)
    import json

    assert json.loads(opts["assign"]) == {"t": [0, 2]}
    assert json.loads(opts["startingOffsets"])["t"]["0"] == 0
    assert json.loads(opts["endingOffsets"])["t"]["0"] == 10_000

    # all-empty topic → no sample read at all
    assert sample_offset_plan("t", {0: 5}, {0: 5}) is None
    assert sample_read_options("b", "t", {0: 5}, {0: 5}) is None
