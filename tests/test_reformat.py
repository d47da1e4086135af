"""Unit tests for the value-reformat coercion family.

Mirrors the reference's reformat_test.go corpus shape: table-driven cases
per coercion (utils/typeutils/reformat.go semantics documented in
olake_spark/functions/reformat.py).
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from olake_spark.functions.reformat import (
    clamp_year,
    format_time,
    parse_timestamp_multi,
    to_bool,
    to_float64,
    to_int64,
)

EPOCH = dt.datetime(1970, 1, 1)


def _one(spark, expr):
    return spark.range(1).select(expr.alias("v")).first()["v"]


def _parse(spark, s, db_timestamp=True):
    return _one(spark, parse_timestamp_multi(F.lit(s), db_timestamp=db_timestamp))


@pytest.mark.parametrize(
    "s,expected",
    [
        ("2024-03-05", dt.datetime(2024, 3, 5)),
        ("2024-03-05 10:20:30", dt.datetime(2024, 3, 5, 10, 20, 30)),
        ("2024-03-05T10:20:30", dt.datetime(2024, 3, 5, 10, 20, 30)),
        ("2024-03-05T10:20:30.123456", dt.datetime(2024, 3, 5, 10, 20, 30, 123456)),
        ("2024-03-05-10.20.30.123456", dt.datetime(2024, 3, 5, 10, 20, 30, 123456)),
        # epoch-seconds integers (reformat.go:159-167)
        ("1700000000", dt.datetime.fromtimestamp(1700000000, dt.UTC).replace(tzinfo=None)),
        # no date prefix → epoch fallback for DB timestamps (reformat.go:276-280)
        ("not a date", EPOCH),
        ("03/05/2024", EPOCH),
        # date prefix but unparseable tail → epoch fallback
        ("2024-03-05 junk here!!", EPOCH),
    ],
)
def test_parse_timestamp_layouts(spark, s, expected):
    assert _parse(spark, s) == expected


def test_parse_timestamp_offset_layouts(spark):
    # offset forms normalize to session-zone (UTC in tests) instants
    got = _parse(spark, "2024-03-05T10:20:30.895Z")
    assert got == dt.datetime(2024, 3, 5, 10, 20, 30, 895000)
    got = _parse(spark, "2024-03-05 10:20:30+00")
    assert got == dt.datetime(2024, 3, 5, 10, 20, 30)


def test_parse_timestamp_strict_mode_nulls(spark):
    # filter-value path: unparseable → NULL, not epoch (ParseFilterValue)
    assert _parse(spark, "garbage", db_timestamp=False) is None
    assert _parse(spark, "2024-03-05", db_timestamp=False) == dt.datetime(2024, 3, 5)


@pytest.mark.parametrize(
    "s,expected",
    [("t", True), ("TRUE", True), ("Yes", True), ("1", True),
     ("f", False), ("NO", False), ("0", False), ("maybe", None)],
)
def test_bool_table(spark, s, expected):
    assert _one(spark, to_bool(F.lit(s))) is expected


def test_bool_from_int(spark):
    assert _one(spark, to_bool(F.lit(1))) is True
    assert _one(spark, to_bool(F.lit(0))) is False
    assert _one(spark, to_bool(F.lit(7))) is None


def test_year_clamp(spark):
    over = F.make_timestamp(
        F.lit(12024), F.lit(6), F.lit(15), F.lit(1), F.lit(2),
        F.lit(3).cast("decimal(8,6)"),
    )
    got = _one(spark, clamp_year(over))
    assert got == dt.datetime(9999, 6, 15, 1, 2, 3)
    ok = F.lit("2024-06-15 01:02:03").cast("timestamp")
    assert _one(spark, clamp_year(ok)) == dt.datetime(2024, 6, 15, 1, 2, 3)


def test_format_time(spark):
    assert _one(spark, format_time(F.lit("2024-01-02 15:04:05").cast("timestamp"))) == "15:04:05"


def test_int64_coercions(spark):
    assert _one(spark, to_int64(F.lit("42"))) == 42
    assert _one(spark, to_int64(F.lit("2.9"))) == 2  # truncate toward zero
    assert _one(spark, to_int64(F.lit("true"))) == 1
    assert _one(spark, to_int64(F.lit("no"))) == 0
    assert _one(spark, to_int64(F.lit("x"))) is None


def test_float64_coercions(spark):
    assert _one(spark, to_float64(F.lit("2.5"))) == 2.5
    assert _one(spark, to_float64(F.lit("yes"))) == 1.0
    assert _one(spark, to_float64(F.lit("x"))) is None
