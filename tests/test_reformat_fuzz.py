"""Randomized batch coverage of the reformat coercion family.

One seeded corpus, one Spark job per property — the breadth of a fuzz run
without a job per example. Every supported datetime layout is rendered
from random instants and must parse back to the exact instant; bool/int/
float coercions are checked against their Python-side truth.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import functions as F

from olake_spark.functions.reformat import (
    FALSE_STRINGS,
    TRUE_STRINGS,
    parse_timestamp_multi,
    to_bool,
    to_float64,
    to_int64,
)

_R = random.Random(20260813)


def _instants(n=300):
    out = []
    for _ in range(n):
        out.append(
            dt.datetime(
                _R.randint(1901, 2099), _R.randint(1, 12), _R.randint(1, 28),
                _R.randint(0, 23), _R.randint(0, 59), _R.randint(0, 59),
            )
        )
    return out


_RENDERS = {
    # python rendering → expected truncation of the parsed instant
    "yyyy-MM-dd HH:mm:ss": lambda d: d.strftime("%Y-%m-%d %H:%M:%S"),
    "iso T": lambda d: d.strftime("%Y-%m-%dT%H:%M:%S"),
    "iso T + micros": lambda d: d.strftime("%Y-%m-%dT%H:%M:%S.%f"),
    "space + micros+offset": lambda d: d.strftime("%Y-%m-%d %H:%M:%S.%f+00:00"),
    "db2 dashes-dots": lambda d: d.strftime("%Y-%m-%d-%H.%M.%S.%f"),
    "iso millis Z": lambda d: d.strftime("%Y-%m-%dT%H:%M:%S.") + f"{d.microsecond // 1000:03d}Z",
    "space + offset": lambda d: d.strftime("%Y-%m-%d %H:%M:%S +00:00"),
}


def test_every_layout_roundtrips(spark):
    instants = _instants()
    rows = []
    for name, render in _RENDERS.items():
        for d in instants:
            rows.append((name, render(d), d))
    df = spark.createDataFrame(rows, "layout string, raw string, want timestamp")
    got = df.withColumn("parsed", parse_timestamp_multi(F.col("raw"))).filter(
        F.col("parsed") != F.col("want")
    )
    bad = got.limit(5).collect()
    assert not bad, f"layout mismatches: {[(r.layout, r.raw, r.parsed) for r in bad]}"


def test_date_only_and_epoch_and_garbage(spark):
    instants = _instants(200)
    rows = [(d.strftime("%Y-%m-%d"), dt.datetime(d.year, d.month, d.day)) for d in instants]
    rows += [(str(int(d.replace(tzinfo=dt.UTC).timestamp())), d) for d in instants]
    df = spark.createDataFrame(rows, "raw string, want timestamp")
    bad = (
        df.withColumn("parsed", parse_timestamp_multi(F.col("raw")))
        .filter(F.col("parsed") != F.col("want"))
        .limit(5)
        .collect()
    )
    assert not bad, f"mismatches: {[(r.raw, r.parsed) for r in bad]}"
    # garbage collapses to the epoch start under db_timestamp, NULL otherwise
    g = spark.createDataFrame([("2024-13-45 99:99:99",), ("nonsense",)], "raw string")
    vals = g.select(
        parse_timestamp_multi(F.col("raw"), db_timestamp=True).alias("db"),
        parse_timestamp_multi(F.col("raw"), db_timestamp=False).alias("strict"),
    ).collect()
    assert all(v.strict is None for v in vals)
    assert {str(v.db) for v in vals} <= {"1970-01-01 00:00:00", "None"}


def test_bool_int_float_tables(spark):
    cases = [(s, True) for s in TRUE_STRINGS] + [(s, False) for s in FALSE_STRINGS]
    cases += [("maybe", None), ("2", None), ("", None)]
    df = spark.createDataFrame(cases, "raw string, want boolean")
    bad = df.withColumn("got", to_bool(F.col("raw"))).filter(
        ~(F.col("got").eqNullSafe(F.col("want")))
    ).collect()
    assert not bad

    nums = [(str(_R.randint(-(10**15), 10**15)),) for _ in range(200)]
    nums += [(f"{_R.uniform(-1e6, 1e6):.6f}",) for _ in range(200)]
    nd = spark.createDataFrame(nums, "raw string")
    chk = nd.select(
        "raw",
        to_int64(F.col("raw")).alias("i"),
        to_float64(F.col("raw")).alias("f"),
    ).collect()
    for r in chk:
        assert r.i == int(float(r.raw))  # Go int64(float) truncation
        assert abs(r.f - float(r.raw)) < 1e-9
    # bools coerce numerically; garbage quarantines to NULL
    misc = spark.createDataFrame(
        [("yes",), ("FALSE",), ("12abc",)], "raw string"
    ).select(to_int64(F.col("raw")).alias("i"), to_float64(F.col("raw")).alias("f")).collect()
    assert (misc[0].i, misc[0].f) == (1, 1.0)
    assert (misc[1].i, misc[1].f) == (0, 0.0)
    assert (misc[2].i, misc[2].f) == (None, None)
