"""File-drop source readers: CSV/JSONL inference, gzip, file-cursor
incremental (drivers/s3 parity) and 2PC crash recovery through sync."""

from __future__ import annotations

import gzip
import json
import os

from pyspark.sql import functions as F

from olake_spark.sinks.table import ManagedTable
from olake_spark.sources.discover import discover_directory
from olake_spark.sources.files import read_files
from olake_spark.sync import CURSOR_PROP, run_sync


def test_csv_with_inference(spark, tmp_path):
    p = str(tmp_path / "t.csv")
    with open(p, "w") as fh:
        fh.write("id,name,score\n1,ann,9.5\n2,bob,7.25\n")
    df = read_files(spark, p, fmt="csv")
    types = dict(df.dtypes)
    assert types["id"] in ("int", "bigint") and types["score"] == "double"
    assert {r["name"] for r in df.collect()} == {"ann", "bob"}


def test_csv_gzip_transparent(spark, tmp_path):
    p = str(tmp_path / "t.csv.gz")
    with gzip.open(p, "wt") as fh:
        fh.write("id,v\n1,x\n2,y\n")
    df = read_files(spark, p, fmt="csv")
    assert df.count() == 2


def test_jsonl(spark, tmp_path):
    p = str(tmp_path / "t.jsonl")
    with open(p, "w") as fh:
        for i in range(3):
            fh.write(json.dumps({"id": i, "tags": [str(i)]}) + "\n")
    df = read_files(spark, p, fmt="jsonl")
    assert df.count() == 3
    assert dict(df.dtypes)["tags"] == "array<string>"


def test_modified_after_file_cursor(spark, tmp_path):
    """S3-driver incremental: file LastModified as the cursor
    (drivers/s3/internal/incremental.go:19-145)."""
    d = str(tmp_path / "drop")
    os.makedirs(d)
    with open(f"{d}/old.csv", "w") as fh:
        fh.write("id\n1\n")
    with open(f"{d}/new.csv", "w") as fh:
        fh.write("id\n2\n")
    # control mtimes explicitly — the cursor is wall-clock metadata
    os.utime(f"{d}/old.csv", (1_700_000_000, 1_700_000_000))
    os.utime(f"{d}/new.csv", (1_800_000_000, 1_800_000_000))
    df = read_files(
        spark, d, fmt="csv", options={"modifiedAfter": "2024-01-01T00:00:00"}
    )
    assert [r["id"] for r in df.collect()] == [2]


def test_crash_between_table_commit_and_state_write(spark, tmp_path):
    """2PC recovery (SURVEY §1.4): the destination table committed a cursor
    the state file never saw (crash in between). On restart the reconcile
    rule trusts the TABLE's committed cursor, so the overlap rows are not
    double-applied."""
    src = str(tmp_path / "src")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    cut = ev.select(ts_us.alias("ts_us")).approxQuantile("ts_us", [0.5], 0.01)[0]
    ev.filter(ts_us <= cut).write.parquet(f"{src}/events/d0")
    dest = str(tmp_path / "dest")
    state_path = str(tmp_path / "state.json")

    cat = discover_directory(spark, src)
    run_sync(spark, cat, src, dest, state_path)
    n1 = ManagedTable(spark, f"{dest}/events").read().count()

    # drop the rest of the data and sync — table + state both advance
    ev.filter(ts_us > cut).write.parquet(f"{src}/events/d1")
    run_sync(spark, cat, src, dest, state_path)
    t = ManagedTable(spark, f"{dest}/events")
    assert t.read().count() == ev.count()
    committed = t.properties()[CURSOR_PROP]

    # simulate the crash: the state file is lost entirely (worst case) while
    # the table keeps its committed cursor
    os.remove(state_path)

    run_sync(spark, cat, src, dest, state_path)
    got = t.read()
    # reconcile picked up the table-committed cursor: no duplicate rows
    assert got.count() == ev.count()
    assert got.select("_olake_id").distinct().count() == ev.count()
    assert t.properties()[CURSOR_PROP] == committed
