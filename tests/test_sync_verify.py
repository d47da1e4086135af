"""sync --verify: post-sync source<->destination reconciliation (r6
verdict #5). Plant one corrupted chunk in the destination and the verify
step must flag exactly that PK range — and nothing else."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olake_spark.sinks.table import ManagedTable
from olake_spark.sources.discover import discover_directory
from olake_spark.sync import run_sync, verify_stream

CHUNK = 256


@pytest.fixture()
def synced(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev.write.parquet(f"{src}/events/drop0")
    dest = str(tmp_path / "dest")
    state = str(tmp_path / "state.json")
    cat = discover_directory(spark, src)
    run_sync(spark, cat, src, dest, state)
    cs = next(c for c in cat.streams if c.stream.name == "events")
    df = spark.read.option("recursiveFileLookup", "true").parquet(f"{src}/events")
    return cs, df, dest


def test_verify_clean_sync_is_ok(spark, synced):
    cs, df, dest = synced
    rep = verify_stream(spark, cs, df, dest, chunk_size=CHUNK)
    assert rep["status"] == "ok"
    assert rep["chunks_mismatched"] == []
    assert rep["row_diff"] == []
    assert rep["chunks_total"] > 1  # the fixture really spans chunks


def test_verify_flags_exactly_the_corrupted_chunk(spark, synced):
    cs, df, dest = synced
    t = ManagedTable(spark, f"{dest}/events")
    # corrupt 3 rows inside chunk 2 (event_ids [512, 768)) — value drift,
    # row counts unchanged, so only the checksum can catch it
    bad_lo, bad_hi = 2 * CHUNK, 3 * CHUNK
    cur = t.read()
    corrupted = cur.withColumn(
        "value",
        F.when(
            (F.col("event_id") >= bad_lo) & (F.col("event_id") < bad_lo + 3),
            F.col("value") + 1.0,
        ).otherwise(F.col("value")),
    )
    t.overwrite(corrupted)

    rep = verify_stream(spark, cs, df, dest, chunk_size=CHUNK)
    assert rep["status"] == "mismatch"
    assert [c["chunk_id"] for c in rep["chunks_mismatched"]] == [2]
    assert rep["chunks_mismatched"][0]["pk_lo"] == bad_lo
    assert rep["chunks_mismatched"][0]["pk_hi"] == bad_hi - 1
    # row drill-down stays INSIDE the flagged range and finds the 3 rows
    assert len(rep["row_diff"]) == 3
    for row in rep["row_diff"]:
        assert bad_lo <= row["event_id"] < bad_lo + 3 + 1
        assert row["status"] == "changed"


def test_verify_detects_missing_rows(spark, synced):
    cs, df, dest = synced
    t = ManagedTable(spark, f"{dest}/events")
    t.overwrite(t.read().filter(F.col("event_id") != 700))
    rep = verify_stream(spark, cs, df, dest, chunk_size=CHUNK)
    assert rep["status"] == "mismatch"
    assert [c["chunk_id"] for c in rep["chunks_mismatched"]] == [700 // CHUNK]
    assert [r["status"] for r in rep["row_diff"]] == ["removed"]
    assert rep["row_diff"][0]["event_id"] == 700
