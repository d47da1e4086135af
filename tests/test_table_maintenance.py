"""ManagedTable retention: expire_snapshots + vacuum_orphans (the Iceberg
expireSnapshots / deleteOrphanFiles parity surface;
reference destination keeps the full snapshot chain and delegates retention
to Iceberg — destination/iceberg/iceberg.go)."""

from __future__ import annotations

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from olake_spark.sinks.table import ManagedTable


def _parquet_files(path: str) -> set[str]:
    out = set()
    for dirpath, _dirs, files in os.walk(os.path.join(path, "data")):
        out |= {os.path.join(dirpath, f) for f in files if f.endswith(".parquet")}
    return out


@pytest.fixture()
def table4(spark):
    t = ManagedTable(spark, tempfile.mkdtemp(prefix="olake_expire_"))
    for i in range(4):
        t.append(spark.range(10).select(
            (F.col("id") + 100 * i).alias("k"), F.lit(i).alias("batch")
        ))
    yield t
    t.drop()


def test_expire_keeps_latest_and_shrinks_disk(spark, table4):
    t = table4
    assert len(t.versions()) == 4
    before = t.read().count()
    files_before = len(_parquet_files(t.path))

    stats = t.expire_snapshots(keep_last=2)
    assert stats["expired_versions"] == [0, 1]
    assert t.versions() == [2, 3]
    # latest read is untouched
    assert t.read().count() == before
    # append manifests are cumulative (old files still referenced by the
    # kept snapshots) — nothing removable yet
    assert stats["removed_files"] == 0
    assert len(_parquet_files(t.path)) == files_before


def test_expire_after_compact_removes_precompaction_files(spark, table4):
    t = table4
    t.compact()  # v4 rewrites everything into one fresh file group
    before_rows = t.read().count()
    files_before = len(_parquet_files(t.path))

    stats = t.expire_snapshots(keep_last=1)
    assert t.versions() == [4]
    assert stats["removed_files"] > 0
    assert len(_parquet_files(t.path)) < files_before
    assert t.read().count() == before_rows


def test_expired_version_read_fails_loudly(spark, table4):
    t = table4
    t.expire_snapshots(keep_last=2)
    with pytest.raises(FileNotFoundError):
        t._manifest(0)


def test_expire_keep_last_validation(spark, table4):
    with pytest.raises(ValueError):
        table4.expire_snapshots(keep_last=0)


def test_vacuum_removes_orphans_never_live_data(spark, table4):
    t = table4
    # plant a crash leftover: a stray data dir + a stale tmp manifest
    stray_dir = os.path.join(t.path, "data", "deadbeef")
    os.makedirs(stray_dir)
    stray = os.path.join(stray_dir, "part-orphan.parquet")
    with open(stray, "wb") as fh:
        fh.write(b"not a real parquet")
    tmp_manifest = os.path.join(t.path, "_commits", ".tmp-crashed.json")
    with open(tmp_manifest, "w") as fh:
        fh.write("{}")

    live_before = _parquet_files(t.path) - {stray}
    rows_before = t.read().count()

    # default (3-day olderThan, Iceberg parity): freshly written files are
    # NOT touched — they may belong to an in-flight optimistic commit
    assert t.vacuum_orphans() == 0
    assert os.path.exists(stray)
    assert os.path.exists(tmp_manifest)

    # quiesced-writers sweep: age cutoff disabled
    removed = t.vacuum_orphans(older_than_s=0)
    assert removed == 1
    assert not os.path.exists(stray)
    assert not os.path.exists(os.path.dirname(stray))  # empty dir swept
    assert not os.path.exists(tmp_manifest)
    assert _parquet_files(t.path) == live_before
    assert t.read().count() == rows_before


def test_vacuum_age_cutoff_spares_in_flight_writer(spark, table4):
    """An orphan older than the cutoff is removed while a concurrent
    writer's just-written (not-yet-committed) data file survives."""
    t = table4
    old_dir = os.path.join(t.path, "data", "old")
    os.makedirs(old_dir)
    old = os.path.join(old_dir, "part-old.parquet")
    with open(old, "wb") as fh:
        fh.write(b"x")
    stale = time.time() - 7200
    os.utime(old, (stale, stale))
    fresh_dir = os.path.join(t.path, "data", "inflight")
    os.makedirs(fresh_dir)
    fresh = os.path.join(fresh_dir, "part-inflight.parquet")
    with open(fresh, "wb") as fh:
        fh.write(b"y")
    assert t.vacuum_orphans(older_than_s=3600) == 1
    assert not os.path.exists(old)
    assert os.path.exists(fresh)


def test_mor_table_expire_then_read_resolves(spark):
    t = ManagedTable(spark, tempfile.mkdtemp(prefix="olake_expire_mor_"))
    try:
        b0 = spark.createDataFrame(
            [(1, 1, "c", 10.0), (2, 1, "c", 20.0)],
            "k int, lsn long, _op_type string, v double",
        )
        b1 = spark.createDataFrame(
            [(1, 2, "u", 11.0), (3, 2, "c", 30.0)],
            "k int, lsn long, _op_type string, v double",
        )
        t.upsert_mor(b0, ["k"], ["lsn"])
        t.upsert_mor(b1, ["k"], ["lsn"])
        t.compact()
        t.expire_snapshots(keep_last=1)
        got = {r.k: r.v for r in t.read().collect()}
        assert got == {1: 11.0, 2: 20.0, 3: 30.0}
    finally:
        t.drop()
