"""Tests for the sharded JSONL export sink."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from olake_spark.sinks.jsonl_sink import estimate_bytes_per_row, write_jsonl_shards


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(i, f"document number {i} with some text") for i in range(100)],
        ["doc_id", "text"],
    ).coalesce(1)


def test_row_capped_shards(docs, tmp_path):
    out = str(tmp_path / "export")
    manifest = write_jsonl_shards(docs, out, max_rows_per_shard=30)
    assert manifest["n_rows"] == 100
    parts = [f for f in manifest["files"] if f["name"].endswith(".json")]
    assert len(parts) == 4  # 30+30+30+10 from one task
    # every shard is valid JSONL and no shard exceeds the cap
    total = 0
    for f in parts:
        with open(os.path.join(out, f["name"])) as fh:
            lines = fh.read().splitlines()
        assert len(lines) <= 30
        total += len(lines)
        row = json.loads(lines[0])
        assert set(row) == {"doc_id", "text"}
    assert total == 100
    # manifest written next to shards
    with open(os.path.join(out, "manifest.json")) as fh:
        assert json.load(fh)["n_rows"] == 100


def test_byte_targeted_shards(docs, tmp_path):
    out = str(tmp_path / "export_b")
    bpr = estimate_bytes_per_row(docs)
    assert 30 < bpr < 100
    manifest = write_jsonl_shards(docs, out, target_shard_bytes=int(bpr * 25))
    assert manifest["rows_per_shard"] == 25
    parts = [f for f in manifest["files"] if f["name"].endswith(".json")]
    assert len(parts) == 4


def test_gzip_compression_roundtrip(docs, tmp_path, spark):
    out = str(tmp_path / "export_gz")
    manifest = write_jsonl_shards(docs, out, max_rows_per_shard=50, compression="gzip")
    gz = [f for f in manifest["files"] if f["name"].endswith(".json.gz")]
    assert gz
    with gzip.open(os.path.join(out, gz[0]["name"]), "rt") as fh:
        json.loads(fh.readline())
    # spark reads the sharded gz export transparently
    back = spark.read.json(out + "/*.json.gz")
    assert back.count() == 100


def test_mutually_exclusive_caps(docs, tmp_path):
    with pytest.raises(ValueError):
        write_jsonl_shards(docs, str(tmp_path / "x"), 10, 1000)
