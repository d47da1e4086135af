"""materialize(): one helper, three deployment profiles, same results."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from olake_spark.materialize import materialize


def _probe(spark):
    return (
        spark.range(1000)
        .withColumn("g", F.col("id") % 7)
        .groupBy("g")
        .agg(F.sum("id").alias("s"))
    )


def _rows(df):
    return {(r.g, r.s) for r in df.collect()}


def test_local_profile_truncates_lineage_same_rows(spark, monkeypatch):
    monkeypatch.delenv("OLAKE_MATERIALIZE", raising=False)
    base = _probe(spark)
    mat = materialize(base)
    assert _rows(mat) == _rows(base)
    # lineage truncated: the materialized plan reads an RDD scan, and a
    # second consumer shares it (one plan, not a re-derivation)
    assert "ExistingRDD" in mat._jdf.queryExecution().executedPlan().toString()


def test_persist_profile_same_rows_and_storage(spark, monkeypatch):
    monkeypatch.setenv("OLAKE_MATERIALIZE", "persist")
    base = _probe(spark)
    mat = materialize(base)
    try:
        assert _rows(mat) == _rows(base)
        assert mat.storageLevel.useDisk and mat.storageLevel.useMemory
    finally:
        mat.unpersist()


def test_reliable_profile_checkpoints_to_dir(spark, monkeypatch, tmp_path):
    monkeypatch.setenv("OLAKE_MATERIALIZE", "reliable")
    monkeypatch.setenv("OLAKE_CHECKPOINT_DIR", str(tmp_path / "ck"))
    base = _probe(spark)
    mat = materialize(base, eager=True)
    assert _rows(mat) == _rows(base)
    # a reliable checkpoint actually landed in the configured dir
    assert any((tmp_path / "ck").rglob("*"))


def test_reliable_profile_without_dir_raises(spark, monkeypatch):
    if not spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
        pytest.skip("session already has a checkpoint dir")
    monkeypatch.setenv("OLAKE_MATERIALIZE", "reliable")
    monkeypatch.delenv("OLAKE_CHECKPOINT_DIR", raising=False)
    with pytest.raises(ValueError, match="OLAKE_CHECKPOINT_DIR"):
        materialize(_probe(spark))


def test_unknown_profile_raises(spark, monkeypatch):
    monkeypatch.setenv("OLAKE_MATERIALIZE", "sometimes")
    with pytest.raises(ValueError, match="OLAKE_MATERIALIZE"):
        materialize(_probe(spark))
