"""Min-max file-skipping index: pruning is lossless and actually prunes."""

import os
import tempfile

from pyspark.sql import functions as F

from olake_spark.operators.fileskip import minmax_index, prune_file_list, pruned_read


def _write_clustered(spark, n_files=8):
    d = tempfile.mkdtemp(prefix="olake_fileskip_test_")
    df = spark.range(0, 800).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    df.repartitionByRange(n_files, "k").write.mode("overwrite").parquet(d)
    return d


def test_index_one_row_per_file(spark):
    d = _write_clustered(spark)
    idx = minmax_index(spark, d, ["k"]).collect()
    n_files = len([f for f in os.listdir(d) if f.endswith(".parquet")])
    assert len(idx) == n_files
    assert sum(r.rows for r in idx) == 800
    for r in idx:
        assert r.min_k <= r.max_k and r.nulls_k == 0


def test_prune_is_lossless_and_effective(spark):
    d = _write_clustered(spark)
    idx = minmax_index(spark, d, ["k"])
    out, audit = pruned_read(spark, idx, "k", 100, 199)
    assert audit["files_read"] < audit["files_total"]
    got = sorted(r.k for r in out.collect())
    assert got == list(range(100, 200))


def test_prune_nothing_matches(spark):
    d = _write_clustered(spark)
    idx = minmax_index(spark, d, ["k"])
    out, audit = pruned_read(spark, idx, "k", 10_000, 20_000)
    assert audit["files_read"] == 0
    assert out.count() == 0
    assert out.columns == ["k", "v"]  # schema survives the empty path


def test_unclustered_layout_degrades_to_full_scan_not_wrong(spark):
    d = tempfile.mkdtemp(prefix="olake_fileskip_test_")
    df = spark.range(0, 400).select(F.col("id").alias("k"))
    # round-robin: every file spans ~the whole range -> no pruning possible
    df.repartition(4).write.mode("overwrite").parquet(d)
    idx = minmax_index(spark, d, ["k"])
    out, audit = pruned_read(spark, idx, "k", 50, 59)
    assert audit["files_read"] == audit["files_total"]
    assert sorted(r.k for r in out.collect()) == list(range(50, 60))


def test_all_null_file_is_skipped_for_range_predicate(spark):
    d = tempfile.mkdtemp(prefix="olake_fileskip_test_")
    spark.createDataFrame([(1,), (2,)], "k BIGINT").coalesce(1).write.mode(
        "overwrite"
    ).parquet(d)
    spark.createDataFrame([(None,), (None,)], "k BIGINT").coalesce(1).write.mode(
        "append"
    ).parquet(d)
    idx = minmax_index(spark, d, ["k"])
    files, total = prune_file_list(idx, "k", 0, 100)
    assert total == 2 and len(files) == 1  # NULL never matches a range
