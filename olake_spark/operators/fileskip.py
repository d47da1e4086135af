"""File-level min-max statistics index + scan pruning (data skipping).

The 100 TB read path lives or dies on NOT opening files: Iceberg keeps
per-file column bounds in manifests and prunes scan tasks against the query
predicate before any executor touches parquet (the reference's destination
relies on exactly those manifest stats once data lands in Iceberg). This
module reproduces that contract over plain parquet directories:

- ``minmax_index`` builds the stats table — one row per file with
  min/max/null-count per indexed column — in ONE distributed scan
  (``input_file_name()`` + groupBy; at 128 MB/file even 100 TB yields only
  ~800k index rows, a dataframe-sized object);
- ``pruned_read`` intersects a range predicate with the index, reads ONLY
  the surviving files, and re-applies the predicate as the residual filter
  (file skipping is a superset filter — bounds overlap does not imply row
  match).

Pruning effectiveness is a property of layout: bounds only exclude files
when the write clustered the column (``repartitionByRange`` /
``zorder_key`` — the repo's Z-order operator exists for exactly this).
The index itself is valid for ANY layout; worst case it prunes nothing
and the read degrades to a full scan, never to a wrong answer.

The file list crossing the driver is bounded by the number of MATCHING
files, and only (path) strings move — never data rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["minmax_index", "prune_file_list", "pruned_read"]


def minmax_index(
    spark: SparkSession, path: str, cols: Sequence[str]
) -> DataFrame:
    """Per-file (min, max, null_count, rows) stats for ``cols`` — one scan.

    Only the indexed columns are read (column pruning reaches the parquet
    footer), and the groupBy on file name combines map-side: each task
    emits one partial row per file it touched.
    """
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("rows")]
    for c in cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}"),
        ]
    return (
        df.select(F.input_file_name().alias("file"), *cols)
        .groupBy("file")
        .agg(*aggs)
    )


def prune_file_list(
    index: DataFrame, col: str, lo, hi
) -> tuple[list[str], int]:
    """Files whose [min, max] bounds intersect [lo, hi], plus the total.

    A file survives unless its whole range lies outside the predicate;
    all-null files (min/max NULL) are kept only if they could matter —
    a range predicate never matches NULL, so they are skipped too.
    Returns (matching_paths, total_files): the caller can audit the skip
    ratio. Driver-side cost is one collect of PATH STRINGS ∝ index rows.
    """
    keep = index.filter(
        (F.col(f"max_{col}") >= F.lit(lo)) & (F.col(f"min_{col}") <= F.lit(hi))
    )
    total = index.count()
    files = [r.file for r in keep.select("file").collect()]
    return files, total


def pruned_read(
    spark: SparkSession,
    index: DataFrame,
    col: str,
    lo,
    hi,
) -> tuple[DataFrame, dict]:
    """Read only the files the index admits for ``col BETWEEN lo AND hi``,
    with the exact predicate re-applied as the residual filter.

    Returns (dataframe, audit) where audit = {files_total, files_read}.
    When nothing survives, the schema is resolved from one arbitrary file
    (footer-only read) and an empty frame is returned.
    """
    files, total = prune_file_list(index, col, lo, hi)
    audit = {"files_total": total, "files_read": len(files)}
    if not files:
        # no file can match: derive schema from ANY file, return empty
        any_file = [r.file for r in index.select("file").limit(1).collect()]
        base = spark.read.parquet(*any_file).limit(0)
        return base.filter(F.lit(False)), audit
    df = spark.read.parquet(*files).filter(
        (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )
    return df, audit
