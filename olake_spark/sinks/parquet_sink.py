"""Partitioned parquet sink with path-template partitioning.

Reference behavior (destination/parquet/parquet.go:41-711, partition path
465-537): the user gives a path template of ``{col, fallback, granularity}``
segments; timestamp columns support HH/DD/WW/MM/YYYY granularities; rows with
a null partition value fall back to a literal. Spark-first: each template
segment becomes a generated column and the write is a plain
``partitionBy(...)`` — the sink itself is Spark's native parquet writer
(vectorized, rolling files via ``maxRecordsPerFile``).

Template syntax kept from the reference: ``/{col_name, fallback, granularity}``
segments, e.g. ``/{o_orderdate, unknown, MM}/{o_orderstatus, na,}``.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["PartitionSegment", "parse_partition_template", "write_partitioned"]

_SEG_RE = re.compile(r"\{\s*([^,}]+?)\s*(?:,\s*([^,}]*?)\s*)?(?:,\s*([^,}]*?)\s*)?\}")

_GRANULARITY_FMT = {
    "HH": "yyyy-MM-dd-HH",
    "DD": "yyyy-MM-dd",
    "WW": "yyyy-ww",
    "MM": "yyyy-MM",
    "YYYY": "yyyy",
}


@dataclass(frozen=True)
class PartitionSegment:
    column: str
    fallback: str = ""
    granularity: str = ""  # "", HH, DD, WW, MM, YYYY

    @property
    def out_name(self) -> str:
        g = f"_{self.granularity.lower()}" if self.granularity else ""
        return f"_p_{self.column}{g}"


def parse_partition_template(template: str) -> list[PartitionSegment]:
    """Parse ``/{col, fallback, granularity}/...`` into segments."""
    segs = []
    for m in _SEG_RE.finditer(template or ""):
        col, fb, gran = m.group(1), m.group(2) or "", (m.group(3) or "").upper()
        if gran and gran not in _GRANULARITY_FMT:
            raise ValueError(f"unknown granularity {gran!r} (use HH/DD/WW/MM/YYYY)")
        segs.append(PartitionSegment(col, fb, gran))
    return segs


def write_partitioned(
    df: DataFrame,
    path: str,
    template: str = "",
    mode: str = "append",
    max_records_per_file: int | None = 1_000_000,
) -> list[str]:
    """Write with template partitioning; returns the partition column names.

    Null/missing partition values land in the fallback bucket rather than
    Hive's ``__HIVE_DEFAULT_PARTITION__`` (reference parity). At scale,
    partition columns should be low-cardinality (date granularities, enum
    cols) — Spark writes one file per (task, partition-value) pair.
    """
    segs = parse_partition_template(template)
    out = df
    part_cols: list[str] = []
    for s in segs:
        c = F.col(s.column)
        if s.granularity:
            c = F.date_format(c.cast("timestamp"), _GRANULARITY_FMT[s.granularity])
        else:
            c = c.cast("string")
        if s.fallback:
            c = F.coalesce(c, F.lit(s.fallback))
        out = out.withColumn(s.out_name, c)
        part_cols.append(s.out_name)
    writer = out.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    if part_cols:
        writer = writer.partitionBy(*part_cols)
    writer.parquet(path)
    return part_cols
