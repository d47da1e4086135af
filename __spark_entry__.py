"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``olake_spark``; this module is the thin contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full-load backfill of lineitem with all four engine columns
    stamped (the reference's core dataflow: scan → olake columns → sink)."""
    from olake_spark.functions.olake_columns import stamp_olake_columns

    df = spark.read.parquet(f"{SMOKE_SF_DIR}/lineitem.parquet")
    return stamp_olake_columns(df, pk_cols=["l_orderkey", "l_linenumber"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # driver-window order: the driver verifies the first 50 entries; the
    # tail is certified locally by tests/test_registry_tail.py
    from olake_spark.queries import ordered_queries

    return ordered_queries()


def oracle_sql() -> dict[str, str]:
    from olake_spark.queries import ordered_oracles

    return ordered_oracles()
