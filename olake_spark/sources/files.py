"""File sources: normalized parquet/CSV/JSON readers + schema discover.

Mirrors the reference's S3/file driver surface (drivers/s3/internal/s3.go,
pkg/parser/{csv,json,parquet}.go) Spark-first: `spark.read.*` does the
parsing/inference; this layer adds the engine's type normalization:

- ns-precision timestamps (parquet TIMESTAMP(NANOS) read as epoch-ns longs
  under ``spark.sql.legacy.parquet.nanosAsLong``) are collapsed to Spark
  micros — the reference collapses all 4 timestamp precisions to one sink
  type (types/data_types.go:116-133).
- nested struct/array/map columns can be flattened to JSON strings
  (utils/typeutils/flatten.go semantics) via ``flatten_complex``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "read_table",
    "normalize_ns_timestamps",
    "flatten_complex",
    "read_files",
    "spread",
]


def spread(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition an under-parallel input before CPU-heavy per-row work.

    Local fixtures often arrive as one parquet row-group (one scan task); the
    downstream per-row stages (hashing, shingle explodes, stamping) are the
    expensive part, so a cheap shuffle of the narrow input buys full-core
    parallelism. Gated to local mode: touching ``df.rdd`` forces physical
    planning, and on a real cluster the scan has thousands of splits anyway —
    there this is a pure pass-through with zero planning cost.
    """
    sc = df.sparkSession.sparkContext
    if not sc.master.startswith("local"):
        return df
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, F.col(key))
    return df

# long columns that are epoch-nanos in the driver-generated testdata; real
# deployments carry this in the stream schema (TypeSchema → timestamp_nano)
NS_TIMESTAMP_COLS: dict[str, list[str]] = {"events": ["ts"]}


def normalize_ns_timestamps(df: DataFrame, ns_cols: list[str]) -> DataFrame:
    """Collapse event-time columns to TimestampType (LTZ micros).

    Handles both physical encodings the testdata has shipped with:
    - epoch-ns long (parquet TIMESTAMP(NANOS) under ``nanosAsLong``) →
      floor-divide to micros (parity with the oracle's epoch_us truncation);
    - TIMESTAMP_NTZ (plain micros timestamp) → cast to LTZ, which under the
      pinned UTC session timezone (``ensure_runtime_confs``) is a pure
      re-tag of the same micros value.

    LTZ is the engine-internal event-time type so ``unix_millis`` /
    ``window`` / watermark arithmetic work uniformly downstream.
    """
    for c in ns_cols:
        field = df.schema[c] if c in df.columns else None
        if field is None:
            continue
        if isinstance(field.dataType, T.LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    return df


def flatten_complex(df: DataFrame) -> DataFrame:
    """Any struct/array/map column → JSON string (reference flatten semantics:
    non-scalar values are json.Marshal-ed, utils/typeutils/flatten.go:60-90)."""
    out = df
    for f in df.schema.fields:
        if isinstance(f.dataType, (T.StructType, T.ArrayType, T.MapType)):
            out = out.withColumn(f.name, F.to_json(F.col(f.name)))
    return out


def ensure_runtime_confs(spark: SparkSession) -> SparkSession:
    """Pin the runtime-settable SQL confs the engine's semantics depend on.

    Session-agnostic by contract: the caller (driver harness, notebook, test)
    owns the SparkSession, so these are (re)applied at read time rather than
    assumed from ``session.get_spark``:

    - ``nanosAsLong``: without it Spark refuses parquet TIMESTAMP(NANOS)
      columns outright (PARQUET_TYPE_ILLEGAL); with it they arrive as
      epoch-ns longs which ``normalize_ns_timestamps`` collapses to micros.
    - ``session.timeZone=UTC``: string→timestamp casts and window bucketing
      are session-TZ-dependent; the engine (like the reference) is UTC-only.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table with engine normalization applied."""
    ensure_runtime_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    return normalize_ns_timestamps(df, NS_TIMESTAMP_COLS.get(name, []))


def read_files(
    spark: SparkSession,
    paths: list[str] | str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Generic file-drop reader (S3 driver parity): csv/json/jsonl/parquet,
    glob patterns, transparent .gz (Spark codec handling), modifiedAfter for
    file-cursor incremental (drivers/s3/internal/incremental.go)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    opts = dict(options or {})
    if fmt == "csv":
        opts.setdefault("header", "true")
        opts.setdefault("inferSchema", "true" if schema is None else "false")
    if fmt in ("json", "jsonl"):
        fmt = "json"
    return reader.options(**opts).format(fmt).load(paths)
