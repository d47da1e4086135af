"""``discover`` — stream listing + schema inference → Catalog.

The reference discovers streams per driver (SQL catalogs, Mongo sampling,
Kafka topic sampling, S3 listing) and folds sampled types through the
widening lattice (drivers/abstract/abstract.go:62-133,
utils/typeutils/resolver.go). Spark-first: file/table schemas come from
``spark.read`` inference; semi-structured sample records go through the
explicit lattice (``infer_schema_from_samples``) because Mongo/Kafka-style
mixed-type unions need LCA widening Spark's JSON inference doesn't do.
"""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from olake_spark.plans.stream import Catalog, ConfiguredStream, StreamMetadata, StreamSpec, SyncMode
from olake_spark.typesys.lattice import DataType, common_ancestor, datatype_for_value, to_spark_type

__all__ = ["infer_schema_from_samples", "discover_directory"]


def infer_schema_from_samples(samples: list[dict]) -> T.StructType:
    """Union-of-fields schema from sampled records with LCA type widening.

    Field order = first-seen order; every field nullable (a field absent in
    any sample is by definition nullable — fields.go semantics)."""
    folded: dict[str, DataType] = {}
    order: list[str] = []
    for rec in samples:
        for k, v in rec.items():
            t = datatype_for_value(v)
            if k not in folded:
                folded[k] = t
                order.append(k)
            else:
                folded[k] = common_ancestor(folded[k], t)
    return T.StructType([T.StructField(k, to_spark_type(folded[k]), True) for k in order])


_CURSOR_CANDIDATES = ("updated_at", "modified_at", "ts", "timestamp", "created_at")


def _detect(spec_fields: list[T.StructField]) -> tuple[list[str], list[str]]:
    """Heuristic PK + cursor detection for schemaless sources: *_id/ id pk;
    timestamp-typed or well-known-named columns as cursors."""
    names = [f.name for f in spec_fields]
    pks = [n for n in names if n == "id" or n.endswith("_id")][:1]
    cursors = [
        f.name
        for f in spec_fields
        if isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
        or f.name in _CURSOR_CANDIDATES
    ]
    return pks, cursors


def discover_directory(
    spark: SparkSession,
    directory: str,
    fmt: str = "parquet",
    namespace: str = "",
    normalization: bool = True,
) -> Catalog:
    """Discover every ``<name>.<fmt>`` / ``<name>/`` dataset in a directory
    as one stream each — the S3-driver shape (drivers/s3/internal/s3.go)."""
    streams: list[ConfiguredStream] = []
    paths = sorted(_glob.glob(os.path.join(directory, f"*.{fmt}"))) or sorted(
        p for p in _glob.glob(os.path.join(directory, "*")) if os.path.isdir(p)
    )
    for p in paths:
        name = os.path.basename(p).removesuffix(f".{fmt}")
        # file drops land at arbitrary nested prefixes (S3-driver behavior)
        df = spark.read.option("recursiveFileLookup", "true").format(fmt).load(p)
        pks, cursors = _detect(df.schema.fields)
        modes = [SyncMode.FULL_REFRESH.value]
        if cursors:
            modes.append(SyncMode.INCREMENTAL.value)
        from olake_spark.plans.stream import generate_destination_details

        dest_db, dest_tbl = generate_destination_details(namespace, name)
        spec = StreamSpec(
            name=name,
            namespace=namespace,
            schema_json=df.schema.jsonValue(),
            supported_sync_modes=modes,
            source_defined_primary_key=pks,
            available_cursor_fields=cursors,
            destination_database=dest_db,
            destination_table=dest_tbl,
        )
        spec.sync_mode = spec.default_sync_mode()
        streams.append(
            ConfiguredStream(spec, StreamMetadata(stream_name=name, namespace=namespace,
                                                  normalization=normalization))
        )
    return Catalog(streams=streams)
