"""Postgres wal2json CDC decode — pure DataFrame expressions.

The reference parses wal2json replication messages in Go and pushes row
callbacks (pkg/waljs/types.go:41-57 WALMessage, filter.go:33-89). Spark-first
the same decode is declarative: a batch of raw wal2json strings (from the
replication slot, a Kafka topic carrying them, or files) goes through
``from_json`` with the WALMessage schema, ``explode`` over the per-commit
change array, and the reference's semantics:

- delete rows take their values from ``oldkeys`` (filter.go:68-70)
- every row carries ``_cdc_lsn`` = the commit's nextlsn (filter.go:78-80)
  and ``_cdc_timestamp`` = the commit timestamp
- op mapping (drivers/abstract/cdc.go:165-179): insert → "i" while the
  backfill-overlap dedup window is open, "c" after; update → "u";
  delete → "d"

All values land as strings in a map column (wal2json renders every value
into JSON; per-stream typing applies the stream schema afterwards via
``project_stream`` — CAST expressions, codegen-friendly). No Python row
loop anywhere: decoding 100 TB of WAL batches is a scan-shaped job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["WAL2JSON_SCHEMA", "decode_wal2json", "project_stream", "op_type_column"]

_CHANGE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("columnnames", T.ArrayType(T.StringType())),
        T.StructField("columntypes", T.ArrayType(T.StringType())),
        T.StructField("columnvalues", T.ArrayType(T.StringType())),
        T.StructField(
            "oldkeys",
            T.StructType(
                [
                    T.StructField("keynames", T.ArrayType(T.StringType())),
                    T.StructField("keytypes", T.ArrayType(T.StringType())),
                    T.StructField("keyvalues", T.ArrayType(T.StringType())),
                ]
            ),
        ),
    ]
)

WAL2JSON_SCHEMA = T.StructType(
    [
        T.StructField("nextlsn", T.StringType()),
        T.StructField("timestamp", T.StringType()),
        T.StructField("change", T.ArrayType(_CHANGE)),
    ]
)


def op_type_column(kind: Column, dedup_inserts: bool = False) -> Column:
    """wal2json kind → engine _op_type (drivers/abstract/cdc.go:165-179).
    Unknown kinds default to the insert op, matching the reference's
    mapChangeKindToOperationType fallthrough."""
    insert_op = F.lit("i") if dedup_inserts else F.lit("c")
    return (
        F.when(kind == "update", F.lit("u"))
        .when(kind == "delete", F.lit("d"))
        .otherwise(insert_op)
    )


def decode_wal2json(
    raw: DataFrame,
    message_col: str = "value",
    tables: list[str] | None = None,
    dedup_inserts: bool = False,
) -> DataFrame:
    """Raw wal2json message strings → exploded changelog.

    Output: (schema, table, _op_type, _cdc_lsn, _cdc_timestamp,
    data map<string,string>). Messages with empty change arrays (keepalives/
    commits without DML) produce no rows, exactly like the reference's
    early return (filter.go:44-46).
    """
    parsed = raw.select(
        F.from_json(F.col(message_col).cast("string"), WAL2JSON_SCHEMA).alias("_m")
    )
    ch = parsed.select(
        F.col("_m.nextlsn").alias("_cdc_lsn"),
        F.to_timestamp("_m.timestamp").alias("_cdc_timestamp"),
        F.explode("_m.change").alias("_c"),
    )
    if tables is not None:
        ch = ch.filter(F.col("_c.table").isin(tables))
    # only DML kinds become rows — non-DML entries (truncate, message) would
    # otherwise surface as null-data rows (the reference handles only
    # insert/update/delete change kinds, filter.go:33-89)
    ch = ch.filter(F.col("_c.kind").isin(["insert", "update", "delete"]))
    is_delete = F.col("_c.kind") == "delete"
    names = F.when(is_delete, F.col("_c.oldkeys.keynames")).otherwise(
        F.col("_c.columnnames")
    )
    values = F.when(is_delete, F.col("_c.oldkeys.keyvalues")).otherwise(
        F.col("_c.columnvalues")
    )
    return ch.select(
        F.col("_c.schema").alias("schema"),
        F.col("_c.table").alias("table"),
        op_type_column(F.col("_c.kind"), dedup_inserts).alias("_op_type"),
        "_cdc_lsn",
        "_cdc_timestamp",
        F.map_from_arrays(names, values).alias("data"),
    )


def project_stream(changelog: DataFrame, schema: T.StructType) -> DataFrame:
    """Type the map-shaped changelog into one stream's columns: CAST each
    map entry to the stream schema's type (stringified WAL values → typed
    columns, the filter.go converter step as codegen expressions)."""
    cols = [
        F.col("data").getItem(f.name).cast(f.dataType).alias(f.name)
        for f in schema.fields
    ]
    return changelog.select(
        *cols, "_op_type", "_cdc_lsn", "_cdc_timestamp"
    )
