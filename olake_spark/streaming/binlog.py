"""MySQL binlog CDC — rows-event decode + Debezium envelope, Spark-first.

The reference tails the binlog with a native Go syncer (pkg/binlog/
binlog.go:1-185) and converts RowsEvents row-by-row (pkg/binlog/
filter.go:52-130). The wire-level tailing is inherently driver-side (a
single ordered log, like the PG replication slot — SURVEY §2.6); what Spark
owns is everything after bytes become rows:

- ``decode_rows_events`` — RowsEvent batches (from a driver-side reader
  that JSON-serializes go-mysql-shaped events, or any equivalent feed) →
  changelog rows with the reference's exact semantics:
  event-type → op (filter.go:60-70, both v1 and v2 event names);
  update events carry (before, after) image pairs interleaved and only
  after-images survive (filter.go:79-87);
  timestamp = microsecond GTID event time when available else
  whole-second header time (filter.go:98-101);
  every row carries ``_cdc_binlog_file_name`` / ``_cdc_binlog_file_pos``
  (filter.go:21-24, 103-110)
- ``decode_debezium`` — the public Debezium MySQL envelope (the
  Kafka-delegated flavor of the same log): op c/u/d/r, before-image for
  deletes, source file/pos/ts_ms
- ``position_key`` / ``reconcile_position`` — binlog position ordering
  (numeric file suffix, then offset — mysql.Position.Compare) and the
  metadata-vs-state crash reconcile (drivers/mysql/internal/cdc.go:86-110):
  destination metadata ahead ⇒ the state write was lost after commit,
  resume from metadata

Insert rows map to ``"i"`` while the backfill-overlap dedup window is open
and ``"c"`` after (drivers/abstract/cdc.go:165-179), same as the wal2json
decoder.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "ROWS_EVENT_SCHEMA",
    "decode_rows_events",
    "DEBEZIUM_SCHEMA",
    "decode_debezium",
    "position_key",
    "reconcile_position",
]


def position_key(file_name: str, pos: int) -> tuple[int, int]:
    """Binlog position as a sortable pair: (numeric file suffix, offset) —
    mysql.Position.Compare semantics (later file wins, then offset)."""
    suffix = file_name.rsplit(".", 1)[-1]
    return (int(suffix), int(pos))


def reconcile_position(
    state: tuple[str, int] | None, metadata: tuple[str, int] | None
) -> tuple[str, int] | None:
    """Crash-recovery rule (drivers/mysql/internal/cdc.go:86-110): the
    destination metadata position ahead of the state position means data was
    committed but the state write was lost — resume from metadata so
    committed events are not re-read; otherwise the state position stands."""
    if state is None:
        return metadata
    if metadata is not None and position_key(*metadata) > position_key(*state):
        return metadata
    return state


def _position_key_col(file_col: Column, pos_col: Column) -> Column:
    return F.regexp_extract(file_col, r"(\d+)$", 1).cast("bigint") * F.lit(
        4294967296
    ) + pos_col.cast("bigint")


# the shape a driver-side binlog reader JSON-serializes per RowsEvent; row
# images stay JSON strings (schema-on-read per stream, like wal2json's map)
ROWS_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("rows", T.ArrayType(T.StringType())),
        T.StructField("header_timestamp", T.LongType()),  # whole seconds
        T.StructField("gtid_timestamp", T.TimestampType()),  # µs, MySQL ≥8.0.1
        T.StructField("file", T.StringType()),
        T.StructField("pos", T.LongType()),
    ]
)


def decode_rows_events(
    events: DataFrame, tables: list[str] | None = None, dedup_inserts: bool = False
) -> DataFrame:
    """RowsEvent batches → exploded changelog.

    Output: (schema, table, _op_type, data, _cdc_timestamp,
    _cdc_binlog_file_name, _cdc_binlog_file_pos, _cdc_pos_key). Non-DML
    event types produce no rows (filter.go:68-70's default return); update
    events keep only the after-images — rows arrive as interleaved
    [before, after, before, after, …] pairs and odd positions survive
    (filter.go:79-87).
    """
    et = F.col("event_type")
    op_raw = (
        F.when(et.startswith("WRITE_ROWS"), "insert")
        .when(et.startswith("UPDATE_ROWS"), "update")
        .when(et.startswith("DELETE_ROWS"), "delete")
    )
    ev = events.withColumn("_op_raw", op_raw).filter(F.col("_op_raw").isNotNull())
    if tables is not None:
        ev = ev.filter(F.col("table").isin(tables))
    exploded = ev.select(
        "schema",
        "table",
        "_op_raw",
        F.coalesce(
            F.col("gtid_timestamp"), F.timestamp_seconds(F.col("header_timestamp"))
        ).alias("_cdc_timestamp"),
        F.col("file").alias("_cdc_binlog_file_name"),
        F.col("pos").alias("_cdc_binlog_file_pos"),
        F.posexplode("rows").alias("_i", "data"),
    ).filter((F.col("_op_raw") != "update") | (F.col("_i") % 2 == 1))
    insert_op = F.lit("i") if dedup_inserts else F.lit("c")
    op = (
        F.when(F.col("_op_raw") == "insert", insert_op)
        .when(F.col("_op_raw") == "update", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    return exploded.select(
        "schema",
        "table",
        op.alias("_op_type"),
        "data",
        "_cdc_timestamp",
        "_cdc_binlog_file_name",
        "_cdc_binlog_file_pos",
        _position_key_col(
            F.col("_cdc_binlog_file_name"), F.col("_cdc_binlog_file_pos")
        ).alias("_cdc_pos_key"),
    )


_DBZ_SOURCE = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("pos", T.LongType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("db", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("snapshot", T.StringType()),
    ]
)

_DBZ_PAYLOAD = T.StructType(
    [
        T.StructField("before", T.StringType()),
        T.StructField("after", T.StringType()),
        T.StructField("source", _DBZ_SOURCE),
        T.StructField("op", T.StringType()),
        T.StructField("ts_ms", T.LongType()),
    ]
)

# Debezium emits either {schema, payload} or the bare payload when
# schemas are disabled — parse both, prefer the wrapped form
DEBEZIUM_SCHEMA = T.StructType(
    [T.StructField("payload", _DBZ_PAYLOAD)] + list(_DBZ_PAYLOAD.fields)
)


def decode_debezium(
    raw: DataFrame, message_col: str = "value", tables: list[str] | None = None
) -> DataFrame:
    """Debezium MySQL envelope JSON → the same changelog shape as
    ``decode_rows_events``.

    Op codes map straight through (c/u/d plus r for snapshot reads — the
    engine's backfill op); deletes read the before-image (the after-image is
    null in delete envelopes), everything else the after-image. The source
    block's file/pos become the binlog extra columns and ``source.ts_ms``
    (the DB commit time) the CDC timestamp.
    """
    m = F.from_json(F.col(message_col).cast("string"), DEBEZIUM_SCHEMA)
    p = F.coalesce(F.col("_m.payload"), F.struct(*[F.col(f"_m.{f.name}") for f in _DBZ_PAYLOAD.fields]))
    parsed = raw.select(m.alias("_m")).select(p.alias("_p")).filter(
        F.col("_p.op").isin("c", "u", "d", "r")
    )
    if tables is not None:
        parsed = parsed.filter(F.col("_p.source.table").isin(tables))
    data = F.when(F.col("_p.op") == "d", F.col("_p.before")).otherwise(F.col("_p.after"))
    return parsed.select(
        F.col("_p.source.db").alias("schema"),
        F.col("_p.source.table").alias("table"),
        F.col("_p.op").alias("_op_type"),
        data.alias("data"),
        F.timestamp_millis(F.col("_p.source.ts_ms")).alias("_cdc_timestamp"),
        F.col("_p.source.file").alias("_cdc_binlog_file_name"),
        F.col("_p.source.pos").alias("_cdc_binlog_file_pos"),
        _position_key_col(F.col("_p.source.file"), F.col("_p.source.pos")).alias(
            "_cdc_pos_key"
        ),
    )
