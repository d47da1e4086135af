"""Kafka source — bounded-drain reads, metadata columns, Confluent wire
format.

Reference behavior (drivers/kafka/internal/kafka.go, cdc.go, pkg/kafka/*):

- topics discovered minus internal ones (``__amazon_msk_canary``,
  ``_schemas``, plus the ``__*`` broker-internal family) — kafka.go:37
- every record carries ``_kafka_key / _kafka_offset / _kafka_partition /
  _kafka_timestamp`` metadata columns; the synthetic primary key is
  (offset, partition) — kafka.go:27-30
- each sync captures end offsets at start and drains to them then exits
  (cdc.go:115-121) — exactly Spark's ``Trigger.AvailableNow``
- Avro messages use the Confluent wire format: magic byte 0x00 + 4-byte
  big-endian schema id + Avro body (schema_registry.go); JSON messages
  decode directly.

Without a broker or the spark-sql-kafka connector jar in this container,
everything here is the driver-side planning layer: option dicts for
``spark.read/readStream.format("kafka")``, the metadata projection, and the
wire-format splitter (pure binary Column expressions). All unit-testable;
the connector jar is config, not code.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "INTERNAL_TOPICS",
    "KAFKA_KEY",
    "KAFKA_OFFSET",
    "KAFKA_PARTITION",
    "KAFKA_TIMESTAMP",
    "KafkaSource",
    "filter_internal_topics",
    "split_confluent_wire",
    "kafka_metadata_columns",
    "avro_available",
    "SAMPLE_MAX_PER_PARTITION",
    "sample_offset_plan",
    "sample_read_options",
]

# schema-discovery sample bound per partition (kafka.go:236-237)
SAMPLE_MAX_PER_PARTITION = 10_000


def sample_offset_plan(
    topic: str,
    start_offsets: dict[int, int],
    end_offsets: dict[int, int],
    max_per_partition: int = SAMPLE_MAX_PER_PARTITION,
) -> tuple[dict, dict] | None:
    """Per-partition sample bounds for schema discovery.

    The reference runs one consumer per partition that stops at 10k messages
    or the end offset (drivers/kafka/internal/kafka.go:191-243). Spark-first
    the same contract is a bounded OFFSET RANGE per partition resolved at
    planning time — one ``spark.read.format("kafka")`` job then reads every
    partition's slice in parallel, no consumer loop. Empty partitions are
    skipped (kafka.go:202-205); returns None when nothing has data.
    """
    starts: dict[str, int] = {}
    ends: dict[str, int] = {}
    for p, start in sorted(start_offsets.items()):
        end = end_offsets.get(p, start)
        if start >= end:
            continue  # empty partition
        starts[str(p)] = start
        ends[str(p)] = min(start + max_per_partition, end)
    if not starts:
        return None
    return {topic: starts}, {topic: ends}


def sample_read_options(
    bootstrap_servers: str,
    topic: str,
    start_offsets: dict[int, int],
    end_offsets: dict[int, int],
    max_per_partition: int = SAMPLE_MAX_PER_PARTITION,
) -> dict[str, str] | None:
    """Ready-to-use ``spark.read.format("kafka")`` options for the sample."""
    import json as _json

    plan = sample_offset_plan(topic, start_offsets, end_offsets, max_per_partition)
    if plan is None:
        return None
    starts, ends = plan
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "assign": _json.dumps({topic: [int(p) for p in starts[topic]]}),
        "startingOffsets": _json.dumps(starts),
        "endingOffsets": _json.dumps(ends),
    }

INTERNAL_TOPICS = ["__amazon_msk_canary", "_schemas"]  # kafka.go:37
KAFKA_KEY = "_kafka_key"
KAFKA_OFFSET = "_kafka_offset"
KAFKA_PARTITION = "_kafka_partition"
KAFKA_TIMESTAMP = "_kafka_timestamp"


def filter_internal_topics(topics: list[str]) -> list[str]:
    """Drop broker-internal (``__``-prefixed) and known service topics."""
    return [
        t for t in topics if t not in INTERNAL_TOPICS and not t.startswith("__")
    ]


def avro_available(spark: SparkSession) -> bool:
    """True when the spark-avro module is loaded (from_avro usable).

    Checked empirically — the Avro classes can be on the classpath while
    the SQL functions stay unusable (AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE)
    unless the spark-avro package is registered.
    """
    try:
        from pyspark.sql.avro.functions import from_avro

        (
            spark.range(1)
            .select(from_avro(F.lit(b"\x02"), '"int"').alias("v"))
            .collect()
        )
        return True
    except Exception:
        return False


def split_confluent_wire(value: Column | str) -> tuple[Column, Column, Column]:
    """(is_wire_format, schema_id, payload) from a Kafka value column.

    Wire format = 0x00 magic byte + 4-byte big-endian schema id + body
    (pkg/kafka/schema_registry.go). Pure binary expressions — no UDF.
    Non-wire-format values get schema_id NULL and the untouched payload.
    """
    c = F.col(value) if isinstance(value, str) else value
    is_wire = (F.length(c) >= 5) & (F.substring(c, 1, 1) == F.lit(b"\x00"))
    schema_id = F.when(
        is_wire, F.conv(F.hex(F.substring(c, 2, 4)), 16, 10).cast("int")
    )
    payload = F.when(is_wire, F.expr(f"substring({_sql(c)}, 6)")).otherwise(c)
    return is_wire, schema_id, payload


def _sql(c: Column) -> str:
    # Column name usable inside F.expr — only called on plain column refs
    return c._jc.toString()  # noqa: SLF001


def kafka_metadata_columns(df: DataFrame) -> DataFrame:
    """Project the connector's (key, value, topic, partition, offset,
    timestamp) into the reference's metadata column names; synthetic PK is
    (_kafka_offset, _kafka_partition)."""
    return df.select(
        F.col("value"),
        F.col("key").cast("string").alias(KAFKA_KEY),
        F.col("offset").alias(KAFKA_OFFSET),
        F.col("partition").alias(KAFKA_PARTITION),
        F.col("timestamp").alias(KAFKA_TIMESTAMP),
    )


@dataclass
class KafkaSource:
    """Driver-side plan for a bounded Kafka drain."""

    bootstrap_servers: str
    topics: list[str]
    group_id: str = "olake-spark"
    max_offsets_per_trigger: int | None = None
    starting_offsets: str = "earliest"

    extra_options: dict = field(default_factory=dict)

    def batch_options(self) -> dict[str, str]:
        """Options for ``spark.read.format("kafka")`` — a bounded snapshot:
        endingOffsets=latest is resolved ONCE at planning, the reference's
        'capture end offsets then drain' contract."""
        return {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": ",".join(filter_internal_topics(self.topics)),
            "startingOffsets": self.starting_offsets,
            "endingOffsets": "latest",
            "kafka.group.id": self.group_id,
            **{k: str(v) for k, v in self.extra_options.items()},
        }

    def stream_options(self) -> dict[str, str]:
        """Options for ``spark.readStream.format("kafka")`` under
        ``Trigger.AvailableNow`` (rate-limited bounded drain)."""
        out = {
            "kafka.bootstrap.servers": self.bootstrap_servers,
            "subscribe": ",".join(filter_internal_topics(self.topics)),
            "startingOffsets": self.starting_offsets,
            "kafka.group.id": self.group_id,
            **{k: str(v) for k, v in self.extra_options.items()},
        }
        if self.max_offsets_per_trigger is not None:
            out["maxOffsetsPerTrigger"] = str(self.max_offsets_per_trigger)
        return out

    def decode_json(self, df: DataFrame, schema) -> DataFrame:
        """JSON-value decode path: metadata columns + parsed payload."""
        meta = kafka_metadata_columns(df)
        return meta.withColumn(
            "_parsed", F.from_json(F.col("value").cast("string"), schema)
        ).select("_parsed.*", KAFKA_KEY, KAFKA_OFFSET, KAFKA_PARTITION, KAFKA_TIMESTAMP)

    def decode_avro(self, spark: SparkSession, df: DataFrame, avro_schema: str) -> DataFrame:
        """Confluent-Avro decode path; requires the spark-avro module."""
        if not avro_available(spark):
            raise NotImplementedError(
                "spark-avro module not loaded — add org.apache.spark:spark-avro "
                "to spark.jars.packages; wire-format split still works without it"
            )
        from pyspark.sql.avro.functions import from_avro

        meta = kafka_metadata_columns(df)
        _, schema_id, payload = split_confluent_wire(F.col("value"))
        return meta.withColumn("_schema_id", schema_id).withColumn(
            "_decoded", from_avro(payload, avro_schema)
        )

    def decode_avro_registry(self, df: DataFrame, registry_client) -> DataFrame:
        """Registry-driven Avro decode: writer schemas are resolved by id
        from the Schema Registry (cached, driver-side —
        pkg/kafka/schema_registry.go:45-98) and the per-id codecs decode
        distributed. Works without the spark-avro jar and handles topics
        whose messages span multiple schema versions."""
        from olake_spark.sources.schema_registry import resolve_and_decode

        return resolve_and_decode(kafka_metadata_columns(df), registry_client)
