"""MongoDB change-stream CDC — bounded-drain planning + DataFrame decode.

The reference watches each collection with a resume-token cursor and drains
until the stream catches up to the cluster opTime captured at start
(drivers/mongodb/internal/cdc.go:70-250). Spark-first, the same bounded run
is: mongo-spark's streaming source (or a batch of raw change-stream JSON
docs) → ``decode_change_stream`` (from_json + the reference's per-op
document selection) → MERGE replay, with the driver-side pieces — resume
token ordering, catch-up rule, crash reconcile — as pure functions here.

Reference semantics reproduced:

- watch pipeline filters to insert/update/replace/delete and requests
  ``fullDocument=updateLookup`` + ``fullDocumentBeforeChange=whenAvailable``
  (cdc.go:97-104) → ``change_stream_config``
- resume token ``_data`` embeds a keystring: byte 0 marker, bytes 1-5
  big-endian seconds, bytes 5-9 increment (cdc.go:280-290) →
  ``resume_token_optime``
- bounded drain: terminate when the stream's token opTime reaches the
  cluster opTime captured at start — NOT lastOplogTime > streamOpTime
  (cdc.go:146-163) → ``caught_up``
- crash reconcile: destination metadata token ahead of state token ⇒ the
  state write was lost after commit; resume from metadata (cdc.go:76-89).
  Tokens compare lexicographically (keystrings are order-preserving hex) →
  ``reconcile_resume_token``
- per-change document selection (cdc.go:166-192): delete reads the
  before-image, else the documentKey; update with a null after-image
  (doc deleted before the updateLookup) reads the before-image;
  replace → update (cdc.go:316-323); change timestamp = millisecond
  ``wallTime`` when present else whole-second ``clusterTime``
  (UnixMilli(T*1000 + I) — the increment lands in the ms slot, parity
  with cdc.go:189-192) → ``decode_change_stream``
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "CHANGE_STREAM_MATCH",
    "change_stream_config",
    "resume_token_optime",
    "caught_up",
    "reconcile_resume_token",
    "CHANGE_DOC_SCHEMA",
    "decode_change_stream",
]

CHANGE_STREAM_MATCH = [
    {"$match": {"operationType": {"$in": ["insert", "update", "replace", "delete"]}}}
]


@dataclass(frozen=True)
class ChangeStreamConfig:
    """The watch options the reference sets (cdc.go:97-106), in the shape
    mongo-spark exposes them (``spark.mongodb.read.*`` options)."""

    resume_after: str | None
    pipeline: list[dict] = field(default_factory=lambda: list(CHANGE_STREAM_MATCH))
    full_document: str = "updateLookup"
    full_document_before_change: str = "whenAvailable"

    def to_options(self) -> dict[str, str]:
        import json

        opts = {
            "change.stream.publish.full.document.only": "false",
            "change.stream.lookup.full.document": self.full_document,
            "aggregation.pipeline": json.dumps(self.pipeline),
        }
        if self.resume_after is not None:
            opts["change.stream.startup.mode"] = "resume_token"
            opts["change.stream.startup.mode.resume.token"] = self.resume_after
        return opts


def change_stream_config(resume_after: str | None) -> ChangeStreamConfig:
    return ChangeStreamConfig(resume_after=resume_after)


def resume_token_optime(token_hex: str) -> tuple[int, int]:
    """Resume token ``_data`` hex → (seconds, increment): keystring byte 0 is
    the type marker, bytes 1-5 big-endian epoch seconds, bytes 5-9 increment
    (cdc.go:280-290)."""
    raw = bytes.fromhex(token_hex)
    if len(raw) < 9:
        raise ValueError("invalid resume token")
    return (
        int.from_bytes(raw[1:5], "big"),
        int.from_bytes(raw[5:9], "big"),
    )


def caught_up(token_hex: str, cluster_optime: tuple[int, int]) -> bool:
    """The bounded-drain stop rule (cdc.go:156-161): stop when the cluster
    opTime captured at start is no longer AFTER the stream's token opTime."""
    return not (cluster_optime > resume_token_optime(token_hex))


def reconcile_resume_token(state_token: str | None, metadata_token: str | None) -> str | None:
    """Crash-recovery rule (cdc.go:76-89): metadata (committed with data)
    ahead of state ⇒ the state write was lost after a destination commit —
    resume from metadata so committed events are not re-read. Otherwise the
    state token stands. Keystring hex compares lexicographically."""
    if state_token is None:
        return metadata_token
    if metadata_token is not None and state_token < metadata_token:
        return metadata_token
    return state_token


_OPTIME = T.StructType([T.StructField("t", T.LongType()), T.StructField("i", T.LongType())])

CHANGE_DOC_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StructType([T.StructField("_data", T.StringType())])),
        T.StructField("operationType", T.StringType()),
        T.StructField("clusterTime", _OPTIME),
        T.StructField("wallTime", T.LongType()),  # epoch millis
        T.StructField("fullDocument", T.StringType()),
        T.StructField("fullDocumentBeforeChange", T.StringType()),
        T.StructField("documentKey", T.StringType()),
    ]
)


def decode_change_stream(raw: DataFrame, message_col: str = "value") -> DataFrame:
    """Raw change-stream event JSON → CDC changelog rows.

    Output: (``_op_type`` c/u/d, ``data`` JSON string of the selected
    document, ``_cdc_timestamp`` millisecond-precision, ``_cdc_resume_token``)
    — the same shape ``wal2json.decode_wal2json`` emits, so the MERGE replay
    path downstream is shared. Document bodies stay JSON strings here
    (schema-on-read per stream via ``from_json`` later), matching the
    reference's map-shaped records.
    """
    m = F.from_json(F.col(message_col).cast("string"), CHANGE_DOC_SCHEMA)
    parsed = raw.select(m.alias("_m")).where(
        F.col("_m.operationType").isin("insert", "update", "replace", "delete")
    )
    op = F.col("_m.operationType")
    norm_op = F.when(op == "replace", F.lit("update")).otherwise(op)
    doc = (
        F.when(
            norm_op == "delete",
            F.coalesce(F.col("_m.fullDocumentBeforeChange"), F.col("_m.documentKey")),
        )
        .when(
            norm_op == "update",
            F.coalesce(F.col("_m.fullDocument"), F.col("_m.fullDocumentBeforeChange")),
        )
        .otherwise(F.col("_m.fullDocument"))
    )
    ts_ms = F.coalesce(
        F.col("_m.wallTime"),
        F.col("_m.clusterTime.t") * 1000 + F.col("_m.clusterTime.i"),
    )
    op_type = (
        F.when(norm_op == "insert", F.lit("c"))
        .when(norm_op == "update", F.lit("u"))
        .otherwise(F.lit("d"))
    )
    return parsed.select(
        op_type.alias("_op_type"),
        doc.alias("data"),
        F.timestamp_millis(ts_ms).alias("_cdc_timestamp"),
        F.col("_m._id._data").alias("_cdc_resume_token"),
    )
