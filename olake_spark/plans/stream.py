"""Stream / catalog contracts — the ``streams.json`` public API.

Faithful re-expression of the reference's catalog model (types/stream.go:13-38,
types/catalog.go:44-67,101-160, types/sync_mode.go:5-10): ``discover`` emits a
catalog of streams with inferred schemas; the user selects streams and
attaches per-stream metadata; ``sync`` consumes the same document. The JSON
shape is kept compatible because it is the user-facing contract.

Sync modes: ``full_refresh | incremental | cdc | strict_cdc`` with default
priority on discover cdc → incremental → strict_cdc → full_refresh
(abstract.go:111-120). Default normalization is on for relational sources and
off (raw JSON mode) for document/message sources (abstract.go:122-126).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from enum import Enum

from pyspark.sql import types as T

from olake_spark.plans.filters import StreamFilter, parse_legacy_filter
from olake_spark.typesys.naming import reformat_column_name

__all__ = ["SyncMode", "StreamSpec", "StreamMetadata", "ConfiguredStream", "Catalog"]


class SyncMode(str, Enum):
    FULL_REFRESH = "full_refresh"
    INCREMENTAL = "incremental"
    CDC = "cdc"
    STRICT_CDC = "strict_cdc"  # CDC without initial backfill


_MODE_PRIORITY = [SyncMode.CDC, SyncMode.INCREMENTAL, SyncMode.STRICT_CDC, SyncMode.FULL_REFRESH]


@dataclass
class StreamSpec:
    """One source table/collection/topic with its inferred schema."""

    name: str
    namespace: str = ""
    schema_json: dict = field(default_factory=dict)  # Spark StructType.jsonValue()
    supported_sync_modes: list[str] = field(
        default_factory=lambda: [SyncMode.FULL_REFRESH.value]
    )
    source_defined_primary_key: list[str] = field(default_factory=list)
    available_cursor_fields: list[str] = field(default_factory=list)
    sync_mode: str = SyncMode.FULL_REFRESH.value

    @property
    def spark_schema(self) -> T.StructType:
        return T.StructType.fromJson(self.schema_json)

    def default_sync_mode(self) -> str:
        for m in _MODE_PRIORITY:
            if m.value in self.supported_sync_modes:
                return m.value
        return SyncMode.FULL_REFRESH.value


@dataclass
class StreamMetadata:
    """Per-stream user configuration (types/catalog.go:44-62)."""

    stream_name: str
    namespace: str = ""
    chunk_column: str = ""
    partition_regex: str = ""
    append_mode: bool = False
    normalization: bool = True
    use_source_column_names: bool = False
    filter: str = ""  # legacy string grammar
    filter_config: dict | None = None  # structured {conditions, logical}
    selected_columns: list[str] | None = None
    sync_new_columns: bool = True

    def stream_filter(self) -> StreamFilter:
        if self.filter_config:
            from olake_spark.plans.filters import FilterCondition

            conds = tuple(
                FilterCondition(c["column"], c["op"], c.get("value"))
                for c in self.filter_config.get("conditions", [])
            )
            return StreamFilter(conds, self.filter_config.get("logical", "and"))
        if self.filter:
            return parse_legacy_filter(self.filter)
        return StreamFilter()


@dataclass
class ConfiguredStream:
    stream: StreamSpec
    metadata: StreamMetadata

    def destination_column(self, source_name: str) -> str:
        return reformat_column_name(source_name, self.metadata.use_source_column_names)


@dataclass
class Catalog:
    """The streams.json document: selected streams + full stream list."""

    selected_streams: dict[str, list[StreamMetadata]] = field(default_factory=dict)
    streams: list[ConfiguredStream] = field(default_factory=list)

    def to_json(self) -> str:
        return json.dumps(
            {
                "selected_streams": {
                    ns: [asdict(m) for m in metas] for ns, metas in self.selected_streams.items()
                },
                "streams": [
                    {"stream": asdict(cs.stream), "metadata": asdict(cs.metadata)}
                    for cs in self.streams
                ],
            },
            indent=2,
        )

    @classmethod
    def from_json(cls, text: str) -> Catalog:
        doc = json.loads(text)
        return cls(
            selected_streams={
                ns: [StreamMetadata(**m) for m in metas]
                for ns, metas in doc.get("selected_streams", {}).items()
            },
            streams=[
                ConfiguredStream(
                    StreamSpec(**s["stream"]), StreamMetadata(**s["metadata"])
                )
                for s in doc.get("streams", [])
            ],
        )

    def merge_rediscovered(self, fresh: Catalog) -> Catalog:
        """Merge a re-discover against this catalog (types/catalog.go:101-160):
        keep user metadata and chosen sync modes for streams that still
        exist, adopt fresh schemas, add new streams, drop vanished ones."""
        by_key = {(cs.stream.namespace, cs.stream.name): cs for cs in self.streams}
        merged: list[ConfiguredStream] = []
        for cs in fresh.streams:
            key = (cs.stream.namespace, cs.stream.name)
            if key in by_key:
                old = by_key[key]
                cs = ConfiguredStream(cs.stream, old.metadata)
                cs.stream.sync_mode = old.stream.sync_mode
            merged.append(cs)
        fresh_keys = {(cs.stream.namespace, cs.stream.name) for cs in fresh.streams}
        selected = {
            ns: [m for m in metas if (ns, m.stream_name) in fresh_keys]
            for ns, metas in self.selected_streams.items()
        }
        return Catalog(selected_streams=selected, streams=merged)

    def diff(self, other: Catalog) -> dict:
        """Stream-level delta between two catalogs (compareStreams parity)."""
        mine = {(cs.stream.namespace, cs.stream.name) for cs in self.streams}
        theirs = {(cs.stream.namespace, cs.stream.name) for cs in other.streams}
        return {
            "added": sorted(f"{ns}.{n}" for ns, n in theirs - mine),
            "removed": sorted(f"{ns}.{n}" for ns, n in mine - theirs),
        }
