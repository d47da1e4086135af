"""Stream / catalog contracts — the ``streams.json`` public API.

Faithful re-expression of the reference's catalog model (types/stream.go:13-38,
types/catalog.go:44-67,101-160, types/sync_mode.go:5-10): ``discover`` emits a
catalog of streams with inferred schemas; the user selects streams and
attaches per-stream metadata; ``sync`` consumes the same document.

``Catalog.from_json`` accepts BOTH serializations: the engine-native shape
(Spark ``StructType`` schema json) and the reference's wire shape
(``type_schema.properties`` per-column OLAKE type sets, ``cursor_field``,
nested ``selected_columns: {columns, sync_new_columns}``). Unknown keys are
ignored so a streams.json produced by the reference loads as-is; ``to_json``
writes the engine-native shape.

Sync modes: ``full_refresh | incremental | cdc | strict_cdc`` with default
priority on discover cdc → incremental → strict_cdc → full_refresh
(abstract.go:111-120). Default normalization is on for relational sources and
off (raw JSON mode) for document/message sources (abstract.go:122-126).
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field, fields as dc_fields
from enum import Enum

from pyspark.sql import types as T

from olake_spark.plans.filters import StreamFilter, parse_legacy_filter
from olake_spark.typesys.naming import reformat_column_name

__all__ = [
    "SyncMode",
    "StreamSpec",
    "StreamMetadata",
    "ConfiguredStream",
    "Catalog",
    "generate_destination_details",
    "merge_selected_columns",
]


class SyncMode(str, Enum):
    FULL_REFRESH = "full_refresh"
    INCREMENTAL = "incremental"
    CDC = "cdc"
    STRICT_CDC = "strict_cdc"  # CDC without initial backfill


_MODE_PRIORITY = [SyncMode.CDC, SyncMode.INCREMENTAL, SyncMode.STRICT_CDC, SyncMode.FULL_REFRESH]


def generate_destination_details(
    namespace: str,
    name: str,
    source_database: str | None = None,
    prefix: str = "",
) -> tuple[str, str]:
    """Default destination (database, table) for a discovered stream —
    utils.GenerateDestinationDetails parity (utils/utils.go:421-444):
    ``[prefix_]sourcedb[:namespace]`` (every part Reformat-normalized,
    namespace attached after a ``:``), table = normalized stream name."""
    parts = [reformat_column_name(p) for p in (prefix, source_database or "") if p]
    db = "_".join(parts)
    if namespace:
        db = f"{db}:{reformat_column_name(namespace)}"
    return db, reformat_column_name(name)


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
    cursor_field: str = ""
    # where the sink writes this stream (types/stream.go:33-35); empty =
    # derive from namespace/name at sync time (generate_destination_details)
    destination_database: str = ""
    destination_table: str = ""
    # connector-level defaults for normalization/append (types/stream.go:40)
    default_stream_properties: dict | None = None

    @property
    def spark_schema(self) -> T.StructType:
        return T.StructType.fromJson(self.schema_json)

    @classmethod
    def from_dict(cls, s: dict) -> "StreamSpec":
        """Load from engine-native OR reference wire shape (types/stream.go:
        13-38). Reference-specific translations: ``type_schema.properties``
        (per-column OLAKE type sets) → Spark schema via the typecast lattice;
        ``cursor_field`` seeds ``available_cursor_fields``. Unknown keys
        (destination_table, additional_properties, ...) are ignored."""
        d = dict(s)
        if "type_schema" in d and not d.get("schema_json"):
            from olake_spark.typesys.lattice import DataType, fold_types, to_spark_type

            props = (d.get("type_schema") or {}).get("properties") or {}
            sf = []
            for col in sorted(props):
                p = props[col] or {}
                tset = list(p.get("type") or [])
                named = [t for t in tset if t != "null"]
                spark_t = (
                    to_spark_type(fold_types([DataType(t) for t in named]))
                    if named
                    else T.StringType()
                )
                sf.append(T.StructField(col, spark_t, not named or "null" in tset))
            d["schema_json"] = T.StructType(sf).jsonValue()
        if d.get("cursor_field") and not d.get("available_cursor_fields"):
            d["available_cursor_fields"] = [d["cursor_field"]]
        known = {f.name for f in dc_fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

    def default_sync_mode(self) -> str:
        for m in _MODE_PRIORITY:
            if m.value in self.supported_sync_modes:
                return m.value
        return SyncMode.FULL_REFRESH.value

    def destination(self) -> tuple[str, str]:
        """Effective sink (database, table): the explicit values when the
        catalog carries them, else the normalized defaults."""
        if self.destination_database or self.destination_table:
            return self.destination_database, self.destination_table
        return generate_destination_details(self.namespace, self.name)


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

    @classmethod
    def from_dict(cls, m: dict) -> "StreamMetadata":
        """Load from engine-native OR reference wire shape (types/catalog.go:
        44-62): the reference nests ``selected_columns: {columns,
        sync_new_columns}``; unknown keys are ignored."""
        d = dict(m)
        sel = d.get("selected_columns")
        if isinstance(sel, dict):
            d["selected_columns"] = sel.get("columns")
            if "sync_new_columns" in sel:
                d["sync_new_columns"] = sel["sync_new_columns"]
        known = {f.name for f in dc_fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})

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


def merge_selected_columns(
    metadata: StreamMetadata,
    old_spec: StreamSpec | None,
    new_spec: StreamSpec,
) -> StreamMetadata:
    """Selected-column re-merge on rediscover — MergeSelectedColumns parity
    (types/catalog.go:174-208): no previous selection → select the full new
    schema; otherwise iterate the NEW schema keeping engine (_olake_*/_cdc_*)
    columns, previously selected columns, and — when ``sync_new_columns`` —
    columns absent from the old schema. A column that vanished from the
    source drops out automatically (the iteration is over the new schema)."""
    from dataclasses import replace

    from olake_spark.functions.olake_columns import CDC_TS, OLAKE_COLUMNS

    new_cols = list(new_spec.spark_schema.fieldNames())
    if not metadata.selected_columns:
        return replace(metadata, selected_columns=new_cols)
    engine_cols = set(OLAKE_COLUMNS) | {CDC_TS, "_cdc_lsn"}
    prev = set(metadata.selected_columns)
    old_cols = set(old_spec.spark_schema.fieldNames()) if old_spec else set()
    kept = [
        c
        for c in new_cols
        if c in engine_cols
        or c in prev
        or (metadata.sync_new_columns and c not in old_cols)
    ]
    return replace(metadata, selected_columns=kept)


@dataclass
class ConfiguredStream:
    stream: StreamSpec
    metadata: StreamMetadata

    def destination_column(self, source_name: str) -> str:
        return reformat_column_name(source_name, self.metadata.use_source_column_names)


def _default_metadata(s: dict) -> dict:
    """Metadata for a stream entry that carries none: connector-level
    ``default_stream_properties`` (types/stream.go:40-43) seed the
    normalization / append_mode defaults."""
    meta = dict(s.get("metadata") or {"stream_name": s["stream"].get("name", "")})
    dsp = (s.get("stream") or {}).get("default_stream_properties") or {}
    if "normalization" in dsp:
        meta.setdefault("normalization", dsp["normalization"])
    if "append_mode" in dsp:
        meta.setdefault("append_mode", dsp["append_mode"])
    return meta


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
                ns: [StreamMetadata.from_dict(m) for m in metas]
                for ns, metas in doc.get("selected_streams", {}).items()
            },
            streams=[
                ConfiguredStream(
                    StreamSpec.from_dict(s["stream"]),
                    StreamMetadata.from_dict(_default_metadata(s)),
                )
                for s in doc.get("streams", [])
            ],
        )

    def _dest_db_prefix(self) -> tuple[bool, str]:
        """(constant_value, prefix) over the catalog's destination dbs —
        getDestDBPrefix parity (types/catalog.go:224-239): if every stream
        shares the same pre-``:`` segment, new streams inherit it (a bare
        constant when no ``:`` is present, else ``prefix:namespace``)."""
        if not self.streams:
            return False, ""
        head = self.streams[0].stream.destination_database.split(":")[0]
        for cs in self.streams:
            if cs.stream.destination_database.split(":")[0] != head:
                return False, ""
        constant = ":" not in self.streams[0].stream.destination_database
        return constant, head

    def merge_rediscovered(self, fresh: Catalog) -> Catalog:
        """Merge a re-discover against this catalog (types/catalog.go:101-172):
        keep user metadata, chosen sync modes, cursor fields, PKs, and
        destination naming for streams that still exist, adopt fresh
        schemas, add new streams (inheriting the catalog's destination-db
        prefix scheme, NOT auto-selected), drop vanished ones. Selected
        columns re-merge per MergeSelectedColumns (catalog.go:174-208)."""
        by_key = {(cs.stream.namespace, cs.stream.name): cs for cs in self.streams}
        constant, prefix = self._dest_db_prefix()
        merged: list[ConfiguredStream] = []
        for cs in fresh.streams:
            key = (cs.stream.namespace, cs.stream.name)
            if key in by_key:
                old = by_key[key]
                cs = ConfiguredStream(cs.stream, old.metadata)
                cs.stream.sync_mode = old.stream.sync_mode
                cs.stream.cursor_field = old.stream.cursor_field
                cs.stream.source_defined_primary_key = list(
                    old.stream.source_defined_primary_key
                )
                cs.stream.destination_database = old.stream.destination_database
                cs.stream.destination_table = old.stream.destination_table
            elif constant:
                cs.stream.destination_database = (
                    self.streams[0].stream.destination_database
                )
            elif prefix:
                cs.stream.destination_database = (
                    f"{prefix}:{reformat_column_name(cs.stream.namespace)}"
                )
            merged.append(cs)
        fresh_by_key = {(cs.stream.namespace, cs.stream.name): cs for cs in fresh.streams}
        selected: dict[str, list[StreamMetadata]] = {}
        for ns, metas in self.selected_streams.items():
            for m in metas:
                key = (ns, m.stream_name)
                if key not in fresh_by_key:
                    continue
                old_cs = by_key.get(key)
                m = merge_selected_columns(
                    m, old_cs.stream if old_cs else None, fresh_by_key[key].stream
                )
                selected.setdefault(ns, []).append(m)
        return Catalog(selected_streams=selected, streams=merged)

    def diff(self, other: Catalog) -> dict:
        """Stream-level delta between two catalogs (compareStreams parity)."""
        mine = {(cs.stream.namespace, cs.stream.name) for cs in self.streams}
        theirs = {(cs.stream.namespace, cs.stream.name) for cs in other.streams}
        return {
            "added": sorted(f"{ns}.{n}" for ns, n in theirs - mine),
            "removed": sorted(f"{ns}.{n}" for ns, n in mine - theirs),
        }

    def streams_delta(self, new: Catalog) -> Catalog:
        """The ``difference_streams.json`` artifact: a catalog holding only
        the SELECTED streams that changed between ``self`` (old) and ``new``
        (rediscovered) — types.GetStreamsDelta parity (types/catalog.go:
        241-345, emitted by protocol/discover.go compareStreams).

        A stream lands in the delta when it is newly selected, or when any
        user-facing property differs: normalization, partition_regex,
        filter / filter_config, append_mode, use_source_column_names, the
        stream's sync_mode, or (for incremental streams) the cursor field.
        """
        old_streams = {(cs.stream.namespace, cs.stream.name): cs for cs in self.streams}
        new_streams = {(cs.stream.namespace, cs.stream.name): cs for cs in new.streams}
        old_selected = {
            (ns, m.stream_name): m
            for ns, metas in self.selected_streams.items()
            for m in metas
        }
        delta = Catalog()
        for ns, metas in new.selected_streams.items():
            for new_meta in metas:
                key = (ns, new_meta.stream_name)
                new_cs = new_streams.get(key)
                if new_cs is None:
                    continue
                old_meta = old_selected.get(key)
                old_cs = old_streams.get(key)
                if old_meta is None or old_cs is None:
                    changed = True  # newly selected stream
                else:
                    cursor_delta = (
                        new_cs.stream.sync_mode == SyncMode.INCREMENTAL.value
                        and (
                            old_cs.stream.cursor_field != new_cs.stream.cursor_field
                            or old_cs.stream.available_cursor_fields
                            != new_cs.stream.available_cursor_fields
                        )
                    )
                    changed = (
                        old_meta.normalization != new_meta.normalization
                        or old_meta.partition_regex != new_meta.partition_regex
                        or old_meta.filter != new_meta.filter
                        or old_meta.filter_config != new_meta.filter_config
                        or old_meta.append_mode != new_meta.append_mode
                        or old_meta.use_source_column_names != new_meta.use_source_column_names
                        or old_cs.stream.sync_mode != new_cs.stream.sync_mode
                        # destination renames re-sync the stream
                        # (types/catalog.go:322-323)
                        or old_cs.stream.destination_database
                        != new_cs.stream.destination_database
                        or old_cs.stream.destination_table
                        != new_cs.stream.destination_table
                        or cursor_delta
                    )
                if changed:
                    delta.streams.append(new_cs)
                    delta.selected_streams.setdefault(ns, []).append(new_meta)
        return delta

    def write_difference(self, new: Catalog, path: str) -> Catalog:
        """Rediscover artifact emit (protocol/discover.go:75-99): compute the
        delta and write it next to the merged catalog."""
        delta = self.streams_delta(new)
        with open(path, "w") as fh:
            fh.write(delta.to_json())
        return delta
