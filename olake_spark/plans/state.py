"""Sync state document — resumable chunks, cursors, log positions.

Mirrors the reference's three-layer state (types/state.go): GLOBAL state for
one shared log position (relational CDC), per-STREAM state for cursor values
and the pending chunk set, MIXED for both. Chunks are removed one-by-one as
they complete → a killed backfill resumes from the surviving set
(types/state.go:192-255).

The JSON document is engine-local (a file path or any blob store); the
authoritative committed position additionally rides in the sink table's
properties (see sinks.table / streaming.replay), and on startup
``reconcile`` replays the reference's 2PC recovery rule: if the table's
committed position is ahead of this document, the crash happened between
table commit and state write — trust the table.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from datetime import datetime, timezone
from decimal import Decimal

from olake_spark.plans.chunks import Chunk

__all__ = ["StreamState", "SyncState", "cursor_to_json", "cursor_less_than"]


def cursor_to_json(value):
    """Normalize a cursor value to a JSON-native type that round-trips.

    Numbers stay numbers (never stringified — '9' > '100' lexicographically),
    timestamps become ISO strings (sortable and re-parseable), everything
    else passes through.
    """
    if isinstance(value, datetime):
        return value.isoformat(sep=" ")
    if isinstance(value, Decimal):
        return float(value)
    return value


def _cursor_key(value) -> tuple[str, object]:
    """(type-class, comparable) for type-aware cursor ordering."""
    if isinstance(value, bool):
        return ("num", float(value))
    if isinstance(value, (int, float)):
        return ("num", float(value))
    if isinstance(value, Decimal):
        return ("num", float(value))
    if isinstance(value, datetime):
        dt = value if value.tzinfo else value.replace(tzinfo=timezone.utc)
        return ("ts", dt.timestamp())
    if isinstance(value, str):
        try:
            return ("num", float(value))
        except ValueError:
            pass
        try:
            dt = datetime.fromisoformat(value)
            return _cursor_key(dt)
        except ValueError:
            pass
        return ("str", value)
    return ("str", str(value))


def cursor_less_than(a, b) -> bool:
    """Type-aware cursor ordering: numeric/epoch cursors compare as numbers,
    ISO timestamps as instants; only genuinely-textual cursors compare
    lexicographically. Mixed type-classes fall back to string compare."""
    ka, kb = _cursor_key(a), _cursor_key(b)
    if ka[0] == kb[0]:
        return ka[1] < kb[1]
    return str(a) < str(b)


@dataclass
class StreamState:
    name: str
    namespace: str = ""
    cursor: dict = field(default_factory=dict)  # {column: last_value}
    chunks: list[Chunk] = field(default_factory=list)  # pending (not-yet-done)

    def remove_chunk(self, chunk: Chunk) -> None:
        self.chunks = [c for c in self.chunks if c != chunk]


@dataclass
class SyncState:
    type: str = "STREAM"  # GLOBAL | STREAM | MIXED
    global_state: dict = field(default_factory=dict)  # e.g. {"lsn": ...}
    streams: dict[str, StreamState] = field(default_factory=dict)

    # -- chunk lifecycle -----------------------------------------------------

    def get_or_plan_chunks(self, stream: str, planner) -> list[Chunk]:
        """Return pending chunks, planning once on first call (resumable)."""
        st = self.streams.setdefault(stream, StreamState(stream))
        if not st.chunks:
            st.chunks = list(planner())
        return list(st.chunks)

    def complete_chunk(self, stream: str, chunk: Chunk) -> None:
        self.streams[stream].remove_chunk(chunk)

    # -- cursor --------------------------------------------------------------

    def set_cursor(self, stream: str, column: str, value) -> None:
        st = self.streams.setdefault(stream, StreamState(stream))
        st.cursor[column] = value

    def get_cursor(self, stream: str, column: str):
        st = self.streams.get(stream)
        return None if st is None else st.cursor.get(column)

    # -- 2PC reconciliation --------------------------------------------------

    def reconcile(self, stream: str, column: str, table_committed) -> bool:
        """Adopt the sink-committed position if it is ahead of local state.

        Returns True when a recovery adjustment happened (the reference then
        runs a bounded "recovery sync" up to the committed position —
        drivers/postgres/internal/cdc.go:69-179)."""
        if table_committed is None:
            return False
        local = self.get_cursor(stream, column)
        if local is None or cursor_less_than(local, table_committed):
            self.set_cursor(stream, column, table_committed)
            return True
        return False

    # -- persistence ---------------------------------------------------------

    def to_json(self) -> str:
        return json.dumps(
            {
                "type": self.type,
                "global": self.global_state,
                "streams": [
                    {
                        "name": st.name,
                        "namespace": st.namespace,
                        "cursor": st.cursor,
                        "chunks": [[c.min, c.max] for c in st.chunks],
                    }
                    for st in self.streams.values()
                ],
            },
            indent=2,
            default=str,
        )

    @classmethod
    def from_json(cls, text: str) -> SyncState:
        """Load engine-native OR reference-shaped state.json (types/state.go:
        42-69): the reference names the stream key ``stream`` (not ``name``)
        and nests cursors + a ``chunks`` list of ``{min, max}`` objects under
        a per-stream ``state`` map."""
        doc = json.loads(text)
        out = cls(type=doc.get("type", "STREAM"), global_state=doc.get("global") or {})
        for s in doc.get("streams", []):
            name = s.get("name") or s.get("stream")
            cursor = dict(s.get("cursor") or {})
            chunks = list(s.get("chunks") or [])
            ref_state = s.get("state")
            if isinstance(ref_state, dict):
                for k, v in ref_state.items():
                    if k == "chunks":
                        chunks = v or []
                    else:
                        cursor.setdefault(k, v)
            out.streams[name] = StreamState(
                name=name,
                namespace=s.get("namespace", ""),
                cursor=cursor,
                chunks=[
                    Chunk(c["min"], c["max"]) if isinstance(c, dict) else Chunk(c[0], c[1])
                    for c in chunks
                ],
            )
        return out

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(self.to_json())
        os.replace(tmp, path)  # atomic on POSIX

    @classmethod
    def load(cls, path: str) -> SyncState:
        if not os.path.exists(path):
            return cls()
        with open(path) as fh:
            return cls.from_json(fh.read())
