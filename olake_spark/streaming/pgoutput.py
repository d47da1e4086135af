"""Postgres ``pgoutput`` logical-replication binary decoder.

The reference's second WAL plugin (pkg/waljs/pgoutput.go:1-298) decodes the
pgoutput binary protocol with a per-connection relation cache. The format is
public (PostgreSQL docs: "Logical Replication Message Formats"); this module
implements it from that spec:

- ``B`` Begin: final LSN (u64), commit ts (µs since 2000-01-01), xid (u32)
- ``C`` Commit: flags, commit LSN, end LSN, ts
- ``R`` Relation: oid, namespace\\0, name\\0, replica identity byte,
  column count, then per column: flags, name\\0, type oid, typmod
- ``I``/``U``/``D`` Insert/Update/Delete: relation oid, then tuples tagged
  ``N`` (new), ``K`` (key old) or ``O`` (full old)
- TupleData: column count, then per column ``n`` (null) | ``u`` (unchanged
  TOAST) | ``t`` + length + UTF-8 text

Reference semantics preserved:

- unchanged-TOAST recovery: on UPDATE a ``u`` column takes its value from
  the old tuple when REPLICA IDENTITY FULL shipped one, else the value is
  lost → NULL (pgoutput.go:154-160 and the :120 warning)
- DELETE emits the old-tuple values (pgoutput.go:226-249)
- OID → type-name map with the "unknown oid falls back to string/json"
  rule (pgoutput.go:252-259)
- every row event carries the transaction's Begin LSN + commit timestamp

Decoding is pure Python over bytes — inherently sequential per replication
slot (a WAL is one ordered log). The Spark wrapper ``decode_pgoutput_df``
runs it inside ``mapPartitions`` so bounded WAL batches decode off-driver;
each partition must contain its transactions' Relation messages (the
replication protocol guarantees Relation precedes first use per connection,
and the bounded-drain reader snapshots its batch from one connection).
"""

from __future__ import annotations

import datetime as dt
import struct
from collections.abc import Iterable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "OID_TO_TYPE",
    "RelationInfo",
    "PgOutputDecoder",
    "decode_messages",
    "decode_pgoutput_df",
    "encode_begin",
    "encode_commit",
    "encode_relation",
    "encode_insert",
    "encode_update",
    "encode_delete",
]

# µs between the Unix and PostgreSQL (2000-01-01) epochs
PG_EPOCH_OFFSET_US = 946_684_800 * 1_000_000

# pgoutput.go:260-298 (public pgtype OIDs); unknown → "json" (string-shaped)
OID_TO_TYPE: dict[int, str] = {
    16: "bool", 17: "bytea", 20: "int8", 21: "int2", 23: "int4",
    25: "text", 114: "json", 700: "float4", 701: "float8",
    1042: "bpchar", 1043: "varchar", 1082: "date", 1083: "time",
    1114: "timestamp", 1184: "timestamptz", 1186: "interval",
    1560: "bit", 1562: "varbit", 1700: "numeric", 2950: "uuid",
    3802: "jsonb",
}


@dataclass(frozen=True)
class RelationInfo:
    oid: int
    namespace: str
    name: str
    columns: tuple[tuple[str, int], ...]  # (name, type oid)
    replica_identity: str  # 'd' default | 'f' full | 'i' index | 'n' nothing


def _cstr(buf: bytes, pos: int) -> tuple[str, int]:
    end = buf.index(b"\x00", pos)
    return buf[pos:end].decode("utf-8"), end + 1


def _read_tuple(buf: bytes, pos: int) -> tuple[list[tuple[str, str | None]], int]:
    """TupleData → list of (kind, text|None); kind ∈ {'t','n','u'}."""
    (ncols,) = struct.unpack_from(">H", buf, pos)
    pos += 2
    cols: list[tuple[str, str | None]] = []
    for _ in range(ncols):
        kind = chr(buf[pos])
        pos += 1
        if kind == "t":
            (ln,) = struct.unpack_from(">I", buf, pos)
            pos += 4
            cols.append(("t", buf[pos : pos + ln].decode("utf-8")))
            pos += ln
        elif kind in ("n", "u"):
            cols.append((kind, None))
        else:
            raise ValueError(f"bad tuple column kind {kind!r}")
    return cols, pos


class PgOutputDecoder:
    """Stateful decoder: feeds on raw XLogData payloads, yields row events."""

    def __init__(self) -> None:
        self.relations: dict[int, RelationInfo] = {}
        self._tx_lsn: int | None = None
        self._tx_ts: dt.datetime | None = None

    def _values(
        self,
        rel: RelationInfo,
        tuple_cols: list[tuple[str, str | None]],
        old_cols: list[tuple[str, str | None]] | None,
    ) -> dict[str, str | None]:
        """Column map with unchanged-TOAST recovery (pgoutput.go:142-174)."""
        data: dict[str, str | None] = {}
        for idx, col in enumerate(tuple_cols):
            if idx >= len(rel.columns):
                continue
            if col[0] == "u" and old_cols is not None and idx < len(old_cols):
                col = old_cols[idx]
            data[rel.columns[idx][0]] = col[1]
        return data

    def decode(self, msg: bytes) -> dict | None:
        """One message → a row event dict, or None for control messages."""
        tag = chr(msg[0])
        if tag == "B":
            # ts is a SIGNED µs offset from 2000-01-01 (pre-2000 commits
            # are negative)
            lsn, ts_us, _xid = struct.unpack_from(">QqI", msg, 1)
            self._tx_lsn = lsn
            self._tx_ts = dt.datetime.fromtimestamp(
                (ts_us + PG_EPOCH_OFFSET_US) / 1e6, dt.UTC
            ).replace(tzinfo=None)
            return None
        if tag == "C":
            return None
        if tag == "R":
            oid = struct.unpack_from(">I", msg, 1)[0]
            ns, pos = _cstr(msg, 5)
            name, pos = _cstr(msg, pos)
            replident = chr(msg[pos])
            (ncols,) = struct.unpack_from(">H", msg, pos + 1)
            pos += 3
            cols = []
            for _ in range(ncols):
                pos += 1  # per-column flags (1 = part of key)
                cname, pos = _cstr(msg, pos)
                typoid, _typmod = struct.unpack_from(">Ii", msg, pos)
                pos += 8
                cols.append((cname, typoid))
            self.relations[oid] = RelationInfo(oid, ns, name, tuple(cols), replident)
            return None
        if tag not in ("I", "U", "D"):
            return None  # origin/type/truncate messages — not row events
        reloid = struct.unpack_from(">I", msg, 1)[0]
        rel = self.relations.get(reloid)
        if rel is None:
            raise KeyError(f"relation {reloid} seen before its Relation message")
        pos = 5
        old_cols = None
        new_cols = None
        while pos < len(msg):
            part = chr(msg[pos])
            pos += 1
            cols, pos = _read_tuple(msg, pos)
            if part in ("K", "O"):
                old_cols = cols
            elif part == "N":
                new_cols = cols
            else:
                raise ValueError(f"bad tuple tag {part!r}")
        if tag == "I":
            op, data = "insert", self._values(rel, new_cols or [], None)
        elif tag == "U":
            op, data = "update", self._values(rel, new_cols or [], old_cols)
        else:
            op, data = "delete", self._values(rel, old_cols or [], None)
        return {
            "op": op,
            "schema": rel.namespace,
            "table": rel.name,
            "data": data,
            "lsn": self._tx_lsn,
            "commit_ts": self._tx_ts,
        }


def decode_messages(msgs: Iterable[bytes]) -> Iterator[dict]:
    dec = PgOutputDecoder()
    for m in msgs:
        ev = dec.decode(bytes(m))
        if ev is not None:
            yield ev


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("schema", T.StringType()),
        T.StructField("table", T.StringType()),
        T.StructField("op", T.StringType()),
        T.StructField("data", T.MapType(T.StringType(), T.StringType())),
        T.StructField("lsn", T.LongType()),
        T.StructField("commit_ts", T.TimestampType()),
    ]
)


def decode_pgoutput_df(raw: DataFrame, message_col: str = "value") -> DataFrame:
    """Decode a DataFrame of raw pgoutput payload bytes.

    Each partition decodes independently with its own relation cache, so a
    partition must be a contiguous protocol slice (Relation before first
    use — true for any per-slot bounded batch). Output matches the wal2json
    decoder's shape; map values stay strings for per-stream typing via
    ``wal2json.project_stream``.
    """

    def run(part: Iterator) -> Iterator:
        for ev in decode_messages(row[message_col] for row in part):
            yield (
                ev["schema"],
                ev["table"],
                ev["op"],
                ev["data"],
                ev["lsn"],
                ev["commit_ts"],
            )

    return raw.rdd.mapPartitions(run).toDF(DECODED_SCHEMA)


# -- encoders (test fixtures + feed simulation; same public format) ---------

def _tuple_bytes(cols: list[tuple[str, str | None]]) -> bytes:
    out = struct.pack(">H", len(cols))
    for kind, val in cols:
        if kind == "t":
            b = (val or "").encode("utf-8")
            out += b"t" + struct.pack(">I", len(b)) + b
        else:
            out += kind.encode()
    return out


def encode_begin(lsn: int, ts: dt.datetime, xid: int = 1) -> bytes:
    us = int(ts.replace(tzinfo=dt.UTC).timestamp() * 1e6) - PG_EPOCH_OFFSET_US
    return b"B" + struct.pack(">QqI", lsn, us, xid)


def encode_commit(lsn: int, ts: dt.datetime) -> bytes:
    us = int(ts.replace(tzinfo=dt.UTC).timestamp() * 1e6) - PG_EPOCH_OFFSET_US
    return b"C" + struct.pack(">BQQq", 0, lsn, lsn, us)


def encode_relation(
    oid: int, ns: str, name: str, cols: list[tuple[str, int]], replident: str = "d"
) -> bytes:
    out = b"R" + struct.pack(">I", oid) + ns.encode() + b"\x00" + name.encode() + b"\x00"
    out += replident.encode() + struct.pack(">H", len(cols))
    for cname, typoid in cols:
        out += b"\x00" + cname.encode() + b"\x00" + struct.pack(">Ii", typoid, -1)
    return out


def encode_insert(reloid: int, values: list[str | None]) -> bytes:
    cols = [("t", v) if v is not None else ("n", None) for v in values]
    return b"I" + struct.pack(">I", reloid) + b"N" + _tuple_bytes(cols)


def encode_update(
    reloid: int,
    new: list[tuple[str, str | None]],
    old: list[tuple[str, str | None]] | None = None,
    key_only: bool = False,
) -> bytes:
    out = b"U" + struct.pack(">I", reloid)
    if old is not None:
        out += (b"K" if key_only else b"O") + _tuple_bytes(old)
    return out + b"N" + _tuple_bytes(new)


def encode_delete(reloid: int, old: list[tuple[str, str | None]], key_only: bool = True) -> bytes:
    return b"D" + struct.pack(">I", reloid) + (b"K" if key_only else b"O") + _tuple_bytes(old)
