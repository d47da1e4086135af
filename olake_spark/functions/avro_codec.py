"""Avro binary codec — pure Python, no spark-avro jar required.

The reference decodes Kafka Avro messages with goavro then flattens the
result (union unwrap, decimal → float64: utils/typeutils/avro.go:11-60;
Confluent wire format split: pkg/kafka/schema_registry.go:1-117). This
container has Avro classes on the classpath but no registered spark-avro
module (``sources.kafka.avro_available`` probes that), so the engine ships
its own decoder of the public Avro binary spec:

- zigzag-varint ints/longs, little-endian float/double, length-prefixed
  bytes/string, records as concatenated fields, enums as indices,
  arrays/maps as counted blocks (negative count ⇒ byte-size prefix),
  unions as (index, value), fixed as raw bytes
- union values unwrap to the plain value (avro.go:30-37 — goavro's
  ``{"type": value}`` wrapper never appears here by construction)
- ``decimal`` logical type (bytes/fixed) → unscaled big-endian two's
  complement / 10^scale → float (avro.go:26-29's big.Rat → float64)
- schema ``name``/``namespace`` normalize through the engine's column
  naming (avro.go:50-68)

``decode_confluent_df`` runs the decoder in ``mapInPandas`` batches —
Arrow-fed Python, the documented fallback path; with spark-avro present,
``sources.kafka.KafkaSource.decode_avro`` uses ``from_avro`` instead and
this module is only the wire-format reference.
"""

from __future__ import annotations

import io
import json
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame

from olake_spark.typesys.naming import reformat_column_name

__all__ = [
    "AvroCodec",
    "normalize_avro_schema",
    "decode_confluent_df",
    "split_confluent",
]


def normalize_avro_schema(schema_json: str) -> str:
    """Top-level name/namespace through the engine's naming rules
    (avro.go:50-68)."""
    m = json.loads(schema_json)
    if isinstance(m.get("name"), str):
        m["name"] = reformat_column_name(m["name"])
    if isinstance(m.get("namespace"), str):
        m["namespace"] = reformat_column_name(m["namespace"])
    return json.dumps(m)


def split_confluent(payload: bytes) -> tuple[int, bytes]:
    """Confluent wire format: 0x00 magic + u32 schema id + Avro body
    (schema_registry.go:1-117)."""
    if len(payload) < 5 or payload[0] != 0:
        raise ValueError("not Confluent wire format (bad magic byte)")
    return struct.unpack_from(">I", payload, 1)[0], payload[5:]


class AvroCodec:
    """Decode (and encode, for fixtures) one Avro schema."""

    def __init__(self, schema: str | dict):
        self.schema = json.loads(schema) if isinstance(schema, str) else schema
        self._named: dict[str, dict] = {}
        self._collect_named(self.schema)

    def _collect_named(self, s) -> None:
        if isinstance(s, dict):
            if s.get("type") in ("record", "enum", "fixed") and "name" in s:
                self._named[s["name"]] = s
            for key in ("fields", "items", "values", "type"):
                if key in s:
                    sub = s[key]
                    if key == "fields":
                        for f in sub:
                            self._collect_named(f.get("type"))
                    else:
                        self._collect_named(sub)
        elif isinstance(s, list):
            for alt in s:
                self._collect_named(alt)

    # -- decode -------------------------------------------------------------

    def decode(self, payload: bytes):
        return self._read(io.BytesIO(payload), self.schema)

    def _read_long(self, buf: io.BytesIO) -> int:
        shift, acc = 0, 0
        while True:
            b = buf.read(1)
            if not b:
                raise EOFError("truncated varint")
            acc |= (b[0] & 0x7F) << shift
            if not b[0] & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def _read(self, buf: io.BytesIO, schema):
        if isinstance(schema, str):
            schema = self._named.get(schema, schema)
        if isinstance(schema, list):  # union: index then value — UNWRAPPED
            idx = self._read_long(buf)
            return self._read(buf, schema[idx])
        if isinstance(schema, dict):
            t = schema["type"]
            # union-as-type-attribute form {"type": ["null","int"]} (or a
            # nested schema object as the type) — recurse before treating t
            # as a primitive name
            if isinstance(t, (list, dict)):
                return self._read(buf, t)
            lt = schema.get("logicalType")
            if t in ("bytes", "fixed") and lt == "decimal":
                raw = self._read_primitive(buf, t, schema)
                unscaled = int.from_bytes(raw, "big", signed=True)
                return unscaled / 10 ** schema.get("scale", 0)
            if t == "record":
                return {
                    f["name"]: self._read(buf, f["type"]) for f in schema["fields"]
                }
            if t == "enum":
                return schema["symbols"][self._read_long(buf)]
            if t == "array":
                out = []
                while True:
                    n = self._read_long(buf)
                    if n == 0:
                        return out
                    if n < 0:
                        self._read_long(buf)  # block byte size — skip
                        n = -n
                    out.extend(self._read(buf, schema["items"]) for _ in range(n))
            if t == "map":
                out = {}
                while True:
                    n = self._read_long(buf)
                    if n == 0:
                        return out
                    if n < 0:
                        self._read_long(buf)
                        n = -n
                    for _ in range(n):
                        k = self._read_primitive(buf, "string", None)
                        out[k] = self._read(buf, schema["values"])
                return out
            return self._read_primitive(buf, t, schema)
        return self._read_primitive(buf, schema, None)

    def _read_primitive(self, buf: io.BytesIO, t: str, schema):
        if t == "null":
            return None
        if t == "boolean":
            return buf.read(1)[0] != 0
        if t in ("int", "long"):
            return self._read_long(buf)
        if t == "float":
            return struct.unpack("<f", buf.read(4))[0]
        if t == "double":
            return struct.unpack("<d", buf.read(8))[0]
        if t in ("bytes", "string"):
            n = self._read_long(buf)
            raw = buf.read(n)
            return raw.decode("utf-8") if t == "string" else raw
        if t == "fixed":
            return buf.read(schema["size"])
        if t in self._named:
            return self._read(buf, self._named[t])
        raise ValueError(f"unsupported avro type {t!r}")

    # -- encode (test fixtures / feed simulation) ---------------------------

    def encode(self, value) -> bytes:
        out = io.BytesIO()
        self._write(out, self.schema, value)
        return out.getvalue()

    def _write_long(self, out: io.BytesIO, v: int) -> None:
        v = (v << 1) ^ (v >> 63)  # zigzag
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.write(bytes([b | 0x80]))
            else:
                out.write(bytes([b]))
                return

    def _write(self, out: io.BytesIO, schema, value) -> None:
        if isinstance(schema, str):
            schema = self._named.get(schema, schema)
        if isinstance(schema, list):
            for idx, alt in enumerate(schema):
                tname = alt if isinstance(alt, str) else alt.get("type")
                if (value is None) == (tname == "null"):
                    self._write_long(out, idx)
                    return self._write(out, alt, value)
            raise ValueError("no union branch for value")
        if isinstance(schema, dict):
            t = schema["type"]
            if isinstance(t, (list, dict)):  # union-as-type-attribute form
                return self._write(out, t, value)
            if t in ("bytes", "fixed") and schema.get("logicalType") == "decimal":
                scale = schema.get("scale", 0)
                unscaled = round(value * 10**scale)
                n = max(1, (unscaled.bit_length() + 8) // 8)
                raw = unscaled.to_bytes(n, "big", signed=True)
                if t == "fixed":
                    raw = raw.rjust(schema["size"], b"\xff" if unscaled < 0 else b"\x00")
                    out.write(raw)
                else:
                    self._write_long(out, len(raw))
                    out.write(raw)
                return
            if t == "record":
                for f in schema["fields"]:
                    self._write(out, f["type"], value[f["name"]])
                return
            if t == "enum":
                return self._write_long(out, schema["symbols"].index(value))
            if t == "array":
                if value:
                    self._write_long(out, len(value))
                    for v in value:
                        self._write(out, schema["items"], v)
                return self._write_long(out, 0)
            if t == "map":
                if value:
                    self._write_long(out, len(value))
                    for k, v in value.items():
                        self._write_primitive(out, "string", k)
                        self._write(out, schema["values"], v)
                return self._write_long(out, 0)
            return self._write_primitive(out, t, value, schema)
        return self._write_primitive(out, schema, value)

    def _write_primitive(self, out: io.BytesIO, t: str, value, schema=None) -> None:
        if t == "null":
            return
        if t == "boolean":
            return out.write(b"\x01" if value else b"\x00")
        if t in ("int", "long"):
            return self._write_long(out, value)
        if t == "float":
            return out.write(struct.pack("<f", value))
        if t == "double":
            return out.write(struct.pack("<d", value))
        if t in ("bytes", "string"):
            raw = value.encode("utf-8") if isinstance(value, str) else value
            self._write_long(out, len(raw))
            return out.write(raw)
        if t == "fixed":
            return out.write(value)
        if t in self._named:
            return self._write(out, self._named[t], value)
        raise ValueError(f"unsupported avro type {t!r}")


def decode_confluent_df(
    df: DataFrame, schema_json: str, value_col: str = "value", out_col: str = "data"
) -> DataFrame:
    """Confluent-framed Avro payload column → JSON-string column.

    Arrow-batched ``mapInPandas`` (the no-jar fallback): strips the 5-byte
    header, decodes, serializes each record to JSON for downstream
    ``from_json`` with the stream schema. Bytes fields hex-encode (the
    engine's Binary → hex convention)."""
    import pandas as pd

    codec = AvroCodec(schema_json)
    fields = [f.name for f in df.schema.fields if f.name != value_col]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields if f.name != value_col]
        + [f"`{out_col}` string"]
    )

    def _jsonable(v):
        if isinstance(v, bytes):
            return v.hex()
        if isinstance(v, dict):
            return {k: _jsonable(x) for k, x in v.items()}
        if isinstance(v, list):
            return [_jsonable(x) for x in v]
        return v

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            decoded = []
            for payload in b[value_col]:
                _sid, body = split_confluent(bytes(payload))
                decoded.append(json.dumps(_jsonable(codec.decode(body))))
            res = b[fields].copy()
            res[out_col] = decoded
            yield res

    return df.mapInPandas(run, out_schema)
