"""Schema Registry client (sources/schema_registry.py) vs a stub Confluent
REST server — auth precedence, caching, default schemaType, error statuses,
and the driver-resolve → distributed-decode path."""

from __future__ import annotations

import json
import struct
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from olake_spark.functions.avro_codec import AvroCodec
from olake_spark.sources.schema_registry import (
    SchemaRegistryClient,
    SchemaRegistryError,
    decode_confluent_multi_df,
    distinct_schema_ids,
    resolve_and_decode,
)

SCHEMA_V1 = {
    "type": "record",
    "name": "ev",
    "fields": [{"name": "id", "type": "long"}, {"name": "s", "type": "string"}],
}
SCHEMA_V2 = {
    "type": "record",
    "name": "ev",
    "fields": [
        {"name": "id", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "extra", "type": ["null", "long"]},
    ],
}


class _Handler(BaseHTTPRequestHandler):
    schemas = {7: SCHEMA_V1, 9: SCHEMA_V2}
    require_auth = None  # None | ("bearer", tok) | ("basic", "user:pass")
    hits: list[str] = []

    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        _Handler.hits.append(self.path)
        if _Handler.require_auth is not None:
            kind, cred = _Handler.require_auth
            got = self.headers.get("Authorization", "")
            want = (
                f"Bearer {cred}"
                if kind == "bearer"
                else "Basic " + __import__("base64").b64encode(cred.encode()).decode()
            )
            if got != want:
                self.send_response(401)
                self.end_headers()
                return
        if self.path == "/subjects":
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"[]")
            return
        if self.path.startswith("/schemas/ids/"):
            sid = int(self.path.rsplit("/", 1)[1])
            if sid not in self.schemas:
                self.send_response(404)
                self.end_headers()
                return
            body = {"schema": json.dumps(self.schemas[sid])}
            if sid == 9:
                body["schemaType"] = "AVRO"  # id 7 omits it → default AVRO
            self.send_response(200)
            self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            self.end_headers()
            self.wfile.write(json.dumps(body).encode())
            return
        self.send_response(404)
        self.end_headers()


@pytest.fixture()
def registry():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _Handler.require_auth = None
    _Handler.hits = []
    yield f"http://127.0.0.1:{srv.server_port}"
    srv.shutdown()


def _frame(sid: int, body: bytes) -> bytes:
    return b"\x00" + struct.pack(">I", sid) + body


def test_fetch_caches_and_defaults_avro(registry):
    c = SchemaRegistryClient(registry)
    r1 = c.fetch_schema(7)
    assert r1.schema_type == "AVRO" and r1.codec is not None  # defaulted
    c.fetch_schema(7)
    c.fetch_schema(7)
    assert _Handler.hits.count("/schemas/ids/7") == 1  # cached after first


def test_fetch_unknown_id_raises(registry):
    with pytest.raises(SchemaRegistryError, match="status 404.*schema ID 42"):
        SchemaRegistryClient(registry).fetch_schema(42)


def test_validate_and_auth(registry):
    SchemaRegistryClient(registry).validate()  # open server: OK

    _Handler.require_auth = ("basic", "u:pw")
    with pytest.raises(SchemaRegistryError, match="invalid credentials"):
        SchemaRegistryClient(registry).validate()
    SchemaRegistryClient(registry, username="u", password="pw").validate()

    # bearer takes priority over basic when both are configured
    _Handler.require_auth = ("bearer", "tok123")
    SchemaRegistryClient(
        registry, username="u", password="pw", bearer_token="tok123"
    ).validate()


def test_connection_refused():
    with pytest.raises(SchemaRegistryError, match="failed to connect"):
        SchemaRegistryClient("http://127.0.0.1:1").validate()


def test_mixed_schema_id_decode(spark):
    c1, c2 = AvroCodec(SCHEMA_V1), AvroCodec(SCHEMA_V2)
    payloads = []
    for i in range(20):
        if i % 2:
            payloads.append((_frame(9, c2.encode({"id": i, "s": f"s{i}", "extra": i * 10})),))
        else:
            payloads.append((_frame(7, c1.encode({"id": i, "s": f"s{i}"})),))
    raw = spark.createDataFrame(payloads, "value binary")

    assert distinct_schema_ids(raw) == [7, 9]

    out = decode_confluent_multi_df(
        raw, {7: SCHEMA_V1, 9: SCHEMA_V2}
    ).collect()
    assert len(out) == 20
    for r in out:
        doc = json.loads(r["data"])
        expect_sid = 9 if doc["id"] % 2 else 7
        assert r["_schema_id"] == expect_sid
        if doc["id"] % 2:
            assert doc["extra"] == doc["id"] * 10
        else:
            assert "extra" not in doc


def test_resolve_and_decode_end_to_end(spark, registry):
    c1, c2 = AvroCodec(SCHEMA_V1), AvroCodec(SCHEMA_V2)
    payloads = [
        (_frame(7, c1.encode({"id": 1, "s": "a"})),),
        (_frame(9, c2.encode({"id": 2, "s": "b", "extra": None})),),
    ]
    raw = spark.createDataFrame(payloads, "value binary")
    client = SchemaRegistryClient(registry)
    out = resolve_and_decode(raw, client)
    rows = {json.loads(r["data"])["id"]: r["_schema_id"] for r in out.collect()}
    assert rows == {1: 7, 2: 9}
    # both ids fetched exactly once (driver-side cache, no executor HTTP)
    assert sorted(h for h in _Handler.hits if h.startswith("/schemas")) == [
        "/schemas/ids/7",
        "/schemas/ids/9",
    ]
