"""Regression tests for the round-1 ADVICE findings.

1. Cursor ordering is type-aware (numeric/epoch cursors must not compare
   lexicographically: '9' > '100' as strings).
2. NULL-op rows (target written without _op_type, null-filled on union)
   survive merges — they are not tombstones.
3. A streams.json / state.json produced by the reference loads as-is
   (type_schema, nested selected_columns, 'stream' key, {min,max} chunks).
4. wal2json unknown change kinds map to the insert op (reference
   mapChangeKindToOperationType default) and non-DML kinds emit no rows.
5. Avro union-as-type-attribute form {"type": ["null","int"]} decodes.
"""

from __future__ import annotations

import json
from datetime import datetime

from pyspark.sql import functions as F

from olake_spark.plans.state import SyncState, cursor_less_than, cursor_to_json
from olake_spark.plans.stream import Catalog


# -- 1: type-aware cursor ordering ------------------------------------------


def test_cursor_numeric_string_ordering():
    assert cursor_less_than("9", "100")  # lexicographic would say 100 < 9
    assert not cursor_less_than("100", "9")
    assert cursor_less_than(9, 100)
    assert cursor_less_than("2024-01-02 00:00:00", "2024-01-10 00:00:00")
    assert cursor_less_than(
        datetime(2024, 1, 2), "2024-01-10 00:00:00.500000"
    )
    # genuinely textual cursors still compare lexicographically
    assert cursor_less_than("abc", "abd")


def test_cursor_to_json_round_trip():
    assert cursor_to_json(42) == 42  # numbers stay numbers
    iso = cursor_to_json(datetime(2024, 1, 2, 3, 4, 5, 600000))
    assert iso == "2024-01-02 03:04:05.600000"
    assert json.loads(json.dumps({"c": iso}))["c"] == iso


def test_reconcile_numeric_cursor_adopts_committed():
    st = SyncState()
    st.set_cursor("ev", "id", "9")
    # committed position 100 is AHEAD; lexicographic compare would miss it
    assert st.reconcile("ev", "id", "100") is True
    assert st.get_cursor("ev", "id") == "100"
    # behind/equal positions leave state untouched
    assert st.reconcile("ev", "id", "50") is False
    assert st.reconcile("ev", "id", "100") is False


# -- 2: NULL-op rows are not deletes ----------------------------------------


def test_merge_null_op_rows_survive(spark):
    from olake_spark.operators.merge import merge_upsert

    # target snapshot written WITHOUT an _op_type column (e.g. a pre-CDC
    # backfill table); unionByName null-fills it during the merge
    target = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    batch = spark.createDataFrame(
        [(2, "b2", "u", 10), (3, "c", "c", 11)], "k int, v string, _op_type string, lsn int"
    )
    target = target.withColumn("lsn", F.lit(0))
    out = {
        r["k"]: r["v"]
        for r in merge_upsert(target, batch, ["k"], ["lsn"]).collect()
    }
    # key 1 exists only in the target with NULL op — it must survive
    assert out == {1: "a", 2: "b2", 3: "c"}


def test_mor_base_without_op_column_survives_read(spark, tmp_path):
    from olake_spark.sinks.table import ManagedTable

    t = ManagedTable(spark, str(tmp_path / "t"))
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    t.overwrite(base)  # base group has no _op_type at all
    delta = spark.createDataFrame(
        [(2, "b2", "u", 10), (3, "c", "c", 11)], "k int, v string, _op_type string, lsn int"
    )
    t.upsert_mor(delta, ["k"], ["lsn"])
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == {1: "a", 2: "b2", 3: "c"}


# -- 3: reference-shaped streams.json / state.json load ----------------------

_REFERENCE_CATALOG = {
    "selected_streams": {
        "public": [
            {
                "stream_name": "events",
                "partition_regex": "",
                "normalization": True,
                "filter": "",
                "selected_columns": {
                    "columns": ["id", "ts", "v"],
                    "sync_new_columns": False,
                },
            }
        ]
    },
    "streams": [
        {
            "stream": {
                "name": "events",
                "namespace": "public",
                "type_schema": {
                    "properties": {
                        "id": {"type": ["integer"]},
                        "ts": {"type": ["timestamp_micro", "null"]},
                        "v": {"type": ["number", "null"]},
                        "tags": {"type": ["array", "null"]},
                    }
                },
                "supported_sync_modes": ["full_refresh", "incremental", "cdc"],
                "source_defined_primary_key": ["id"],
                "available_cursor_fields": [],
                "cursor_field": "ts",
                "sync_mode": "cdc",
                "destination_table": "events_dst",
                "additional_properties": "whatever",
            }
        }
    ],
}


def test_reference_catalog_loads():
    cat = Catalog.from_json(json.dumps(_REFERENCE_CATALOG))
    assert len(cat.streams) == 1
    cs = cat.streams[0]
    assert cs.stream.name == "events"
    assert cs.stream.sync_mode == "cdc"
    # cursor_field seeds available_cursor_fields
    assert cs.stream.available_cursor_fields == ["ts"]
    sch = cs.stream.spark_schema
    by_name = {f.name: f.dataType.simpleString() for f in sch.fields}
    assert by_name["id"] == "bigint"  # OLAKE 'integer' = int64
    assert by_name["ts"] == "timestamp"
    assert by_name["v"] == "double"
    # metadata: nested selected_columns unpacked; stream has no 'metadata'
    # key in the reference shape, so it defaults from the stream name
    assert cs.metadata.stream_name == "events"
    meta = cat.selected_streams["public"][0]
    assert meta.selected_columns == ["id", "ts", "v"]
    assert meta.sync_new_columns is False


def test_reference_state_loads():
    ref_state = {
        "type": "STREAM",
        "streams": [
            {
                "stream": "events",
                "namespace": "public",
                "sync_mode": "incremental",
                "state": {
                    "ts": "2024-01-05 00:00:00",
                    "chunks": [{"min": 0, "max": 100}, {"min": 100, "max": 200}],
                },
            }
        ],
    }
    st = SyncState.from_json(json.dumps(ref_state))
    assert st.get_cursor("events", "ts") == "2024-01-05 00:00:00"
    chunks = st.streams["events"].chunks
    assert [(c.min, c.max) for c in chunks] == [(0, 100), (100, 200)]
    # engine-native shape still loads (round-trip)
    again = SyncState.from_json(st.to_json())
    assert again.get_cursor("events", "ts") == "2024-01-05 00:00:00"
    assert [(c.min, c.max) for c in again.streams["events"].chunks] == [
        (0, 100),
        (100, 200),
    ]


# -- 4: wal2json unknown-kind default + non-DML filter -----------------------


def test_wal2json_unknown_kind_and_truncate(spark):
    from olake_spark.streaming.wal2json import decode_wal2json, op_type_column

    msg = json.dumps(
        {
            "nextlsn": "0/1000",
            "timestamp": "2024-03-01 10:00:00",
            "change": [
                {
                    "kind": "insert",
                    "schema": "public",
                    "table": "t",
                    "columnnames": ["id"],
                    "columntypes": ["integer"],
                    "columnvalues": ["1"],
                },
                {"kind": "truncate", "schema": "public", "table": "t"},
            ],
        }
    )
    raw = spark.createDataFrame([(msg,)], "value string")
    rows = decode_wal2json(raw).collect()
    # the truncate entry emits no row
    assert len(rows) == 1 and rows[0]["_op_type"] == "c"
    # unknown kinds default to insert op, like the reference
    df = spark.createDataFrame([("message",), ("insert",)], "kind string")
    got = [r["op"] for r in df.select(op_type_column(F.col("kind")).alias("op")).collect()]
    assert got == ["c", "c"]


# -- 5: avro union-as-type-attribute ----------------------------------------


def test_avro_union_as_type_attribute():
    from olake_spark.functions.avro_codec import AvroCodec

    schema = {
        "type": "record",
        "name": "R",
        "fields": [
            {"name": "a", "type": {"type": ["null", "int"]}},
            {"name": "b", "type": {"type": ["null", "string"]}},
        ],
    }
    codec = AvroCodec(schema)
    for rec in ({"a": 5, "b": None}, {"a": None, "b": "x"}):
        assert codec.decode(codec.encode(rec)) == rec
