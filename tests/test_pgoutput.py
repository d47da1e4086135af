"""pgoutput binary protocol decode (streaming/pgoutput.py vs
pkg/waljs/pgoutput.go semantics)."""

from __future__ import annotations

import datetime as dt

import pytest

from olake_spark.streaming.pgoutput import (
    PgOutputDecoder,
    decode_messages,
    decode_pgoutput_df,
    encode_begin,
    encode_commit,
    encode_delete,
    encode_insert,
    encode_relation,
    encode_update,
)

TS = dt.datetime(2024, 3, 1, 12, 0, 0)
REL = encode_relation(55, "public", "orders", [("id", 20), ("status", 25), ("blob", 25)])


def _events(msgs):
    return list(decode_messages(msgs))


def test_insert_roundtrip():
    msgs = [REL, encode_begin(1000, TS), encode_insert(55, ["7", "open", None]),
            encode_commit(1000, TS)]
    (ev,) = _events(msgs)
    assert ev["op"] == "insert" and ev["table"] == "orders" and ev["schema"] == "public"
    assert ev["data"] == {"id": "7", "status": "open", "blob": None}
    assert ev["lsn"] == 1000 and ev["commit_ts"] == TS


def test_update_toast_recovery_with_full_old_tuple():
    # 'u' column in the new tuple recovers from the old tuple (REPLICA
    # IDENTITY FULL), pgoutput.go:154-160
    new = [("t", "7"), ("t", "closed"), ("u", None)]
    old = [("t", "7"), ("t", "open"), ("t", "big-toast-value")]
    msgs = [REL, encode_begin(1010, TS), encode_update(55, new, old)]
    (ev,) = _events(msgs)
    assert ev["data"] == {"id": "7", "status": "closed", "blob": "big-toast-value"}


def test_update_toast_lost_without_old_tuple():
    new = [("t", "7"), ("t", "closed"), ("u", None)]
    msgs = [REL, encode_begin(1020, TS), encode_update(55, new)]
    (ev,) = _events(msgs)
    assert ev["data"]["blob"] is None  # DEFAULT replident → value lost


def test_delete_emits_old_values():
    msgs = [REL, encode_begin(1030, TS), encode_delete(55, [("t", "7"), ("n", None), ("n", None)])]
    (ev,) = _events(msgs)
    assert ev["op"] == "delete"
    assert ev["data"] == {"id": "7", "status": None, "blob": None}


def test_relation_required_before_rows():
    dec = PgOutputDecoder()
    dec.decode(encode_begin(1, TS))
    with pytest.raises(KeyError):
        dec.decode(encode_insert(99, ["1"]))


def test_relation_message_updates_schema():
    # a second Relation message for the same oid replaces the cached one
    # (ALTER TABLE mid-stream)
    rel2 = encode_relation(55, "public", "orders", [("id", 20), ("note", 25)])
    msgs = [REL, encode_begin(1, TS), encode_insert(55, ["1", "a", "b"]),
            rel2, encode_insert(55, ["2", "hello"])]
    evs = _events(msgs)
    assert evs[0]["data"] == {"id": "1", "status": "a", "blob": "b"}
    assert evs[1]["data"] == {"id": "2", "note": "hello"}


def test_decode_df_mappartitions(spark):
    msgs = [REL, encode_begin(2000, TS),
            encode_insert(55, ["1", "a", None]),
            encode_update(55, [("t", "1"), ("t", "b"), ("n", None)]),
            encode_delete(55, [("t", "1"), ("n", None), ("n", None)]),
            encode_commit(2000, TS)]
    raw = spark.createDataFrame([(m,) for m in msgs], "value binary").coalesce(1)
    out = decode_pgoutput_df(raw).collect()
    assert [r["op"] for r in out] == ["insert", "update", "delete"]
    assert out[0]["data"]["id"] == "1" and out[0]["lsn"] == 2000
    assert out[1]["data"]["status"] == "b"
    assert out[2]["commit_ts"] == TS
