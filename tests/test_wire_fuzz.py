"""Property-based roundtrips for the wire-format codecs (no Spark session).

The deterministic oracle queries prove the decoders against fixed corpora;
these drive the same encode→decode paths through randomized inputs —
boundary integers, empty/unicode-free strings, NULL bitmaps in every
position, v1/v2 headers — the corners a fixed fixture never hits.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings
from hypothesis import strategies as st

from olake_spark.functions.avro_codec import AvroCodec
from olake_spark.streaming import binlog_wire as bw
from olake_spark.streaming.pgoutput import (
    decode_messages,
    encode_begin,
    encode_delete,
    encode_insert,
    encode_relation,
    encode_update,
)

# ---------------------------------------------------------------------------
# MySQL binlog ROWS_EVENT
# ---------------------------------------------------------------------------

_COLS = [bw.TYPE_TINY, bw.TYPE_LONG, bw.TYPE_LONGLONG, bw.TYPE_VARCHAR, bw.TYPE_DATETIME2]
_META = [0, 0, 0, 64, 0]

_ascii = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60
)
_row = st.tuples(
    st.one_of(st.none(), st.integers(-128, 127)),
    st.one_of(st.none(), st.integers(-(2**31), 2**31 - 1)),
    st.one_of(st.none(), st.integers(-(2**63), 2**63 - 1)),
    st.one_of(st.none(), _ascii),
    st.one_of(
        st.none(),
        st.datetimes(
            min_value=dt.datetime(1000, 1, 1),
            max_value=dt.datetime(9999, 12, 28, 23, 59, 59),
        ).map(lambda d: d.replace(microsecond=0)),
    ),
)


def _expect(vals):
    # decoder emits every column; NULL bitmap positions surface as None
    out = {}
    for name, v in zip(["c0", "c1", "c2", "c3", "c4"], vals):
        if v is None:
            out[name] = None
        elif isinstance(v, dt.datetime):
            out[name] = v.strftime("%Y-%m-%d %H:%M:%S")
        else:
            out[name] = str(v)
    return out


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(_row, min_size=1, max_size=5), v2=st.booleans(),
       op=st.sampled_from(["insert", "delete"]))
def test_binlog_write_delete_roundtrip(rows, v2, op):
    names = ["c0", "c1", "c2", "c3", "c4"]
    events = [
        bw.encode_table_map(7, "db", "t", _COLS, _META, names=names),
        bw.encode_rows_event(7, op, [list(r) for r in rows], _COLS, _META, v2=v2),
    ]
    got = list(bw.decode_binlog_events(events, "f.000001"))
    assert len(got) == len(rows)
    want_op = op
    for ev, r in zip(got, rows):
        assert (ev["schema"], ev["table"], ev["op"]) == ("db", "t", want_op)
        assert ev["data"] == _expect(r)


@settings(max_examples=40, deadline=None)
@given(pairs=st.lists(st.tuples(_row, _row), min_size=1, max_size=4), v2=st.booleans())
def test_binlog_update_keeps_after_image(pairs, v2):
    names = ["c0", "c1", "c2", "c3", "c4"]
    events = [
        bw.encode_table_map(7, "db", "t", _COLS, _META, names=names),
        bw.encode_rows_event(
            7, "update", [(list(a), list(b)) for a, b in pairs], _COLS, _META, v2=v2
        ),
    ]
    got = list(bw.decode_binlog_events(events, "f.000001"))
    assert [ev["data"] for ev in got] == [_expect(b) for _, b in pairs]
    assert all(ev["op"] == "update" for ev in got)


# ---------------------------------------------------------------------------
# pgoutput
# ---------------------------------------------------------------------------

_pg_text = st.one_of(st.none(), st.text(max_size=80))


@settings(max_examples=40, deadline=None)
@given(rows=st.lists(st.tuples(st.integers(0, 2**31), _pg_text, _pg_text),
                     min_size=1, max_size=5))
def test_pgoutput_insert_roundtrip(rows):
    msgs = [encode_relation(9, "s", "t", [("id", 20), ("a", 25), ("b", 25)])]
    for lsn, a, b in rows:
        msgs.append(encode_begin(lsn, dt.datetime(2024, 1, 2, 3, 4, 5)))
        msgs.append(encode_insert(9, [str(lsn), a, b]))
    got = [ev for ev in decode_messages(msgs)]
    assert len(got) == len(rows)
    for ev, (lsn, a, b) in zip(got, rows):
        assert ev["op"] == "insert" and ev["lsn"] == lsn
        assert ev["data"] == {"id": str(lsn), "a": a, "b": b}


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=40), st.text(max_size=40))
def test_pgoutput_update_recovers_toast(old_b, new_a):
    msgs = [
        encode_relation(9, "s", "t", [("id", 20), ("a", 25), ("b", 25)]),
        encode_begin(5, dt.datetime(2024, 1, 1)),
        encode_update(
            9,
            new=[("t", "1"), ("t", new_a), ("u", None)],  # b unchanged-TOAST
            old=[("t", "1"), ("t", "old_a"), ("t", old_b)],
        ),
    ]
    (ev,) = list(decode_messages(msgs))
    assert ev["op"] == "update"
    assert ev["data"] == {"id": "1", "a": new_a, "b": old_b}  # b recovered


@settings(max_examples=40, deadline=None)
@given(st.integers(0, 2**31), st.booleans())
def test_pgoutput_delete_roundtrip(key, key_only):
    msgs = [
        encode_relation(9, "s", "t", [("id", 20), ("a", 25), ("b", 25)]),
        encode_begin(3, dt.datetime(2024, 6, 1)),
        encode_delete(9, [("t", str(key)), ("t", "x"), ("n", None)], key_only=key_only),
    ]
    (ev,) = list(decode_messages(msgs))
    assert ev["op"] == "delete"
    assert ev["data"]["id"] == str(key)


# ---------------------------------------------------------------------------
# Avro binary codec
# ---------------------------------------------------------------------------

_AVRO_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "opt", "type": ["null", "long"]},
        {"name": "tags", "type": {"type": "array", "items": "string"}},
        {"name": "f", "type": "double"},
        {"name": "b", "type": "boolean"},
    ],
}

_avro_value = st.fixed_dictionaries(
    {
        "k": st.integers(-(2**63), 2**63 - 1),
        "s": st.text(max_size=60),
        "opt": st.one_of(st.none(), st.integers(-(2**40), 2**40)),
        "tags": st.lists(st.text(max_size=10), max_size=4),
        "f": st.floats(allow_nan=False, allow_infinity=False, width=64),
        "b": st.booleans(),
    }
)


@settings(max_examples=60, deadline=None)
@given(v=_avro_value)
def test_avro_encode_decode_roundtrip(v):
    codec = AvroCodec(_AVRO_SCHEMA)
    assert codec.decode(codec.encode(v)) == v


# ---------------------------------------------------------------------------
# GTID event: µs commit timestamps round-trip through all wire forms
# ---------------------------------------------------------------------------

_us = st.integers(0, (1 << 55) - 1)


@given(
    gno=st.integers(1, 2**62),
    imm=_us,
    delta=st.integers(0, 10**9),
    anonymous=st.booleans(),
    short_form=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_gtid_timestamp_roundtrip(gno, imm, delta, anonymous, short_form):
    import uuid

    sid = uuid.UUID(int=gno * 2654435761 % (1 << 128)).bytes
    dec = bw.BinlogDecoder()
    if short_form:  # pre-8.0.1: no timestamps on the wire
        dec.decode(bw.encode_gtid(sid, gno, anonymous=anonymous))
        assert dec.gtid_ts_us is None
    else:
        orig = max(0, imm - delta)
        dec.decode(
            bw.encode_gtid(sid, gno, immediate_us=imm, original_us=orig,
                           anonymous=anonymous)
        )
        # zero means "server didn't stamp" and must behave like absent
        assert dec.gtid_ts_us == (orig or None)
    if anonymous:
        assert dec.gtid is None
    else:
        assert dec.gtid is not None and dec.gtid.endswith(f":{gno}")
