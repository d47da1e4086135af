"""MySQL binlog binary decoder (streaming/binlog_wire.py) round-trips —
the wire format is the public binlog event layout the reference consumes
through go-mysql (pkg/binlog/binlog.go:1-185, filter.go:52-373)."""

from __future__ import annotations

import datetime as dt

import pytest

from olake_spark.streaming import binlog_wire as bw


COLS = [bw.TYPE_LONG, bw.TYPE_VARCHAR, bw.TYPE_DATETIME2, bw.TYPE_NEWDECIMAL,
        bw.TYPE_DOUBLE, bw.TYPE_TINY]
META = [0, 255, 6, (12 << 8) | 2, 8, 0]
NAMES = ["id", "name", "created", "price", "ratio", "flag"]


def _tm(table_id=23, unsigned=None):
    return bw.encode_table_map(
        table_id, "shop", "orders", COLS, META, names=NAMES, unsigned=unsigned
    )


def test_insert_roundtrip_types():
    row = [7, "héllo", dt.datetime(2024, 3, 1, 10, 20, 30, 123456),
           "1234567890.55", 0.25, -3]
    events = [_tm(), bw.encode_rows_event(23, "insert", [row], COLS, META, log_pos=500)]
    out = list(bw.decode_binlog_events(events, file_name="binlog.000007"))
    assert len(out) == 1
    ev = out[0]
    assert (ev["schema"], ev["table"], ev["op"]) == ("shop", "orders", "insert")
    assert ev["data"] == {
        "id": "7",
        "name": "héllo",
        "created": "2024-03-01 10:20:30.123456",
        "price": "1234567890.55",
        "ratio": "0.25",
        "flag": "-3",
    }
    assert ev["file"] == "binlog.000007" and ev["pos"] == 500


def test_update_keeps_after_image_and_nulls():
    before = [1, "old", dt.datetime(2024, 1, 1, 0, 0, 0), "1.00", 1.0, 0]
    after = [1, None, dt.datetime(2024, 1, 2, 3, 4, 5), "-2.50", -1.5, 1]
    events = [_tm(), bw.encode_rows_event(23, "update", [(before, after)], COLS, META)]
    out = list(bw.decode_binlog_events(events))
    assert len(out) == 1
    assert out[0]["op"] == "update"
    assert out[0]["data"]["name"] is None  # NULL in the after image
    assert out[0]["data"]["created"] == "2024-01-02 03:04:05"
    assert out[0]["data"]["price"] == "-2.50"


def test_delete_and_v1_events():
    row = [9, "gone", dt.datetime(2024, 5, 5, 5, 5, 5), "0.05", 0.0, 1]
    events = [_tm(), bw.encode_rows_event(23, "delete", [row], COLS, META, v2=False)]
    out = list(bw.decode_binlog_events(events))
    assert out[0]["op"] == "delete" and out[0]["data"]["id"] == "9"


def test_rotate_tracks_file():
    row = [1, "a", dt.datetime(2024, 1, 1), "1.00", 1.0, 0]
    events = [
        bw.encode_rotate("binlog.000002"),
        _tm(),
        bw.encode_rows_event(23, "insert", [row], COLS, META, log_pos=42),
    ]
    out = list(bw.decode_binlog_events(events, file_name="binlog.000001"))
    assert out[0]["file"] == "binlog.000002" and out[0]["pos"] == 42


def test_signedness_optional_metadata():
    # -1 as signed int32 bits decodes as 4294967295 when SIGNEDNESS marks
    # the column unsigned (filter.go:205-240 unsigned type names)
    cols, meta, names = [bw.TYPE_LONG, bw.TYPE_LONG], [0, 0], ["a", "b"]
    events = [
        bw.encode_table_map(5, "db", "t", cols, meta, names=names,
                            unsigned=[True, False]),
        bw.encode_rows_event(5, "insert", [[0xFFFFFFFF, -1]], cols, meta,
                             unsigned=[True, False]),
    ]
    (ev,) = bw.decode_binlog_events(events)
    assert ev["data"] == {"a": "4294967295", "b": "-1"}


def test_column_name_override_without_optmeta():
    # MINIMAL-metadata servers ship no COLUMN_NAME TLV; the stream schema
    # supplies names instead (the reference reads them from TableMapEvent,
    # filter.go:120-123)
    cols, meta = [bw.TYPE_LONG], [0]
    events = [
        bw.encode_table_map(5, "db", "t", cols, meta, names=None),
        bw.encode_rows_event(5, "insert", [[3]], cols, meta),
    ]
    (anon,) = bw.decode_binlog_events(events)
    assert anon["data"] == {"col0": "3"}
    (named,) = bw.decode_binlog_events(events, column_names={("db", "t"): ["pk"]})
    assert named["data"] == {"pk": "3"}


@pytest.mark.parametrize(
    "text,prec,scale",
    [
        ("0.00", 10, 2), ("-0.01", 10, 2), ("99999999.99", 10, 2),
        ("-99999999.99", 10, 2), ("123456789012345.123456789", 24, 9),
        ("-1.5", 4, 2), ("42", 5, 0), ("-42", 5, 0),
    ],
)
def test_newdecimal_roundtrip(text, prec, scale):
    from decimal import Decimal

    raw = bw._encode_decimal(text, prec, scale)
    got, end = bw._decode_decimal(raw, 0, prec, scale)
    assert end == len(raw)
    canonical = str(Decimal(text).quantize(Decimal(1).scaleb(-scale)))
    assert got == canonical


def test_timestamp2_and_date():
    cols = [bw.TYPE_TIMESTAMP2, bw.TYPE_DATE]
    meta = [6, 0]
    events = [
        bw.encode_table_map(9, "db", "t", cols, meta, names=["ts", "d"]),
        bw.encode_rows_event(
            9, "insert",
            [[dt.datetime(2024, 6, 1, 12, 0, 0, 999000), dt.date(1999, 12, 31)]],
            cols, meta,
        ),
    ]
    (ev,) = bw.decode_binlog_events(events)
    assert ev["data"] == {"ts": "2024-06-01 12:00:00.999000", "d": "1999-12-31"}


def test_decode_binlog_df(spark):
    rows = [[i, f"n{i}", dt.datetime(2024, 2, 1, i % 24, 0, 0), f"{i}.25", i / 4, i % 2]
            for i in range(50)]
    events = [_tm()] + [
        bw.encode_rows_event(23, "insert", [r], COLS, META, log_pos=100 + i)
        for i, r in enumerate(rows)
    ]
    raw = spark.createDataFrame([(e,) for e in events], "value binary").coalesce(1)
    out = bw.decode_binlog_df(raw, file_name="binlog.000001").collect()
    assert len(out) == 50
    byid = {int(r["data"]["id"]): r for r in out}
    assert byid[7]["data"]["name"] == "n7"
    assert byid[7]["data"]["price"] == "7.25"
    assert byid[49]["pos"] == 149


def test_gtid_event_microsecond_timestamp_and_sticky_state():
    """GTID event (MySQL >=8.0.1): the 7-byte original-commit timestamp
    overrides the header's seconds on every row of the transaction
    (binlog.go:121-126, filter.go:98-100); the GTID string tags rows;
    anonymous and pre-8.0.1 (no-timestamp) forms fall back to header
    seconds."""
    import datetime as dt
    import uuid

    from olake_spark.streaming.binlog_wire import (
        BinlogDecoder,
        TYPE_LONG,
        encode_gtid,
        encode_rows_event,
        encode_table_map,
    )

    sid = uuid.UUID("12345678-1234-5678-1234-567812345678")
    us = 1_709_287_200_123_456  # 2024-03-01 10:00:00.123456 UTC
    dec = BinlogDecoder("f.000001", {("db", "t"): ["id"]})
    tm = encode_table_map(7, "db", "t", [TYPE_LONG], [0])
    rows_ev = encode_rows_event(7, "insert", [[1]], [TYPE_LONG], [0], ts=1_709_287_205)

    # flag-clear form: original == immediate
    dec.decode(encode_gtid(sid.bytes, 42, immediate_us=us))
    dec.decode(tm)
    (r1,) = dec.decode(rows_ev)
    assert r1["ts"] == dt.datetime(2024, 3, 1, 10, 0, 0, 123456)
    assert r1["gtid"] == f"{sid}:42"

    # flag-set form: distinct original wins over immediate
    dec.decode(encode_gtid(sid.bytes, 43, immediate_us=us + 999, original_us=us + 5))
    (r2,) = dec.decode(rows_ev)
    assert r2["ts"] == dt.datetime(2024, 3, 1, 10, 0, 0, 123461)
    assert r2["gtid"] == f"{sid}:43"

    # anonymous GTID: timestamp still applies, no gtid string
    dec.decode(encode_gtid(sid.bytes, 0, immediate_us=us, anonymous=True))
    (r3,) = dec.decode(rows_ev)
    assert r3["ts"].microsecond == 123456 and r3["gtid"] is None

    # pre-8.0.1 short form: no timestamps -> header seconds fallback
    dec.decode(encode_gtid(sid.bytes, 44))
    (r4,) = dec.decode(rows_ev)
    assert r4["ts"] == dt.datetime(2024, 3, 1, 10, 0, 5)
    assert r4["gtid"] == f"{sid}:44"


def test_checksum_verified_not_just_stripped():
    """binlog_checksum=CRC32: a valid trailing crc32 decodes; a corrupt one
    raises instead of silently decoding garbage (the reference inherits
    this from go-mysql's event parser)."""
    import zlib

    import pytest

    from olake_spark.streaming.binlog_wire import (
        BinlogDecoder,
        TYPE_LONG,
        encode_rows_event,
        encode_table_map,
    )

    def with_crc(ev: bytes) -> bytes:
        return ev + (zlib.crc32(ev) & 0xFFFFFFFF).to_bytes(4, "little")

    tm = encode_table_map(9, "db", "t", [TYPE_LONG], [0])
    ins = encode_rows_event(9, "insert", [[5]], [TYPE_LONG], [0])

    dec = BinlogDecoder("f", {("db", "t"): ["id"]}, checksum=True)
    dec.decode(with_crc(tm))
    (row,) = dec.decode(with_crc(ins))
    assert row["data"]["id"] == "5"

    bad = bytearray(with_crc(ins))
    bad[-1] ^= 0xFF
    with pytest.raises(ValueError, match="checksum mismatch"):
        dec.decode(bytes(bad))
