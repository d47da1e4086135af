"""WKB→WKT geometry normalization tests (functions/geo.py).

WKB fixtures are hand-built little-endian buffers with the MySQL 4-byte
SRID prefix, mirroring ReformatGeoType (reformat.go:512-545).
"""

from __future__ import annotations

import struct

from pyspark.sql import functions as F

from olake_spark.functions.geo import geo_column, wkb_to_wkt

SRID = struct.pack("<I", 4326)


def _wkb_point(x, y):
    return SRID + struct.pack("<BIdd", 1, 1, x, y)


def _wkb_linestring(pts):
    out = struct.pack("<BII", 1, 2, len(pts))
    for x, y in pts:
        out += struct.pack("<dd", x, y)
    return SRID + out


def _wkb_polygon(rings):
    out = struct.pack("<BII", 1, 3, len(rings))
    for ring in rings:
        out += struct.pack("<I", len(ring))
        for x, y in ring:
            out += struct.pack("<dd", x, y)
    return SRID + out


def test_point():
    assert wkb_to_wkt(_wkb_point(1.0, 2.5)) == "POINT (1 2.5)"


def test_linestring():
    assert wkb_to_wkt(_wkb_linestring([(0, 0), (1, 1), (2, 0)])) == (
        "LINESTRING (0 0, 1 1, 2 0)"
    )


def test_polygon():
    ring = [(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)]
    assert wkb_to_wkt(_wkb_polygon([ring])) == (
        "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
    )


def test_string_passthrough():
    assert wkb_to_wkt("POINT (9 9)") == "POINT (9 9)"


def test_garbage_hex_fallback():
    raw = SRID + b"\x01\x99\x00\x00\x00junk"
    assert wkb_to_wkt(raw) == raw.hex()


def test_short_buffer_hex_fallback():
    assert wkb_to_wkt(b"\x01\x02") == "0102"


def test_none_passthrough():
    assert wkb_to_wkt(None) is None


def test_big_endian_point():
    raw = SRID + struct.pack(">BIdd", 0, 1, 3.0, 4.0)
    # byte-order flag 0 = big endian
    assert wkb_to_wkt(raw) == "POINT (3 4)"


def test_udf_on_dataframe(spark):
    rows = [(1, bytearray(_wkb_point(10.5, -3.0))), (2, bytearray(b"\xff\xfe\xfd\xfc\xfb"))]
    df = spark.createDataFrame(rows, "id int, g binary")
    out = {r["id"]: r["wkt"] for r in df.select("id", geo_column("g").alias("wkt")).collect()}
    assert out[1] == "POINT (10.5 -3)"
    assert out[2] == "fffefdfcfb"
