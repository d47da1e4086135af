"""Geometry normalization: WKB bytes → WKT strings.

Reference semantics (utils/typeutils/reformat.go:512-545 ReformatGeoType):
MySQL/PG geometry columns arrive as WKB with a 4-byte SRID prefix; the
engine skips the prefix, decodes WKB, and emits WKT. Anything that fails to
decode falls back to the lowercase hex of the *whole* input. Strings pass
through untouched (already WKT).

No geo library ships in this container, so the decoder is a small pure-
Python WKB reader for the common planar types (Point, LineString, Polygon,
MultiPoint); exotic types hex-fallback exactly like a decode failure. It
runs as an Arrow-batched pandas UDF — per-batch Python, not per-row — and
geometry columns are a tiny fraction of scanned bytes, so the Python hop
is bounded. (With a real cluster, swap the body for shapely/sedona and the
signature stays the same.)
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["wkb_to_wkt", "geo_column"]

_POINT, _LINESTRING, _POLYGON, _MULTIPOINT = 1, 2, 3, 4


def _fmt(x: float) -> str:
    # Go's %v float rendering: integral values print without a decimal part
    return repr(int(x)) if x == int(x) else repr(x)


def _read_point(buf: memoryview, off: int, fmt: str) -> tuple[str, int]:
    x, y = struct.unpack_from(fmt + "dd", buf, off)
    return f"{_fmt(x)} {_fmt(y)}", off + 16


def _read_ring(buf: memoryview, off: int, fmt: str) -> tuple[str, int]:
    (n,) = struct.unpack_from(fmt + "I", buf, off)
    off += 4
    pts = []
    for _ in range(n):
        p, off = _read_point(buf, off, fmt)
        pts.append(p)
    return "(" + ", ".join(pts) + ")", off


def _decode_wkb(b: bytes) -> str | None:
    try:
        buf = memoryview(b)
        fmt = "<" if buf[0] == 1 else ">"
        (gtype,) = struct.unpack_from(fmt + "I", buf, 1)
        off = 5
        if gtype == _POINT:
            p, off = _read_point(buf, off, fmt)
            out = f"POINT ({p})"
        elif gtype == _LINESTRING:
            ring, off = _read_ring(buf, off, fmt)
            out = f"LINESTRING {ring}"
        elif gtype == _POLYGON:
            (nrings,) = struct.unpack_from(fmt + "I", buf, off)
            off += 4
            rings = []
            for _ in range(nrings):
                r, off = _read_ring(buf, off, fmt)
                rings.append(r)
            out = f"POLYGON ({', '.join(rings)})"
        elif gtype == _MULTIPOINT:
            (n,) = struct.unpack_from(fmt + "I", buf, off)
            off += 4
            pts = []
            for _ in range(n):
                # each member point is a full WKB value (endianness + type)
                mfmt = "<" if buf[off] == 1 else ">"
                (mt,) = struct.unpack_from(mfmt + "I", buf, off + 1)
                if mt != _POINT:
                    return None
                p, noff = _read_point(buf, off + 5, mfmt)
                pts.append(f"({p})")
                off = noff
            out = f"MULTIPOINT ({', '.join(pts)})"
        else:
            return None
        return out if off == len(buf) else None
    except (struct.error, IndexError):
        return None


def wkb_to_wkt(value: bytes | str | None) -> str | None:
    """One value through the reference's geo pipeline (driver-side helper)."""
    if value is None:
        return None
    if isinstance(value, str):
        return value
    b = bytes(value)
    if len(b) > 4:
        decoded = _decode_wkb(b[4:])  # skip the 4-byte SRID prefix
        if decoded:
            return decoded
    return b.hex()


_udf_cache: list = []


def geo_column(col: Column | str) -> Column:
    """WKB binary column → WKT string column (hex fallback)."""
    if not _udf_cache:
        # built lazily — pandas_udf registration needs an active session
        @pandas_udf("string")
        def _wkb_to_wkt_udf(s: pd.Series) -> pd.Series:
            return s.map(wkb_to_wkt)

        _udf_cache.append(_wkb_to_wkt_udf)
    c = F.col(col) if isinstance(col, str) else col
    return _udf_cache[0](c)
