"""Pure-stdlib image codec: BMP/PNG round-trips, all PNG filter types,
exact NN resize, and the oracle-reproducible pixel checksum.

The forward PNG filterer here is written from the PNG spec (RFC 2083 §6)
independently of the decoder, so filter tests are differential, not
self-confirming.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from olake_spark.functions import imagecodec as ic

rng = np.random.RandomState(7)
PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _png_from_raw(w: int, h: int, ctype: int, raw: bytes) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )


def _forward_filter(img: np.ndarray, ftypes: list[int]) -> bytes:
    """Apply PNG row filters per spec (independent reimplementation)."""
    h, w, nch = img.shape
    stride = w * nch
    flat = img.reshape(h, stride).astype(int)
    out = bytearray()
    for y, ft in zip(range(h), ftypes):
        out.append(ft)
        for x in range(stride):
            cur = flat[y, x]
            left = flat[y, x - nch] if x >= nch else 0
            up = flat[y - 1, x] if y else 0
            ul = flat[y - 1, x - nch] if y and x >= nch else 0
            if ft == 0:
                v = cur
            elif ft == 1:
                v = cur - left
            elif ft == 2:
                v = cur - up
            elif ft == 3:
                v = cur - (left + up) // 2
            else:  # Paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else (up if pb <= pc else ul)
                v = cur - pred
            out.append(v & 0xFF)
    return bytes(out)


@pytest.mark.parametrize("w,h", [(8, 8), (13, 7), (64, 48), (1, 1), (5, 3)])
def test_bmp_png_roundtrip(w, h):
    a = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    assert np.array_equal(ic.decode_image(ic.encode_bmp(a)), a)
    assert np.array_equal(ic.decode_image(ic.encode_png(a)), a)


def test_bmp_topdown_decode():
    a = rng.randint(0, 256, (6, 10, 3), dtype=np.uint8)
    data = bytearray(ic.encode_bmp(a))
    # flip to top-down: negate height, reverse pixel row order
    struct.pack_into("<i", data, 22, -6)
    stride = (3 * 10 + 3) // 4 * 4
    rows = bytes(data[54:])
    flipped = b"".join(
        rows[(5 - y) * stride : (6 - y) * stride] for y in range(6)
    )
    assert np.array_equal(ic.decode_image(bytes(data[:54]) + flipped), a)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_each_filter_type(ftype):
    a = rng.randint(0, 256, (9, 6, 3), dtype=np.uint8)
    raw = _forward_filter(a, [ftype] * 9)
    assert np.array_equal(ic.decode_image(_png_from_raw(6, 9, 2, raw)), a)


def test_png_mixed_filters_gray_and_rgba():
    ft = [0, 1, 2, 3, 4, 2, 1]
    g = rng.randint(0, 256, (7, 5, 1), dtype=np.uint8)
    png = _png_from_raw(5, 7, 0, _forward_filter(g, ft))
    assert np.array_equal(ic.decode_image(png), np.repeat(g, 3, axis=2))
    rgba = rng.randint(0, 256, (7, 5, 4), dtype=np.uint8)
    png = _png_from_raw(5, 7, 6, _forward_filter(rgba, ft))
    assert np.array_equal(ic.decode_image(png), rgba[:, :, :3])


def test_resize_nearest_exact_mapping():
    a = rng.randint(0, 256, (10, 9, 3), dtype=np.uint8)
    up = ic.resize_nearest(a, 20, 25)
    down = ic.resize_nearest(a, 4, 5)
    for y in range(5):
        for x in range(4):
            assert (down[y, x] == a[y * 10 // 5, x * 9 // 4]).all()
    for y in range(25):
        for x in range(20):
            assert (up[y, x] == a[y * 10 // 25, x * 9 // 20]).all()
    # identity resize is the identity
    assert np.array_equal(ic.resize_nearest(a, 9, 10), a)


def test_pixel_checksum_formula_and_sensitivity():
    a = rng.randint(0, 256, (4, 6, 3), dtype=np.uint8)
    expected = sum(
        (y * 6 + x + 1)
        * (int(a[y, x, 0]) + 2 * int(a[y, x, 1]) + 4 * int(a[y, x, 2]))
        for y in range(4)
        for x in range(6)
    )
    assert ic.pixel_checksum(a) == expected
    assert ic.pixel_checksum(a[:, :, ::-1]) != expected  # channel swap
    assert ic.pixel_checksum(a[::-1]) != expected  # vertical flip


def test_undecodable_raises():
    with pytest.raises(ValueError):
        ic.decode_image(b"not an image at all")
    with pytest.raises(ValueError):
        ic.decode_image(b"BM" + b"\x00" * 10)  # truncated BMP
    # interlaced PNG refused, not mis-decoded
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 1)
    png = PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlace"):
        ic.decode_image(png)


def test_corrupt_payloads_normalize_to_valueerror():
    """Every decode failure mode must surface as ValueError — the kernels
    catch exactly that to honor the poison-payload contract (a corrupt
    IDAT used to escape as zlib.error and kill the stage)."""
    a = rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)
    good = ic.encode_png(a)
    # valid signature+IHDR, garbage DEFLATE bytes in IDAT
    corrupt_idat = (
        good[: good.index(b"IDAT") - 4]
        + _chunk(b"IDAT", b"\x99garbage-not-deflate\x00")
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="corrupt png"):
        ic.decode_image(corrupt_idat)
    # truncated IHDR body (struct.error inside)
    short_ihdr = PNG_SIG + _chunk(b"IHDR", b"\x00\x00\x00\x04")
    with pytest.raises(ValueError):
        ic.decode_image(short_ihdr)
    # BMP with trashed header fields
    bmp = bytearray(ic.encode_bmp(a))
    with pytest.raises(ValueError):
        ic.decode_image(bytes(bmp[:30]))


def test_sub_filter_vectorized_matches_reference():
    """The cumsum-lane Sub decode equals the sequential definition on a
    wide row (regression for the vectorization)."""
    a = rng.randint(0, 256, (3, 257, 3), dtype=np.uint8)
    raw = _forward_filter(a, [1, 1, 1])
    assert np.array_equal(ic.decode_image(_png_from_raw(257, 3, 2, raw)), a)


def test_apng_roundtrip_and_contracts():
    frames = [rng.randint(0, 256, (6, 9, 3), dtype=np.uint8) for _ in range(4)]
    data = ic.encode_apng(frames)
    out = ic.decode_apng(data)
    assert len(out) == 4
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)
    # plain PNG decodes as a 1-frame clip
    png = ic.encode_png(frames[0])
    one = ic.decode_apng(png)
    assert len(one) == 1 and np.array_equal(one[0], frames[0])
    # frame-count mismatch and corrupt frame stream both normalize to
    # ValueError (poison contract)
    bad = bytearray(data)
    actl_at = data.index(b"acTL")
    struct.pack_into(">I", bad, actl_at + 4, 9)  # declare 9 frames
    with pytest.raises(ValueError, match="declares 9"):
        ic.decode_apng(bytes(bad))
    fdat_at = data.index(b"fdAT")
    corrupt = bytearray(data)
    corrupt[fdat_at + 12 : fdat_at + 20] = b"\x00" * 8
    with pytest.raises(ValueError):
        ic.decode_apng(bytes(corrupt))
    # out-of-profile frames (offset) refused, not mis-composited
    fctl_at = data.index(b"fcTL")
    off = bytearray(data)
    struct.pack_into(">I", off, fctl_at + 4 + 12, 2)  # x_offset = 2
    with pytest.raises(ValueError, match="offset|unsupported"):
        ic.decode_apng(bytes(off))


def test_apng_zero_frame_actl_refused():
    """acTL declaring 0 frames (spec: num_frames >= 1) must raise, not
    return [] — a [] return made sample_frames silently DROP the media
    row instead of surfacing a NULL row (regression)."""
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    a = rng.randint(0, 256, (4, 4, 3), dtype=np.uint8)
    idat = ic.encode_png(a)
    idat_body = idat[idat.index(b"IDAT") + 4 :]
    data = (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"acTL", struct.pack(">II", 0, 0))
        + idat[idat.index(b"IDAT") - 4 : idat.index(b"IEND") - 4]
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="zero frames"):
        ic.decode_apng(data)
    with pytest.raises(ValueError, match="zero frames"):
        ic.parse_apng_streams(data)


def test_apng_out_of_profile_header_refused():
    """decode_apng must enforce the same IHDR comp/filt checks as
    _decode_png — an APNG with filter-method or compression-method != 0
    is refused, never decoded as if method 0 (regression)."""
    frames = [rng.randint(0, 256, (4, 4, 3), dtype=np.uint8) for _ in range(2)]
    data = ic.encode_apng(frames)
    ihdr_at = data.index(b"IHDR")
    for byte_off in (9, 10):  # comp, filt bytes inside the IHDR body
        bad = bytearray(data)
        bad[ihdr_at + 4 + byte_off] = 1
        # CRC now wrong too, but profile check fires first on the parse
        with pytest.raises(ValueError, match="profile|corrupt"):
            ic.decode_apng(bytes(bad))


def test_parse_streams_selective_decode_matches_full():
    """parse_apng_streams + decode_frame_stream on a subset equals the
    corresponding frames of a full decode_apng — the sample_frames fast
    path decodes only sampled indices."""
    frames = [rng.randint(0, 256, (5, 7, 3), dtype=np.uint8) for _ in range(5)]
    data = ic.encode_apng(frames)
    full = ic.decode_apng(data)
    w, h, ctype, streams = ic.parse_apng_streams(data)
    assert (w, h, ctype, len(streams)) == (7, 5, 2, 5)
    for t in (0, 2, 4):
        assert np.array_equal(
            ic.decode_frame_stream(streams[t], w, h, ctype), full[t]
        )
    # plain PNG → None (caller falls back to decode_image)
    assert ic.parse_apng_streams(ic.encode_png(frames[0])) is None
