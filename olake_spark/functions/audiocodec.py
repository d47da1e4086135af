"""Pure-stdlib audio codec for the multimodal kernels: WAV (RIFF PCM16).

The audio sibling of ``imagecodec.py``: canonical 44-byte-header RIFF/WAVE
with 16-bit little-endian PCM — the fully-public format every toolchain
can read — decoded and encoded with ``struct``/numpy only (no ffmpeg /
librosa in this environment; compressed codecs stay honestly out of
scope and surface as ``ValueError`` → NULL features, never fabricated
values).

``sample_checksum`` is an exact int64 the SQL oracle reproduces from a
sample closed form alone, and ``decimate`` is the exact every-k-th-sample
downsample whose output checksum the oracle computes with an index map —
so decode → resample → re-encode → decode is verified sample-exact
cross-engine, the same discipline as the image path.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_wav",
    "encode_wav",
    "decimate",
    "sample_checksum",
    "is_wav",
]


def is_wav(data: bytes) -> bool:
    return len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 mono sample array) from RIFF PCM16 bytes.

    Walks the chunk list (fmt / data; others skipped), requires PCM
    format 1, 16-bit, mono. Every malformed-input failure raises
    ``ValueError`` (the kernels' single catch type)."""
    if not is_wav(data):
        raise ValueError("not a RIFF/WAVE payload")
    try:
        pos, rate, bits, nch = 12, None, None, None
        samples = None
        while pos + 8 <= len(data):
            tag = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body = data[pos + 8 : pos + 8 + size]
            if len(body) != size:
                raise ValueError("truncated WAV chunk")
            if tag == b"fmt ":
                fmt, nch, rate = struct.unpack_from("<HHI", body, 0)
                (bits,) = struct.unpack_from("<H", body, 14)
                if fmt != 1:
                    raise ValueError(f"unsupported WAV format code {fmt} (PCM only)")
                if bits != 16 or nch != 1:
                    raise ValueError(
                        f"unsupported WAV layout (bits={bits}, channels={nch})"
                    )
            elif tag == b"data":
                samples = np.frombuffer(body, dtype="<i2")
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        if rate is None or samples is None:
            raise ValueError("WAV missing fmt/data chunk")
        return int(rate), samples.astype(np.int16)
    except struct.error as exc:
        raise ValueError(f"corrupt WAV payload: {exc}") from exc


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """Canonical 44-byte-header RIFF PCM16 mono encode."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
    )
    return hdr + pcm


def decimate(samples: np.ndarray, factor: int) -> np.ndarray:
    """Exact every-``factor``-th-sample downsample (out[i] = in[i*factor])
    — the index map the SQL oracle reproduces with integer arithmetic.
    (A production resampler low-passes first; plain decimation is the
    deterministic, oracle-checkable core.)"""
    if factor < 1:
        raise ValueError("decimation factor must be >= 1")
    return np.asarray(samples)[::factor]


def sample_checksum(samples: np.ndarray) -> int:
    """Exact int64 position-weighted checksum: Σ (i+1) * sample[i].

    Signed samples allowed; bounds: n ≤ ~5e5 at |s| ≤ 32768 stays far
    inside int64. Reorderings and sign flips change the value, and the
    oracle computes it from the synthesis closed form with one
    generate_series — no codec on the oracle side."""
    s = np.asarray(samples, dtype=np.int64)
    return int((np.arange(1, len(s) + 1, dtype=np.int64) * s).sum())
