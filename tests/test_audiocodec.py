"""WAV (RIFF PCM16) codec + audio kernels: round-trips, chunk walking,
unsupported-layout refusal, exact decimation, poison-payload contracts."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from olake_spark.functions import audiocodec as ac

rng = np.random.RandomState(11)


def test_roundtrip_and_header_size():
    s = rng.randint(-32768, 32768, 1000).astype(np.int16)
    data = ac.encode_wav(s, 16000)
    assert len(data) == 44 + 2 * len(s)
    rate, out = ac.decode_wav(data)
    assert rate == 16000
    assert np.array_equal(out, s)


def test_extra_chunks_skipped():
    """Real-world WAVs carry LIST/INFO chunks between fmt and data — the
    chunk walk must skip unknown (and odd-sized, word-aligned) chunks."""
    s = rng.randint(-1000, 1000, 64).astype(np.int16)
    data = ac.encode_wav(s, 8000)
    fmt_chunk = data[12:36]
    data_chunk = data[36:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # odd size + pad
    spliced = b"RIFF" + struct.pack("<I", 0) + b"WAVE" + fmt_chunk + extra + data_chunk
    rate, out = ac.decode_wav(spliced)
    assert rate == 8000 and np.array_equal(out, s)


def test_unsupported_layouts_refused():
    s = rng.randint(-100, 100, 16).astype(np.int16)
    good = bytearray(ac.encode_wav(s, 8000))
    stereo = bytearray(good)
    struct.pack_into("<H", stereo, 22, 2)  # nch=2
    with pytest.raises(ValueError, match="channels"):
        ac.decode_wav(bytes(stereo))
    f32 = bytearray(good)
    struct.pack_into("<H", f32, 20, 3)  # IEEE float format code
    with pytest.raises(ValueError, match="PCM only"):
        ac.decode_wav(bytes(f32))
    with pytest.raises(ValueError):
        ac.decode_wav(b"RIFF\x00\x00\x00\x00WAVEfmt \xff\xff\xff\xff")
    with pytest.raises(ValueError):
        ac.decode_wav(b"not audio")


def test_decimate_exact_and_checksum():
    s = rng.randint(-32768, 32768, 101).astype(np.int16)
    d = ac.decimate(s, 3)
    assert np.array_equal(d, s[::3]) and len(d) == 34
    expected = sum((i + 1) * int(v) for i, v in enumerate(s))
    assert ac.sample_checksum(s) == expected
    assert ac.sample_checksum(s[::-1]) != expected  # order-sensitive


def test_audio_kernels_end_to_end(spark):
    from olake_spark.operators.multimodal import (
        extract_audio_features,
        resample_audio,
        synth_audio_params,
        synth_samples,
        synthesize_audio,
    )

    ids = spark.range(1, 7).withColumnRenamed("id", "media_id")
    media = synthesize_audio(ids)
    feats = {r.media_id: r for r in extract_audio_features(media).collect()}
    for mid, r in feats.items():
        n, rate = synth_audio_params(mid)
        s = synth_samples(mid, n)
        assert (r.n_samples, r.sample_rate) == (n, rate)
        assert r.n_bytes == 44 + 2 * n
        assert r.sample_checksum == ac.sample_checksum(s)
    res = {r.media_id: r
           for r in extract_audio_features(resample_audio(media, 4)).collect()}
    for mid, r in res.items():
        n, rate = synth_audio_params(mid)
        expect = ac.decimate(synth_samples(mid, n), 4)
        assert r.n_samples == len(expect)
        assert r.sample_rate == rate // 4
        assert r.sample_checksum == ac.sample_checksum(expect)
    # poison payload passes through with NULL audio fields
    bad = spark.createDataFrame(
        [(99, bytearray(b"mp3-or-something"), "audio", "{}")],
        "media_id long, payload binary, media_type string, meta string",
    )
    f = extract_audio_features(bad).first()
    assert f.n_bytes == 16 and f.sample_rate is None and f.sample_checksum is None
    r = resample_audio(bad, 2).first()
    assert bytes(r.payload) == b"mp3-or-something"


def test_mixed_poison_batch_keeps_int64_exact(spark):
    """A mapInPandas batch mixing a poison (None-field) row with a long
    valid clip must NOT round the int64 checksum through float64: pandas
    coerces int columns with NaN to float64, silently corrupting values
    above 2^53 (regression — _exact_frame object-dtype fix)."""
    from olake_spark.operators.multimodal import extract_audio_features

    n = 1_000_000
    s = np.full(n, 30000, dtype=np.int16)
    s[0] = 30001  # make the checksum ODD: float64 would round it even
    expected = ac.sample_checksum(s)
    assert expected > 2**53 and expected % 2 == 1
    wav = ac.encode_wav(s, 16000)
    media = spark.createDataFrame(
        [(1, None, "audio", None), (2, wav, "audio", None)],
        "media_id long, payload binary, media_type string, meta string",
    ).coalesce(1)  # force both rows into ONE kernel batch
    rows = {r.media_id: r for r in extract_audio_features(media).collect()}
    assert rows[1].sample_checksum is None
    assert rows[2].sample_checksum == expected
    assert rows[2].n_samples == n


def test_audio_fingerprint_invariance_and_kernel(spark):
    """Energy fingerprint contracts: amplitude scaling (no clipping)
    preserves all 64 bits; reordering samples changes them; the Spark
    kernel equals the driver-side reference; poison surfaces NULL."""
    from olake_spark.operators.multimodal import (
        amplify_audio,
        audio_fingerprint,
        audio_fingerprint_of,
        synth_samples,
        synthesize_audio,
    )

    s = synth_samples(5, 900)
    fp = audio_fingerprint_of(s)
    assert audio_fingerprint_of((s.astype(np.int64) * 7).astype(np.int16)) == fp
    assert audio_fingerprint_of(s[::-1].copy()) != fp
    with pytest.raises(ValueError, match="needs"):
        audio_fingerprint_of(s[:64])

    ids = spark.range(1, 6).withColumnRenamed("id", "media_id")
    media = synthesize_audio(ids)
    got = {r.media_id: r.afp for r in audio_fingerprint(media).collect()}
    for mid in range(1, 6):
        n, _ = __import__("olake_spark.operators.multimodal", fromlist=["synth_audio_params"]).synth_audio_params(mid)
        assert got[mid] == audio_fingerprint_of(synth_samples(mid, n))
    # amplified re-encode keeps the fingerprint through a REAL decode
    amp = {r.media_id: r.afp for r in audio_fingerprint(amplify_audio(media, 3)).collect()}
    assert amp == got
    # poison
    bad = spark.createDataFrame(
        [(9, None, "audio", None), (10, b"junk", "audio", None)],
        "media_id long, payload binary, media_type string, meta string",
    )
    assert all(r.afp is None for r in audio_fingerprint(bad).collect())
