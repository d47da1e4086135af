"""Property-based fuzz for the pure-stdlib media codecs: arbitrary
payloads must round-trip exactly, and malformed bytes must raise
ValueError — never decode wrong or escape with a different exception."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from olake_spark.functions import audiocodec as ac
from olake_spark.functions import imagecodec as ic

dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


@st.composite
def images(draw):
    w, h = draw(dims)
    seed = draw(st.integers(0, 2**31 - 1))
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)


@given(images())
@settings(max_examples=40, deadline=None)
def test_bmp_roundtrip_exact(arr):
    assert np.array_equal(ic.decode_image(ic.encode_bmp(arr)), arr)


@given(images())
@settings(max_examples=40, deadline=None)
def test_png_roundtrip_exact(arr):
    assert np.array_equal(ic.decode_image(ic.encode_png(arr)), arr)


@given(images(), st.integers(1, 40), st.integers(1, 40))
@settings(max_examples=30, deadline=None)
def test_resize_matches_floor_map(arr, w2, h2):
    out = ic.resize_nearest(arr, w2, h2)
    assert out.shape == (h2, w2, 3)
    h, w = arr.shape[:2]
    for y2 in (0, h2 - 1):
        for x2 in (0, w2 - 1):
            assert (out[y2, x2] == arr[(y2 * h) // h2, (x2 * w) // w2]).all()


@given(st.lists(images(), min_size=1, max_size=4), st.integers(0, 3))
@settings(max_examples=20, deadline=None)
def test_apng_roundtrip_and_selective_decode(frames, pick):
    # equal-size frames required: broadcast all to frame 0's shape
    h, w = frames[0].shape[:2]
    frames = [np.resize(f, (h, w, 3)).astype(np.uint8) for f in frames]
    data = ic.encode_apng(frames)
    out = ic.decode_apng(data)
    assert len(out) == len(frames)
    for a, b in zip(frames, out):
        assert np.array_equal(a, b)
    parsed = ic.parse_apng_streams(data)
    assert parsed is not None
    w_, h_, ctype, streams = parsed
    t = min(pick, len(streams) - 1)
    assert np.array_equal(
        ic.decode_frame_stream(streams[t], w_, h_, ctype), frames[t]
    )


@given(st.binary(min_size=0, max_size=300))
@settings(max_examples=60, deadline=None)
def test_arbitrary_bytes_never_misdecode(data):
    """Garbage in -> ValueError out (or a real decode for a crafted valid
    prefix): no other exception type may escape the codec boundary."""
    for fn in (ic.decode_image, ic.decode_apng):
        try:
            fn(data)
        except ValueError:
            pass
    try:
        ac.decode_wav(data)
    except ValueError:
        pass


@given(
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=400),
    st.sampled_from([8000, 16000, 44100]),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_exact(samples, rate):
    s = np.array(samples, dtype=np.int16)
    r2, s2 = ac.decode_wav(ac.encode_wav(s, rate))
    assert r2 == rate and np.array_equal(s2, s)


@given(st.lists(st.integers(-32768, 32767), min_size=65, max_size=300))
@settings(max_examples=30, deadline=None)
def test_audio_fingerprint_amplitude_invariance(samples):
    from olake_spark.operators.multimodal import audio_fingerprint_of

    s = np.array(samples, dtype=np.int16)
    # scale by 2 in int32 space then clip-free check: skip if clipping
    if np.abs(s.astype(np.int64) * 2).max() <= 32767:
        assert audio_fingerprint_of((s * 2).astype(np.int16)) == audio_fingerprint_of(s)
