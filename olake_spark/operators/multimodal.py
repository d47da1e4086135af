"""Multimodal columns: opaque binary payloads + typed metadata, with REAL
pure-stdlib image kernels.

Design for image/audio/video at 100 TB: media lives as an opaque ``binary``
column (or an object-store URI column) beside typed metadata; all decode /
feature-extract / resize / frame-sample work runs as **Arrow-batched
``mapInPandas``** stages so bytes never round-trip per row through Python
serde, and the pipeline partitions by input splits (no shuffle) unless the
caller groups (e.g. frames → video).

The image kernels actually transform pixels: ``functions/imagecodec.py``
decodes/encodes 24-bit BMP and 8-bit PNG (stdlib ``zlib``), resizes with an
exact integer nearest-neighbor map, and computes an int64 pixel checksum a
SQL oracle can reproduce from the pixel function alone — so decode →
resize → re-encode → decode is verified pixel-exact cross-engine. Formats
beyond BMP/PNG (JPEG/WebP/video/audio) need codecs this container doesn't
ship; payloads the codec can't parse surface as NULL dimensions, never a
fake value.

Reference parity: the reference engine stops at row-level sync (no media
kernels); this family implements the builder brief's multimodal
requirement.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from olake_spark.functions import imagecodec as ic

from olake_spark.materialize import materialize

__all__ = [
    "MEDIA_SCHEMA",
    "FEATURE_SCHEMA",
    "AUDIO_FEATURE_SCHEMA",
    "attach_binary_payload",
    "synthesize_images",
    "synthesize_audio",
    "extract_features",
    "extract_audio_features",
    "resize_images",
    "resample_audio",
    "sample_frames",
    "synthesize_videos",
    "dhash_of",
    "image_dhash",
    "image_near_dups",
    "incremental_phash_dedup",
    "audio_fingerprint_of",
    "audio_fingerprint",
    "amplify_audio",
    "resize_videos",
    "video_fingerprint",
    "FRAME_SCHEMA",
    "synth_dims",
    "synth_pixels",
    "synth_audio_params",
    "synth_samples",
    "synth_video_params",
    "synth_frame_seed",
]

# canonical media-table shape: id + payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),  # image|audio|video
        T.StructField("meta", T.StringType(), True),  # JSON metadata
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_hash", T.StringType(), True),
        T.StructField("format", T.StringType(), True),  # bmp|png|NULL
        T.StructField("width", T.IntegerType(), True),  # NULL if undecodable
        T.StructField("height", T.IntegerType(), True),
        T.StructField("pix_checksum", T.LongType(), True),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media-shaped table from a text column (UTF-8 bytes stand in
    for an opaque payload — generic binary plumbing, not a decodable
    image; ``extract_features`` reports NULL dimensions for these)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("blob").alias("media_type"),
        F.to_json(F.struct(F.length(F.col(text_col)).alias("n_chars"))).alias("meta"),
    )


# ---------------------------------------------------------------------------
# deterministic synthetic images (fixture generator — the testdata carries
# no real media, so images are synthesized distributedly from ids; the SQL
# oracle recomputes every derived quantity from these same closed forms)
# ---------------------------------------------------------------------------

# dims: 8..64 wide, 8..48 tall — enough variety to hit BMP row padding
# (w % 4 ≠ 0), up- and down-scaling, and both formats
def synth_dims(media_id: int) -> tuple[int, int]:
    return 8 + (media_id * 7) % 57, 8 + (media_id * 11) % 41


def synth_pixels(media_id: int, w: int, h: int) -> np.ndarray:
    """R=(id*7+x*13+y*31)%256, G=(id*3+x*5+y*11)%256, B=(id+x+y)%256."""
    y, x = np.mgrid[0:h, 0:w]
    i = int(media_id)
    r = (i * 7 + x * 13 + y * 31) % 256
    g = (i * 3 + x * 5 + y * 11) % 256
    b = (i + x + y) % 256
    return np.stack([r, g, b], axis=2).astype(np.uint8)


def synthesize_images(
    ids: DataFrame, id_col: str = "media_id", fmt: str | None = None
) -> DataFrame:
    """One deterministic synthetic image per input id, encoded for real:
    even ids → BMP, odd ids → PNG (or force ``fmt=``). Runs as an
    Arrow-batched ``mapInPandas`` over the id frame — generation is
    distributed and partition-independent (everything derives from the
    id), the shape real media ingestion has after a binary-file read."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col].astype("int64"):
                mid = int(mid)
                w, h = synth_dims(mid)
                arr = synth_pixels(mid, w, h)
                f = fmt or ("bmp" if mid % 2 == 0 else "png")
                payload = ic.encode_bmp(arr) if f == "bmp" else ic.encode_png(arr)
                out.append(
                    (mid, payload, "image", json.dumps({"w": w, "h": h, "fmt": f}))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload", "media_type", "meta"])

    return ids.mapInPandas(kernel, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# decode kernels
# ---------------------------------------------------------------------------


def _exact_frame(rows: list[tuple], columns: list[str]) -> pd.DataFrame:
    """Build a pandas frame with ``dtype=object`` so int64 columns in
    batches mixing poison (None) and valid rows are NOT coerced to
    float64 — that coercion silently rounds values above 2^53 (audio
    checksums legitimately reach ~4e18). Arrow converts object columns
    of Python ints/None to exact int64."""
    return pd.DataFrame(rows, columns=columns, dtype=object)


def _feature_row(mid: int, payload: bytes | None):
    if payload is None:
        return (mid, None, None, None, None, None, None)
    data = bytes(payload)
    md5 = hashlib.md5(data).hexdigest()
    try:
        arr = ic.decode_image(data)
    except ValueError:
        return (mid, len(data), md5, None, None, None, None)
    h, w = arr.shape[:2]
    return (
        mid, len(data), md5, ic.detect_format(data), w, h, ic.pixel_checksum(arr)
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL feature extraction: decode the payload (BMP/PNG),
    report (n_bytes, md5, format, width, height, pixel checksum). Payloads
    the codec can't parse get NULL format/dims/checksum — undecodable media
    is a surfaced data-quality signal, never a fabricated dimension."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _feature_row(int(m), p)
                for m, p in zip(pdf["media_id"], pdf["payload"])
            ]
            yield _exact_frame(
                rows,
                [
                    "media_id", "n_bytes", "content_hash", "format",
                    "width", "height", "pix_checksum",
                ],
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL resize through the Arrow batch path: decode each payload,
    nearest-neighbor resize to (width, height), re-encode in the SAME
    format, and stamp the actual output dims into ``meta``.

    The output schema is DERIVED FROM THE INPUT (not a fixed literal), so
    frames carrying extra columns keep them untouched — only ``payload``
    and (if present) ``meta`` change. Undecodable payloads pass through
    unchanged with an ``"undecodable"`` meta marker rather than failing
    the batch: at 100 TB a poison image must not kill the stage.
    """
    meta_cols = {f.name for f in media.schema.fields}
    has_meta = "meta" in meta_cols

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads, metas = [], []
            for p in pdf["payload"]:
                if p is None:
                    payloads.append(None)
                    metas.append(json.dumps({"resize": "null-payload"}))
                    continue
                data = bytes(p)
                try:
                    arr = ic.decode_image(data)
                except ValueError:
                    payloads.append(data)
                    metas.append(json.dumps({"resize": "undecodable"}))
                    continue
                res = ic.resize_nearest(arr, width, height)
                fmt = ic.detect_format(data)
                enc = ic.encode_bmp(res) if fmt == "bmp" else ic.encode_png(res)
                payloads.append(enc)
                metas.append(
                    json.dumps({"w": int(width), "h": int(height), "fmt": fmt})
                )
            out["payload"] = payloads
            if has_meta:
                out["meta"] = metas
            yield out

    return media.mapInPandas(kernel, schema=media.schema)


# ---------------------------------------------------------------------------
# audio: WAV (RIFF PCM16) — as real as the image path
# ---------------------------------------------------------------------------

AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),  # NULL if undecodable
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("peak", T.IntegerType(), True),  # max |sample|
        T.StructField("sum_abs", T.LongType(), True),  # exact Σ|sample|
        T.StructField("sample_checksum", T.LongType(), True),
    ]
)


def synth_audio_params(media_id: int) -> tuple[int, int]:
    """(n_samples, rate): 800..2399 samples, rate 8k/16k by parity."""
    return 800 + (media_id * 37) % 1600, 8000 if media_id % 2 == 0 else 16000


def synth_samples(media_id: int, n: int) -> np.ndarray:
    """sample[i] = ((id*31 + i*17) % 4001) - 2000 — int16-range closed form."""
    i = np.arange(n, dtype=np.int64)
    return (((int(media_id) * 31 + i * 17) % 4001) - 2000).astype(np.int16)


def synthesize_audio(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """One deterministic RIFF PCM16 clip per id (real encode), the audio
    twin of ``synthesize_images`` — distributed, id-derived, Arrow-batched."""
    from olake_spark.functions import audiocodec as ac

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col].astype("int64"):
                mid = int(mid)
                n, rate = synth_audio_params(mid)
                payload = ac.encode_wav(synth_samples(mid, n), rate)
                out.append(
                    (mid, payload, "audio", json.dumps({"n": n, "rate": rate}))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload", "media_type", "meta"])

    return ids.mapInPandas(kernel, MEDIA_SCHEMA)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """REAL WAV decode per payload: byte size, sample rate, sample count,
    peak amplitude, exact Σ|sample|, and the position-weighted checksum.
    Non-WAV / corrupt payloads surface NULL audio fields, never values."""
    from olake_spark.functions import audiocodec as ac

    def row(mid: int, payload):
        if payload is None:
            return (mid, None, None, None, None, None, None)
        data = bytes(payload)
        try:
            rate, s = ac.decode_wav(data)
        except ValueError:
            return (mid, len(data), None, None, None, None, None)
        a = s.astype(np.int64)
        return (
            mid, len(data), rate, len(s), int(np.abs(a).max(initial=0)),
            int(np.abs(a).sum()), ac.sample_checksum(s),
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _exact_frame(
                [row(int(m), p) for m, p in zip(pdf["media_id"], pdf["payload"])],
                [f.name for f in AUDIO_FEATURE_SCHEMA.fields],
            )

    return media.mapInPandas(kernel, AUDIO_FEATURE_SCHEMA)


def resample_audio(media: DataFrame, factor: int) -> DataFrame:
    """REAL decimation resample through the batch path: decode, keep every
    ``factor``-th sample, re-encode at rate//factor. Schema derives from
    the input (extra columns preserved); undecodable payloads pass through
    with a marker — same contracts as ``resize_images``."""
    from olake_spark.functions import audiocodec as ac

    has_meta = "meta" in {f.name for f in media.schema.fields}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads, metas = [], []
            for p in pdf["payload"]:
                if p is None:
                    payloads.append(None)
                    metas.append(json.dumps({"resample": "null-payload"}))
                    continue
                data = bytes(p)
                try:
                    rate, s = ac.decode_wav(data)
                except ValueError:
                    payloads.append(data)
                    metas.append(json.dumps({"resample": "undecodable"}))
                    continue
                ds = ac.decimate(s, factor)
                new_rate = max(rate // factor, 1)
                payloads.append(ac.encode_wav(ds, new_rate))
                metas.append(
                    json.dumps({"rate": new_rate, "n": int(len(ds)), "factor": factor})
                )
            out["payload"] = payloads
            if has_meta:
                out["meta"] = metas
            yield out

    return media.mapInPandas(kernel, schema=media.schema)


def incremental_phash_dedup(
    new_hashes: DataFrame,
    index_hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_hamming: int = 6,
    max_bucket_size: int | None = None,
    cache_index: bool = True,
) -> DataFrame:
    """Ingest-time perceptual dedup: rows of a NEW media batch with no
    near-duplicate (Hamming <= max_hamming) in an existing corpus's hash
    index — the media twin of ``dedup.incremental_minhash_dedup``. Works
    over any of the 64-bit perceptual hashes (image ``dhash``, audio
    ``afp``, video ``vfp``), so one persisted index per modality serves
    daily ingest.

    Shape: band the batch and the index, equi-join batch-bands x
    index-bands (never batch x corpus — cost ∝ |batch| + candidates),
    Hamming-verify candidates (lossless for max_hamming < 8), and one
    anti-join removes batch ids with any index match. Persist the index's
    band table bucketed on (band, bv) at scale and the daily join is
    exchange-free on the corpus side. Within-batch dups are a separate
    ``image_near_dups`` pass over the (small) surviving batch."""
    from olake_spark.operators.dedup import cap_buckets

    if max_hamming >= DHASH_BANDS:
        raise ValueError("pigeonhole exactness requires max_hamming < num bands")
    if cache_index:
        # cache(), not materialize(): cache_index is the CROSS-CALL reuse
        # knob — cache() registers the caller's shared index plan in the
        # CacheManager so repeated daily-ingest batches against the same
        # index hit the computed blocks, while a per-call checkpoint would
        # re-decode the corpus every invocation. Within one call it still
        # materializes the decode→fingerprint pipeline exactly once.
        index_hashes = index_hashes.cache()
    # the batch hash relation feeds the band join AND the final anti-join;
    # materialize it once so the batch's decode pipeline (mapInPandas
    # kernels) does not run twice (guide §4 — r11 audit: 20 Python-eval
    # nodes in media_incremental_dedup's plan for 2 real decode passes)
    new_hashes = new_hashes.transform(materialize)
    width = DHASH_BITS // DHASH_BANDS

    def bands(df: DataFrame) -> DataFrame:
        arr = F.array(
            *[
                F.struct(
                    F.lit(j).alias("band"),
                    F.shiftrightunsigned(F.col(hash_col), j * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("bv"),
                )
                for j in range(DHASH_BANDS)
            ]
        )
        out = (
            df.filter(F.col(hash_col).isNotNull())
            .select(id_col, hash_col, F.explode(arr).alias("b"))
            .select(
                id_col, hash_col,
                F.col("b.band").alias("band"), F.col("b.bv").alias("bv"),
            )
        )
        return cap_buckets(out, ["band", "bv"], max_bucket_size)

    bt_new, bt_idx = bands(new_hashes).alias("n"), bands(index_hashes).alias("i")
    ham = F.bit_count(F.col(f"n.{hash_col}").bitwiseXOR(F.col(f"i.{hash_col}")))
    dup_ids = (
        bt_new.join(
            bt_idx,
            (F.col("n.band") == F.col("i.band")) & (F.col("n.bv") == F.col("i.bv")),
        )
        .filter(ham <= max_hamming)
        .select(F.col(f"n.{id_col}").alias(id_col))
        .distinct()
    )
    return new_hashes.join(dup_ids, id_col, "left_anti")


AUDIO_FP_WINDOWS = 65  # 65 energy windows -> 64 comparison bits


def audio_fingerprint_of(samples: np.ndarray) -> int:
    """64-bit audio energy fingerprint: bucket samples into 65 windows by
    w(i) = (i*65)//n, sum |sample| per window (exact int), bit w =
    energy[w+1] > energy[w]. Amplitude-scale invariant (c*|s| preserves
    every comparison) — the audio twin of the image dHash. Signed 64-bit
    wrap so Spark longs and BIGINT oracles agree bit-for-bit."""
    n = len(samples)
    if n < AUDIO_FP_WINDOWS:
        raise ValueError(f"audio fingerprint needs >= {AUDIO_FP_WINDOWS} samples")
    a = np.abs(samples.astype(np.int64))
    idx = (np.arange(n, dtype=np.int64) * AUDIO_FP_WINDOWS) // n
    e = np.bincount(idx, weights=a, minlength=AUDIO_FP_WINDOWS).astype(np.int64)
    h = 0
    for w in range(AUDIO_FP_WINDOWS - 1):
        if e[w + 1] > e[w]:
            h |= 1 << w
    return h - (1 << 64) if h >= (1 << 63) else h


def audio_fingerprint(media: DataFrame) -> DataFrame:
    """Perceptual audio hash through the Arrow batch path: decode the WAV
    payload and compute its 64-bit energy fingerprint (``afp``). Pairs
    within a small Hamming distance are near-duplicate clips — feed the
    result to ``image_near_dups(hash_col="afp")`` for the lossless
    banded join. Undecodable / too-short payloads surface NULL."""
    from olake_spark.functions import audiocodec as ac

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("afp", T.LongType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                if p is None:
                    rows.append((mid, None))
                    continue
                try:
                    _rate, s = ac.decode_wav(bytes(p))
                    rows.append((mid, audio_fingerprint_of(s)))
                except ValueError:
                    rows.append((mid, None))
            yield _exact_frame(rows, ["media_id", "afp"])

    return media.mapInPandas(kernel, schema)


def amplify_audio(media: DataFrame, factor: int) -> DataFrame:
    """Integer amplitude scaling through the batch path (decode, multiply,
    re-encode) — clipping-free inputs stay sample-exact. Schema derives
    from the input; undecodable payloads pass through with a marker."""
    from olake_spark.functions import audiocodec as ac

    has_meta = "meta" in {f.name for f in media.schema.fields}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads, metas = [], []
            for p in pdf["payload"]:
                if p is None:
                    payloads.append(None)
                    metas.append(json.dumps({"amplify": "null-payload"}))
                    continue
                data = bytes(p)
                try:
                    rate, s = ac.decode_wav(data)
                except ValueError:
                    payloads.append(data)
                    metas.append(json.dumps({"amplify": "undecodable"}))
                    continue
                scaled = np.clip(
                    s.astype(np.int64) * factor, -32768, 32767
                ).astype(np.int16)
                payloads.append(ac.encode_wav(scaled, rate))
                metas.append(json.dumps({"amplify": factor}))
            out["payload"] = payloads
            if has_meta:
                out["meta"] = metas
            yield out

    return media.mapInPandas(kernel, schema=media.schema)


# ---------------------------------------------------------------------------
# video: APNG — the public animated container a stdlib can decode
# ---------------------------------------------------------------------------

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.IntegerType(), True),  # NULL if undecodable
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("pix_checksum", T.LongType(), True),
    ]
)


def synth_video_params(media_id: int) -> tuple[int, int, int]:
    """(n_frames, w, h): 2-5 frames, small deterministic dims."""
    i = int(media_id)
    return 2 + i % 4, 8 + (i * 5) % 17, 8 + (i * 3) % 13


def synth_frame_seed(media_id: int, t: int) -> int:
    """Frame t's pixels reuse the image closed form under this seed."""
    return int(media_id) * 131 + 7 * t


def synthesize_videos(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """One deterministic APNG clip per id (REAL animated-PNG encode, one
    independent zlib stream per frame) — the video member of the
    synthesize_* fixture family."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid in pdf[id_col].astype("int64"):
                mid = int(mid)
                nf, w, h = synth_video_params(mid)
                frames = [
                    synth_pixels(synth_frame_seed(mid, t), w, h)
                    for t in range(nf)
                ]
                payload = ic.encode_apng(frames)
                out.append(
                    (mid, payload, "video",
                     json.dumps({"n_frames": nf, "w": w, "h": h, "fmt": "apng"}))
                )
            yield pd.DataFrame(out, columns=["media_id", "payload", "media_type", "meta"])

    return ids.mapInPandas(kernel, MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual image dedup: dHash + Hamming band join
# ---------------------------------------------------------------------------

DHASH_BITS = 64
DHASH_BANDS = 8  # 8 bands x 8 bits: pigeonhole-lossless for hamming < 8


def dhash_of(arr: np.ndarray) -> int:
    """64-bit difference hash (public dHash algorithm): integer luma
    gray = (299R + 587G + 114B)//1000, exact NN resample to a 9x8 grid,
    bit(y,x) = gray(x+1,y) > gray(x,y), position y*8+x. Returned as a
    SIGNED 64-bit value (two's complement wrap) so Spark longs and the
    SQL oracle's BIGINT agree bit-for-bit."""
    a = arr.astype(np.int64)
    g = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
    h_, w_ = g.shape
    xs = (np.arange(9, dtype=np.int64) * w_) // 9
    ys = (np.arange(8, dtype=np.int64) * h_) // 8
    sg = g[np.ix_(ys, xs)]
    bits = sg[:, 1:] > sg[:, :-1]
    h = 0
    for pos, b in enumerate(bits.reshape(-1)):  # row-major: pos = y*8 + x
        if b:
            h |= 1 << pos
    return h - (1 << 64) if h >= (1 << 63) else h


DHASH_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("dhash", T.LongType(), True),  # NULL if undecodable
    ]
)


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual hash per image through the Arrow batch path: decode the
    payload (real BMP/PNG codec) and compute its 64-bit dHash. dHash is
    scale- and brightness-shift-invariant by construction (it compares
    neighboring resampled luma cells), which is what makes it the standard
    near-dup key for image corpora. Undecodable payloads surface a NULL
    hash — poison never fabricates a bucket."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                if p is None:
                    rows.append((mid, None))
                    continue
                try:
                    arr = ic.decode_image(bytes(p))
                except ValueError:
                    rows.append((mid, None))
                    continue
                rows.append((mid, dhash_of(arr)))
            yield _exact_frame(rows, ["media_id", "dhash"])

    return media.mapInPandas(kernel, DHASH_SCHEMA)


def image_near_dups(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "dhash",
    max_hamming: int = 6,
    max_bucket_size: int | None = None,
    keep_hashes: bool = False,
) -> DataFrame:
    """Image pairs with hamming(dhash) <= max_hamming via the pigeonhole
    band join (8 byte-bands over 64 bits): any pair within hamming < 8
    shares at least one exact band, so the candidate generator is
    LOSSLESS for max_hamming <= 7 — recall 1.0 with no all-pairs scan.
    Corpus shuffles once on (band, value); ``max_bucket_size`` bounds
    mega-buckets at corpus scale (same contract as the text SimHash/LSH
    family). Returns (id_a, id_b, hamming) with id_a < id_b;
    ``keep_hashes=True`` adds (h_a, h_b) so callers that need the
    fingerprints don't recompute the hash pipeline with a re-join."""
    from olake_spark.operators.dedup import cap_buckets

    if max_hamming >= DHASH_BANDS:
        raise ValueError("pigeonhole exactness requires max_hamming < num bands")
    width = DHASH_BITS // DHASH_BANDS
    sh = hashes.filter(F.col(hash_col).isNotNull())
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.shiftrightunsigned(F.col(hash_col), j * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("bv"),
            )
            for j in range(DHASH_BANDS)
        ]
    )
    bt = sh.select(id_col, hash_col, F.explode(bands).alias("b")).select(
        id_col, hash_col, F.col("b.band").alias("band"), F.col("b.bv").alias("bv")
    )
    bt = cap_buckets(bt, ["band", "bv"], max_bucket_size)
    # materialize the band table ONCE before the self-join: bt's lineage
    # holds the full decode->fingerprint pipeline (mapInPandas kernels), and
    # an unmaterialized self-join re-executes that pipeline on BOTH sides
    # (the r11 plan audit counted 16 Python-eval nodes / 8 scans per media
    # dedup query for what is one decode pass). The checkpointed relation is
    # tiny — (id, hash64, band, bv) x 8 bands per item — while the payload
    # decode it replaces is the dominant cost (guide §4: cross the Python
    # boundary once; §2.1: never recompute an expensive subtree twice).
    bt = bt.transform(materialize)
    a, b = bt.alias("a"), bt.alias("b")
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col(f"a.{hash_col}").alias("h_a"),
            F.col(f"b.{hash_col}").alias("h_b"),
        )
        .distinct()
        .select(
            "id_a",
            "id_b",
            *(["h_a", "h_b"] if keep_hashes else []),
            ham.cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def resize_videos(media: DataFrame, width: int, height: int) -> DataFrame:
    """REAL per-frame video resize through the batch path: decode every
    APNG frame, nearest-neighbor resize, re-encode the clip. Schema
    derives from the input; undecodable payloads pass through with a
    marker — same contracts as ``resize_images``/``resample_audio``."""
    has_meta = "meta" in {f.name for f in media.schema.fields}

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            payloads, metas = [], []
            for p in pdf["payload"]:
                if p is None:
                    payloads.append(None)
                    metas.append(json.dumps({"resize": "null-payload"}))
                    continue
                data = bytes(p)
                try:
                    frames = ic.decode_apng(data)
                except ValueError:
                    payloads.append(data)
                    metas.append(json.dumps({"resize": "undecodable"}))
                    continue
                res = [ic.resize_nearest(f, width, height) for f in frames]
                payloads.append(ic.encode_apng(res))
                metas.append(
                    json.dumps(
                        {"w": int(width), "h": int(height), "n_frames": len(res)}
                    )
                )
            out["payload"] = payloads
            if has_meta:
                out["meta"] = metas
            yield out

    return media.mapInPandas(kernel, schema=media.schema)


def video_fingerprint(media: DataFrame) -> DataFrame:
    """Perceptual video hash: the dHash of the clip's MIDDLE frame
    (index n_frames//2 — the standard representative-keyframe choice).
    Only that frame's compressed stream is inflated
    (``parse_apng_streams``), so the kernel cost per clip is one frame's
    DEFLATE+unfilter regardless of clip length. Scale-invariant like the
    image dHash; pairs feed ``image_near_dups(hash_col="vfp")``.
    Undecodable payloads surface NULL."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("n_frames", T.IntegerType(), True),
            T.StructField("vfp", T.LongType(), True),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                if p is None:
                    rows.append((mid, None, None))
                    continue
                try:
                    parsed = ic.parse_apng_streams(bytes(p))
                    if parsed is None:  # plain PNG = 1-frame clip
                        rows.append((mid, 1, dhash_of(ic.decode_image(bytes(p)))))
                        continue
                    w, h, ctype, streams = parsed
                    mid_frame = ic.decode_frame_stream(
                        streams[len(streams) // 2], w, h, ctype
                    )
                    rows.append((mid, len(streams), dhash_of(mid_frame)))
                except ValueError:
                    rows.append((mid, None, None))
            yield _exact_frame(rows, ["media_id", "n_frames", "vfp"])

    return media.mapInPandas(kernel, schema)


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling: decode the APNG payload and emit one row per
    every ``every_n``-th frame with its true dimensions and pixel
    checksum — the 1-video-row → N-frame-rows explode shape, with actual
    decoded pixels behind it. A plain PNG is a 1-frame clip and samples
    normally (a real row with n_frames=1). An undecodable payload yields
    one surfaced row with NULL frame fields — never a vanished media_id.
    Compressed video containers (mp4/H.264 …) need codecs this
    environment doesn't ship and surface as NULL rows.

    Only the SAMPLED frames are inflated: ``parse_apng_streams`` splits
    the container into per-frame compressed streams without decompressing,
    so for every_n=N roughly (N-1)/N of the DEFLATE+unfilter work is
    skipped in this hot kernel."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                mid = int(mid)
                if p is None:
                    rows.append((mid, None, None, None, None, None))
                    continue
                step = max(int(every_n), 1)
                try:
                    parsed = ic.parse_apng_streams(bytes(p))
                    if parsed is None:  # plain PNG = 1-frame clip
                        wanted = [(0, ic.decode_image(bytes(p)))]
                        nf = 1
                    else:
                        w, h, ctype, streams = parsed
                        nf = len(streams)
                        wanted = [
                            (t, ic.decode_frame_stream(streams[t], w, h, ctype))
                            for t in range(0, nf, step)
                        ]
                except ValueError:
                    rows.append((mid, None, None, None, None, None))
                    continue
                for t, f in wanted:
                    rows.append(
                        (mid, nf, t, f.shape[1], f.shape[0],
                         ic.pixel_checksum(f))
                    )
            yield _exact_frame(rows, [f.name for f in FRAME_SCHEMA.fields])

    return media.mapInPandas(kernel, FRAME_SCHEMA)
