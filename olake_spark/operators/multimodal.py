"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design for image/audio/video at 100 TB: media lives as an opaque ``binary``
column (or an object-store URI column) beside typed metadata; all decode /
feature-extract / resize / frame-sample work runs as **Arrow-batched
``mapInPandas``** stages so bytes never round-trip per row through Python
serde, and the pipeline partitions by input splits (no shuffle) unless the
caller groups (e.g. frames → video).

The actual codecs (PIL/ffmpeg/librosa) are not in this container, so the
decode kernels are stubbed: ``decode_stub=True`` computes deterministic
features from the raw bytes (length, md5, a fake "dimension" from the hash)
— the Spark-side plumbing (schemas, batch iteration, binary Arrow transfer,
UDF signatures) is real and tested; swapping in a real codec changes only
the inner pandas function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_binary_payload",
    "extract_features",
    "resize_images",
    "sample_frames",
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
        T.StructField("fake_width", T.IntegerType(), True),
        T.StructField("fake_height", T.IntegerType(), True),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Build a media-shaped table from a text column (testdata has no real
    media; UTF-8 bytes stand in for an opaque payload)."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image").alias("media_type"),
        F.to_json(F.struct(F.length(F.col(text_col)).alias("n_chars"))).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """Deterministic stand-in for a codec: md5 + pseudo-dimensions."""
    h = hashlib.md5(payload).hexdigest()
    return h, int(h[:4], 16) % 1920 + 1, int(h[4:8], 16) % 1080 + 1


def extract_features(media: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the binary payload column."""
    if not decode_stub:
        raise NotImplementedError(
            "real codecs (PIL/ffmpeg) unavailable in this environment; "
            "pass decode_stub=True or plug a codec into the pandas kernel"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(lambda b: _fake_decode(bytes(b)))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pdf["payload"].map(lambda b: len(bytes(b))).astype("int64"),
                    "content_hash": feats.map(lambda f: f[0]),
                    "fake_width": feats.map(lambda f: f[1]).astype("int32"),
                    "fake_height": feats.map(lambda f: f[2]).astype("int32"),
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize through the REAL batch path: an Arrow-batched ``mapInPandas``
    kernel receives (media_id, payload, media_type, meta) record batches
    and returns the same schema — exactly where a PIL/cv2
    decode→resize→re-encode goes. The stub kernel passes payload bytes
    through untouched and stamps the target size into meta, so schema,
    binary Arrow transfer, and batch iteration are exercised end-to-end;
    swapping in a real codec changes only the two marked lines."""
    import json as _json

    meta_json = _json.dumps({"target_w": int(width), "target_h": int(height)})

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            # real codec: out["payload"] = [reencode(resize(decode(b))) ...]
            out["payload"] = out["payload"]  # stub: bytes pass through
            out["meta"] = meta_json
            yield out

    return media.mapInPandas(kernel, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Stub frame sampler: one deterministic 'frame' row per payload chunk of
    ``every_n`` KiB — the explode shape (1 video row → N frame rows) that a
    real ffmpeg kernel produces."""
    n_frames = F.greatest(
        (F.length("payload") / F.lit(every_n * 1024)).cast("int"), F.lit(1)
    )
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
        F.md5(F.concat(F.col("payload").cast("string"), F.lit("|frame"))).alias("frame_hash"),
    )
