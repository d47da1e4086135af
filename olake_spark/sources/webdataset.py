"""WebDataset-style tar-shard ingest for multimodal training corpora.

WebDataset (public format: github.com/webdataset/webdataset) stores
training samples as members of plain POSIX tar shards — all files sharing
a basename ("key") form one sample ({key}.txt, {key}.cls, {key}.jpg …),
and samples are CONTIGUOUS within a shard. At 100 TB the shard is the unit
of parallelism: Spark lists/reads shards as opaque binary payloads (one
task per shard, `spark.read.format("binaryFile")` or any blob source), and
everything inside a shard — the tar walk, member decode, and sample
grouping — happens in one Arrow-batched ``mapInPandas`` kernel with ZERO
shuffle, because the format guarantees a sample never spans shards.

The tar walk is the real thing (stdlib ``tarfile`` over the in-memory
payload); corrupt shards surface as NULL member rows, never a dead stage.

Reference parity: the reference engine ingests rows from databases and
object-store files (`/root/reference/drivers/s3` reads CSV/JSON/parquet);
tar-shard sample ingest is part of the builder brief's multimodal
training-pipeline surface, beyond reference scope.
"""

from __future__ import annotations

import hashlib
import io
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "SHARD_SCHEMA",
    "MEMBER_SCHEMA",
    "SAMPLE_SCHEMA",
    "MEDIA_MEMBER_SCHEMA",
    "synthesize_tar_shards",
    "synthesize_media_tar_shards",
    "untar_members",
    "untar_media",
    "group_samples",
    "synth_member_text",
    "WRITE_SHARD_SCHEMA",
    "wds_write_plan",
    "wds_build_shards",
]

SHARD_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_members", T.IntegerType(), True),
    ]
)

MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("member_name", T.StringType(), True),  # NULL = corrupt shard
        T.StructField("size", T.LongType(), True),
        T.StructField("content_md5", T.StringType(), True),
    ]
)

SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("txt_md5", T.StringType(), True),
        T.StructField("txt_size", T.LongType(), True),
        T.StructField("cls", T.LongType(), True),
    ]
)


def synth_member_text(doc_id: int) -> str:
    """Closed-form member payload the SQL oracle reproduces with
    ``'doc-' || id || ':' || repeat('ab', id % 17)``."""
    return f"doc-{int(doc_id)}:" + "ab" * (int(doc_id) % 17)


def _tar_bytes(doc_ids: list[int]) -> bytes:
    """Deterministic USTAR shard: per doc a ``{id:08d}.txt`` (closed-form
    text) and ``{id:08d}.cls`` (label = id % 10 as decimal bytes), keys
    contiguous per the WebDataset contract; mtime/uid/gid zeroed so the
    bytes are a pure function of the ids."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for did in doc_ids:
            for ext, body in (
                ("txt", synth_member_text(did).encode()),
                ("cls", str(int(did) % 10).encode()),
            ):
                info = tarfile.TarInfo(name=f"{int(did):08d}.{ext}")
                info.size = len(body)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(body))
    return buf.getvalue()


def synthesize_tar_shards(
    ids: DataFrame, id_col: str = "doc_id", docs_per_shard: int = 8
) -> DataFrame:
    """One real tar shard per ``id // docs_per_shard`` group, built
    distributedly: ids shuffle once on the shard key (the only exchange
    in the whole family), then each kernel writes its shards in memory.
    This is the fixture generator — real ingestion starts at
    ``untar_members`` over payloads read from any blob source."""
    grouped = (
        ids.select(
            # integral DIV, not float-divide-then-cast: exact for every id,
            # and floor (not truncate-toward-zero) semantics match id // n
            F.expr(f"CAST({id_col} AS BIGINT) DIV {int(docs_per_shard)}").alias(
                "shard_id"
            ),
            F.col(id_col).cast("long").alias("_id"),
        )
        .groupBy("shard_id")
        .agg(F.sort_array(F.collect_list("_id")).alias("_ids"))
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, dids in zip(pdf["shard_id"], pdf["_ids"]):
                dids = [int(d) for d in dids]
                rows.append((int(sid), _tar_bytes(dids), 2 * len(dids)))
            yield pd.DataFrame(
                rows, columns=["shard_id", "payload", "n_members"], dtype=object
            )

    return grouped.mapInPandas(kernel, SHARD_SCHEMA)


# media tar fixtures: copy ids ≥ this base are NN-resized re-encodes of
# their (id − base) original — the planted near-duplicates the perceptual
# dedup stage of the media curation pipeline must find and drop
MEDIA_COPY_BASE = 100_000_000

MEDIA_MEMBER_SCHEMA = T.StructType(
    [
        T.StructField("shard_id", T.LongType(), False),
        T.StructField("media_id", T.LongType(), True),  # NULL = corrupt shard
        T.StructField("payload", T.BinaryType(), True),
    ]
)


def synthesize_media_tar_shards(
    ids: DataFrame, id_col: str = "media_id", docs_per_shard: int = 8
) -> DataFrame:
    """Real image-bearing tar shards: one ``{id:08d}.bmp`` member per id,
    encoded with the real codec from the shared pixel closed form
    (operators/multimodal.py synth_pixels). Ids at or above
    ``MEDIA_COPY_BASE`` pack the 32×24 NN-resized re-encode of their base
    image — planted rescaled near-duplicates whose bytes are still a pure
    function of the member id, so the SQL oracle reproduces everything
    downstream from closed forms. Same one-shuffle shape as
    ``synthesize_tar_shards``."""
    from olake_spark.functions import imagecodec as ic
    from olake_spark.operators.multimodal import synth_dims, synth_pixels

    def _member_bytes(mid: int) -> bytes:
        if mid >= MEDIA_COPY_BASE:
            base = mid - MEDIA_COPY_BASE
            w, h = synth_dims(base)
            arr = synth_pixels(base, w, h)
            import numpy as np

            ys = (np.arange(24, dtype=np.int64) * h) // 24
            xs = (np.arange(32, dtype=np.int64) * w) // 32
            arr = arr[np.ix_(ys, xs)]
        else:
            w, h = synth_dims(mid)
            arr = synth_pixels(mid, w, h)
        return ic.encode_bmp(arr)

    grouped = (
        ids.select(
            F.expr(f"CAST({id_col} AS BIGINT) DIV {int(docs_per_shard)}").alias(
                "shard_id"
            ),
            F.col(id_col).cast("long").alias("_id"),
        )
        .groupBy("shard_id")
        .agg(F.sort_array(F.collect_list("_id")).alias("_ids"))
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, mids in zip(pdf["shard_id"], pdf["_ids"]):
                buf = io.BytesIO()
                with tarfile.open(
                    fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT
                ) as tf:
                    for mid in (int(m) for m in mids):
                        body = _member_bytes(mid)
                        info = tarfile.TarInfo(name=f"{mid:08d}.bmp")
                        info.size = len(body)
                        info.mtime = 0
                        tf.addfile(info, io.BytesIO(body))
                rows.append((int(sid), buf.getvalue(), len(mids)))
            yield pd.DataFrame(
                rows, columns=["shard_id", "payload", "n_members"], dtype=object
            )

    return grouped.mapInPandas(kernel, SHARD_SCHEMA)


def untar_media(shards: DataFrame) -> DataFrame:
    """Tar walk that KEEPS member bodies for image members (.bmp/.png):
    one row per media member, key parsed back to the numeric media id —
    the ingest half of the media curation pipeline. Non-media members are
    skipped; a corrupt shard surfaces exactly one NULL row (the same
    poison contract as ``untar_members``). No shuffle — members stay in
    their shard's partition and feed the decode kernels directly."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, p in zip(pdf["shard_id"], pdf["payload"]):
                sid = int(sid)
                if p is None:
                    rows.append((sid, None, None))
                    continue
                shard_rows = []
                try:
                    for name, body in _walk(bytes(p)):
                        key, _, ext = name.rpartition(".")
                        if ext not in ("bmp", "png"):
                            continue
                        try:
                            mid = int(key)
                        except ValueError:
                            mid = None  # malformed key: loud NULL id, body kept
                        shard_rows.append((sid, mid, body))
                except (tarfile.TarError, OSError, EOFError):
                    shard_rows = [(sid, None, None)]
                rows.extend(shard_rows)
            yield pd.DataFrame(
                rows,
                columns=[f.name for f in MEDIA_MEMBER_SCHEMA.fields],
                dtype=object,
            )

    return shards.mapInPandas(kernel, MEDIA_MEMBER_SCHEMA)


def _walk(payload: bytes):
    """Yield (name, body) for every regular member of a tar payload."""
    with tarfile.open(fileobj=io.BytesIO(payload), mode="r:") as tf:
        for info in tf:
            if info.isreg():
                fh = tf.extractfile(info)
                yield info.name, (fh.read() if fh else b"")


def untar_members(shards: DataFrame) -> DataFrame:
    """REAL tar walk per shard (stdlib ``tarfile`` over the in-memory
    payload): one output row per regular member with its name, size, and
    content md5. Corrupt/NULL payloads surface one NULL member row per
    shard — the poison contract every kernel in this repo honors. No
    shuffle: members stay in their shard's partition."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, p in zip(pdf["shard_id"], pdf["payload"]):
                sid = int(sid)
                if p is None:
                    rows.append((sid, None, None, None))
                    continue
                shard_rows = []
                try:
                    for name, body in _walk(bytes(p)):
                        shard_rows.append(
                            (sid, name, len(body), hashlib.md5(body).hexdigest())
                        )
                except (tarfile.TarError, OSError, EOFError):
                    # a mid-walk failure poisons the WHOLE shard: partial
                    # members are discarded so the contract stays exactly
                    # one NULL row per corrupt shard (same as group_samples)
                    shard_rows = [(sid, None, None, None)]
                rows.extend(shard_rows)
            yield pd.DataFrame(rows, columns=[f.name for f in MEMBER_SCHEMA.fields],
                               dtype=object)

    return shards.mapInPandas(kernel, MEMBER_SCHEMA)


def group_samples(shards: DataFrame) -> DataFrame:
    """WebDataset sample grouping done WHERE THE FORMAT PUTS IT — inside
    the shard kernel: members sharing a basename key pair into one sample
    row ({key}.txt -> text md5/size, {key}.cls -> integer label) with no
    shuffle, because samples are contiguous within a shard by contract.
    Unknown extensions are ignored (they create no sample). Granularity
    of failure: a malformed MEMBER (e.g. a non-integer .cls body) NULLs
    only that field of its own sample; a shard whose tar walk itself
    fails surfaces exactly one all-NULL row with partial samples
    discarded."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for sid, p in zip(pdf["shard_id"], pdf["payload"]):
                sid = int(sid)
                if p is None:
                    rows.append((sid, None, None, None, None))
                    continue
                shard_rows = []
                try:
                    samples: dict[str, dict] = {}
                    for name, body in _walk(bytes(p)):
                        key, _, ext = name.rpartition(".")
                        if ext == "txt":
                            s = samples.setdefault(key, {})
                            s["txt_md5"] = hashlib.md5(body).hexdigest()
                            s["txt_size"] = len(body)
                        elif ext == "cls":
                            s = samples.setdefault(key, {})
                            try:
                                s["cls"] = int(body.decode())
                            except (ValueError, UnicodeDecodeError):
                                s["cls"] = None  # malformed label, loud NULL
                    for key, s in samples.items():
                        shard_rows.append(
                            (sid, key, s.get("txt_md5"), s.get("txt_size"),
                             s.get("cls"))
                        )
                except (tarfile.TarError, OSError, EOFError):
                    shard_rows = [(sid, None, None, None, None)]
                rows.extend(shard_rows)
            yield pd.DataFrame(rows, columns=[f.name for f in SAMPLE_SCHEMA.fields],
                               dtype=object)

    return shards.mapInPandas(kernel, SAMPLE_SCHEMA)


# ---------------------------------------------------------------------------
# Write side: deterministic shard assignment + real tar shard building
# ---------------------------------------------------------------------------

WRITE_SHARD_SCHEMA = T.StructType(
    [
        T.StructField("stream", T.IntegerType(), False),
        T.StructField("shard_seq", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("n_members", T.IntegerType(), True),
    ]
)


def wds_write_plan(
    df: DataFrame,
    key_col: str,
    size_col: str,
    shard_bytes: int,
    n_streams: int = 4,
    seed: str = "wds",
) -> DataFrame:
    """Deterministic WebDataset shard assignment — the WRITE planner.

    Samples hash into ``n_streams`` writer streams, are laid head-to-tail
    per stream in (hash, key) order, and a new shard starts every
    ``shard_bytes`` of payload: shard = exclusive-prefix-sum //
    shard_bytes — a sample is never split, so shards may overrun by at
    most one sample (the WebDataset convention). Fully SQL-expressible,
    so the oracle pins every (stream, shard_seq, offset_bytes).

    The prefix sum is computed DISTRIBUTED (the ``length_buckets`` idiom)
    — a bare per-stream window would serialize each stream and cap
    parallelism at ``n_streams``: range-repartition on the
    (stream, hash, key) total order, exclusive-sum locally inside each
    physical partition, then add per-(stream, partition) totals
    prefix-summed over a partition-count-sized frame and broadcast back.
    The result is independent of where the range boundaries fall because
    (stream, hash, key) is a total order; parallelism =
    ``spark.sql.shuffle.partitions``, not ``n_streams``. Keys must be
    unique and non-null (they are the order tiebreak and join identity).

    Adds: ``stream``, ``shard_seq``, ``offset_bytes``, and ``_wds_h``
    (the intra-stream order key ``wds_build_shards`` sorts by)."""
    if shard_bytes <= 0:
        raise ValueError(f"shard_bytes must be positive, got {shard_bytes}")
    from olake_spark.operators.sampling import hash_bucket
    from pyspark.sql import Window as W

    h = hash_bucket(F.col(key_col), seed)
    out = df.withColumn("_wds_h", h).withColumn(
        "stream", F.pmod(F.col("_wds_h"), F.lit(n_streams)).cast("int")
    )
    part = out.repartitionByRange(
        F.col("stream").asc(), F.col("_wds_h").asc(), F.col(key_col).asc()
    ).withColumn("_pid", F.spark_partition_id())
    sizes = part.groupBy("stream", "_pid").agg(
        F.sum(F.col(size_col)).cast("long").alias("_psz")
    )
    # windows over `sizes` touch one row per PARTITION — driver-tiny
    w_prev = (
        W.partitionBy("stream").orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    )
    offs = sizes.select(
        "stream",
        "_pid",
        F.coalesce(F.sum("_psz").over(w_prev), F.lit(0)).cast("long").alias("_off"),
    )
    w_local = (
        W.partitionBy("stream", "_pid")
        .orderBy(F.col("_wds_h"), F.col(key_col))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(F.col(size_col)).over(w_local), F.lit(0)).cast("long")
    return (
        part.withColumn("_lcum", local)
        .join(F.broadcast(offs), ["stream", "_pid"])
        .withColumn("_wds_cum", F.col("_lcum") + F.col("_off"))
        .withColumn("shard_seq", F.expr(f"_wds_cum div {int(shard_bytes)}"))
        .withColumn("offset_bytes", F.col("_wds_cum") % shard_bytes)
        .drop("_wds_cum", "_lcum", "_pid")
    )


def wds_build_shards(
    plan: DataFrame, key_col: str, payload_col: str
) -> DataFrame:
    """Materialize REAL tar shard bytes from a ``wds_write_plan`` frame:
    one USTAR archive per (stream, shard_seq), members named
    ``{key}.txt`` in the plan's (hash, key) order, mtime/uid/gid zeroed
    so shard bytes are a pure function of the content. One shuffle on the
    shard identity; each shard builds inside its own Arrow batch.
    Round-trips through ``untar_members``/``group_samples``."""

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_wds_h", key_col])
        buf = io.BytesIO()
        with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
            for key, body in zip(pdf[key_col], pdf[payload_col]):
                body = bytes(body) if body is not None else b""
                info = tarfile.TarInfo(name=f"{key}.txt")
                info.size = len(body)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(body))
        return pd.DataFrame(
            [
                (
                    int(pdf["stream"].iloc[0]),
                    int(pdf["shard_seq"].iloc[0]),
                    buf.getvalue(),
                    len(pdf),
                )
            ],
            columns=["stream", "shard_seq", "payload", "n_members"],
            dtype=object,
        )

    return plan.groupBy("stream", "shard_seq").applyInPandas(
        build, WRITE_SHARD_SCHEMA
    )
