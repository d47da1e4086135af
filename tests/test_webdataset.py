"""WebDataset tar-shard ingest: real tarfile walk, sample grouping,
poison contracts."""

from __future__ import annotations

import hashlib
import io
import tarfile

from pyspark.sql import functions as F

from olake_spark.sources.webdataset import (
    group_samples,
    synth_member_text,
    synthesize_tar_shards,
    untar_members,
)
from olake_spark.sources import webdataset as wds


def test_tar_shards_roundtrip(spark):
    ids = spark.range(0, 20).withColumnRenamed("id", "doc_id")
    shards = synthesize_tar_shards(ids, docs_per_shard=8)
    rows = shards.collect()
    assert {r.shard_id for r in rows} == {0, 1, 2}
    # payload is a REAL tar: stdlib reads it back member-for-member
    by_id = {r.shard_id: r for r in rows}
    with tarfile.open(fileobj=io.BytesIO(bytes(by_id[0].payload)), mode="r:") as tf:
        names = [i.name for i in tf if i.isreg()]
    assert names[0] == "00000000.txt" and names[1] == "00000000.cls"
    assert len(names) == by_id[0].n_members == 16

    members = untar_members(shards).collect()
    assert len(members) == 40  # 20 docs x 2 members
    m = {r.member_name: r for r in members}
    body = synth_member_text(7).encode()
    assert m["00000007.txt"].size == len(body)
    assert m["00000007.txt"].content_md5 == hashlib.md5(body).hexdigest()


def test_sample_grouping_and_poison(spark):
    ids = spark.range(0, 16).withColumnRenamed("id", "doc_id")
    samples = group_samples(synthesize_tar_shards(ids, docs_per_shard=8))
    got = {r.key: r for r in samples.collect()}
    assert len(got) == 16
    r = got["00000005"]
    assert (r.cls, r.txt_size) == (5, len(synth_member_text(5)))
    # corrupt payload: one NULL row per shard, never a dead stage
    bad = spark.createDataFrame(
        [(9, b"not a tar at all" * 10, 0), (10, None, 0)],
        "shard_id long, payload binary, n_members int",
    )
    out = group_samples(bad).collect()
    assert {r.shard_id for r in out} == {9, 10}
    assert all(r.key is None for r in out)
    assert all(r.member_name is None for r in untar_members(bad).collect())


def test_member_level_failure_granularity(spark):
    """Failure granularity contracts (regression): a malformed .cls body
    NULLs only that sample's label; unknown extensions create no phantom
    samples; a truncated tar discards partial members and surfaces
    exactly one NULL row in BOTH kernels."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for name, body in [
            ("00000001.txt", b"hello"),
            ("00000001.cls", b"not-an-int"),
            ("00000002.txt", b"world"),
            ("00000002.cls", b"7"),
            ("metadata.json", b"{}"),  # unknown ext: must be ignored
        ]:
            info = tarfile.TarInfo(name=name)
            info.size = len(body)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(body))
    shards = spark.createDataFrame(
        [(0, buf.getvalue(), 5)], "shard_id long, payload binary, n_members int"
    )
    got = {r.key: r for r in group_samples(shards).collect()}
    assert set(got) == {"00000001", "00000002"}  # no 'metadata' phantom
    assert got["00000001"].cls is None and got["00000001"].txt_size == 5
    assert got["00000002"].cls == 7

    # truncated tar: member 1 complete, member 2 chopped mid-region
    # (tarfile raises ReadError; a cut at an exact block boundary is
    # indistinguishable from a short archive and reads cleanly)
    full = buf.getvalue()
    truncated = full[: 512 * 3]
    bad = spark.createDataFrame(
        [(3, truncated, 0)], "shard_id long, payload binary, n_members int"
    )
    m = untar_members(bad).collect()
    assert len(m) == 1 and m[0].member_name is None
    s = group_samples(bad).collect()
    assert len(s) == 1 and s[0].key is None


def test_write_plan_shard_byte_bound(spark):
    docs = spark.createDataFrame(
        [(i, 100 + (i % 7) * 30) for i in range(200)], "doc_id long, sz long"
    )
    plan = wds.wds_write_plan(docs, "doc_id", "sz", shard_bytes=1000, n_streams=3)
    rows = plan.collect()
    # every sample STARTS inside its shard's byte budget
    assert all(0 <= r.offset_bytes < 1000 for r in rows)
    # per (stream, shard) the non-final shards are filled past nothing:
    # offsets are the exclusive prefix sums of sizes in (h, key) order
    by_shard = {}
    for r in rows:
        by_shard.setdefault((r.stream, r.shard_seq), []).append(r)
    for grp in by_shard.values():
        grp = sorted(grp, key=lambda r: r.offset_bytes)
        run = grp[0].offset_bytes
        for r in grp:
            assert r.offset_bytes == run % 1000
            run += r.sz
    # determinism under repartition
    again = {
        (r.doc_id): (r.stream, r.shard_seq, r.offset_bytes)
        for r in wds.wds_write_plan(
            docs.repartition(11), "doc_id", "sz", 1000, 3
        ).collect()
    }
    assert {r.doc_id: (r.stream, r.shard_seq, r.offset_bytes) for r in rows} == again


def test_build_shards_roundtrip_through_ingest(spark):
    docs = spark.createDataFrame(
        [(i, f"payload body {i} " * (1 + i % 5)) for i in range(60)],
        "doc_id long, text string",
    )
    sized = docs.withColumn("payload", F.encode("text", "utf-8")).withColumn(
        "sz", F.octet_length("text").cast("long")
    )
    plan = wds.wds_write_plan(sized, "doc_id", "sz", shard_bytes=512, n_streams=2)
    shards = wds.wds_build_shards(plan, "doc_id", "payload")
    built = shards.collect()
    assert sum(r.n_members for r in built) == 60
    # re-ingest with the READ kernels: keys and content md5s must match
    readable = shards.select(
        (F.col("stream").cast("long") * 1_000_000 + F.col("shard_seq")).alias(
            "shard_id"
        ),
        "payload",
        F.col("n_members").cast("int").alias("n_members"),
    )
    samples = {r.key: r for r in wds.group_samples(readable).collect()}
    import hashlib

    for row in docs.collect():
        got = samples[str(row.doc_id)]
        assert got.txt_md5 == hashlib.md5(row.text.encode()).hexdigest()
        assert got.txt_size == len(row.text.encode())
    # shard bytes are a pure function of content (rebuild -> identical)
    again = {(r.stream, r.shard_seq): bytes(r.payload) for r in
             wds.wds_build_shards(plan, "doc_id", "payload").collect()}
    assert {(r.stream, r.shard_seq): bytes(r.payload) for r in built} == again


def test_media_tar_roundtrip_planted_copy_decodes(spark):
    """synthesize_media_tar_shards packs real BMPs (copies = 32x24 NN
    resizes of their base); untar_media hands back decodable payloads
    whose pixels match the direct synthesis path."""
    from olake_spark.functions import imagecodec as ic
    from olake_spark.operators.multimodal import synth_dims, synth_pixels
    from olake_spark.sources.webdataset import (
        MEDIA_COPY_BASE,
        synthesize_media_tar_shards,
        untar_media,
    )

    ids = spark.createDataFrame(
        [(6,), (12,), (12 + MEDIA_COPY_BASE,)], "media_id long"
    )
    out = {
        int(r.media_id): bytes(r.payload)
        for r in untar_media(synthesize_media_tar_shards(ids)).collect()
    }
    assert set(out) == {6, 12, 12 + MEDIA_COPY_BASE}
    import numpy as np

    for mid in (6, 12):
        w, h = synth_dims(mid)
        assert np.array_equal(ic.decode_image(out[mid]), synth_pixels(mid, w, h))
    w, h = synth_dims(12)
    arr = synth_pixels(12, w, h)
    ys = (np.arange(24, dtype=np.int64) * h) // 24
    xs = (np.arange(32, dtype=np.int64) * w) // 32
    assert np.array_equal(
        ic.decode_image(out[12 + MEDIA_COPY_BASE]), arr[np.ix_(ys, xs)]
    )


def test_untar_media_corrupt_shard_poisons(spark):
    from olake_spark.sources.webdataset import untar_media

    shards = spark.createDataFrame(
        [(0, bytearray(b"not a tar at all" * 40), 1)],
        "shard_id long, payload binary, n_members int",
    )
    rows = untar_media(shards).collect()
    assert len(rows) == 1
    assert rows[0].media_id is None and rows[0].payload is None


def test_write_plan_prefix_sum_is_distributed(spark):
    """The write plan's exchange must be a RANGE partitioning over the
    (stream, hash, key) total order — the two-level prefix sum replaced
    the per-stream serialized window (r5 verdict #5) — and offsets must
    equal the serial per-stream reference regardless of where the range
    boundaries fall."""
    from olake_spark.sources.webdataset import wds_write_plan

    docs = spark.range(2000).select(
        F.col("id").cast("string").alias("k"),
        (F.col("id") % 50 + 1).cast("long").alias("sz"),
    )
    plan = wds_write_plan(docs, "k", "sz", shard_bytes=256, n_streams=2)
    phys = plan._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(stream" in phys
    # the big-table window runs per (stream, physical partition), never a
    # bare per-stream window over the full data
    assert "_pid" in phys

    rows = plan.select("k", "sz", "_wds_h", "stream", "shard_seq",
                       "offset_bytes").collect()
    by_stream = {}
    for r in rows:
        by_stream.setdefault(r.stream, []).append(r)
    assert len(by_stream) == 2
    for st, rs in by_stream.items():
        rs.sort(key=lambda r: (r._wds_h, r.k))
        cum = 0
        for r in rs:
            assert (r.shard_seq, r.offset_bytes) == (cum // 256, cum % 256), r
            cum += r.sz
