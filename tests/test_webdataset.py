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
