"""Z-order clustering: key correctness and measured row-group skipping."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from olake_spark.sinks.zorder import quantize_minmax, write_zordered, zorder_key


def test_quantize_clamps_and_scales(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], ["x"])
    out = [
        r.q
        for r in df.select(quantize_minmax(F.col("x"), 0.0, 100.0, bits=8).alias("q"))
        .orderBy("q")
        .collect()
    ]
    assert out[0] == 0 and out[1] == 0  # below-range clamps with the min
    assert out[-1] == 255 and out[-2] == 255  # above-range clamps with the max
    assert out[2] == int(50.0 / 100.0 * 255)


def test_zorder_interleave_known_bits(spark):
    # x=0b11, y=0b01, 2 bits -> z bits: b0x=1,b0y=1,b1x=1,b1y=0 -> 0b0111 = 7
    df = spark.createDataFrame([(3, 1)], ["x", "y"])
    z = df.select(
        zorder_key([F.col("x"), F.col("y")], bits=2).alias("z")
    ).first()["z"]
    assert z == 0b0111


def test_zorder_locality_beats_single_sort(spark):
    # neighbors on the z-curve are close in BOTH dims; a lexicographic key
    # (x<<bits)|y puts (0,255) right before (1,0) — far apart in y
    df = spark.createDataFrame([(x, y) for x in range(16) for y in range(16)], ["x", "y"])
    rows = (
        df.select("x", "y", zorder_key([F.col("x"), F.col("y")], bits=4).alias("z"))
        .orderBy("z")
        .collect()
    )
    jumps = [
        abs(a.x - b.x) + abs(a.y - b.y) for a, b in zip(rows, rows[1:])
    ]
    assert max(jumps) <= 16  # z-curve max neighbor jump stays local
    assert sum(jumps) / len(jumps) < 3


def test_zorder_rejects_wide_keys(spark):
    with pytest.raises(ValueError):
        zorder_key([F.lit(1), F.lit(2), F.lit(3), F.lit(4)], bits=16)
    with pytest.raises(ValueError):
        quantize_minmax(F.lit(1), 5.0, 5.0)


def _groups_matching(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
    """(matching, total) parquet row groups whose [min,max] intersects [lo,hi]."""
    match = total = 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(idx).statistics
            total += 1
            if st is None or (st.min <= hi and st.max >= lo):
                match += 1
    return match, total


def test_zordered_write_prunes_on_both_dims(spark, tmp_path):
    # 40k rows over a 200x200 grid; z-ordered into 16 files must let a
    # narrow predicate on EITHER dim skip most row groups, which a write
    # partitioned on row order cannot
    n = 40_000
    df = (
        spark.range(n)
        .select(
            (F.col("id") % 200).cast("double").alias("a"),
            ((F.col("id") * 7919) % 200).cast("double").alias("b"),
        )
    )
    zpath = str(tmp_path / "zordered")
    write_zordered(df, zpath, [("a", 0.0, 200.0), ("b", 0.0, 200.0)], num_files=16)
    plain = str(tmp_path / "plain")
    df.repartition(16).write.mode("overwrite").parquet(plain)

    za, ta = _groups_matching(zpath, "a", 10.0, 20.0)
    zb, tb = _groups_matching(zpath, "b", 10.0, 20.0)
    pa, pt = _groups_matching(plain, "a", 10.0, 20.0)
    # written data is intact
    assert spark.read.parquet(zpath).count() == n
    assert set(spark.read.parquet(zpath).columns) == {"a", "b"}
    # both dims prune under z-order; the unordered layout prunes neither
    assert za <= ta // 2, f"dim a: {za}/{ta} groups match"
    assert zb <= tb // 2, f"dim b: {zb}/{tb} groups match"
    assert pa == pt, "unordered layout should match every group"
