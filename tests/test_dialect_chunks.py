"""Physical-locator chunk planners (sources/dialect_chunks.py vs the
reference's per-dialect backfill strategies)."""

from __future__ import annotations

import pytest

from olake_spark.plans.chunks import EFFECTIVE_CHUNK_BYTES, Chunk
from olake_spark.sources.dialect_chunks import (
    compute_sample_percent,
    ctid_page_chunks,
    ctid_partitioned_chunks,
    ctid_predicate,
    db2_rid_chunks,
    db2_rid_predicate,
    mysql_limit_offset_chunks,
    mysql_limit_offset_scan_sql,
    oracle_next_rowid_sql,
    oracle_rowid_task_sqls,
    oracle_sample_block_sql,
    physloc_next_chunk_sql,
    physloc_predicate,
    physloc_walk_chunks,
    sample_boundaries_to_chunks,
    tablesample_boundary_sql,
)

UINT32_MAX = 2**32 - 1


def test_ctid_pages_batch_math():
    # 8 KiB blocks → 2 GiB / 8 KiB = 262144 pages per chunk
    chunks = ctid_page_chunks(600_000, block_size=8192)
    assert chunks[0] == Chunk("'(0,0)'", "'(262144,0)'")
    assert chunks[1] == Chunk("'(262144,0)'", "'(524288,0)'")
    # final end page pinned to uint32-max so late inserts are read
    assert chunks[-1] == Chunk("'(524288,0)'", f"'({UINT32_MAX},0)'")
    assert ctid_predicate(chunks[0]) == "ctid >= '(0,0)' AND ctid < '(262144,0)'"
    # empty table still yields one full-range chunk
    assert len(ctid_page_chunks(0)) == 1


def test_ctid_partitioned_shrinks_batch():
    # two partitions overlap the scan range → per-chunk page batch halves
    # while both are alive, then doubles back when one runs dry
    pages = {"p0": 1_000_000, "p1": 300_000}
    chunks = ctid_partitioned_chunks(pages, block_size=8192)
    batch_full = 262144
    first_span = int(chunks[0].max.strip("'()").split(",")[0])
    assert first_span == batch_full // 2  # both partitions in range
    # all chunk starts strictly increase and the tail is pinned
    starts = [int(c.min.strip("'()").split(",")[0]) for c in chunks]
    assert starts == sorted(set(starts))
    assert chunks[-1].max == f"'({UINT32_MAX},0)'"


def test_physloc_walk_and_predicate():
    chunks = physloc_walk_chunks(["0x01", "0x09", "0x11"])
    # head below table min, interior (min, max], unbounded tail
    assert chunks[0] == Chunk(None, "0x01")
    assert chunks[1] == Chunk("0x01", "0x09")
    assert chunks[-1] == Chunk("0x11", None)
    assert physloc_predicate(chunks[1]) == "%%physloc%% > 0x01 AND %%physloc%% <= 0x09"
    assert physloc_predicate(chunks[0]) == "%%physloc%% <= 0x01"
    sql = physloc_next_chunk_sql("[dbo].[t]", 50_000)
    assert "ROW_NUMBER() OVER (ORDER BY %%physloc%%)" in sql
    assert "WHERE rn = 50000" in sql
    assert physloc_walk_chunks([]) == []


def test_sample_percent_clamps():
    # 10 samples per chunk
    assert compute_sample_percent(1_000_000, 100) == pytest.approx(0.1)
    # floor 0.01, cap 50
    assert compute_sample_percent(10**10, 1) == 0.01
    assert compute_sample_percent(10, 100) == 50.0


def test_sample_boundaries_stride():
    samples = [f"k{i:03d}" for i in range(100)]
    chunks = sample_boundaries_to_chunks(samples, 4)
    assert chunks[0] == Chunk(None, "k000")
    assert chunks[1] == Chunk("k000", "k025")
    assert chunks[2] == Chunk("k025", "k050")
    assert chunks[-1] == Chunk("k075", None)
    with pytest.raises(ValueError):
        sample_boundaries_to_chunks(["a"], 4)
    sql = tablesample_boundary_sql("[s].[t]", ["a", "b"], 1.5)
    assert "TABLESAMPLE SYSTEM (1.500000 PERCENT)" in sql
    assert "CONCAT_WS" in sql and "ORDER BY a, b" in sql


def test_oracle_rowid_sqls():
    sqls = oracle_rowid_task_sqls("T1", "OWNER", "ORDERS", 512)
    assert "create_task('T1')" in sqls["create"]
    assert "create_chunks_by_rowid" in sqls["chunk"] and "chunk_size => 512" in sqls["chunk"]
    assert "user_parallel_execute_chunks" in sqls["retrieve"]
    assert "drop_task('T1')" in sqls["drop"]
    assert "SAMPLE BLOCK(0.250000)" in oracle_sample_block_sql('"O"."T"', 0.25)
    probe = oracle_next_rowid_sql('"O"."T"', "AAAA", 10_000)
    assert "FETCH FIRST 10000 ROWS ONLY" in probe and "ROWID >= 'AAAA'" in probe


def test_db2_rid_chunks_step_and_tail():
    # avg 200-byte rows → 2 GiB / 200 ≈ 10.7M rids per chunk
    chunks = db2_rid_chunks(1000, 25_000_000, avg_row_bytes=200.0)
    step = -(-EFFECTIVE_CHUNK_BYTES // 200)
    assert chunks[0] == Chunk(1000, 1000 + step)
    assert chunks[-1].max is None  # tail unbounded
    assert db2_rid_predicate('"S"."T"', chunks[0]) == (
        f'RID("S"."T") >= 1000 AND RID("S"."T") < {1000 + step}'
    )


def test_mysql_limit_offset_windows():
    chunks = mysql_limit_offset_chunks(250_000, 100_000)
    assert chunks[0] == Chunk("0", "100000")
    assert chunks[1] == Chunk("100000", "200000")
    assert chunks[2] == Chunk("200000", None)  # tail window unbounded
    assert (
        mysql_limit_offset_scan_sql("`db`.`t`", chunks[1])
        == "SELECT * FROM `db`.`t` LIMIT 100000 OFFSET 100000"
    )
    assert mysql_limit_offset_scan_sql("`db`.`t`", Chunk(None, "500"), "x > 1") == (
        "SELECT * FROM `db`.`t` WHERE x > 1 LIMIT 500"
    )
    tail = mysql_limit_offset_scan_sql("`db`.`t`", chunks[2])
    assert f"LIMIT {2**64 - 1} OFFSET 200000" in tail
    assert mysql_limit_offset_chunks(0, 100) == [Chunk("0", None)]


# -- MSSQL IAM page walk (backfill.go:341-422, jdbc.go:663-706) --------------


def test_physloc_sort_key_matches_binary_compare():
    from olake_spark.sources.dialect_chunks import physloc_hex, physloc_sort_key

    # SQL Server compares %%physloc%% BINARY(8) byte-wise: page_id LE,
    # file_id LE, slot LE. Sorting the uint64 keys must equal sorting the
    # hex literals lexicographically.
    pairs = [(1, 100), (1, 99), (2, 5), (1, 1000000), (3, 0)]
    keys = [physloc_sort_key(f, p) for f, p in pairs]
    hexes = [physloc_hex(k) for k in keys]
    assert sorted(hexes) == [physloc_hex(k) for k in sorted(keys)]
    # slot id pinned to end-of-page
    assert physloc_hex(physloc_sort_key(1, 2)).endswith("FFFF")


def test_iam_pages_to_chunks_boundaries():
    from olake_spark.sources.dialect_chunks import (
        Chunk,
        iam_pages_to_chunks,
        physloc_hex,
        physloc_sort_key,
    )

    pages = [(1, p) for p in range(100)]  # 100 pages, unsorted insertion ok
    # 10 pages per chunk → boundaries at sorted positions 10,20,...,90
    chunks = iam_pages_to_chunks(pages, target_chunk_bytes=10 * 8060)
    assert len(chunks) == 10
    assert chunks[0].min is None and chunks[-1].max is None
    assert chunks[0].max == physloc_hex(physloc_sort_key(1, 10))
    # contiguous: each max == next min
    for a, b in zip(chunks, chunks[1:]):
        assert a.max == b.min
    # single-chunk table → exactly one unbounded chunk
    assert iam_pages_to_chunks([(1, 5)]) == [Chunk(None, None)]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        iam_pages_to_chunks([])


def test_iam_capability_probe_decision():
    from olake_spark.sources.dialect_chunks import (
        iam_permission_probe_sql,
        iam_server_properties_sql,
        iam_walk_pages_sql,
        iam_walk_supported,
    )

    assert iam_walk_supported(16, 3)  # SQL Server 2022, standalone
    assert not iam_walk_supported(10, 3)  # 2008 < 2012
    assert not iam_walk_supported(16, 5)  # Azure SQL Database
    assert not iam_walk_supported(16, 8)  # Azure SQL Managed Instance
    assert "SERVERPROPERTY" in iam_server_properties_sql()
    assert "TOP 0" in iam_permission_probe_sql()
    q = iam_walk_pages_sql()
    assert "dm_db_database_page_allocations" in q and "'LIMITED'" in q
    assert "is_iam_page = 0" in q and "allocation_unit_type = 1" in q


def test_iam_chunks_feed_physloc_predicate():
    from olake_spark.sources.dialect_chunks import iam_pages_to_chunks, physloc_predicate

    chunks = iam_pages_to_chunks([(1, p) for p in range(30)], target_chunk_bytes=10 * 8060)
    preds = [physloc_predicate(c) for c in chunks]
    assert preds[0].startswith("%%physloc%% <= 0x")
    assert " > 0x" in preds[1] and " <= 0x" in preds[1]
    assert preds[-1].startswith("%%physloc%% > 0x")
