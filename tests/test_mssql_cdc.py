"""MSSQL CDC planner: SQL shapes + batch decode semantics."""

from __future__ import annotations

import pytest

from olake_spark.sources.mssql_cdc import (
    capture_instances_query,
    decode_cdc_batch,
    get_changes_query,
    increment_lsn_query,
    max_lsn_query,
)


def test_get_changes_query_shape():
    q = get_changes_query("dbo_users", "0x0000002A", "0x0000003B")
    assert "fn_cdc_get_all_changes_dbo_users" in q
    assert "(0x0000002A, 0x0000003B, 'all')" in q
    assert "ORDER BY [__$start_lsn], [__$seqval]" in q


def test_lsn_hex_validated():
    with pytest.raises(ValueError):
        get_changes_query("dbo_users", "0xZZ", "0x00")
    with pytest.raises(ValueError):
        get_changes_query("users; DROP TABLE x", "0x00", "0x01")


def test_discovery_query_lists_streams():
    q = capture_instances_query(["dbo.users", "sales.orders"])
    assert "IN ('dbo.users','sales.orders')" in q
    assert "cdc.change_tables" in q


def test_lsn_window_queries():
    assert "fn_cdc_get_max_lsn" in max_lsn_query()
    assert "fn_cdc_increment_lsn(0x2A)" in increment_lsn_query("2A")


def test_decode_cdc_batch(spark):
    rows = [
        (bytearray(b"\x00\x2a"), 1, 1, 1, "gone"),   # op 1 = delete
        (bytearray(b"\x00\x2b"), 2, 2, 2, "new"),    # op 2 = insert
        (bytearray(b"\x00\x2c"), 3, 4, 3, "after"),  # op 4 = update after-image
    ]
    df = spark.createDataFrame(
        rows,
        "`__$start_lsn` binary, `__$seqval` int, `__$operation` int, id int, name string",
    )
    out = {r["id"]: (r["_op_type"], r["_cdc_lsn"]) for r in decode_cdc_batch(df).collect()}
    assert out == {1: ("d", "002a"), 2: ("c", "002b"), 3: ("u", "002c")}


def test_decode_dedup_insert_window(spark):
    df = spark.createDataFrame(
        [(bytearray(b"\x01"), 1, 2, 7)],
        "`__$start_lsn` binary, `__$seqval` int, `__$operation` int, id int",
    )
    assert decode_cdc_batch(df, dedup_inserts=True).first()["_op_type"] == "i"


def test_bookkeeping_columns_dropped(spark):
    df = spark.createDataFrame(
        [(bytearray(b"\x01"), 1, 2, 7, bytearray(b"\xff"))],
        "`__$start_lsn` binary, `__$seqval` int, `__$operation` int, id int, `__$update_mask` binary",
    )
    cols = decode_cdc_batch(df).columns
    assert cols == ["id", "_op_type", "_cdc_lsn"]
