"""MySQL binlog decode semantics (streaming/binlog.py vs pkg/binlog/filter.go)."""

from __future__ import annotations

from olake_spark.streaming.binlog import position_key, reconcile_position


def test_position_key_orders_by_file_then_pos():
    assert position_key("mysql-bin.000042", 100) < position_key("mysql-bin.000043", 5)
    assert position_key("mysql-bin.000042", 100) < position_key("mysql-bin.000042", 101)
    assert position_key("binlog.000007", 0) == (7, 0)


def test_reconcile_position_crash_recovery():
    state = ("mysql-bin.000042", 500)
    # metadata on a later file → resume from metadata (cdc.go:101-105)
    assert reconcile_position(state, ("mysql-bin.000043", 10)) == ("mysql-bin.000043", 10)
    # same file, metadata further ahead → metadata
    assert reconcile_position(state, ("mysql-bin.000042", 900)) == ("mysql-bin.000042", 900)
    # state ahead or equal → state stands
    assert reconcile_position(state, ("mysql-bin.000042", 100)) == state
    assert reconcile_position(state, state) == state
    assert reconcile_position(None, state) == state
    assert reconcile_position(state, None) == state


def test_decode_rows_events_update_pairing(spark):
    from olake_spark.streaming.binlog import ROWS_EVENT_SCHEMA, decode_rows_events

    rows = [
        ("UPDATE_ROWS_EVENTv2", "db", "t", ['{"v":"before1"}', '{"v":"after1"}',
                                            '{"v":"before2"}', '{"v":"after2"}'],
         1704067200, None, "mysql-bin.000042", 10),
        ("WRITE_ROWS_EVENTv1", "db", "t", ['{"v":"ins"}'], 1704067201, None,
         "mysql-bin.000042", 20),
        ("DELETE_ROWS_EVENTv2", "db", "t", ['{"v":"del"}'], 1704067202, None,
         "mysql-bin.000042", 30),
        ("TABLE_MAP_EVENT", "db", "t", ['{"v":"skip"}'], 1704067203, None,
         "mysql-bin.000042", 40),
        ("WRITE_ROWS_EVENTv2", "db", "other", ['{"v":"other"}'], 1704067204, None,
         "mysql-bin.000042", 50),
    ]
    df = spark.createDataFrame(rows, ROWS_EVENT_SCHEMA)
    out = decode_rows_events(df, tables=["t"])
    got = {(r["_op_type"], r["data"]) for r in out.collect()}
    # only after-images for updates; non-DML and other tables vanish
    assert got == {
        ("u", '{"v":"after1"}'),
        ("u", '{"v":"after2"}'),
        ("c", '{"v":"ins"}'),
        ("d", '{"v":"del"}'),
    }
    dedup = decode_rows_events(df, tables=["t"], dedup_inserts=True)
    assert {r["_op_type"] for r in dedup.collect()} == {"i", "u", "d"}
