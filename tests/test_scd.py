"""SCD Type 2 history builder + ManagedTable time travel."""

import tempfile

from olake_spark.operators.scd import scd2_history
from olake_spark.sinks.table import ManagedTable

COLS = ["k", "attr", "lsn", "_op_type"]


def _hist(spark, rows, **kw):
    df = spark.createDataFrame(rows, COLS)
    out = scd2_history(df, keys=["k"], tracked=["attr"], order_cols=["lsn"], **kw)
    return {
        (r.k, r.attr, r.valid_from, r.valid_to, r.is_current)
        for r in out.collect()
    }


def test_collapse_and_intervals(spark):
    rows = [
        (1, "a", 10, "c"),
        (1, "a", 20, "u"),  # unchanged → collapsed into v1
        (1, "b", 30, "u"),  # real change → v2
        (1, "b", 40, "u"),  # unchanged → collapsed
    ]
    assert _hist(spark, rows) == {
        (1, "a", 10, 30, False),
        (1, "b", 30, None, True),
    }


def test_no_collapse_keeps_every_event(spark):
    rows = [(1, "a", 10, "c"), (1, "a", 20, "u")]
    assert _hist(spark, rows, collapse_unchanged=False) == {
        (1, "a", 10, 20, False),
        (1, "a", 20, None, True),
    }


def test_delete_closes_and_recreate_reopens(spark):
    rows = [
        (1, "a", 10, "c"),
        (1, "a", 20, "d"),  # delete closes v1; no new version
        (1, "a", 30, "c"),  # identical attrs, but post-delete → NEW version
    ]
    assert _hist(spark, rows) == {
        (1, "a", 10, 20, False),
        (1, "a", 30, None, True),
    }


def test_deleted_key_has_no_current(spark):
    rows = [(1, "a", 10, "c"), (1, "b", 20, "u"), (1, "b", 30, "d")]
    h = _hist(spark, rows)
    assert h == {(1, "a", 10, 20, False), (1, "b", 20, 30, False)}
    assert not any(cur for *_, cur in h)


def test_null_attrs_null_safe_collapse(spark):
    rows = [(1, None, 10, "c"), (1, None, 20, "u"), (1, "x", 30, "u")]
    assert _hist(spark, rows) == {
        (1, None, 10, 30, False),
        (1, "x", 30, None, True),
    }


def test_single_exchange_plan(spark):
    """Both window passes share one hash partitioning on the key."""
    df = spark.createDataFrame([(1, "a", 10, "c")], COLS)
    plan = scd2_history(
        df, keys=["k"], tracked=["attr"], order_cols=["lsn"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def _mk_batch(spark, rows):
    return spark.createDataFrame(
        rows, "k BIGINT, v STRING, lsn BIGINT, _op_type STRING"
    )


def test_time_travel_versions(spark):
    t = ManagedTable(spark, tempfile.mkdtemp(prefix="olake_tt_test_"))
    t.upsert_mor(_mk_batch(spark, [(1, "a", 1, "c"), (2, "b", 1, "c")]), ["k"], ["lsn"])
    t.upsert_mor(_mk_batch(spark, [(1, "a2", 2, "u")]), ["k"], ["lsn"])
    t.upsert_mor(_mk_batch(spark, [(2, None, 3, "d")]), ["k"], ["lsn"])
    assert t.versions() == [0, 1, 2]

    def snap(version=None):
        return {(r.k, r.v) for r in t.read(version).select("k", "v").collect()}

    assert snap(0) == {(1, "a"), (2, "b")}
    assert snap(1) == {(1, "a2"), (2, "b")}
    assert snap(2) == snap() == {(1, "a2")}


def test_time_travel_survives_compaction(spark):
    t = ManagedTable(spark, tempfile.mkdtemp(prefix="olake_tt_test_"))
    t.upsert_mor(_mk_batch(spark, [(1, "a", 1, "c")]), ["k"], ["lsn"])
    t.upsert_mor(_mk_batch(spark, [(1, "b", 2, "u")]), ["k"], ["lsn"])
    t.compact()
    assert t.versions() == [0, 1, 2]
    # pre-compaction snapshot still resolves (no eager vacuum)
    assert [r.v for r in t.read(version=0).collect()] == ["a"]
    assert [r.v for r in t.read(version=2).collect()] == ["b"]
