"""Incremental view maintenance: chained refresh ≡ full recompute over
any batch split, including NULL values, NULL group keys, group
migration on update, eviction at n=0, and delete-of-unknown-PK
(operators/ivm.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from olake_spark.operators.ivm import (
    incremental_view_refresh,
    view_finalize,
    view_state,
)
from olake_spark.operators.merge import apply_changelog, latest_state

PK, ORDER, GRP = ["pk"], ["lsn"], ["grp"]
SCHEMA = "pk long, lsn long, value double, grp string, _op_type string"


def _refresh_chain(spark, changelog_rows, n_batches):
    ch = spark.createDataFrame(changelog_rows, SCHEMA)
    hi = max(r[1] for r in changelog_rows)
    lo = min(r[1] for r in changelog_rows)
    cuts = [lo + (hi - lo) * (i + 1) // n_batches for i in range(n_batches)]
    prev = lo - 1
    batches = []
    for c in cuts:
        batches.append(ch.filter((F.col("lsn") > prev) & (F.col("lsn") <= c)))
        prev = c
    base = ch.limit(0)
    view = view_state(base, GRP, "value")
    for b in batches:
        view = incremental_view_refresh(view, base, b, PK, ORDER, GRP, "value")
        base = apply_changelog(base, [b], PK, ORDER)
    return view, ch


def _assert_matches_recompute(spark, rows, n_batches):
    view, ch = _refresh_chain(spark, rows, n_batches)
    final = latest_state(ch, PK, ORDER)
    key = lambda t: tuple(map(repr, t))  # noqa: E731 — None-safe ordering
    want = sorted(
        map(tuple, view_finalize(view_state(final, GRP, "value"), GRP).collect()),
        key=key,
    )
    got = sorted(map(tuple, view_finalize(view, GRP).collect()), key=key)
    assert got == want


def test_ivm_basic_updates_and_deletes(spark):
    rows = [
        (1, 1, 10.0, "a", "c"),
        (2, 2, 20.0, "a", "c"),
        (3, 3, 30.0, "b", "c"),
        (1, 4, 15.0, "a", "u"),   # in-group update
        (2, 5, None, "a", "d"),   # delete
        (4, 6, 40.0, "b", "c"),
        (3, 7, 35.0, "a", "u"),   # migrates b -> a
    ]
    _assert_matches_recompute(spark, rows, 3)


def test_ivm_group_eviction_and_rebirth(spark):
    rows = [
        (1, 1, 5.0, "x", "c"),
        (1, 2, None, "x", "d"),   # group x evicted (n=0)
        (2, 3, 7.0, "x", "c"),    # reborn later
    ]
    _assert_matches_recompute(spark, rows, 3)


def test_ivm_null_group_key_and_null_values(spark):
    rows = [
        (1, 1, 10.0, None, "c"),
        (2, 2, None, None, "c"),  # NULL value in NULL-key group
        (3, 3, 3.0, "g", "c"),
        (1, 4, 12.0, "g", "u"),   # migrates NULL-key -> g
        (3, 5, None, "g", "u"),   # value becomes NULL in place
    ]
    _assert_matches_recompute(spark, rows, 2)


def test_ivm_delete_unknown_pk_is_noop(spark):
    rows = [
        (1, 1, 10.0, "a", "c"),
        (99, 2, None, "a", "d"),  # tombstone for a PK that never existed
    ]
    _assert_matches_recompute(spark, rows, 2)


def test_ivm_minmax_retract_extremum(spark):
    # deleting/updating away the group max forces the dirty-group
    # recompute to find the runner-up — the case pure deltas cannot do
    rows = [
        (1, 1, 10.0, "a", "c"),
        (2, 2, 99.0, "a", "c"),
        (3, 3, 50.0, "a", "c"),
        (2, 4, None, "a", "d"),   # max leaves
        (1, 5, 1.0, "a", "u"),    # min lowers in place
    ]
    view, ch = _refresh_chain(spark, rows, 2)
    got = {tuple(r[:1]): r for r in view_finalize(view, GRP).collect()}
    r = got[("a",)]
    assert (r.n, r.min_value, r.max_value) == (2, 1.0, 50.0)
    _assert_matches_recompute(spark, rows, 2)


def test_ivm_randomized_vs_recompute(spark):
    import random

    rng = random.Random(406)
    rows, lsn = [], 0
    live: set[int] = set()
    for _ in range(300):
        lsn += 1
        pk = rng.randrange(40)
        if live and rng.random() < 0.2:
            pk = rng.choice(sorted(live))
            rows.append((pk, lsn, None, None, "d"))
            live.discard(pk)
            continue
        grp = rng.choice(["a", "b", "c", None])
        val = None if rng.random() < 0.1 else round(rng.uniform(-50, 50), 2)
        rows.append((pk, lsn, val, grp, "u" if pk in live else "c"))
        live.add(pk)
    for n_batches in (1, 4):
        _assert_matches_recompute(spark, rows, n_batches)
