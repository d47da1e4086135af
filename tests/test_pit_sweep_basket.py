"""Round-6 additions: point-in-time join, sweep-line concurrency, EWMA fold,
k-anonymity report, basket pair lift."""

from __future__ import annotations

from pyspark.sql import functions as F

from olake_spark.operators.basket import pair_counts_with_lift
from olake_spark.operators.pii import k_anonymity_report
from olake_spark.operators.scd import point_in_time_join, scd2_history
from olake_spark.operators.timeseries import ewma_last, sweepline_concurrency


# ---------------------------------------------------------------------------
# point_in_time_join
# ---------------------------------------------------------------------------

def _dim(spark):
    # key 1: v=10 @ [100, 200), v=20 @ [200, 300), deleted at 300,
    #        re-created v=30 @ [400, open)
    changelog = spark.createDataFrame(
        [
            (1, 100, 1, "c", 10),
            (1, 200, 2, "u", 20),
            (1, 300, 3, "d", None),
            (1, 400, 4, "c", 30),
            # key 2: burst — two changes at the same LSN (zero-width first
            # version), then nothing
            (2, 100, 5, "c", 1),
            (2, 100, 6, "u", 2),
        ],
        "k int, lsn long, eid int, _op_type string, v int",
    )
    return scd2_history(
        changelog, keys=["k"], tracked=["v"], order_cols=["lsn", "eid"]
    )


def test_pit_interval_semantics(spark):
    facts = spark.createDataFrame(
        [
            (1, 99, "before-first"),
            (1, 100, "at-open"),
            (1, 199, "v1-end"),
            (1, 200, "v2-open"),
            (1, 300, "in-delete-gap"),
            (1, 350, "still-gap"),
            (1, 400, "reopened"),
            (1, 999, "open-version"),
        ],
        "k int, t long, label string",
    )
    out = {
        r.label: (r.v, r.matched)
        for r in point_in_time_join(
            facts, _dim(spark), keys=["k"], fact_time="t", tracked=["v"]
        ).collect()
    }
    assert out["before-first"] == (None, False)
    assert out["at-open"] == (10, True)  # left edge inclusive
    assert out["v1-end"] == (10, True)
    assert out["v2-open"] == (20, True)  # half-open: old closes, new opens
    assert out["in-delete-gap"] == (None, False)
    assert out["still-gap"] == (None, False)
    assert out["reopened"] == (30, True)
    assert out["open-version"] == (30, True)


def test_pit_zero_width_burst_picks_live_version(spark):
    # at lsn 100 key 2 has a zero-width v=1 then the live v=2: a fact at
    # 100 must see v=2, never the zero-width predecessor
    facts = spark.createDataFrame([(2, 100, "x"), (2, 500, "y")],
                                  "k int, t long, label string")
    out = {
        r.label: (r.v, r.matched)
        for r in point_in_time_join(
            facts, _dim(spark), keys=["k"], fact_time="t", tracked=["v"]
        ).collect()
    }
    assert out["x"] == (2, True)
    assert out["y"] == (2, True)


def test_pit_plan_single_exchange_no_join(spark):
    facts = spark.createDataFrame([(1, 150, "a")], "k int, t long, label string")
    plan = point_in_time_join(
        facts, _dim(spark), keys=["k"], fact_time="t", tracked=["v"]
    )._jdf.queryExecution().executedPlan().toString()
    # union + window carry — interval join would show a Join node with a
    # range condition or a nested loop
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# sweepline_concurrency
# ---------------------------------------------------------------------------

def test_sweepline_matches_naive_cumsum(spark):
    # intervals straddling bucket boundaries (bucket = 100 units)
    iv = spark.createDataFrame(
        [(0, 50), (10, 250), (40, 45), (199, 200), (205, 430), (300, 310)],
        "s long, e long",
    )
    out = {
        r.ts_us: r.concurrency
        for r in sweepline_concurrency(iv, "s", "e", bucket_us=100).collect()
    }
    # naive check
    deltas: dict[int, int] = {}
    for s, e in [(0, 50), (10, 250), (40, 45), (199, 200), (205, 430), (300, 310)]:
        deltas[s] = deltas.get(s, 0) + 1
        deltas[e + 1] = deltas.get(e + 1, 0) - 1
    run, expect = 0, {}
    for t in sorted(deltas):
        run += deltas[t]
        expect[t] = run
    assert out == expect
    assert max(out.values()) == 3  # (0,50), (10,250), (40,45) all open at 40
    assert min(out.values()) == 0  # fully closed at the end


def test_sweepline_net_zero_boundary_collapses(spark):
    # one interval ends at t, another starts at t+1 → the -1 and +1 land
    # on the same boundary instant and must net to 0 concurrency change
    iv = spark.createDataFrame([(0, 99), (100, 150)], "s long, e long")
    out = {
        r.ts_us: r.concurrency
        for r in sweepline_concurrency(iv, "s", "e", bucket_us=1000).collect()
    }
    assert out[0] == 1
    assert out[100] == 1  # -1 for [0,99] and +1 for [100,150] net to zero
    assert out[151] == 0


# ---------------------------------------------------------------------------
# ewma_last
# ---------------------------------------------------------------------------

def test_ewma_recursion_exact(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, 8.0),
        (1, t0 + dt.timedelta(seconds=1), 2, 4.0),
        (1, t0 + dt.timedelta(seconds=2), 3, 2.0),
        (2, t0, 4, 5.0),  # single observation: ewma == value
    ]
    df = spark.createDataFrame(rows, "user_id int, ts timestamp, eid int, value double")
    out = {
        r.user_id: (r.n, r.ewma)
        for r in ewma_last(df, "ts", ["user_id"], "value", alpha=0.25,
                           order_cols=["eid"]).collect()
    }
    # ewma = ((8*0.75 + 4*0.25)*0.75 + 2*0.25) = (7.0)*0.75 + 0.5 = 5.75
    assert out[1] == (3, 5.75)
    assert out[2] == (1, 5.0)


def test_ewma_order_by_tiebreaker(spark):
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    # identical timestamps — eid breaks the tie, so fold order is 1.0 then 3.0
    df = spark.createDataFrame(
        [(1, t0, 2, 3.0), (1, t0, 1, 1.0)],
        "user_id int, ts timestamp, eid int, value double",
    )
    out = ewma_last(df, "ts", ["user_id"], "value", alpha=0.5,
                    order_cols=["eid"]).collect()[0]
    assert out.ewma == 2.0  # 1.0*0.5 + 3.0*0.5


# ---------------------------------------------------------------------------
# k_anonymity_report
# ---------------------------------------------------------------------------

def test_k_anonymity_flags_and_null_class(spark):
    df = spark.createDataFrame(
        [
            ("a", "x", 1), ("a", "x", 2), ("a", "x", 3),
            ("b", "y", 1), ("b", "y", 1),
            (None, "y", 4),
        ],
        "qi1 string, qi2 string, s int",
    )
    out = {
        (r.qi1, r.qi2): (r.class_size, r.sensitive_distinct, r.k_anonymous, r.l_diverse)
        for r in k_anonymity_report(df, ["qi1", "qi2"], "s", k=3, l_diversity=2).collect()
    }
    assert out[("a", "x")] == (3, 3, True, True)
    assert out[("b", "y")] == (2, 1, False, False)  # 2 rows, 1 distinct value
    # NULL quasi-identifier forms its own (audited) class, never dropped
    assert out[(None, "y")] == (1, 1, False, False)


# ---------------------------------------------------------------------------
# pair_counts_with_lift
# ---------------------------------------------------------------------------

def test_basket_pairs_and_lift(spark):
    df = spark.createDataFrame(
        [(1, "p"), (1, "q"), (2, "p"), (2, "q"), (3, "p"), (3, "r"),
         (4, "p"), (4, "q"), (4, "q")],  # dup (4, q) must collapse
        "b int, i string",
    )
    out = {
        (r.item_a, r.item_b): (r.n_baskets, r.lift)
        for r in pair_counts_with_lift(df, "b", "i", min_count=2).collect()
    }
    # (p,q) co-occur in baskets 1,2,4; support p=4, q=3, total baskets=4
    assert out[("p", "q")][0] == 3
    assert out[("p", "q")][1] == 1.0  # 3*4/(4*3)
    assert ("p", "r") not in out  # below min_count


def test_basket_max_size_drops_mega_baskets(spark):
    rows = [(1, "a"), (1, "b")] + [(2, f"i{k}") for k in range(10)]
    df = spark.createDataFrame(rows, "b int, i string")
    out = pair_counts_with_lift(df, "b", "i", min_count=1, max_basket_size=5).collect()
    assert {(r.item_a, r.item_b) for r in out} == {("a", "b")}
