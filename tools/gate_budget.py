#!/usr/bin/env python
"""Per-query gate-cost accounting → GATE_BUDGET.json.

The correctness gate (driver window + local tail mirror) runs every
registry query on Spark AND its DuckDB oracle; its wall time is the
round's iteration feedback loop, so oracle cost is a budgeted quantity:
**slowest single query < 10 s, full gate ≤ ~3 min at sf0.01**. This tool
measures spark-side and oracle-side seconds separately for every query
and writes the table worst-first, so a budget-busting oracle (e.g. a
too-deeply-unrolled k-means CTE) is caught the round it lands.

Usage: python tools/gate_budget.py [sf_dir]   (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]
BUDGET_SINGLE_S = 10.0


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    load1, load5, load15 = os.getloadavg()
    sys.path.insert(0, REPO)
    import __spark_entry__ as entrymod
    from olake_spark.session import get_spark

    spark = get_spark("gate_budget", extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rows = []
    t_all = time.time()
    for name, fn in qs.items():
        t0 = time.time()
        n = len(fn(spark, sf_dir).toPandas())
        t_spark = time.time() - t0
        t1 = time.time()
        if name in oracles:
            con.sql(oracles[name]).df()
            t_oracle = time.time() - t1
        else:
            t_oracle = None
        rows.append(
            {
                "query": name,
                "spark_s": round(t_spark, 2),
                "oracle_s": round(t_oracle, 2) if t_oracle is not None else None,
                "total_s": round(t_spark + (t_oracle or 0.0), 2),
                "rows": n,
            }
        )
        print(f"{name}: spark={t_spark:.2f}s oracle="
              f"{t_oracle if t_oracle is None else round(t_oracle, 2)}s")

    # a shared-JVM sweep takes one GC/JIT pause per ~150 queries somewhere;
    # re-measure first-pass budget busters once and keep the better number
    # (two independent exceedances = a real buster, one = measurement noise
    # — the same variance protocol bench.py documents)
    for r in rows:
        if r["total_s"] <= BUDGET_SINGLE_S or r["query"] not in oracles:
            continue
        name = r["query"]
        t0 = time.time()
        n = len(qs[name](spark, sf_dir).toPandas())
        t_spark = time.time() - t0
        t1 = time.time()
        con.sql(oracles[name]).df()
        t_oracle = time.time() - t1
        if t_spark + t_oracle < r["total_s"]:
            r.update(
                spark_s=round(t_spark, 2),
                oracle_s=round(t_oracle, 2),
                total_s=round(t_spark + t_oracle, 2),
                rows=n,
                remeasured=True,
            )
        print(f"re-measure {name}: total={r['total_s']}s")

    rows.sort(key=lambda r: -r["total_s"])
    total = round(time.time() - t_all, 1)
    over = [r["query"] for r in rows if r["total_s"] > BUDGET_SINGLE_S]
    out = {
        "sf_dir": sf_dir,
        "gate_total_s": total,
        "budget_single_s": BUDGET_SINGLE_S,
        # idle stamps (sampled BEFORE the JVM started — per the repo's
        # measurement protocol, the sweep's own self-load can't gate
        # idleness) so the suite's creep alarm can verify the recorded
        # artifact came from a settled box.
        "load_at_start": round(load1, 2),
        "load15_at_start": round(load15, 2),
        "idle_box": load1 < 2.0,
        "registry_count": len(rows),
        "over_budget": over,
        "queries": rows,
    }
    with open(os.path.join(REPO, "GATE_BUDGET.json"), "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"\ngate total: {total}s over {len(rows)} queries; "
          f"over-budget: {over or 'none'}")
    print("worst 10:")
    for r in rows[:10]:
        print(f"  {r['query']}: total={r['total_s']}s "
              f"(spark={r['spark_s']}, oracle={r['oracle_s']})")
    return 1 if over else 0


if __name__ == "__main__":
    raise SystemExit(main())
