#!/usr/bin/env python
"""Interleaved A/B of the similarity family between two trees (r10
verdict ask #2: the shared-bench common set regressed two consecutive
rounds, concentrated in similarity_topk_{ivf,lsh,pq} +
dedup_ngram_jaccard, while no commit touched those operators — settle
whether the delta is real code drift or machine warmth).

Protocol: for each query, alternate isolated best-of-3 subprocess runs
between TREE_A (current checkout) and TREE_B (the r9 worktree),
``blocks`` times each, with a cooldown between children — interleaving
means any slow machine drift hits both trees equally. Requires a
settled box (waits for load1 < 1 up front; stamps load before every
child).

Usage: python tools/ab_similarity.py [tree_b] [blocks] [out_json]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

QUERIES = [
    "similarity_topk_ivf",
    "similarity_topk_lsh",
    "similarity_topk_pq",
    "dedup_ngram_jaccard",
]
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _wait_idle(limit: float = 1.0, timeout_s: float = 900.0) -> float:
    t0 = time.time()
    while True:
        l1 = os.getloadavg()[0]
        if l1 < limit:
            return l1
        if time.time() - t0 > timeout_s:
            print(f"WARN proceeding at load1={l1:.2f} (timeout)")
            return l1
        time.sleep(20)


def _run_one(tree: str, name: str, best_of: int = 3) -> dict:
    """One isolated child in ``tree``; returns {best, spread, load}."""
    load = round(os.getloadavg()[0], 2)
    # r9's _iso_child has no best_of param (fixed 3); r11's defaults to 3
    code = (
        f"import sys; sys.path.insert(0, {tree!r})\n"
        f"import bench\n"
        f"try:\n"
        f"    bench._iso_child({name!r}, {SF_DIR!r}, {best_of})\n"
        f"except TypeError:\n"
        f"    bench._iso_child({name!r}, {SF_DIR!r})\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=900, cwd=tree,
    )
    iso = [ln for ln in proc.stdout.splitlines() if ln.startswith("ISO_RESULT")]
    if proc.returncode != 0 or not iso:
        return {"error": proc.stderr[-400:], "load": load}
    payload = json.loads(iso[-1].split(None, 1)[1])
    payload["load"] = load
    return payload


def main() -> int:
    tree_a = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    tree_b = sys.argv[1] if len(sys.argv) > 1 else "/tmp/r9ab"
    blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/ab_similarity.json"
    cooldown = 10.0

    l1 = _wait_idle()
    print(f"starting at load1={l1:.2f}; A={tree_a} B={tree_b}")
    results: dict = {
        "tree_a": tree_a, "tree_b": tree_b, "sf_dir": SF_DIR,
        "blocks": blocks, "load_at_start": round(l1, 2), "runs": [],
    }
    for name in QUERIES:
        for blk in range(blocks):
            for tag, tree in (("A", tree_a), ("B", tree_b)):
                r = _run_one(tree, name)
                r.update(query=name, tree=tag, block=blk)
                results["runs"].append(r)
                best = r.get("sec") or r.get("error")
                print(f"{name} {tag} blk{blk}: {best} (load {r['load']})",
                      flush=True)
                time.sleep(cooldown)

    # per-query best-of-all-blocks summary
    summary = {}
    for name in QUERIES:
        row = {}
        for tag in ("A", "B"):
            vals = [
                r["sec"] for r in results["runs"]
                if r["query"] == name and r["tree"] == tag and "sec" in r
            ]
            row[tag] = {"best": min(vals) if vals else None, "all": vals}
        a, b = row["A"]["best"], row["B"]["best"]
        row["delta_pct"] = (
            round((a - b) / b * 100, 1) if a and b else None
        )
        summary[name] = row
    results["summary"] = summary
    with open(out_path, "w") as fh:
        json.dump(results, fh, indent=1)
    print(json.dumps(summary, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
