#!/usr/bin/env python
"""Rotate queries out of the driver's 50-entry verification window.

The external driver verifies only the FIRST 50 registry entries per round;
queries past that ride on the local driver-mirror gate (certified by
``tests/test_registry_tail.py``). Adding a query therefore overflows the
window, and some window query must rotate into ``_GATE_TAIL`` — this tool
makes that rotation mechanical and safe:

1. Computes the overflow (window size − 50).
2. Ranks window queries by how many CONSECUTIVE recent driver rounds they
   were green (reading ``CORRECTNESS_r*.json``) and proposes rotating the
   longest-green, earliest-registered ones — never anything green in fewer
   than ``--min-green`` (default 2) rounds, and never a pinned headliner.
3. With ``--apply``: appends the names to the ``_GATE_TAIL`` literal in
   ``olake_spark/queries.py`` (preserving the block's rotation-history
   comments), then re-imports and re-checks the invariant gate_order()
   enforces.

Usage:
    python tools/rotate_window.py           # dry run: show proposal
    python tools/rotate_window.py --apply   # edit queries.py
"""

from __future__ import annotations

import argparse
import glob
import importlib
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the vs-baseline headliners stay in the window: they are the queries the
# round report leads with, and the driver re-proves them every round
PINNED = {"full_load_lineitem", "cdc_merge_replay", "cdc_mor_replay"}


def _green_streak(name: str, rounds: list[dict]) -> int:
    """Consecutive green driver rounds, counting back from the latest."""
    streak = 0
    for rec in rounds:  # rounds newest-first
        entry = rec.get(name)
        if not entry or not (
            entry.get("rows_match") and entry.get("schema_match")
            and entry.get("hash_match") and not entry.get("err")
        ):
            break
        streak += 1
    return streak


def propose(min_green: int) -> tuple[list[str], list[tuple[str, int]]]:
    sys.path.insert(0, REPO)
    q = importlib.import_module("olake_spark.queries")
    importlib.import_module("olake_spark.queries_data_ops")
    order = q.gate_order.__wrapped__() if hasattr(q.gate_order, "__wrapped__") else None
    # gate_order() raises on overflow by design — recompute the raw window
    tail = set(q._GATE_TAIL)
    window = [n for n in q.QUERIES if n not in tail]
    overflow = len(window) - q.DRIVER_WINDOW_SIZE
    del order

    files = sorted(
        glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")), reverse=True
    )
    rounds = []
    for f in files:
        try:
            with open(f) as fh:
                rounds.append(json.load(fh))
        except (OSError, json.JSONDecodeError):
            continue

    ranked = []
    for pos, name in enumerate(window):
        if name in PINNED:
            continue
        streak = _green_streak(name, rounds)
        if streak >= min_green:
            # longest streak first; ties → earliest registered (oldest)
            ranked.append((name, streak, pos))
    ranked.sort(key=lambda t: (-t[1], t[2]))

    if overflow <= 0:
        return [], [(n, s) for n, s, _ in ranked]
    if len(ranked) < overflow:
        raise SystemExit(
            f"window over cap by {overflow} but only {len(ranked)} window "
            f"queries are ≥{min_green}-round green — lower --min-green or "
            "verify the new queries first"
        )
    return [n for n, _, _ in ranked[:overflow]], [(n, s) for n, s, _ in ranked]


def apply_rotation(names: list[str], round_tag: str) -> None:
    path = os.path.join(REPO, "olake_spark", "queries.py")
    with open(path) as fh:
        src = fh.read()
    m = re.search(r"_GATE_TAIL = \[\n(.*?)\n\]", src, re.DOTALL)
    if not m:
        raise SystemExit("could not locate the _GATE_TAIL literal")
    header = (
        f"    # {round_tag} rotations (tools/rotate_window.py): longest-"
        "driver-green\n    # window queries out, making room for the "
        "round's new oracle queries\n"
    )
    # one header per round: skip it if this round's block already exists
    addition = ("" if header in m.group(1) + "\n" else header) + "".join(
        f'    "{n}",\n' for n in names
    )
    src = src[: m.end(1)] + "\n" + addition.rstrip("\n") + src[m.end(1):]
    with open(path, "w") as fh:
        fh.write(src)

    # re-import fresh and re-check the invariant
    for mod in list(sys.modules):
        if mod.startswith("olake_spark"):
            del sys.modules[mod]
    sys.path.insert(0, REPO)
    q = importlib.import_module("olake_spark.queries")
    importlib.import_module("olake_spark.queries_data_ops")
    order = q.gate_order()  # raises if still over cap or names unknown
    window = [n for n in order if n not in set(q._GATE_TAIL)]
    assert len(window) <= q.DRIVER_WINDOW_SIZE
    assert len(set(q._GATE_TAIL)) == len(q._GATE_TAIL), "duplicate tail names"
    print(f"applied; window={len(window)}/{q.DRIVER_WINDOW_SIZE}, "
          f"tail={len(q._GATE_TAIL)}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--apply", action="store_true")
    ap.add_argument("--min-green", type=int, default=2)
    ap.add_argument("--round-tag", default="round-5")
    args = ap.parse_args()

    names, ranked = propose(args.min_green)
    print("rotation candidates (name, consecutive green driver rounds):")
    for n, s in ranked[:15]:
        print(f"  {n}  ({s})")
    if not names:
        print("window within cap — nothing to rotate")
        return
    print(f"\nproposed rotation → tail: {names}")
    if args.apply:
        apply_rotation(names, args.round_tag)
    else:
        print("(dry run; pass --apply to edit olake_spark/queries.py)")


if __name__ == "__main__":
    main()
