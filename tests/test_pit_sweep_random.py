"""Randomized brute-force parity for the round-6 temporal operators.

Each test replays a handful of seeded random instances (deterministic —
no wall-clock, no flaky reruns) against a pure-Python reference:

- point_in_time_join vs "scan every version interval per fact" —
  exercises delete gaps, re-creates, same-LSN bursts, facts before the
  first version;
- sweepline_concurrency vs a dict-accumulate running sum — exercises
  duplicate boundaries, net-zero instants, bucket-edge crossings.
"""

from __future__ import annotations

import random

from olake_spark.operators.scd import point_in_time_join, scd2_history
from olake_spark.operators.timeseries import sweepline_concurrency

OPS = ["c", "u", "u", "u", "d"]  # delete probability 1/5


def _random_changelog(rng: random.Random, n_keys: int, n_events: int):
    rows = []
    for eid in range(n_events):
        rows.append((
            rng.randrange(n_keys),                  # key
            rng.randrange(50),                      # lsn (dense → bursts)
            eid,                                    # unique tie-break
            rng.choice(OPS),
            rng.randrange(5),                       # tracked value (collapses)
        ))
    return rows


def _pit_reference(changelog, facts):
    """Per key: ordered version chain with collapse-unchanged + delete
    semantics, then interval scan per fact."""
    bykey: dict[int, list] = {}
    for k, lsn, eid, op, v in sorted(changelog, key=lambda r: (r[1], r[2])):
        bykey.setdefault(k, []).append((lsn, eid, op, v))
    intervals: dict[int, list] = {}
    for k, evs in bykey.items():
        kept = []
        prev = None  # (op, v)
        for lsn, eid, op, v in evs:
            if prev is None or op == "d" or prev[0] == "d" or prev[1] != v:
                kept.append((lsn, eid, op, v))
                prev = (op, v)
            else:
                prev = (op, v)
        ivs = []
        for i, (lsn, eid, op, v) in enumerate(kept):
            nxt = kept[i + 1][0] if i + 1 < len(kept) else None
            if op != "d":
                ivs.append((lsn, nxt, v))
        intervals[k] = ivs
    out = {}
    for k, t, fid in facts:
        match = None
        for lo, hi, v in intervals.get(k, []):
            if lo <= t and (hi is None or t < hi):
                match = v
                break
        out[fid] = match
    return out


def test_pit_join_matches_bruteforce_random(spark):
    for seed in (7, 23, 91):
        rng = random.Random(seed)
        changelog = _random_changelog(rng, n_keys=6, n_events=80)
        facts = [
            (rng.randrange(6), rng.randrange(55), fid) for fid in range(60)
        ]
        ch = spark.createDataFrame(
            changelog, "k int, lsn long, eid int, _op_type string, v int"
        )
        dim = scd2_history(ch, ["k"], ["v"], ["lsn", "eid"])
        fdf = spark.createDataFrame(facts, "k int, t long, fid int")
        got = {
            r.fid: (r.v if r.matched else None)
            for r in point_in_time_join(
                fdf, dim, keys=["k"], fact_time="t", tracked=["v"]
            ).collect()
        }
        want = _pit_reference(changelog, facts)
        assert got == want, f"seed {seed}: {dict(set(got.items()) ^ set(want.items()))}"


def test_sweepline_matches_bruteforce_random(spark):
    for seed in (3, 17):
        rng = random.Random(seed)
        ivs = []
        for _ in range(120):
            s = rng.randrange(1000)
            ivs.append((s, s + rng.randrange(300)))
        df = spark.createDataFrame(ivs, "s long, e long")
        got = {
            r.ts_us: r.concurrency
            for r in sweepline_concurrency(df, "s", "e", bucket_us=100).collect()
        }
        deltas: dict[int, int] = {}
        for s, e in ivs:
            deltas[s] = deltas.get(s, 0) + 1
            deltas[e + 1] = deltas.get(e + 1, 0) - 1
        run, want = 0, {}
        for t in sorted(deltas):
            run += deltas[t]
            want[t] = run
        assert got == want, f"seed {seed}"
