"""Triangle counting: hand graphs, hub-star (no triangles), duplicate/
reverse/self edges collapse, randomized vs brute force
(operators/graph.py triangle_count)."""

from __future__ import annotations

from itertools import combinations

from olake_spark.operators.graph import triangle_count


def _counts(spark, pairs, schema="src string, dst string"):
    df = spark.createDataFrame(pairs, schema)
    return {r.node: r.n_triangles for r in triangle_count(df).collect()}


def _brute(pairs):
    adj: dict = {}
    for u, v in pairs:
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {n: 0 for n in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            out[a] += 1
            out[b] += 1
            out[c] += 1
    return out


def test_k4_minus_edge_with_noise_edges(spark):
    pairs = [
        ("a", "b"), ("b", "c"), ("c", "a"), ("a", "d"), ("b", "d"),
        ("x", "y"),           # isolated edge
        ("b", "a"), ("a", "a")  # reverse duplicate + self loop collapse
    ]
    got = _counts(spark, pairs)
    assert got == {"a": 2, "b": 2, "c": 1, "d": 1, "x": 0, "y": 0}
    assert got == _brute(pairs) | {"x": 0, "y": 0}


def test_star_hub_has_no_triangles(spark):
    # worst-case naive wedge explosion: a degree-40 hub — orientation
    # sends every edge hub->leaf or leaf->hub consistently; zero triangles
    pairs = [("hub", f"l{i}") for i in range(40)]
    got = _counts(spark, pairs)
    assert all(v == 0 for v in got.values())


def test_numeric_ids_random_vs_brute(spark):
    import random

    rng = random.Random(63)
    pairs = list(
        {
            (min(a, b), max(a, b))
            for a, b in (
                (rng.randrange(30), rng.randrange(30)) for _ in range(140)
            )
            if a != b
        }
    )
    got = _counts(spark, [(int(a), int(b)) for a, b in pairs], "src long, dst long")
    assert got == _brute(pairs)
