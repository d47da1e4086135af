"""Round-8 batch: mutual information, clustering coefficient, new-vs-returning."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from olake_spark.operators.audit import mutual_information
from olake_spark.operators.graph import clustering_coefficient
from olake_spark.operators.timeseries import new_vs_returning


def test_mutual_information_independent_is_zero(spark):
    # perfectly independent 2x2 grid: MI = 0, NMI = 0
    rows = [(x, y) for x in "ab" for y in "cd" for _ in range(25)]
    df = spark.createDataFrame(rows, "x string, y string")
    out = mutual_information(df, "x", "y").first()
    assert out.n == 100 and out.n_cells == 4
    assert out.mi == 0.0
    assert out.h_x == pytest.approx(math.log(2), abs=1e-6)
    assert out.nmi == 0.0


def test_mutual_information_deterministic_function(spark):
    # y is a function of x -> MI = H(x) = H(y), NMI = 1
    rows = [("a", "c")] * 30 + [("b", "d")] * 70
    df = spark.createDataFrame(rows, "x string, y string")
    out = mutual_information(df, "x", "y").first()
    h = -(0.3 * math.log(0.3) + 0.7 * math.log(0.7))
    assert out.mi == pytest.approx(h, abs=1e-6)
    assert out.nmi == pytest.approx(1.0, abs=1e-6)


def test_mutual_information_matches_direct(spark):
    counts = {("a", "c"): 10, ("a", "d"): 5, ("b", "c"): 3, ("b", "d") : 12}
    rows = [k for k, v in counts.items() for _ in range(v)]
    df = spark.createDataFrame(rows, "x string, y string")
    n = sum(counts.values())
    cx = {"a": 15, "b": 15}
    cy = {"c": 13, "d": 17}
    mi = sum(
        (c / n) * math.log(c * n / (cx[x] * cy[y]))
        for (x, y), c in counts.items()
    )
    out = mutual_information(df, "x", "y").first()
    assert out.mi == pytest.approx(mi, abs=1e-6)


def test_clustering_coefficient_triangle_plus_tail(spark):
    # triangle 1-2-3 with a pendant 4 hanging off node 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (1, 4)], "src long, dst long"
    )
    out = {r.node: r for r in clustering_coefficient(edges).collect()}
    assert out[2].cc == 1.0 and out[3].cc == 1.0
    # node 1: degree 3, one closed wedge of three -> 2*1/(3*2) = 1/3
    assert out[1].degree == 3 and out[1].cc == pytest.approx(1 / 3, abs=1e-6)
    # pendant: degree 1 -> cc is NULL, never 0/0
    assert out[4].degree == 1 and out[4].cc is None


def test_clustering_coefficient_clique_all_ones(spark):
    nodes = range(1, 6)
    edges = spark.createDataFrame(
        [(a, b) for a in nodes for b in nodes if a < b], "src long, dst long"
    )
    rows = clustering_coefficient(edges).collect()
    assert all(r.cc == 1.0 and r.n_triangles == 6 for r in rows)


def test_new_vs_returning_census(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("u1", 0), ("u1", 0),  # same-day repeats dedup
        ("u2", 0),
        ("u1", 1), ("u3", 1),
        ("u2", 2), ("u3", 2), ("u4", 2),
    ]
    df = spark.createDataFrame(
        [(u, t0 + dt.timedelta(days=d)) for u, d in rows],
        "u string, ts timestamp",
    )
    out = {
        r.bucket - 19723: (r.n_active, r.n_new, r.n_returning)
        for r in new_vs_returning(df, "ts", "u").collect()
    }
    assert out == {0: (2, 2, 0), 1: (2, 1, 1), 2: (3, 1, 2)}
    # invariant: active = new + returning, every bucket
    assert all(a == nw + rt for a, nw, rt in out.values())
