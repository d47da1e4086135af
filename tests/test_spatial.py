"""Grid ε-neighbor join: losslessness vs brute force, cell-edge cases,
mega-cell cap, and the top-k-per-group WindowGroupLimit plan shape."""

from __future__ import annotations

import itertools
import math

from pyspark.sql import functions as F

from olake_spark.operators.spatial import grid_neighbor_pairs


def _brute(points: list[tuple[int, float, float]], eps: float) -> set[tuple[int, int]]:
    eu = round(eps * 1_000_000)
    q = [(i, round(x * 1_000_000), round(y * 1_000_000)) for i, x, y in points]
    out = set()
    for (i, xa, ya), (j, xb, yb) in itertools.combinations(q, 2):
        if (xa - xb) ** 2 + (ya - yb) ** 2 <= eu * eu:
            out.add((min(i, j), max(i, j)))
    return out


def test_grid_join_lossless_vs_brute_force(spark):
    # cluster + isolated points + negative coords + exact-boundary pair
    points = [
        (1, 0.00, 0.00),
        (2, 0.04, 0.00),       # within eps of 1
        (3, 0.05, 0.00),       # exactly eps from 1 (boundary inclusive)
        (4, 0.11, 0.00),       # outside eps of all of 1..3? (0.06 from 3: no)
        (5, -0.04, -0.04),     # negative quadrant, near 1
        (6, 2.00, 2.00),       # far away
        (7, -0.051, 0.0),      # just outside eps of 1
    ]
    df = spark.createDataFrame(points, "id int, x double, y double")
    got = {
        (r.id_a, r.id_b)
        for r in grid_neighbor_pairs(df, "id", "x", "y", eps=0.05).collect()
    }
    assert got == _brute(points, 0.05)
    assert (1, 3) in got       # boundary distance == eps is IN
    assert (1, 7) not in got   # just outside


def test_grid_join_cross_cell_pair_found_once(spark):
    # two points in adjacent cells, within eps — must appear exactly once
    df = spark.createDataFrame(
        [(1, 0.049, 0.0), (2, 0.051, 0.0)], "id int, x double, y double"
    )
    rows = grid_neighbor_pairs(df, "id", "x", "y", eps=0.05).collect()
    assert len(rows) == 1
    assert (rows[0].id_a, rows[0].id_b) == (1, 2)
    assert rows[0].dist2_micros == 2_000 * 2_000


def test_grid_join_max_cell_size_caps_loudly(spark):
    # 10 coincident points → C(10,2)=45 pairs; cap at 5 drops the cell
    rows = [(i, 0.0, 0.0) for i in range(10)] + [(90, 1.0, 1.0), (91, 1.003, 1.0)]
    df = spark.createDataFrame(rows, "id int, x double, y double")
    out = grid_neighbor_pairs(df, "id", "x", "y", eps=0.05, max_cell_size=5).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(90, 91)}


def test_grid_join_plan_is_equi_join(spark):
    df = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.01, 0.0)], "id int, x double, y double"
    )
    plan = (
        grid_neighbor_pairs(df, "id", "x", "y", eps=0.05)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_topk_per_group_compiles_to_window_group_limit(spark, sf_dir):
    from olake_spark.queries import QUERIES

    plan = (
        QUERIES["orders_topk_per_customer"](spark, sf_dir)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # Spark 4 rewrites rank<=k into WindowGroupLimit with a map-side
    # Partial mode — the shuffle carries at most k rows per key
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan
