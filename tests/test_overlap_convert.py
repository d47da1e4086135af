"""Round-8 batch: audience overlap matrix + time-to-convert histogram."""

from __future__ import annotations

import datetime as dt

from olake_spark.operators.overlap import set_overlap_matrix
from olake_spark.operators.sessions import conversion_delay_histogram


def test_set_overlap_exact_jaccard(spark):
    rows = [
        ("A", "u1"), ("A", "u2"), ("A", "u3"),
        ("B", "u2"), ("B", "u3"), ("B", "u4"),
        ("C", "u9"),
        ("A", "u2"),  # duplicate membership must not inflate counts
    ]
    df = spark.createDataFrame(rows, "g string, m string")
    out = {(r.group_a, r.group_b): r for r in set_overlap_matrix(df, "g", "m").collect()}
    ab = out[("A", "B")]
    assert (ab.n_a, ab.n_b, ab.n_inter) == (3, 3, 2)
    assert ab.jaccard == 0.5  # 2 / (3 + 3 - 2)
    # disjoint pairs below min_inter emit nothing
    assert ("A", "C") not in out and ("B", "C") not in out


def test_set_overlap_min_inter_prunes(spark):
    rows = [("A", "u1"), ("A", "u2"), ("B", "u1"), ("B", "u2"), ("C", "u1")]
    df = spark.createDataFrame(rows, "g string, m string")
    out = set_overlap_matrix(df, "g", "m", min_inter=2).collect()
    assert {(r.group_a, r.group_b) for r in out} == {("A", "B")}


def _events(spark, rows):
    t0 = dt.datetime(2024, 1, 1)
    data = [(u, t, t0 + dt.timedelta(hours=h)) for u, t, h in rows]
    return spark.createDataFrame(data, "u string, et string, ts timestamp")


def test_conversion_delay_semantics(spark):
    df = _events(
        spark,
        [
            # u1: first view h0, purchases at h2 and h5 -> delay 2h (bucket 2)
            ("u1", "view", 0), ("u1", "purchase", 2), ("u1", "purchase", 5),
            # u2: purchase BEFORE any view -> only the later one counts (1h)
            ("u2", "purchase", 0), ("u2", "view", 3), ("u2", "purchase", 4),
            # u3: view but never purchases -> no row
            ("u3", "view", 1),
            # u4: purchase only, never views -> no row
            ("u4", "purchase", 2),
            # u5: converts in the same instant -> bucket 0
            ("u5", "view", 6), ("u5", "purchase", 6),
        ],
    )
    out = {
        r.delay_bucket: r.n_users
        for r in conversion_delay_histogram(
            df, "ts", "u", "et", "view", "purchase", bucket="1 hour"
        ).collect()
    }
    assert out == {2: 1, 1: 1, 0: 1}


def test_conversion_delay_partition_invariant(spark):
    rows = []
    for i in range(30):
        rows.append((f"u{i}", "view", i))
        rows.append((f"u{i}", "purchase", i + (i % 5)))
    df = _events(spark, rows)
    a = conversion_delay_histogram(df, "ts", "u", "et", "view", "purchase").collect()
    b = conversion_delay_histogram(
        df.repartition(11), "ts", "u", "et", "view", "purchase"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert sum(r.n_users for r in a) == 30
