"""Entity resolution: blocking + transitive grouping + survivorship."""

from olake_spark.operators.entity import golden_records, match_pairs, resolve_entities

SCHEMA = "rid BIGINT, name STRING, addr STRING, bal DOUBLE"


def test_transitive_cluster_and_survivorship(spark):
    # A~B (d=1), A~C (d=2), B~C is d=3 -> still one entity via A
    rows = [
        (1, "acme corp", "abcdefghijkl", 10.0),
        (2, "ACME CORP", "abcdefghijk", None),   # 1 deletion
        (3, "acme", "abdefghijl", 20.0),          # 2 deletions
        (9, "other", "zzzzyyyyxxxx", 5.0),        # unrelated
    ]
    records = spark.createDataFrame(rows, SCHEMA)
    resolved = resolve_entities(records, "rid", "addr", max_dist=2)
    golden = {
        r.cluster_id: r
        for r in golden_records(
            resolved, "rid", longest_cols=["addr"], min_cols=["name"], max_cols=["bal"]
        ).collect()
    }
    assert set(golden) == {1, 9}
    g = golden[1]
    assert g.n_records == 3
    assert g.addr == "abcdefghijkl"  # most complete survives
    assert g.bal == 20.0  # NULL loses to max
    assert g.name == "ACME CORP"  # min() — uppercase sorts first in ASCII
    assert golden[9].n_records == 1 and golden[9].bal == 5.0


def test_match_pairs_demirrored_and_thresholded(spark):
    rows = [
        (1, "x", "abcdefghijkl", 0.0),
        (2, "x", "abcdefghijk", 0.0),
        (3, "x", "qqqqwwwweeee", 0.0),
    ]
    records = spark.createDataFrame(rows, SCHEMA)
    pairs = match_pairs(records, "rid", "addr", max_dist=2).collect()
    assert [(p.id_a, p.id_b, p.dist) for p in pairs] == [(1, 2, 1)]
