"""Integer PageRank: hand-computed ranks, determinism, checkpoint path."""

from __future__ import annotations

from olake_spark.operators.graph import pagerank


def _edges(spark):
    # cycle a->b->c->a plus d->a; all out-degrees 1
    return spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("d", "a")], "src string, dst string"
    )


def test_pagerank_one_round_hand_computed(spark):
    r = {x.node: x.pr for x in pagerank(_edges(spark), iters=1).collect()}
    base = (15 * (10**12 // 4)) // 100  # 37_500_000_000
    r0 = 10**12 // 4
    assert r["d"] == base  # no in-edges
    assert r["b"] == base + (85 * r0) // 100
    assert r["c"] == base + (85 * r0) // 100
    assert r["a"] == base + (85 * 2 * r0) // 100  # fed by c and d
    assert r["a"] > r["b"] == r["c"] > r["d"]


def test_pagerank_deterministic_and_checkpoint_equal(spark):
    e = _edges(spark)
    a = sorted(map(tuple, pagerank(e, iters=3).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(5), iters=3).collect()))
    c = sorted(
        map(tuple, pagerank(e, iters=3, checkpoint_every=2).collect())
    )
    # 0 = never checkpoint (the pre-r11 reading) — must return, not raise
    d = sorted(
        map(tuple, pagerank(e, iters=2, checkpoint_every=0).collect())
    )
    assert a == b == c
    assert d == sorted(map(tuple, pagerank(e, iters=2).collect()))


def test_pagerank_duplicate_edges_collapse(spark):
    e = _edges(spark)
    doubled = e.union(e)
    a = sorted(map(tuple, pagerank(e, iters=2).collect()))
    b = sorted(map(tuple, pagerank(doubled, iters=2).collect()))
    assert a == b


def test_personalized_pagerank_mass_concentrates_near_seeds(spark):
    from olake_spark.operators.graph import personalized_pagerank

    # two disconnected stars: seed star (a -> b, c) and far star (x -> y, z)
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("x", "y"), ("x", "z")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("a",)], "node string")
    pr = {r.node: r.ppr for r in personalized_pagerank(edges, seeds, iters=3).collect()}
    # the far component never receives mass
    assert pr["x"] == pr["y"] == pr["z"] == 0
    assert pr["a"] > 0 and pr["b"] > 0 and pr["b"] == pr["c"]
    # partition invariance (exact integers)
    pr2 = {
        r.node: r.ppr
        for r in personalized_pagerank(
            edges.repartition(5), seeds, iters=3
        ).collect()
    }
    assert pr == pr2


def test_pagerank_driver_path_equals_dataflow(spark):
    # the hybrid's two executions must be bit-identical (exact integers):
    # random directed graph with string ids, duplicates, self-referential
    # hubs and dangling nodes
    import random

    rng = random.Random(7)
    rows = [
        (f"n{rng.randrange(60)}", f"n{rng.randrange(60)}")
        for _ in range(400)
    ]
    e = spark.createDataFrame(rows, "src string, dst string")
    fast = sorted(map(tuple, pagerank(e, iters=3).collect()))
    slow = sorted(
        map(tuple, pagerank(e, iters=3, driver_collect_max=0).collect())
    )
    assert fast == slow


def test_personalized_pagerank_driver_path_equals_dataflow(spark):
    import random

    from olake_spark.operators.graph import personalized_pagerank

    rng = random.Random(11)
    rows = [
        (f"n{rng.randrange(40)}", f"n{rng.randrange(40)}")
        for _ in range(250)
    ]
    e = spark.createDataFrame(rows, "src string, dst string")
    # seeds include an id absent from the graph: it still dilutes the
    # per-seed mass (count) while receiving none, on both paths
    seeds = spark.createDataFrame(
        [("n1",), ("n2",), ("absent",)], "node string"
    )
    fast = sorted(
        map(tuple, personalized_pagerank(e, seeds, iters=3).collect())
    )
    slow = sorted(
        map(
            tuple,
            personalized_pagerank(
                e, seeds, iters=3, driver_collect_max=0
            ).collect(),
        )
    )
    assert fast == slow


def test_pagerank_driver_path_fuzz(spark):
    # fuzz the Pregel mirror: dense hubs, self-loops-only nodes, long
    # chains, duplicate edges at several densities
    import random

    for seed in range(3):
        rng = random.Random(70 + seed)
        n = 30 + 20 * seed
        rows = [("h", f"n{i}") for i in range(n)]  # hub fan-out
        rows += [
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}")
            for _ in range(300)
        ]
        rows += [(f"c{i}", f"c{i+1}") for i in range(15)]  # chain
        e = spark.createDataFrame(rows, "src string, dst string")
        fast = sorted(map(tuple, pagerank(e, iters=4).collect()))
        slow = sorted(
            map(tuple, pagerank(e, iters=4, driver_collect_max=0).collect())
        )
        assert fast == slow, seed


def test_median_mad_bpe_fuzz_seeds(spark):
    # a couple more seeds through the median_mad and bpe mirrors
    import random

    from olake_spark.operators.bpe import bpe_train_merges
    from olake_spark.operators.quantiles import median_mad

    rng = random.Random(99)
    rows = [
        (rng.choice(["a", "b"]), round(rng.gauss(50, 200), 2))
        for _ in range(1200)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    assert sorted(
        map(tuple, median_mad(df, ["g"], "v", report_k=2.5).collect())
    ) == sorted(
        map(
            tuple,
            median_mad(
                df, ["g"], "v", report_k=2.5, driver_collect_max=0
            ).collect(),
        )
    )
    texts = [
        (i, " ".join(rng.choice(["aa", "aaa", "abab", "x,y", "zz zz"]) for _ in range(12)))
        for i in range(40)
    ]
    tdf = spark.createDataFrame(texts, "doc_id int, text string")
    assert [
        tuple(r) for r in bpe_train_merges(tdf, n_merges=4).collect()
    ] == [
        tuple(r)
        for r in bpe_train_merges(tdf, n_merges=4, driver_collect_max=0).collect()
    ]
