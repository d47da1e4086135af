"""Prefix-filtered q-gram fuzzy join: planted-typo recall (lossless
filter), hot-gram skew immunity, short strings."""

from __future__ import annotations

from olake_spark.operators.fuzzy import fuzzy_join, qgram_set
from pyspark.sql import functions as F


def test_fuzzy_join_finds_planted_typos(spark):
    corpus = spark.createDataFrame(
        [
            (1, "goldenrod lavender spring"),
            (2, "midnight cobalt turquoise"),
            (3, "salmon peach chiffon"),
        ],
        "rid long, name string",
    )
    probes = spark.createDataFrame(
        [
            (10, "goldenrod lavendr spring"),  # 1 deletion from rid 1
            (20, "midnight cobalt turqoise"),  # 1 deletion from rid 2
            (30, "completely unrelated text!"),
        ],
        "pid long, pname string",
    )
    out = fuzzy_join(
        probes, corpus, "pid", "pname", "rid", "name", q=3, max_dist=2
    ).collect()
    got = {(r.pid, r.rid): r.dist for r in out}
    assert got[(10, 1)] == 1 and got[(20, 2)] == 1
    assert not any(pid == 30 for pid, _ in got)


def test_prefix_filter_is_lossless_under_edit_mutations(spark):
    """Every string within the claimed distance MUST surface — the
    prefix-filter theorem, exercised over systematic 1- and 2-edit
    mutations of diverse corpus strings."""
    base = [
        "alpha bravo charlie",
        "delta echo foxtrot",
        "golf hotel india jazz",
        "kilo lima mike november",
    ]
    corpus = spark.createDataFrame(
        [(i, s) for i, s in enumerate(base)], "rid long, name string"
    )
    probes = []
    pid = 0
    for i, s in enumerate(base):
        probes.append((pid, i, s[1:]))  # 1 deletion
        pid += 1
        probes.append((pid, i, "x" + s[2:]))  # 1 del + 1 sub
        pid += 1
        probes.append((pid, i, s[:5] + "zz" + s[7:]))  # 2 subs
        pid += 1
    pdf = spark.createDataFrame(
        [(p, s) for p, _, s in probes], "pid long, pname string"
    )
    got = {
        (r.pid, r.rid)
        for r in fuzzy_join(
            pdf, corpus, "pid", "pname", "rid", "name", q=3, max_dist=2
        ).collect()
    }
    for p, i, _ in probes:
        assert (p, i) in got, f"lost planted mutation pid={p} of rid={i}"


def test_hot_grams_never_reach_prefix(spark):
    # a gram shared by every corpus row ('aaaa') must not blow up the
    # candidate set: prefix slots go to the rare distinct{i} grams.
    # max_dist=1 so only the true source row qualifies (at 2, cross-id
    # pairs like distinct3->distinct7 are genuine 2-edit matches)
    corpus = spark.createDataFrame(
        [(i, f"aaaa distinct{i} word") for i in range(50)],
        "rid long, name string",
    )
    probes = spark.createDataFrame(
        [(99, "aaaa distinct3 wordx")], "pid long, pname string"
    )
    out = fuzzy_join(
        probes, corpus, "pid", "pname", "rid", "name", q=3, max_dist=1
    ).collect()
    assert {(r.pid, r.rid) for r in out} == {(99, 3)}


def test_qgram_set_short_strings_empty(spark):
    df = spark.createDataFrame([("ab",), ("abc",), ("",)], "s string")
    rows = df.select(qgram_set(F.col("s")).alias("g")).collect()
    assert [r.g for r in rows] == [[], ["abc"], []]


def test_jaccard_join_exact_vs_bruteforce_and_pruning(spark):
    """jaccard_join's pairs equal a brute-force scan; the audit columns
    show the prefix filter generated fewer candidates than share-any."""
    from itertools import combinations

    from olake_spark.operators.fuzzy import jaccard_join

    sets = {
        1: ["a", "b", "c", "d"],
        2: ["a", "b", "c", "e"],          # J(1,2)=3/5=0.6
        3: ["a", "x", "y", "z"],          # J(1,3)=1/7
        4: ["b", "c", "d"],               # J(1,4)=3/4
        5: ["p", "q"],
        6: ["p", "q"],                    # J(5,6)=1
        7: [],                            # empty: no pairs
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in sets.items()], "id long, tk array<string>"
    )
    t = 0.5
    got = {
        (r.id_a, r.id_b): (r.overlap, r.jaccard)
        for r in jaccard_join(df, "id", "tk", threshold=t).collect()
    }
    expect = {}
    for a, b in combinations(sorted(k for k in sets if sets[k]), 2):
        o = len(set(sets[a]) & set(sets[b]))
        u = len(set(sets[a]) | set(sets[b]))
        if o / u >= t:
            expect[(a, b)] = o
    assert {k: v[0] for k, v in got.items()} == expect
    row = jaccard_join(df, "id", "tk", threshold=t).limit(1).collect()[0]
    assert row.n_candidates <= row.n_uncapped_candidates


def test_jaccard_join_threshold_validation(spark):
    import pytest

    from olake_spark.operators.fuzzy import jaccard_join

    df = spark.createDataFrame([(1, ["a"])], "id long, tk array<string>")
    with pytest.raises(ValueError):
        jaccard_join(df, "id", "tk", threshold=0.0)


def test_editdist1_join_lossless_vs_bruteforce(spark):
    """The deletion index must be LOSSLESS at d=1: compare against the
    brute-force O(n²) levenshtein join on a vocabulary engineered with
    substitutions, inserts, deletes, a known false-positive shape
    ("ab"/"ba" share deletion variants at true distance 2), and
    dist-0 duplicates under distinct ids."""
    from olake_spark.operators.fuzzy import editdist1_join

    words = [
        (1, "cat"), (2, "cut"), (3, "cast"), (4, "at"), (5, "cat"),
        (6, "ab"), (7, "ba"), (8, "zzz"),
    ]
    df = spark.createDataFrame(words, "id long, w string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in editdist1_join(df, "id", "w").collect()
    }
    def lev(a, b):
        import functools
        @functools.lru_cache(maxsize=None)
        def d(i, j):
            if i == 0: return j
            if j == 0: return i
            return min(d(i-1, j) + 1, d(i, j-1) + 1,
                       d(i-1, j-1) + (a[i-1] != b[j-1]))
        return d(len(a), len(b))
    exp = {
        (a_id, b_id, lev(a_w, b_w))
        for a_id, a_w in words for b_id, b_w in words
        if a_id < b_id and lev(a_w, b_w) <= 1
    }
    assert got == exp
    assert (1, 5, 0) in got          # exact duplicates, distinct ids
    assert not any(a == 6 and b == 7 for a, b, _ in got)  # "ab"/"ba" killed
