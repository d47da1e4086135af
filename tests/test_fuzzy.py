"""Q-gram fuzzy join: planted-typo recall, df-cap path, short strings."""

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
        probes, corpus, "pid", "pname", "rid", "name",
        q=3, min_shared=2, max_dist=2,
    ).collect()
    got = {(r.pid, r.rid): r.dist for r in out}
    assert got[(10, 1)] == 1 and got[(20, 2)] == 1
    assert not any(pid == 30 for pid, _ in got)


def test_fuzzy_join_max_df_drops_hot_grams_only(spark):
    # 'aaa' appears in every corpus row -> dropped at max_df=2; the pair
    # still matches through its distinctive grams
    corpus = spark.createDataFrame(
        [(i, f"aaaa distinct{i} word") for i in range(5)],
        "rid long, name string",
    )
    probes = spark.createDataFrame(
        [(99, "aaaa distinct3 wordx")], "pid long, pname string"
    )
    out = fuzzy_join(
        probes, corpus, "pid", "pname", "rid", "name",
        q=3, min_shared=2, max_dist=2, max_df=2,
    ).collect()
    assert {(r.pid, r.rid) for r in out} == {(99, 3)}


def test_qgram_set_short_strings_empty(spark):
    df = spark.createDataFrame([("ab",), ("abc",), ("",)], "s string")
    rows = df.select(qgram_set(F.col("s")).alias("g")).collect()
    assert [r.g for r in rows] == [[], ["abc"], []]
