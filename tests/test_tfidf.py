"""TF-IDF top terms and vocabulary coverage."""

from __future__ import annotations

import math

import pytest

from olake_spark.operators.tfidf import doc_terms, tfidf_top_terms, vocab_coverage


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark spark shuffle join"),
        (2, "spark join filter"),
        (3, "parquet footer parquet"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_doc_terms_counts(spark, corpus):
    got = {(r.doc_id, r.term): r.tf for r in doc_terms(corpus, "doc_id", "text").collect()}
    assert got[(1, "spark")] == 2
    assert got[(3, "parquet")] == 2
    assert got[(2, "filter")] == 1


def test_tfidf_ranks_distinctive_terms_first(spark, corpus):
    out = tfidf_top_terms(corpus, "doc_id", "text", top_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: unique "shuffle" (ln 3 ~ 1.10) outranks repeated-but-shared
    # "spark" (2 ln 1.5 ~ 0.81)
    top1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert [r.term for r in top1] == ["shuffle", "spark"]
    assert top1[0].tfidf == round(math.log(3 / 1), 6)
    assert top1[1].tfidf == round(2 * math.log(3 / 2), 6)
    # doc 3: "parquet" tf=2 df=1 -> strongest score in the corpus
    top3 = sorted(by_doc[3], key=lambda r: r.rank)
    assert top3[0].term == "parquet"
    assert top3[0].tfidf == round(2 * math.log(3 / 1), 6)
    # every doc emits at most top_n rows with ranks 1..n
    for rows in by_doc.values():
        assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
        assert len(rows) <= 2


def test_tfidf_zero_for_ubiquitous_term(spark):
    df = spark.createDataFrame([(1, "common a"), (2, "common b")], ["doc_id", "text"])
    out = {
        (r.doc_id, r.term): r.tfidf
        for r in tfidf_top_terms(df, "doc_id", "text", top_n=5).collect()
    }
    assert out[(1, "common")] == 0.0  # ln(N/df) = ln(1)


def test_vocab_coverage_monotone_and_complete(spark, corpus):
    rows = sorted(vocab_coverage(corpus, "text", top_k=100).collect(), key=lambda r: r.rank)
    assert rows[0].term == "spark" and rows[0].n_occurrences == 3
    covs = [r.coverage for r in rows]
    assert covs == sorted(covs)  # cumulative
    assert covs[-1] == 1.0  # k >= vocab covers everything
    # rank ties on count break by term ascending
    counts = [(r.n_occurrences, r.term) for r in rows]
    assert counts == sorted(counts, key=lambda t: (-t[0], t[1]))


def test_vocab_coverage_limits_to_top_k(spark, corpus):
    assert vocab_coverage(corpus, "text", top_k=2).count() == 2
