"""Unit tests for URL/domain curation and BM25 scoring operators."""

from __future__ import annotations

import math

import pytest

from olake_spark.operators.bm25 import bm25_scores
from olake_spark.operators.urls import domain_stats, extract_urls, filter_blocked_domains


@pytest.fixture(scope="module")
def url_docs(spark):
    rows = [
        (0, "intro https://a.example.com/x then http://b.example.org/y"),
        (1, "again https://a.example.com/z trailing"),
        (2, "no links here"),
        (3, "spam https://evil.bad.site/p and https://sub.bad.site:8080/q"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_extract_urls(url_docs):
    got = {r["doc_id"]: r["urls"] for r in extract_urls(url_docs).collect()}
    assert got[0] == ["https://a.example.com/x", "http://b.example.org/y"]
    assert got[2] == []


def test_domain_stats(url_docs):
    got = {r["domain"]: (r["n_urls"], r["n_docs"]) for r in domain_stats(url_docs).collect()}
    assert got["a.example.com"] == (2, 2)
    assert got["b.example.org"] == (1, 1)
    # port is not part of the domain
    assert got["sub.bad.site"] == (1, 1)


def test_filter_blocked_drop_and_flag(url_docs):
    kept = filter_blocked_domains(url_docs, ["bad.site"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [0, 1, 2]
    flagged = {r["doc_id"]: r["blocked"]
               for r in filter_blocked_domains(url_docs, ["bad.site"], mode="flag").collect()}
    assert flagged == {0: 0, 1: 0, 2: 0, 3: 1}
    # subdomain of a blocked domain is blocked; unrelated suffix is not
    kept2 = filter_blocked_domains(url_docs, ["example.com"])
    assert sorted(r["doc_id"] for r in kept2.collect()) == [2, 3]


def test_filter_blocked_empty_list(url_docs):
    assert filter_blocked_domains(url_docs, []).count() == 4
    flagged = filter_blocked_domains(url_docs, [], mode="flag")
    assert flagged.filter("blocked = 1").count() == 0


def test_bm25_matches_reference_formula(spark):
    rows = [
        (0, "spark spark join"),
        (1, "spark filter filter filter"),
        (2, "other words entirely present"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bm25_scores(df, ["spark", "join"]).collect()}

    def ref_score(tf, df_t, n, dl, avgdl, k1=1.2, b=0.75):
        idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    n, avgdl = 3.0, (3 + 4 + 4) / 3
    want0 = ref_score(2, 2, n, 3, avgdl) + ref_score(1, 1, n, 3, avgdl)
    assert out[0]["bm25"] == pytest.approx(want0, rel=1e-12)
    assert out[2]["bm25"] == 0.0
    assert out[0]["tf_spark"] == 2 and out[0]["tf_join"] == 1 and out[0]["dl"] == 3


def test_bm25_topk_ordering(spark):
    rows = [(i, "spark " * (i + 1)) for i in range(5)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    top = bm25_scores(df, ["spark"], top_k=2).collect()
    # more mentions but same saturation curve: higher tf wins
    assert [r["doc_id"] for r in top] == [4, 3]
