"""Deterministic sampling + PII operators."""

from __future__ import annotations

import pytest

from olake_spark.operators.pii import PII_PATTERNS, pii_counts, redact_pii
from olake_spark.operators.sampling import (
    hash_sample,
    reservoir_per_group,
    split_train_test,
    stratified_sample,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, "lang%d" % (i % 3), f"text {i}") for i in range(600)]
    return spark.createDataFrame(rows, "id long, lang string, text string")


def test_hash_sample_stable_and_proportional(docs):
    s1 = hash_sample(docs, "id", 0.3)
    s2 = hash_sample(docs, "id", 0.3)
    ids1 = {r["id"] for r in s1.collect()}
    assert ids1 == {r["id"] for r in s2.collect()}  # re-run stable
    assert 0.2 < len(ids1) / 600 < 0.4  # roughly proportional
    # repartitioning must not change the decision (seeded sample() fails this)
    ids3 = {r["id"] for r in hash_sample(docs.repartition(7), "id", 0.3).collect()}
    assert ids3 == ids1
    # nested fractions: the 10% sample is a subset of the 30% sample
    ids10 = {r["id"] for r in hash_sample(docs, "id", 0.1).collect()}
    assert ids10 < ids1
    with pytest.raises(ValueError):
        hash_sample(docs, "id", 1.5)


def test_stratified_fractions(docs):
    out = stratified_sample(docs, "id", "lang", {"lang0": 1.0, "lang1": 0.0})
    rows = out.collect()
    langs = {r["lang"] for r in rows}
    assert langs == {"lang0"}  # lang1 zeroed, lang2 default 0
    assert len(rows) == 200  # fraction 1.0 keeps every lang0 row


def test_reservoir_exact_k(docs):
    out = reservoir_per_group(docs, ["lang"], "id", k=5)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").count().withColumnRenamed("count", "n").collect()}
    assert per == {"lang0": 5, "lang1": 5, "lang2": 5}
    # small group: min(k, |group|)
    tiny = docs.filter("id < 4")
    assert reservoir_per_group(tiny, ["lang"], "id", k=5).count() == 4


def test_split_train_test_partitions(docs):
    out = split_train_test(docs, "id", 0.2)
    assert out.count() == 600  # split labels, never drops
    frac = out.filter("split = 'test'").count() / 600
    assert 0.1 < frac < 0.3


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b+c@ex-corp.io and 10.1.2.3 then 123-45-6789 call 555-123-4567"),
            (2, "nothing here"),
            (3, "two mails x@y.co z@w.org"),
        ],
        "id long, text string",
    )
    counted = pii_counts(df, "text").orderBy("id").collect()
    assert (counted[0]["n_email"], counted[0]["n_ipv4"], counted[0]["n_ssn"], counted[0]["n_phone"]) == (1, 1, 1, 1)
    assert counted[1]["n_email"] == 0 and counted[1]["n_phone"] == 0
    assert counted[2]["n_email"] == 2
    red = {r["id"]: r["text"] for r in redact_pii(df, "text").collect()}
    assert red[1] == "mail [EMAIL] and [IPV4] then [SSN] call [PHONE]"
    assert red[2] == "nothing here"
    assert red[3] == "two mails [EMAIL] [EMAIL]"
    assert set(PII_PATTERNS) == {"email", "ipv4", "ssn", "phone"}


def test_fingerprint_split_keeps_duplicates_together(spark):
    from olake_spark.operators.sampling import split_by_fingerprint

    rows = [(i, f"doc body {i % 7}  extra") for i in range(100)]  # 7 contents × ~14 dups
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = split_by_fingerprint(df, "text", 0.5).collect()
    by_content = {}
    for r in out:
        by_content.setdefault(r["text"], set()).add(r["split"])
    # every duplicated content lands entirely on one side
    assert all(len(sides) == 1 for sides in by_content.values())
    # whitespace normalization: differing spacing = same fingerprint
    df2 = spark.createDataFrame(
        [(1, "hello   world"), (2, " hello world ")], ["doc_id", "text"]
    )
    s = {r["doc_id"]: r["split"] for r in split_by_fingerprint(df2, "text", 0.5).collect()}
    assert s[1] == s[2]


def test_mixture_by_tokens_respects_token_budgets(spark):
    from pyspark.sql import functions as F

    from olake_spark.operators.sampling import mixture_by_tokens

    # stratum "long" has 10x the tokens per doc of "short"; equal token
    # weights must therefore keep ~10x fewer long docs than a row-count mix
    rows = [(i, "long", "tok " * 100) for i in range(200)] + [
        (i + 1000, "short", "tok") for i in range(200)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = mixture_by_tokens(df, "doc_id", "lang", "text", {"long": 0.5, "short": 0.5})
    kept = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # short is the binding stratum (fewest tokens/weight): kept in full
    assert kept.get("short", 0) == 200
    # long keeps ~1/100 of its docs to match short's token mass (200 tokens)
    assert 0 < kept.get("long", 0) <= 12
    # determinism: rerun identical
    again = mixture_by_tokens(df, "doc_id", "lang", "text", {"long": 0.5, "short": 0.5})
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
