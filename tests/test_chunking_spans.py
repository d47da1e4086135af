"""Document chunking windows and duplicate-span exposure."""

from __future__ import annotations

import pytest

from olake_spark.operators.chunking import chunk_documents
from olake_spark.operators.quality import dup_span_stats


def _toks(n):
    return " ".join(f"t{i}" for i in range(1, n + 1))


def test_chunk_windows_cover_and_overlap(spark):
    # 10 tokens, window 4, stride 3 -> starts 1,4,7 (ceil((10-4)/3)+1 = 3)
    df = spark.createDataFrame([(1, _toks(10))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, "doc_id", "text", window=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [(r.chunk_id, r.start_token, r.n_tokens) for r in rows] == [
        (0, 1, 4),
        (1, 4, 4),
        (2, 7, 4),
    ]
    assert rows[0].chunk_text == "t1 t2 t3 t4"
    assert rows[2].chunk_text == "t7 t8 t9 t10"


def test_chunk_final_partial_window(spark):
    # 9 tokens, window 4, stride 3 -> starts 1,4,7; last chunk has 3 tokens
    df = spark.createDataFrame([(1, _toks(9))], ["doc_id", "text"])
    rows = sorted(
        chunk_documents(df, "doc_id", "text", window=4, stride=3).collect(),
        key=lambda r: r.chunk_id,
    )
    assert [r.n_tokens for r in rows] == [4, 4, 3]
    assert rows[-1].chunk_text == "t7 t8 t9"


def test_chunk_short_and_empty_docs(spark):
    df = spark.createDataFrame([(1, "only three tokens"), (2, "")], ["doc_id", "text"])
    rows = chunk_documents(df, "doc_id", "text", window=8, stride=4).collect()
    by_doc = {r.doc_id: r for r in rows}
    assert len(rows) == 2  # one chunk each
    assert by_doc[1].n_tokens == 3 and by_doc[1].chunk_text == "only three tokens"
    assert by_doc[2].n_tokens == 0 and by_doc[2].chunk_text == ""


def test_chunk_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", window=0)
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", stride=-1)


def test_dup_span_fraction(spark):
    shared = "alpha beta gamma delta epsilon"  # one shared 5-gram
    rows = [
        (1, shared + " one two three"),  # grams at pos 1..4; pos-1 gram is shared
        (2, "x y " + shared),  # grams at pos 1..3; pos-3 gram is shared
        (3, "totally different words here now"),  # 1 gram, unique
        (4, "shorty"),  # < 5 tokens -> 0 grams
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in dup_span_stats(df, "doc_id", "text", k=5).collect()}
    assert out[1].n_grams == 4 and out[1].n_dup_grams == 1
    assert out[1].dup_fraction == 0.25
    assert out[2].n_grams == 3 and out[2].n_dup_grams == 1
    assert out[3].n_grams == 1 and out[3].n_dup_grams == 0
    assert out[4].n_grams == 0 and out[4].dup_fraction == 0.0


def test_dup_span_within_doc_repeat_is_not_cross_doc(spark):
    # a gram repeated INSIDE one doc only is not cross-document duplication
    df = spark.createDataFrame(
        [(1, "a b c d e a b c d e"), (2, "v w x y z")], ["doc_id", "text"]
    )
    out = {r.doc_id: r for r in dup_span_stats(df, "doc_id", "text", k=5).collect()}
    assert out[1].n_dup_grams == 0
    assert out[2].n_dup_grams == 0
