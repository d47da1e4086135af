"""HTML visible-text extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from olake_spark.operators.text import strip_html, with_html_text


def _strip(spark, html: str) -> str:
    df = spark.createDataFrame([(html,)], ["h"])
    return df.select(strip_html(F.col("h")).alias("t")).first()["t"]


def test_script_and_style_content_dropped(spark):
    out = _strip(
        spark,
        '<head><style>p {color: red}</style></head>'
        '<body>visible<script type="x">var hidden = 1 < 2;</script></body>',
    )
    assert out == "visible"
    assert "hidden" not in out and "color" not in out


def test_block_closers_become_lines(spark):
    out = _strip(spark, "<h1>Title</h1><p>para one</p><p>para two</p>")
    assert out == "Title\npara one\npara two"


def test_entities_decode_amp_last(spark):
    assert _strip(spark, "a &lt;b&gt; &quot;c&quot; &#39;d&#39; e&nbsp;f") == 'a <b> "c" \'d\' e f'
    # &amp;lt; is the ESCAPED text "&lt;" — must not double-decode to "<"
    assert _strip(spark, "x &amp;lt; y") == "x &lt; y"


def test_inline_tags_and_whitespace_collapse(spark):
    out = _strip(spark, "a <b>bold</b>   and <i>italic</i>\t text")
    assert out == "a bold and italic text"


def test_malformed_markup_degrades_to_whitespace(spark):
    # unclosed tag swallows to the next '>', never drops following text
    assert _strip(spark, "keep <a href='x keep2") == "keep <a href='x keep2"
    assert _strip(spark, "one<br>two<br />three") == "one\ntwo\nthree"


def test_with_html_text_column(spark):
    df = spark.createDataFrame([(1, "<p>hi</p>")], ["id", "raw"])
    out = with_html_text(df, "raw").first()
    assert out["text"] == "hi"
