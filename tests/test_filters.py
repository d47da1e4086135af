import pytest

from olake_spark.plans.filters import FilterCondition, StreamFilter, parse_legacy_filter


def test_parse_single():
    f = parse_legacy_filter("age > 30")
    assert f.conditions == (FilterCondition("age", ">", 30),)


def test_parse_two_or_with_quotes():
    f = parse_legacy_filter("event_type = 'click' or value >= 400.0")
    assert f.logical == "or"
    assert f.conditions[0] == FilterCondition("event_type", "=", "click")
    assert f.conditions[1] == FilterCondition("value", ">=", 400.0)


def test_parse_quoted_column_and_null():
    f = parse_legacy_filter('"my col" != null and x <= -2')
    assert f.conditions[0] == FilterCondition("my col", "!=", None)
    assert f.conditions[1] == FilterCondition("x", "<=", -2)
    assert f.to_sql() == "my col IS NOT NULL AND x <= -2"


def test_parse_empty_and_bad():
    assert parse_legacy_filter("") == StreamFilter()
    with pytest.raises(ValueError):
        parse_legacy_filter("a ~ b")
    with pytest.raises(ValueError):
        StreamFilter(
            (
                FilterCondition("a", "=", 1),
                FilterCondition("b", "=", 1),
                FilterCondition("c", "=", 1),
            )
        )


def test_sql_rendering():
    f = StreamFilter(
        (FilterCondition("s", "=", "o'brien"), FilterCondition("b", "!=", True)), "and"
    )
    assert f.to_sql() == "s = 'o''brien' AND b <> TRUE"


def test_bool_and_null_coercion():
    f = parse_legacy_filter("active = true and deleted = null")
    assert f.conditions[0].value is True
    assert f.conditions[1].value is None
    assert f.conditions[1].to_sql() == "deleted IS NULL"
