import datetime as dt

from pyspark.sql import types as T

from olake_spark.typesys import (
    DataType,
    common_ancestor,
    datatype_for_value,
    fold_types,
    from_spark_type,
    reformat_column_name,
    to_spark_type,
)
from olake_spark.typesys.lattice import merge_spark_schemas

D = DataType


def test_lca_numeric_spine():
    assert common_ancestor(D.INT32, D.INT64) == D.INT64
    assert common_ancestor(D.INT64, D.FLOAT64) == D.FLOAT64
    assert common_ancestor(D.BOOL, D.INT32) == D.INT32
    assert common_ancestor(D.BOOL, D.FLOAT64) == D.FLOAT64
    assert common_ancestor(D.FLOAT32, D.INT64) == D.FLOAT64
    assert common_ancestor(D.FLOAT32, D.FLOAT64) == D.FLOAT64


def test_lca_timestamp_spine():
    assert common_ancestor(D.TIMESTAMP, D.TIMESTAMP_MICRO) == D.TIMESTAMP_MICRO
    assert common_ancestor(D.TIMESTAMP_MILLI, D.TIMESTAMP_NANO) == D.TIMESTAMP_NANO
    assert common_ancestor(D.TIMESTAMP, D.INT64) == D.STRING


def test_lca_null_and_mixed():
    assert common_ancestor(D.NULL, D.INT32) == D.INT32
    assert common_ancestor(D.OBJECT, D.OBJECT) == D.OBJECT
    assert common_ancestor(D.OBJECT, D.ARRAY) == D.STRING
    assert common_ancestor(D.STRING, D.BOOL) == D.STRING


def test_fold():
    assert fold_types({D.INT32, D.INT64, D.NULL}) == D.INT64
    assert fold_types([D.INT64, D.FLOAT64, D.STRING]) == D.STRING
    assert fold_types([]) == D.NULL


def test_value_inference():
    assert datatype_for_value(None) == D.NULL
    assert datatype_for_value(True) == D.BOOL
    assert datatype_for_value(7) == D.INT32
    assert datatype_for_value(2**40) == D.INT64
    assert datatype_for_value(1.5) == D.FLOAT64
    assert datatype_for_value("plain") == D.STRING
    # the "string that parses as datetime" inference trap
    assert datatype_for_value("2024-01-02") == D.TIMESTAMP
    assert datatype_for_value("2024-01-02T03:04:05") == D.TIMESTAMP
    assert datatype_for_value("2024-01-02 03:04:05.123") == D.TIMESTAMP_MILLI
    assert datatype_for_value("2024-01-02 03:04:05.123456") == D.TIMESTAMP_MICRO
    assert datatype_for_value("2024-01-02 03:04:05.123456789") == D.TIMESTAMP_NANO
    assert datatype_for_value({"a": 1}) == D.OBJECT
    assert datatype_for_value([1, 2]) == D.ARRAY
    assert datatype_for_value(dt.datetime(2024, 1, 1)) == D.TIMESTAMP


def test_spark_roundtrip():
    assert to_spark_type(D.INT64) == T.LongType()
    assert to_spark_type(D.TIMESTAMP_NANO) == T.TimestampType()
    assert from_spark_type(T.DecimalType(10, 2)) == D.FLOAT64
    assert from_spark_type(T.ArrayType(T.IntegerType())) == D.ARRAY


def test_merge_schemas_widens():
    a = T.StructType([T.StructField("id", T.IntegerType()), T.StructField("v", T.FloatType())])
    b = T.StructType([T.StructField("id", T.LongType()), T.StructField("w", T.StringType())])
    m = merge_spark_schemas(a, b)
    assert [f.name for f in m.fields] == ["id", "v", "w"]
    assert m["id"].dataType == T.LongType()
    assert m["v"].dataType == T.FloatType()


def test_reformat_names():
    assert reformat_column_name("My Col-Name") == "my_col_name"
    assert reformat_column_name("UserID") == "userid"
    assert reformat_column_name("a.b.c") == "a_b_c"
    assert reformat_column_name("Keep Me", use_source_names=True) == "Keep Me"
