"""The 14-type widening lattice with LCA conflict resolution.

Reimplements, from public behavioral description, the reference's dynamic
schema model: a column observed with several runtime types folds to a single
type via lowest-common-ancestor walk over a fixed "typecast tree" rooted at
String (reference: types/type_schema.go:246-322, weights types/data_types.go:41-52).

Tree shape::

    string
    ├── number (float64)
    │   ├── integer (int64)
    │   │   └── integer_small (int32)
    │   │       └── boolean
    │   └── number_small (float32)
    ├── timestamp_nano
    │   └── timestamp_micro
    │       └── timestamp_milli
    │           └── timestamp
    ├── object   (flattens to JSON string at the sink)
    ├── array    (flattens to JSON string at the sink)
    └── unknown

``null`` is the bottom element: it merges away against anything.

Widening examples: int32+int64→int64, int64+float64→float64,
bool+int32→int32, timestamp+timestamp_micro→timestamp_micro,
int64+timestamp→string, object+object→object, object+array→string.
"""

from __future__ import annotations

import datetime as _dt
import enum
import re

from pyspark.sql import types as T

__all__ = [
    "DataType",
    "common_ancestor",
    "fold_types",
    "to_spark_type",
    "from_spark_type",
    "datatype_for_value",
    "merge_spark_schemas",
]


class DataType(str, enum.Enum):
    NULL = "null"
    INT32 = "integer_small"
    INT64 = "integer"
    FLOAT32 = "number_small"
    FLOAT64 = "number"
    STRING = "string"
    BOOL = "boolean"
    OBJECT = "object"
    ARRAY = "array"
    UNKNOWN = "unknown"
    TIMESTAMP = "timestamp"
    TIMESTAMP_MILLI = "timestamp_milli"
    TIMESTAMP_MICRO = "timestamp_micro"
    TIMESTAMP_NANO = "timestamp_nano"


# child -> parent edges of the typecast tree (root = STRING, parent None)
_PARENT: dict[DataType, DataType | None] = {
    DataType.STRING: None,
    DataType.FLOAT64: DataType.STRING,
    DataType.INT64: DataType.FLOAT64,
    DataType.INT32: DataType.INT64,
    DataType.BOOL: DataType.INT32,
    DataType.FLOAT32: DataType.FLOAT64,
    DataType.TIMESTAMP_NANO: DataType.STRING,
    DataType.TIMESTAMP_MICRO: DataType.TIMESTAMP_NANO,
    DataType.TIMESTAMP_MILLI: DataType.TIMESTAMP_MICRO,
    DataType.TIMESTAMP: DataType.TIMESTAMP_MILLI,
    DataType.OBJECT: DataType.STRING,
    DataType.ARRAY: DataType.STRING,
    DataType.UNKNOWN: DataType.STRING,
}


def _ancestors(t: DataType) -> list[DataType]:
    """Path from t (inclusive) to the root."""
    path = [t]
    while (p := _PARENT[path[-1]]) is not None:
        path.append(p)
    return path


def common_ancestor(a: DataType, b: DataType) -> DataType:
    """Lowest common ancestor of two types in the typecast tree.

    ``null`` is identity; identical types map to themselves.
    """
    if a == b:
        return a
    if a == DataType.NULL:
        return b
    if b == DataType.NULL:
        return a
    anc_a = _ancestors(a)
    anc_b = set(_ancestors(b))
    for t in anc_a:  # walk up from the deeper node; first hit is the LCA
        if t in anc_b:
            return t
    return DataType.STRING


def fold_types(types: set[DataType] | list[DataType]) -> DataType:
    """Fold an observed type-set to one destination type (Property.DataType())."""
    out = DataType.NULL
    for t in types:
        out = common_ancestor(out, t)
    return out


# ---------------------------------------------------------------------------
# Spark mapping
# ---------------------------------------------------------------------------

_TO_SPARK: dict[DataType, T.DataType] = {
    DataType.NULL: T.StringType(),
    DataType.INT32: T.IntegerType(),
    DataType.INT64: T.LongType(),
    DataType.FLOAT32: T.FloatType(),
    DataType.FLOAT64: T.DoubleType(),
    DataType.STRING: T.StringType(),
    DataType.BOOL: T.BooleanType(),
    # nested values are flattened to JSON strings at the sink (reference
    # behavior: utils/typeutils/flatten.go — any non-scalar → json string)
    DataType.OBJECT: T.StringType(),
    DataType.ARRAY: T.StringType(),
    DataType.UNKNOWN: T.StringType(),
    # all four precisions collapse to one Spark timestamp type, mirroring the
    # reference collapsing them to iceberg timestamptz (types/data_types.go:116-133)
    DataType.TIMESTAMP: T.TimestampType(),
    DataType.TIMESTAMP_MILLI: T.TimestampType(),
    DataType.TIMESTAMP_MICRO: T.TimestampType(),
    DataType.TIMESTAMP_NANO: T.TimestampType(),
}


def to_spark_type(t: DataType) -> T.DataType:
    return _TO_SPARK[t]


def from_spark_type(t: T.DataType) -> DataType:
    """Spark type → engine type (used when reading source schemas)."""
    if isinstance(t, T.BooleanType):
        return DataType.BOOL
    if isinstance(t, (T.ByteType, T.ShortType, T.IntegerType)):
        return DataType.INT32
    if isinstance(t, T.LongType):
        return DataType.INT64
    if isinstance(t, T.FloatType):
        return DataType.FLOAT32
    if isinstance(t, (T.DoubleType, T.DecimalType)):
        # decimals are lossy-by-design → float64 (reference
        # drivers/*/datatype_conversion: decimal/numeric → Float64)
        return DataType.FLOAT64
    if isinstance(t, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return DataType.TIMESTAMP_MICRO
    if isinstance(t, T.StructType) or isinstance(t, T.MapType):
        return DataType.OBJECT
    if isinstance(t, T.ArrayType):
        return DataType.ARRAY
    if isinstance(t, T.StringType):
        return DataType.STRING
    if isinstance(t, T.NullType):
        return DataType.NULL
    return DataType.UNKNOWN


# ---------------------------------------------------------------------------
# Runtime value → DataType (sample-based inference for JSON/Mongo/Kafka shapes)
# ---------------------------------------------------------------------------

_INT32_MIN, _INT32_MAX = -(2**31), 2**31 - 1

# ISO-8601-ish detector: a string that parses as a datetime is a timestamp
# (inference trap reproduced from the reference's TypeFromValue behavior)
_TS_RE = re.compile(
    r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2}(\.\d{1,9})?)?(Z|[+-]\d{2}:?\d{2})?)?$"
)


def _timestamp_precision(frac: str | None) -> DataType:
    if not frac:
        return DataType.TIMESTAMP
    n = len(frac)
    if n <= 3:
        return DataType.TIMESTAMP_MILLI
    if n <= 6:
        return DataType.TIMESTAMP_MICRO
    return DataType.TIMESTAMP_NANO


def datatype_for_value(v: object) -> DataType:
    """Infer the engine type of one runtime value (drives sample inference)."""
    if v is None:
        return DataType.NULL
    if isinstance(v, bool):
        return DataType.BOOL
    if isinstance(v, int):
        return DataType.INT32 if _INT32_MIN <= v <= _INT32_MAX else DataType.INT64
    if isinstance(v, float):
        return DataType.FLOAT64
    if isinstance(v, _dt.datetime):
        return DataType.TIMESTAMP_MICRO if v.microsecond else DataType.TIMESTAMP
    if isinstance(v, _dt.date):
        return DataType.TIMESTAMP
    if isinstance(v, (bytes, bytearray)):
        return DataType.STRING
    if isinstance(v, str):
        m = _TS_RE.match(v)
        if m:
            return _timestamp_precision(m.group(3)[1:] if m.group(3) else None)
        return DataType.STRING
    if isinstance(v, dict):
        return DataType.OBJECT
    if isinstance(v, (list, tuple)):
        return DataType.ARRAY
    return DataType.UNKNOWN


def merge_spark_schemas(a: T.StructType, b: T.StructType) -> T.StructType:
    """Widen two Spark schemas field-by-field through the lattice.

    Used on schema evolution: new fields appended, conflicting fields widened
    via LCA (int→long, float→double, any-vs-timestamp → string, ...).
    """
    fields: dict[str, T.StructField] = {f.name: f for f in a.fields}
    order = [f.name for f in a.fields]
    for f in b.fields:
        if f.name not in fields:
            fields[f.name] = f
            order.append(f.name)
        else:
            cur = fields[f.name]
            if cur.dataType != f.dataType:
                widened = to_spark_type(
                    common_ancestor(from_spark_type(cur.dataType), from_spark_type(f.dataType))
                )
                fields[f.name] = T.StructField(f.name, widened, True)
            elif f.nullable and not cur.nullable:
                fields[f.name] = T.StructField(f.name, cur.dataType, True)
    return T.StructType([fields[n] for n in order])
