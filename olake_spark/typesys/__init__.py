"""Type system: the widening lattice, column naming, value reformat."""

from olake_spark.typesys.lattice import (
    DataType,
    common_ancestor,
    datatype_for_value,
    fold_types,
    from_spark_type,
    to_spark_type,
)
from olake_spark.typesys.naming import reformat_column_name

__all__ = [
    "DataType",
    "common_ancestor",
    "datatype_for_value",
    "fold_types",
    "from_spark_type",
    "to_spark_type",
    "reformat_column_name",
]
