"""Engine column functions: _olake_* metadata, projection, flatten."""

from olake_spark.functions.olake_columns import (
    OLAKE_COLUMNS,
    OP_BACKFILL,
    OP_CREATE,
    OP_DELETE,
    OP_INSERT_OVERLAP,
    OP_UPDATE,
    olake_id_column,
    stamp_olake_columns,
)

__all__ = [
    "OLAKE_COLUMNS",
    "OP_BACKFILL",
    "OP_CREATE",
    "OP_DELETE",
    "OP_INSERT_OVERLAP",
    "OP_UPDATE",
    "olake_id_column",
    "stamp_olake_columns",
]
