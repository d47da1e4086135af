"""Engine-added metadata columns (the "raw schema").

Every synced row carries four engine columns (reference:
constants/constants.go:19-23, drivers/abstract/abstract.go:30-35):

- ``_olake_id``        : stable row identity — raw PK value if single PK,
                         md5 of ``v1|v2|...`` (values ordered by sorted PK
                         column name) if composite, md5 of the whole record
                         if no PK (utils/utils.go:265-286).
- ``_op_type``         : ``r`` backfill read, ``c`` steady-state insert,
                         ``i`` insert during the backfill-overlap window,
                         ``u`` update, ``d`` delete
                         (drivers/abstract/cdc.go:165-179).
- ``_olake_timestamp`` : ingest wall-clock time.
- ``_cdc_timestamp``   : source change time (null for backfill reads).

All expressed as native Column expressions — JVM-side, codegen-friendly,
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "OLAKE_ID",
    "OP_TYPE",
    "OLAKE_TS",
    "CDC_TS",
    "OLAKE_COLUMNS",
    "OP_BACKFILL",
    "OP_CREATE",
    "OP_INSERT_OVERLAP",
    "OP_UPDATE",
    "OP_DELETE",
    "olake_id_column",
    "stamp_olake_columns",
]

OLAKE_ID = "_olake_id"
OP_TYPE = "_op_type"
OLAKE_TS = "_olake_timestamp"
CDC_TS = "_cdc_timestamp"
OLAKE_COLUMNS = [OLAKE_ID, OP_TYPE, OLAKE_TS, CDC_TS]

OP_BACKFILL = "r"
OP_CREATE = "c"
OP_INSERT_OVERLAP = "i"
OP_UPDATE = "u"
OP_DELETE = "d"


def olake_id_column(pk_cols: list[str], all_cols: list[str] | None = None) -> Column:
    """Stable string row identity from the primary key.

    Parity with the reference: single PK → the raw value stringified;
    composite PK → md5 over pk values joined by ``|`` in sorted-column-name
    order; no PK → md5 of the JSON of the whole row (deterministic because
    struct field order is fixed).
    """
    if len(pk_cols) == 1:
        return F.col(pk_cols[0]).cast("string")
    if pk_cols:
        ordered = sorted(pk_cols)
        return F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in ordered]))
    if not all_cols:
        raise ValueError("no PK and no column list for whole-record hash")
    return F.md5(F.to_json(F.struct(*[F.col(c) for c in all_cols])))


def stamp_olake_columns(
    df: DataFrame,
    pk_cols: list[str],
    op_type: str | Column = OP_BACKFILL,
    cdc_timestamp: Column | None = None,
    ingest_timestamp: Column | None = None,
) -> DataFrame:
    """Append the four engine columns to a source DataFrame.

    ``op_type`` may be a literal (backfill: every row ``"r"``) or a Column
    (CDC batches: mapped per-row from the change kind).
    """
    op_col = F.lit(op_type) if isinstance(op_type, str) else op_type
    return (
        df.withColumn(OLAKE_ID, olake_id_column(pk_cols, df.columns))
        .withColumn(OP_TYPE, op_col)
        .withColumn(OLAKE_TS, ingest_timestamp if ingest_timestamp is not None else F.current_timestamp())
        .withColumn(CDC_TS, cdc_timestamp if cdc_timestamp is not None else F.lit(None).cast("timestamp"))
    )
