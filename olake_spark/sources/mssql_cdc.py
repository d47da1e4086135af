"""MSSQL CDC-table polling — query planning + batch decode.

SQL Server CDC is poll-based: the agent writes committed changes into
``cdc.<capture_instance>_CT`` tables and ``cdc.fn_cdc_get_all_changes_*``
reads an LSN window. That maps 1:1 onto Spark micro-batches: each poll is a
``spark.read.jdbc(query=get_changes(from, to))`` producing one changelog
batch for the MERGE pipeline — no log decoding, no connector jar.

Reference parity (drivers/mssql/internal/cdc.go:47-574, queries
pkg/jdbc/jdbc.go:707-830):

- capture-instance discovery / enablement probes (dialect SQL builders)
- LSN window = [saved_lsn incremented, max_lsn captured at sync start] —
  the bounded drain
- ``__$operation`` codes: 1 → delete, 2 → insert, 3/4 → update
  (cdc.go:444-456; 'all' mode emits no before-images)
- every row carries ``_cdc_lsn`` (hex of ``__$start_lsn``); ``__$*``
  bookkeeping columns are dropped from the payload
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cdc_support_query",
    "max_lsn_query",
    "increment_lsn_query",
    "capture_instances_query",
    "get_changes_query",
    "ddl_history_query",
    "decode_cdc_batch",
]


def cdc_support_query() -> str:
    """Is CDC enabled on the current database (jdbc.go:707-714)."""
    return "SELECT is_cdc_enabled FROM sys.databases WHERE name = DB_NAME()"


def max_lsn_query() -> str:
    """Current max LSN — captured ONCE at sync start; the drain's end
    position (jdbc.go:726-728)."""
    return "SELECT sys.fn_cdc_get_max_lsn() AS max_lsn"


def increment_lsn_query(lsn_hex: str) -> str:
    """Next LSN after a committed position — the window's inclusive start
    (jdbc.go:731-733)."""
    return f"SELECT sys.fn_cdc_increment_lsn({_lsn_lit(lsn_hex)}) AS next_lsn"


def capture_instances_query(stream_ids: list[str]) -> str:
    """Discover capture instances + start LSNs for selected schema.table
    streams (jdbc.go:748-769)."""
    ids = "','".join(stream_ids)
    return (
        "SELECT s.name AS schema_name, t.name AS table_name, "
        "c.capture_instance, c.start_lsn "
        "FROM sys.tables t "
        "JOIN sys.schemas s ON t.schema_id = s.schema_id "
        "JOIN cdc.change_tables c ON t.object_id = c.source_object_id "
        f"WHERE CONCAT(s.name, '.', t.name) IN ('{ids}') "
        "ORDER BY s.name ASC, t.name ASC, c.start_lsn ASC"
    )


def get_changes_query(capture_instance: str, from_lsn_hex: str, to_lsn_hex: str) -> str:
    """One poll window for one capture instance (jdbc.go:800-806), ordered
    by (start_lsn, seqval) so batch replay order matches commit order.
    Feed to ``spark.read.jdbc(query=...)`` — one micro-batch."""
    if not capture_instance.replace("_", "").isalnum():
        raise ValueError(f"suspicious capture instance {capture_instance!r}")
    return (
        f"SELECT * FROM cdc.[fn_cdc_get_all_changes_{capture_instance}]"
        f"({_lsn_lit(from_lsn_hex)}, {_lsn_lit(to_lsn_hex)}, 'all') "
        "ORDER BY [__$start_lsn], [__$seqval]"
    )


def ddl_history_query(stream_ids: list[str]) -> str:
    """Schema-change history for the selected streams (jdbc.go:809-819) —
    polled before each drain to detect capture-instance staleness."""
    ids = "','".join(stream_ids)
    return (
        "SELECT sch.name, tbl.name, hist.required_column_update, "
        "hist.ddl_command, hist.ddl_lsn, hist.ddl_time "
        "FROM cdc.ddl_history AS hist "
        "JOIN sys.tables AS tbl ON hist.source_object_id = tbl.object_id "
        "JOIN sys.schemas AS sch ON tbl.schema_id = sch.schema_id "
        f"WHERE CONCAT(sch.name, '.', tbl.name) IN ('{ids}') "
        "ORDER BY hist.ddl_lsn ASC"
    )


def _lsn_lit(lsn_hex: str) -> str:
    h = lsn_hex.removeprefix("0x")
    if not all(c in "0123456789abcdefABCDEF" for c in h):
        raise ValueError(f"not an LSN hex string: {lsn_hex!r}")
    return f"0x{h}"


def decode_cdc_batch(df: DataFrame, dedup_inserts: bool = False) -> DataFrame:
    """CDC-table rows → engine changelog: op mapping (cdc.go:444-456),
    hex LSN as ``_cdc_lsn``, ``__$*`` bookkeeping dropped."""
    op = F.col("__$operation")
    insert_op = F.lit("i") if dedup_inserts else F.lit("c")
    op_type = (
        F.when(op == 1, F.lit("d"))
        .when(op == 2, insert_op)
        .otherwise(F.lit("u"))  # 3/4 → update
    )
    payload = [c for c in df.columns if not c.startswith("__$")]
    return df.select(
        *payload,
        op_type.alias("_op_type"),
        F.lower(F.hex(F.col("__$start_lsn"))).alias("_cdc_lsn"),
    )
