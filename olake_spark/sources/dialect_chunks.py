"""Physical-locator chunk strategies — the per-dialect planners that don't
split on a key's value space but on the engine's physical row addresses.

Spark reads each planned chunk as one JDBC predicate partition
(``spark.read.jdbc(..., predicates=[...])``), so every planner here emits
either ``plans.chunks.Chunk`` ranges plus a predicate renderer, or the exact
driver-side SQL the reference issues to discover boundaries:

- **PG ctid page ranges** (drivers/postgres/internal/backfill.go:63-134;
  queries pkg/jdbc/jdbc.go:128-218): pages from ``pg_class.relpages``,
  chunk = ``ceil(2 GiB / block_size)`` pages, boundaries rendered as
  ``'(page,0)'`` tids; partitioned tables shrink the page batch by how many
  partitions still have pages in range.
- **MSSQL %%physloc%% walk** (drivers/mssql/internal/backfill.go:244-278;
  pkg/jdbc/jdbc.go:642-661, 967-1009): ROW_NUMBER walk over physical RIDs;
  scan predicates use the walk's (min, max] convention, with READPAST.
- **MSSQL TABLESAMPLE boundaries** (backfill.go:283-340; jdbc.go:1041-1054;
  clamps constants/constants.go:44-54): sample ~10 rows per target chunk,
  clamp percent to [0.01, 50], pick evenly-strided boundaries.
- **Oracle DBMS_PARALLEL_EXECUTE / SAMPLE BLOCK / ROWID walk**
  (drivers/oracle/internal/backfill.go:91-286; jdbc.go:1118-1188).
- **DB2 RID ranges** (drivers/db2/internal/backfill.go:57-206;
  jdbc.go:1558-1728): RID() min/max + avg-row-size chunk step.
- **MySQL LIMIT/OFFSET row windows** (no-PK fallback,
  drivers/mysql/internal/backfill.go:198-220; jdbc.go:355-373).

All boundary **discovery** stays driver-side (one cheap query per boundary —
exactly the reference's design); the heavy row reads are Spark partitions,
so a 1000-executor cluster fans out without any planner change.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from olake_spark.plans.chunks import EFFECTIVE_CHUNK_BYTES, Chunk

__all__ = [
    "ctid_page_chunks",
    "ctid_partitioned_chunks",
    "ctid_predicate",
    "physloc_next_chunk_sql",
    "physloc_walk_chunks",
    "physloc_predicate",
    "compute_sample_percent",
    "tablesample_boundary_sql",
    "sample_boundaries_to_chunks",
    "iam_object_id_sql",
    "iam_walk_pages_sql",
    "iam_server_properties_sql",
    "iam_permission_probe_sql",
    "iam_walk_supported",
    "physloc_sort_key",
    "physloc_hex",
    "iam_pages_to_chunks",
    "oracle_rowid_task_sqls",
    "oracle_sample_block_sql",
    "oracle_next_rowid_sql",
    "rowid_predicate",
    "db2_rid_chunks",
    "db2_rid_predicate",
    "mysql_limit_offset_chunks",
    "mysql_limit_offset_scan_sql",
]

_UINT32_MAX = 2**32 - 1
_UINT64_MAX = 2**64 - 1

# TABLESAMPLE / SAMPLE BLOCK clamps (constants/constants.go:44-54)
SAMPLE_PERCENT_MIN = 0.01
SAMPLE_PERCENT_MAX = 50.0
SAMPLE_ROWS_PER_CHUNK = 10


# -- PG ctid pages ----------------------------------------------------------

def ctid_page_chunks(rel_pages: int, block_size: int = 8192) -> list[Chunk]:
    """Non-partitioned ctid ranges (backfill.go:80-104): batch =
    ``ceil(2 GiB raw / block_size)`` pages; the final chunk's end page is
    pinned to uint32-max so rows appended after planning are still read."""
    batch = math.ceil(EFFECTIVE_CHUNK_BYTES / block_size)
    rel_pages = max(1, rel_pages)
    chunks = []
    for start in range(0, rel_pages, batch):
        end = start + batch
        if end >= rel_pages:
            end = _UINT32_MAX
        chunks.append(Chunk(f"'({start},0)'", f"'({end},0)'"))
    return chunks


def ctid_partitioned_chunks(partition_pages: dict[str, int], block_size: int = 8192) -> list[Chunk]:
    """Partitioned-table ctid ranges (backfill.go:106-133): the same page
    interval is scanned in every partition at once, so the page batch
    shrinks by how many partitions still have pages past the current start —
    keeping per-chunk raw bytes ≈ constant as partitions run dry."""
    batch_pages = math.ceil(EFFECTIVE_CHUNK_BYTES / block_size)
    max_pages = max(partition_pages.values(), default=0)

    def parts_in_range(threshold: int) -> int:
        return max(1, sum(1 for p in partition_pages.values() if p > threshold))

    chunks = []
    start = 0
    batch = math.ceil(batch_pages / parts_in_range(0))
    while start < max_pages:
        batch = math.ceil(batch_pages / parts_in_range(start + batch))
        end = start + batch
        if end >= max_pages:
            end = _UINT32_MAX
        chunks.append(Chunk(f"'({start},0)'", f"'({end},0)'"))
        start = start + batch
    return chunks


def ctid_predicate(chunk: Chunk) -> str:
    """One ctid chunk → the JDBC partition predicate (the reference embeds
    the same condition in its chunk scan, jdbc.go:234-258)."""
    parts = []
    if chunk.min is not None:
        parts.append(f"ctid >= {chunk.min}")
    if chunk.max is not None:
        parts.append(f"ctid < {chunk.max}")
    return " AND ".join(parts) or "TRUE"


# -- MSSQL %%physloc%% ------------------------------------------------------

def physloc_next_chunk_sql(qualified_table: str, chunk_rows: int) -> str:
    """The boundary-walk probe (jdbc.go:649-661): ROW_NUMBER over physical
    RIDs greater than the current boundary; row ``chunk_rows`` is the next
    boundary. ``@p1`` binds the current boundary."""
    return (
        "WITH ordered AS ("
        " SELECT %%physloc%% AS physloc, ROW_NUMBER() OVER (ORDER BY %%physloc%%) AS rn"
        f" FROM {qualified_table}"
        " WHERE %%physloc%% > @p1"
        f") SELECT physloc FROM ordered WHERE rn = {chunk_rows}"
    )


def physloc_walk_chunks(boundaries: list[str]) -> list[Chunk]:
    """Walk results → chunks (backfill.go:255-277): a head chunk below the
    table minimum (rows inserted onto earlier pages mid-sync), (min, max]
    interior ranges, and an unbounded tail from the last boundary."""
    if not boundaries:
        return []
    chunks = [Chunk(None, boundaries[0])]
    for lo, hi in zip(boundaries, boundaries[1:]):
        chunks.append(Chunk(lo, hi))
    chunks.append(Chunk(boundaries[-1], None))
    return chunks


def physloc_predicate(chunk: Chunk) -> str:
    """physloc scan condition (jdbc.go:975-1009) — note the walk's
    half-open-on-the-LEFT convention (``> min AND <= max``), opposite of the
    key-range planners; pair with ``WITH (READPAST)`` in the outer scan."""
    if chunk.min is not None and chunk.max is not None:
        return f"%%physloc%% > {chunk.min} AND %%physloc%% <= {chunk.max}"
    if chunk.min is not None:
        return f"%%physloc%% > {chunk.min}"
    if chunk.max is not None:
        return f"%%physloc%% <= {chunk.max}"
    return "1 = 1"


# -- MSSQL TABLESAMPLE boundaries ------------------------------------------

def compute_sample_percent(approx_rows: int, num_chunks: int) -> float:
    """~10 sample rows per target chunk, clamped to [0.01, 50]%
    (utils.go:552-556; rationale constants/constants.go:44-54)."""
    pct = (num_chunks * SAMPLE_ROWS_PER_CHUNK) / max(1, approx_rows) * 100.0
    return max(SAMPLE_PERCENT_MIN, min(SAMPLE_PERCENT_MAX, pct))


def tablesample_boundary_sql(qualified_table: str, pk_cols: list[str], percent: float) -> str:
    """The sampled-boundary query (jdbc.go:1041-1054): TABLESAMPLE SYSTEM
    with NOLOCK, sorted PK values (composite keys concatenated)."""
    sel = pk_cols[0] if len(pk_cols) == 1 else "CONCAT_WS(',', " + ", ".join(pk_cols) + ")"
    order = ", ".join(pk_cols)
    return (
        f"SELECT {sel} FROM {qualified_table}"
        f" TABLESAMPLE SYSTEM ({percent:.6f} PERCENT) WITH (NOLOCK)"
        f" ORDER BY {order}"
    )


def sample_boundaries_to_chunks(samples: list[str], num_chunks: int) -> list[Chunk]:
    """Evenly-strided boundaries from the sorted sample (backfill.go:326-339):
    chunk i starts at sample ``floor(i * len/num)``; head chunk unbounded
    below the first pick, tail unbounded above the last. Raises when the
    sample is thinner than the chunk target (the reference falls back to
    another strategy)."""
    if len(samples) < num_chunks:
        raise ValueError(f"sample returned {len(samples)} rows, need ≥ {num_chunks}")
    step = len(samples) / num_chunks
    chunks: list[Chunk] = []
    prev: str | None = None
    for i in range(num_chunks):
        idx = min(int(i * step), len(samples) - 1)
        chunks.append(Chunk(prev, samples[idx]))
        prev = samples[idx]
    chunks.append(Chunk(prev, None))
    return chunks


# -- MSSQL IAM page walk ----------------------------------------------------
# The third no-PK strategy (drivers/mssql/internal/backfill.go:341-422,
# queries pkg/jdbc/jdbc.go:663-706): enumerate the table's allocated data
# pages from sys.dm_db_database_page_allocations, sort them in %%physloc%%
# byte order, and cut one chunk every pages-per-chunk pages. Needs a
# capability probe: SQL Server ≥ 2012, not Azure SQL DB/MI, and VIEW
# DATABASE STATE on the login.

# 256 MiB target parquet × compression ratio 8 (constants/constants.go:32-33)
EFFECTIVE_PARQUET_SIZE = 256 * 1024 * 1024 * 8
# in-row payload upper bound per 8 KB page (backfill.go:25-27)
USABLE_BYTES_PER_PAGE = 8060


def iam_object_id_sql() -> str:
    """Resolve schema+table to object_id (jdbc.go:688-693); params:
    @p1 = schema, @p2 = table."""
    return "SELECT OBJECT_ID(QUOTENAME(@p1) + '.' + QUOTENAME(@p2))"


def iam_walk_pages_sql() -> str:
    """Allocated in-row data pages for an object (jdbc.go:663-685);
    params: @p1 = object_id. LIMITED mode never touches page contents."""
    return (
        "SELECT allocated_page_file_id AS file_id,"
        " allocated_page_page_id AS page_id"
        " FROM sys.dm_db_database_page_allocations(DB_ID(), @p1, NULL, NULL, 'LIMITED')"
        " WHERE is_allocated = 1 AND is_iam_page = 0"
        " AND index_id IN (0, 1) AND allocation_unit_type = 1"
    )


def iam_server_properties_sql() -> str:
    """Capability probe part 1 (jdbc.go:695-699): version + engine edition."""
    return (
        "SELECT CAST(SERVERPROPERTY('ProductMajorVersion') AS INT),"
        " CAST(SERVERPROPERTY('EngineEdition') AS INT)"
    )


def iam_permission_probe_sql() -> str:
    """Capability probe part 2 (jdbc.go:701-706): TOP 0 evaluates the DMF
    without returning rows; failure ⇒ no VIEW DATABASE STATE."""
    return (
        "SELECT TOP 0 1 FROM sys.dm_db_database_page_allocations("
        "DB_ID(), OBJECT_ID('sys.objects'), NULL, NULL, 'LIMITED')"
    )


def iam_walk_supported(major_version: int, engine_edition: int) -> bool:
    """The probe decision (backfill.go:391-422): 2012+ (major ≥ 11) and not
    Azure SQL Database (5) / Managed Instance (8), where the DMF is blocked.
    The permission probe runs separately because it needs a live query."""
    return major_version >= 11 and engine_edition not in (5, 8)


def physloc_sort_key(file_id: int, page_id: int) -> int:
    """(file_id, page_id) → uint64 that sorts identically to SQL Server's
    byte-wise BINARY(8) compare of %%physloc%% (backfill.go:146-156).
    slot_id pinned to 0xFFFF ('end of page') so boundaries split between
    pages, never inside one."""
    b = page_id.to_bytes(4, "little") + file_id.to_bytes(2, "little") + b"\xff\xff"
    return int.from_bytes(b, "big")


def physloc_hex(key: int) -> str:
    """Sort key → the 0x-hex BINARY(8) literal %%physloc%% predicates use
    (backfill.go:158-164 + jdbc.go formatPhysLocValue)."""
    return "0x" + key.to_bytes(8, "big").hex().upper()


def iam_pages_to_chunks(
    pages: list[tuple[int, int]],
    target_chunk_bytes: int = EFFECTIVE_PARQUET_SIZE,
    usable_bytes_per_page: int = USABLE_BYTES_PER_PAGE,
) -> list[Chunk]:
    """IAM page list → physloc chunks (backfill.go:365-388).

    Pages sort in physloc order (the DMF guarantees no order), then one
    boundary lands every ``pages_per_chunk`` pages; the head chunk is
    unbounded below, the tail unbounded above, and a table that fits in one
    chunk yields exactly [Chunk(None, None)]. Bounds are the 0x-hex
    %%physloc%% literals ``physloc_predicate`` consumes.
    """
    if not pages:
        raise ValueError("IAM walk returned no allocated pages")
    keys = sorted(physloc_sort_key(f, p) for f, p in pages)
    pages_per_chunk = max(target_chunk_bytes // usable_bytes_per_page, 1)
    chunks: list[Chunk] = []
    prev: str | None = None
    for i in range(pages_per_chunk, len(keys), pages_per_chunk):
        boundary = physloc_hex(keys[i])
        chunks.append(Chunk(prev, boundary))
        prev = boundary
    chunks.append(Chunk(prev, None))
    return chunks


# -- Oracle ROWID -----------------------------------------------------------

def oracle_rowid_task_sqls(task: str, owner: str, table: str, blocks_per_chunk: int) -> dict[str, str]:
    """The DBMS_PARALLEL_EXECUTE lifecycle (jdbc.go:1159-1188): create task,
    create ROWID chunks by block count, retrieve ranges, drop task."""
    return {
        "create": f"BEGIN DBMS_PARALLEL_EXECUTE.create_task('{task}'); END;",
        "chunk": (
            "BEGIN DBMS_PARALLEL_EXECUTE.create_chunks_by_rowid("
            f"task_name => '{task}', table_owner => '{owner}', table_name => '{table}', "
            f"by_row => FALSE, chunk_size => {blocks_per_chunk}); END;"
        ),
        "retrieve": (
            "SELECT chunk_id, start_rowid, end_rowid FROM user_parallel_execute_chunks"
            f" WHERE task_name = '{task}' ORDER BY chunk_id"
        ),
        "drop": f"BEGIN DBMS_PARALLEL_EXECUTE.drop_task('{task}'); END;",
    }


def oracle_sample_block_sql(qualified_table: str, percent: float) -> str:
    """SAMPLE BLOCK boundary sample (jdbc.go:1134-1141) — block-level
    sampling avoids the full sort NTILE would need on billion-row tables."""
    return f"SELECT ROWID FROM {qualified_table} SAMPLE BLOCK({percent:.6f}) ORDER BY ROWID"


def oracle_next_rowid_sql(qualified_table: str, current_rowid: str, chunk_rows: int) -> str:
    """ROWID walk probe (jdbc.go:1130-1132): max ROWID + row count of the
    next ``chunk_rows`` physical rows."""
    return (
        "SELECT MAX(ROWID), COUNT(*) AS row_count FROM("
        f"SELECT ROWID FROM {qualified_table} WHERE ROWID >= '{current_rowid}'"
        f" ORDER BY ROWID FETCH FIRST {chunk_rows} ROWS ONLY)"
    )


def rowid_predicate(chunk: Chunk) -> str:
    """ROWID range predicate for the Spark JDBC partition (the reference
    scans ``ROWID BETWEEN start AND end`` from the task's chunk table)."""
    if chunk.min is not None and chunk.max is not None:
        return f"ROWID BETWEEN '{chunk.min}' AND '{chunk.max}'"
    if chunk.min is not None:
        return f"ROWID >= '{chunk.min}'"
    if chunk.max is not None:
        return f"ROWID <= '{chunk.max}'"
    return "1 = 1"


# -- DB2 RID ----------------------------------------------------------------

def db2_rid_chunks(min_rid: int, max_rid: int, avg_row_bytes: float) -> list[Chunk]:
    """RID-range arithmetic split (drivers/db2/internal/backfill.go:57-206):
    chunk step = ``ceil(2 GiB / avg_row_bytes)`` RIDs (RIDs are dense row
    addresses), unbounded tail above the max."""
    step = max(1, math.ceil(EFFECTIVE_CHUNK_BYTES / max(1.0, avg_row_bytes)))
    chunks: list[Chunk] = []
    start = min_rid
    while start <= max_rid:
        end = start + step
        chunks.append(Chunk(start, end if end <= max_rid else None))
        start = end
    if not chunks:
        chunks.append(Chunk(min_rid, None))
    return chunks


def db2_rid_predicate(qualified_table: str, chunk: Chunk) -> str:
    """RID scan condition (jdbc.go:1563-1585): ``RID(table)`` ranges."""
    rid = f"RID({qualified_table})"
    if chunk.min is not None and chunk.max is not None:
        return f"{rid} >= {chunk.min} AND {rid} < {chunk.max}"
    if chunk.min is not None:
        return f"{rid} >= {chunk.min}"
    if chunk.max is not None:
        return f"{rid} < {chunk.max}"
    return "1 = 1"


# -- MySQL LIMIT/OFFSET row windows ----------------------------------------

def mysql_limit_offset_chunks(total_rows: int, chunk_rows: int) -> list[Chunk]:
    """No-PK fallback (drivers/mysql/internal/backfill.go:198-220): row
    windows of ``chunk_rows``; boundaries are row offsets (as strings, like
    the reference's state encoding), tail unbounded."""
    chunks: list[Chunk] = []
    start = 0
    while start < total_rows:
        end = start + chunk_rows
        if end >= total_rows:
            chunks.append(Chunk(str(start), None))
            break
        chunks.append(Chunk(str(start), str(end)))
        start = end
    if not chunks:
        chunks.append(Chunk("0", None))
    return chunks


def mysql_limit_offset_scan_sql(qualified_table: str, chunk: Chunk, filter_sql: str = "") -> str:
    """The window scan (jdbc.go:355-373): LIMIT max when no min;
    LIMIT (max-min) OFFSET min for interior windows; LIMIT uint64-max
    OFFSET min for the tail. Deterministic only under the reference's
    repeatable-read chunk transaction — same caveat applies on Spark."""
    q = f"SELECT * FROM {qualified_table}"
    if filter_sql:
        q += f" WHERE {filter_sql}"
    if chunk.min is None:
        return f"{q} LIMIT {int(chunk.max)}"
    if chunk.max is not None:
        return f"{q} LIMIT {int(chunk.max) - int(chunk.min)} OFFSET {int(chunk.min)}"
    return f"{q} LIMIT {_UINT64_MAX} OFFSET {int(chunk.min)}"


@dataclass(frozen=True)
class _Probe:
    """Driver-side discovery SQL bundle for a dialect (used by sync planning
    and asserted in tests; the strings match the reference's probes)."""

    name: str
    sqls: dict[str, str]


PG_PROBES = _Probe(
    "postgres",
    {
        "block_size": "SHOW block_size",
        "rel_pages": (
            "SELECT relpages FROM pg_class WHERE relname = '{table}' AND"
            " relnamespace = (SELECT oid FROM pg_namespace WHERE nspname = '{schema}')"
        ),
        "is_partitioned": (
            "SELECT COUNT(i.inhrelid) FROM pg_inherits i"
            " JOIN pg_class c ON c.oid = i.inhparent"
            " JOIN pg_namespace n ON n.oid = c.relnamespace"
            " WHERE n.nspname = '{schema}' AND c.relname = '{table}'"
        ),
        "partition_pages_pg12": (
            "SELECT pt.relid::text AS name,"
            " CEIL(1.05 * (pg_relation_size(pt.relid::oid) /"
            " current_setting('block_size')::int))::bigint AS pages"
            " FROM pg_partition_tree('{schema}.{table}') pt"
            " WHERE pt.isleaf = true ORDER BY pages DESC"
        ),
    },
)
