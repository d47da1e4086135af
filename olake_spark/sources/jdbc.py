"""JDBC source layer: dialect SQL builders + Spark read assembly.

The reference's pkg/jdbc/jdbc.go is ~1700 lines of per-dialect SQL text for
discover, chunk planning, chunk scans, cursor predicates, and stats. On
Spark the *reads* are one call — ``spark.read.jdbc(url, table,
predicates=[...])`` — so this module keeps only what must stay driver-side:
the dialect SQL strings and the predicate assembly. Everything is pure
string-building, unit-testable without a live database; ``read_chunked`` /
``read_incremental`` wire the strings into ``spark.read`` when a URL exists.

Dialects: postgres, mysql, mssql, oracle, db2 (CDC support matrix matches
the reference: oracle/db2 are backfill/incremental only).
"""

from __future__ import annotations

import decimal
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from olake_spark.plans.chunks import Chunk, chunks_to_predicates

__all__ = ["Dialect", "DIALECTS", "JdbcSource"]


@dataclass(frozen=True)
class Dialect:
    """SQL shapes one database family needs (pkg/jdbc/jdbc.go parity)."""

    name: str
    quote: str = '"'
    # discover
    list_tables_sql: str = ""
    table_schema_sql: str = ""  # params: schema, table
    primary_key_sql: str = ""
    # stats for chunk planning (approx rows/size drive chunk count)
    stats_sql: str = ""
    # cursor rendering (timestamp casts differ per dialect)
    timestamp_cast: str = "TIMESTAMP '{v}'"
    supports_cdc: bool = True
    # per-connection snapshot-consistency statement for chunked backfill
    # (the reference wraps every chunk scan in a REPEATABLE READ read-only
    # transaction — drivers/postgres/internal/backfill.go:34-38, MySQL
    # jdbc.WithIsolation pkg/jdbc/jdbc.go:573-590, MSSQL read-committed
    # drivers/mssql/internal/backfill.go:63). Spark maps this to
    # ``sessionInitStatement``: executed once on every partition's
    # connection before its chunk query. Empty = dialect default (Oracle
    # reads are statement-level consistent; the reference sets none).
    chunk_isolation_sql: str = ""

    def q(self, ident: str) -> str:
        # double any embedded quote char (SQL-standard identifier escaping;
        # MySQL does the same with backticks) — an unescaped quote in a
        # table/column name would otherwise truncate the identifier and
        # splice the remainder into the statement
        return f"{self.quote}{ident.replace(self.quote, self.quote * 2)}{self.quote}"

    def qualified(self, schema: str, table: str) -> str:
        return f"{self.q(schema)}.{self.q(table)}" if schema else self.q(table)

    # -- scan/cursor SQL ----------------------------------------------------

    def chunk_scan_sql(
        self, schema: str, table: str, columns: list[str] | None, where: str = ""
    ) -> str:
        cols = ", ".join(self.q(c) for c in columns) if columns else "*"
        sql = f"SELECT {cols} FROM {self.qualified(schema, table)}"
        if where:
            sql += f" WHERE {where}"
        return sql

    def render_cursor_value(self, v: object, is_timestamp: bool = False) -> str:
        if is_timestamp:
            return self.timestamp_cast.format(v=v)
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        if isinstance(v, bool):  # before int: bool is an int subclass, and
            return "TRUE" if v else "FALSE"  # repr() would emit Python's True
        if isinstance(v, (int, float, decimal.Decimal)):
            return str(v)
        if v is None:
            raise ValueError("cursor value cannot be NULL — use the IS NULL fallback")
        return "'" + str(v).replace("'", "''") + "'"

    def cursor_predicate(
        self,
        cursor: str,
        last_value: object,
        secondary: str | None = None,
        secondary_last: object | None = None,
        is_timestamp: bool = False,
    ) -> str:
        """Incremental predicate with secondary-cursor null fallback
        (pkg/jdbc/jdbc.go:1401-1451): primary > v OR (primary IS NULL AND
        secondary > v2)."""
        p = f"{self.q(cursor)} > {self.render_cursor_value(last_value, is_timestamp)}"
        if secondary and secondary_last is not None:
            s = f"{self.q(secondary)} > {self.render_cursor_value(secondary_last)}"
            return f"{p} OR ({self.q(cursor)} IS NULL AND {s})"
        return p

    def threshold_predicate(self, cursor: str, max_value: object, is_timestamp: bool = False) -> str:
        """Backfill-overlap threshold (jdbc.go:1490-1527): read only rows at
        or below the max cursor captured before backfill (plus NULLs), so the
        following incremental pass cannot double-read."""
        v = self.render_cursor_value(max_value, is_timestamp)
        return f"{self.q(cursor)} <= {v} OR {self.q(cursor)} IS NULL"

    def max_cursor_sql(self, schema: str, table: str, cursors: list[str]) -> str:
        # alias is quoted too: a cursor column with spaces/specials would
        # otherwise produce an unparseable bare alias
        aggs = ", ".join(f"MAX({self.q(c)}) AS {self.q('max_' + c)}" for c in cursors)
        return f"SELECT {aggs} FROM {self.qualified(schema, table)}"

    def boundary_probe_sql(
        self, schema: str, table: str, pk: str, after: object | None, chunk_rows: int
    ) -> str:
        """The ORDER BY/LIMIT/OFFSET boundary walk probe (jdbc.go:76-123)."""
        where = f" WHERE {self.q(pk)} > {self.render_cursor_value(after)}" if after is not None else ""
        if self.name in ("mssql",):
            return (
                f"SELECT {self.q(pk)} FROM {self.qualified(schema, table)}{where} "
                f"ORDER BY {self.q(pk)} OFFSET {chunk_rows} ROWS FETCH NEXT 1 ROWS ONLY"
            )
        if self.name in ("oracle", "db2"):
            return (
                f"SELECT {self.q(pk)} FROM {self.qualified(schema, table)}{where} "
                f"ORDER BY {self.q(pk)} OFFSET {chunk_rows} ROWS FETCH FIRST 1 ROWS ONLY"
            )
        return (
            f"SELECT {self.q(pk)} FROM {self.qualified(schema, table)}{where} "
            f"ORDER BY {self.q(pk)} LIMIT 1 OFFSET {chunk_rows}"
        )


DIALECTS: dict[str, Dialect] = {
    "postgres": Dialect(
        name="postgres",
        list_tables_sql=(
            "SELECT table_schema, table_name FROM information_schema.tables "
            "WHERE table_schema NOT IN ('pg_catalog', 'information_schema')"
        ),
        table_schema_sql=(
            "SELECT column_name, data_type, is_nullable FROM information_schema.columns "
            "WHERE table_schema = '{schema}' AND table_name = '{table}' "
            "ORDER BY ordinal_position"
        ),
        primary_key_sql=(
            "SELECT a.attname FROM pg_index i "
            "JOIN pg_attribute a ON a.attrelid = i.indrelid AND a.attnum = ANY(i.indkey) "
            "WHERE i.indrelid = '{schema}.{table}'::regclass AND i.indisprimary"
        ),
        stats_sql=(
            "SELECT reltuples::BIGINT AS approx_rows, pg_relation_size(oid) AS bytes "
            "FROM pg_class WHERE oid = '{schema}.{table}'::regclass"
        ),
        timestamp_cast="TO_TIMESTAMP('{v}', 'YYYY-MM-DD HH24:MI:SS.US')",
        chunk_isolation_sql=(
            "SET SESSION CHARACTERISTICS AS TRANSACTION "
            "ISOLATION LEVEL REPEATABLE READ, READ ONLY"
        ),
    ),
    "mysql": Dialect(
        name="mysql",
        quote="`",
        list_tables_sql=(
            "SELECT table_schema, table_name FROM information_schema.tables "
            "WHERE table_schema NOT IN ('mysql','sys','performance_schema','information_schema')"
        ),
        table_schema_sql=(
            "SELECT column_name, data_type, is_nullable FROM information_schema.columns "
            "WHERE table_schema = '{schema}' AND table_name = '{table}' "
            "ORDER BY ordinal_position"
        ),
        primary_key_sql=(
            "SELECT column_name FROM information_schema.key_column_usage "
            "WHERE table_schema = '{schema}' AND table_name = '{table}' "
            "AND constraint_name = 'PRIMARY' ORDER BY ordinal_position"
        ),
        stats_sql=(
            "SELECT table_rows AS approx_rows, data_length AS bytes "
            "FROM information_schema.tables "
            "WHERE table_schema = '{schema}' AND table_name = '{table}'"
        ),
        timestamp_cast="TIMESTAMP('{v}')",
        chunk_isolation_sql=(
            "SET SESSION TRANSACTION ISOLATION LEVEL REPEATABLE READ, READ ONLY"
        ),
    ),
    "mssql": Dialect(
        name="mssql",
        list_tables_sql=(
            "SELECT s.name AS table_schema, t.name AS table_name "
            "FROM sys.tables t JOIN sys.schemas s ON t.schema_id = s.schema_id"
        ),
        table_schema_sql=(
            "SELECT column_name, data_type, is_nullable FROM information_schema.columns "
            "WHERE table_schema = '{schema}' AND table_name = '{table}' "
            "ORDER BY ordinal_position"
        ),
        primary_key_sql=(
            "SELECT c.name FROM sys.index_columns ic "
            "JOIN sys.indexes i ON i.object_id = ic.object_id AND i.index_id = ic.index_id "
            "JOIN sys.columns c ON c.object_id = ic.object_id AND c.column_id = ic.column_id "
            "WHERE i.is_primary_key = 1 AND i.object_id = OBJECT_ID('{schema}.{table}')"
        ),
        stats_sql=(
            "SELECT SUM(p.rows) AS approx_rows, SUM(a.total_pages) * 8192 AS bytes "
            "FROM sys.partitions p JOIN sys.allocation_units a ON p.partition_id = a.container_id "
            "WHERE p.object_id = OBJECT_ID('{schema}.{table}') AND p.index_id IN (0, 1)"
        ),
        timestamp_cast="CAST('{v}' AS DATETIME2)",
        chunk_isolation_sql="SET TRANSACTION ISOLATION LEVEL READ COMMITTED",
    ),
    "oracle": Dialect(
        name="oracle",
        list_tables_sql="SELECT owner AS table_schema, table_name FROM all_tables",
        table_schema_sql=(
            "SELECT column_name, data_type, nullable AS is_nullable FROM all_tab_columns "
            "WHERE owner = '{schema}' AND table_name = '{table}' ORDER BY column_id"
        ),
        primary_key_sql=(
            "SELECT cols.column_name FROM all_constraints cons "
            "JOIN all_cons_columns cols ON cons.constraint_name = cols.constraint_name "
            "AND cons.owner = cols.owner "
            "WHERE cons.constraint_type = 'P' AND cons.owner = '{schema}' "
            "AND cols.table_name = '{table}'"
        ),
        stats_sql=(
            "SELECT num_rows AS approx_rows, blocks * 8192 AS bytes FROM all_tables "
            "WHERE owner = '{schema}' AND table_name = '{table}'"
        ),
        timestamp_cast="TO_TIMESTAMP('{v}', 'YYYY-MM-DD HH24:MI:SS.FF6')",
        supports_cdc=False,
    ),
    "db2": Dialect(
        name="db2",
        list_tables_sql=(
            "SELECT tabschema AS table_schema, tabname AS table_name FROM syscat.tables "
            "WHERE type = 'T' AND tabschema NOT LIKE 'SYS%'"
        ),
        table_schema_sql=(
            "SELECT colname AS column_name, typename AS data_type, nulls AS is_nullable "
            "FROM syscat.columns WHERE tabschema = '{schema}' AND tabname = '{table}' "
            "ORDER BY colno"
        ),
        primary_key_sql=(
            "SELECT colname FROM syscat.keycoluse "
            "WHERE tabschema = '{schema}' AND tabname = '{table}' ORDER BY colseq"
        ),
        stats_sql=(
            "SELECT card AS approx_rows, npages * 4096 AS bytes FROM syscat.tables "
            "WHERE tabschema = '{schema}' AND tabname = '{table}'"
        ),
        timestamp_cast="TIMESTAMP('{v}')",
        supports_cdc=False,
    ),
}


@dataclass
class JdbcSource:
    """One JDBC connection's read surface, Spark-first.

    Chunked backfill = ``predicates`` (one Spark partition per chunk);
    numeric-PK fast path = Spark's built-in ``partitionColumn`` bounds.
    """

    url: str
    dialect_name: str
    properties: dict[str, str] = field(default_factory=dict)

    @property
    def dialect(self) -> Dialect:
        return DIALECTS[self.dialect_name]

    def chunk_read_properties(self, repeatable_read: bool = True) -> dict[str, str]:
        """Connection properties for a chunked backfill read.

        ``repeatable_read`` adds the dialect's snapshot-consistency
        statement as ``sessionInitStatement`` — Spark executes it once per
        partition connection before the chunk query runs, the Spark-native
        equivalent of the reference's per-chunk
        ``BeginTx(Isolation: RepeatableRead)``
        (drivers/postgres/internal/backfill.go:34-38). An explicit
        ``sessionInitStatement`` in ``self.properties`` wins.
        """
        props = dict(self.properties)
        iso = self.dialect.chunk_isolation_sql
        if repeatable_read and iso and "sessionInitStatement" not in props:
            props["sessionInitStatement"] = iso
        return props

    def read_chunked(
        self,
        spark: SparkSession,
        schema: str,
        table: str,
        pk: str,
        chunks: list[Chunk],
        extra_filter: str = "",
        repeatable_read: bool = True,
    ) -> DataFrame:
        preds = chunks_to_predicates(self.dialect.q(pk), chunks)
        if extra_filter:
            preds = [f"({p}) AND ({extra_filter})" for p in preds]
        return spark.read.jdbc(
            url=self.url,
            table=self.dialect.qualified(schema, table),
            predicates=preds,
            properties=self.chunk_read_properties(repeatable_read),
        )

    def read_numeric_partitioned(
        self,
        spark: SparkSession,
        schema: str,
        table: str,
        pk: str,
        lower: int,
        upper: int,
        num_partitions: int,
        repeatable_read: bool = True,
    ) -> DataFrame:
        """Spark's built-in arithmetic split — the exact primitive the
        reference hand-rolls for numeric PKs."""
        return spark.read.jdbc(
            url=self.url,
            table=self.dialect.qualified(schema, table),
            column=pk,
            lowerBound=lower,
            upperBound=upper,
            numPartitions=num_partitions,
            properties=self.chunk_read_properties(repeatable_read),
        )

    def read_incremental(
        self,
        spark: SparkSession,
        schema: str,
        table: str,
        cursor: str,
        last_value: object,
        is_timestamp: bool = False,
        secondary: str | None = None,
        secondary_last: object | None = None,
    ) -> DataFrame:
        where = self.dialect.cursor_predicate(
            cursor, last_value, secondary, secondary_last, is_timestamp
        )
        sql = self.dialect.chunk_scan_sql(schema, table, None, where)
        return spark.read.jdbc(
            url=self.url, table=f"({sql}) olake_inc", properties=self.properties
        )
