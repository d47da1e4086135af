"""Dialect SQL builder parity tests (no live database needed)."""

from olake_spark.plans.chunks import Chunk, chunks_to_predicates, split_numeric_range
from olake_spark.sources.jdbc import DIALECTS


def test_all_dialects_complete():
    for name, d in DIALECTS.items():
        assert d.list_tables_sql and d.table_schema_sql and d.primary_key_sql
        assert d.stats_sql
        assert "{v}" in d.timestamp_cast, name
    assert not DIALECTS["oracle"].supports_cdc
    assert not DIALECTS["db2"].supports_cdc
    assert DIALECTS["postgres"].supports_cdc


def test_quoting():
    assert DIALECTS["mysql"].qualified("db", "t") == "`db`.`t`"
    assert DIALECTS["postgres"].qualified("public", "orders") == '"public"."orders"'
    assert DIALECTS["postgres"].qualified("", "orders") == '"orders"'


def test_cursor_predicates():
    pg = DIALECTS["postgres"]
    assert pg.cursor_predicate("updated_at", "2024-01-01 00:00:00", is_timestamp=True) == (
        "\"updated_at\" > TO_TIMESTAMP('2024-01-01 00:00:00', 'YYYY-MM-DD HH24:MI:SS.US')"
    )
    # secondary-cursor null fallback
    got = pg.cursor_predicate("v", 10, secondary="id", secondary_last=99)
    assert got == '"v" > 10 OR ("v" IS NULL AND "id" > 99)'
    # threshold (backfill-overlap guard)
    assert pg.threshold_predicate("v", 10) == '"v" <= 10 OR "v" IS NULL'
    # string escaping
    assert DIALECTS["mysql"].cursor_predicate("s", "o'b") == "`s` > 'o''b'"


def test_boundary_probe_per_dialect():
    assert (
        DIALECTS["mysql"].boundary_probe_sql("db", "t", "id", 100, 5000)
        == "SELECT `id` FROM `db`.`t` WHERE `id` > 100 ORDER BY `id` LIMIT 1 OFFSET 5000"
    )
    assert "OFFSET 5000 ROWS FETCH NEXT 1 ROWS ONLY" in DIALECTS["mssql"].boundary_probe_sql(
        "dbo", "t", "id", None, 5000
    )
    assert "FETCH FIRST 1 ROWS ONLY" in DIALECTS["oracle"].boundary_probe_sql(
        "S", "T", "ID", 7, 1000
    )


def test_scan_sql_and_max_cursor():
    ms = DIALECTS["mssql"]
    assert (
        ms.chunk_scan_sql("dbo", "t", ["a", "b"], '"a" > 1')
        == 'SELECT "a", "b" FROM "dbo"."t" WHERE "a" > 1'
    )
    assert (
        ms.max_cursor_sql("dbo", "t", ["u", "v"])
        == 'SELECT MAX("u") AS "max_u", MAX("v") AS "max_v" FROM "dbo"."t"'
    )


def test_identifier_quote_escaping():
    # an embedded quote char must double, never terminate the identifier
    # (SQL-standard escaping; the reference relies on each driver's quoter)
    pg = DIALECTS["postgres"]
    assert pg.q('we"ird') == '"we""ird"'
    assert pg.qualified('s"s', 't') == '"s""s"."t"'
    my = DIALECTS["mysql"]
    assert my.q("my`table") == "`my``table`"
    # a malicious identifier cannot splice SQL past the quoting
    evil = 'x"; DROP TABLE users; --'
    assert pg.q(evil) == '"x""; DROP TABLE users; --"'
    assert pg.chunk_scan_sql("public", evil, None).count('"') % 2 == 0


def test_cursor_value_rendering_types():
    pg = DIALECTS["postgres"]
    assert pg.render_cursor_value("o'neil") == "'o''neil'"
    assert pg.render_cursor_value(True) == "TRUE"  # not Python's repr True
    assert pg.render_cursor_value(False) == "FALSE"
    assert pg.render_cursor_value(42) == "42"
    assert pg.render_cursor_value(4.5) == "4.5"
    import decimal

    assert pg.render_cursor_value(decimal.Decimal("10.25")) == "10.25"
    import pytest

    with pytest.raises(ValueError):
        pg.render_cursor_value(None)


def test_chunks_feed_predicates():
    chunks = split_numeric_range(0, 1000, 3)
    preds = chunks_to_predicates(DIALECTS["mysql"].q("id"), chunks)
    assert preds[0].startswith("(`id` >= 0 AND `id` < 334) OR `id` IS NULL")
    assert preds[-1] == "`id` >= 1002" or preds[-1].startswith("`id` >= ")
    # string chunks render with quoting+escaping
    spreds = chunks_to_predicates("k", [Chunk("a", "m"), Chunk("m", None)])
    assert spreds == ["(k >= 'a' AND k < 'm') OR k IS NULL", "k >= 'm'"]


def test_chunk_read_repeatable_read_properties():
    from olake_spark.sources.jdbc import DIALECTS, JdbcSource

    pg = JdbcSource("jdbc:postgresql://h/db", "postgres")
    props = pg.chunk_read_properties()
    assert props["sessionInitStatement"] == (
        "SET SESSION CHARACTERISTICS AS TRANSACTION "
        "ISOLATION LEVEL REPEATABLE READ, READ ONLY"
    )
    assert "REPEATABLE READ" in DIALECTS["mysql"].chunk_isolation_sql
    assert "READ COMMITTED" in DIALECTS["mssql"].chunk_isolation_sql
    # Oracle/DB2: no statement — dialect default consistency
    assert DIALECTS["oracle"].chunk_isolation_sql == ""
    assert JdbcSource("jdbc:oracle:thin:@h:1521/db", "oracle").chunk_read_properties() == {}
    # opt-out and explicit override both win
    assert "sessionInitStatement" not in pg.chunk_read_properties(repeatable_read=False)
    custom = JdbcSource(
        "jdbc:postgresql://h/db", "postgres",
        properties={"sessionInitStatement": "SET x"},
    )
    assert custom.chunk_read_properties()["sessionInitStatement"] == "SET x"
