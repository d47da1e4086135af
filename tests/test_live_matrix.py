"""Live-source integration matrix — env-gated, skip-by-default.

Every JDBC/Mongo/Kafka planner in this repo is string- and fixture-verified,
but quoting/driver quirks only surface against real servers. This module is
the containerized-integration entry point: point the env vars below at live
services (docker-compose or otherwise) and the SAME code paths the unit
tests verify run end-to-end — discovery SQL against real catalogs, chunked
reads through real JDBC drivers, snapshot-consistency session init,
incremental cursor predicates.

Gates (each test skips, never fakes, when its gate is closed):

- ``OLAKE_LIVE_PG_URL``    e.g. jdbc:postgresql://localhost:5432/postgres
- ``OLAKE_LIVE_PG_USER`` / ``OLAKE_LIVE_PG_PASSWORD``
- ``OLAKE_LIVE_MYSQL_URL`` e.g. jdbc:mysql://localhost:3306/test
- ``OLAKE_LIVE_MYSQL_USER`` / ``OLAKE_LIVE_MYSQL_PASSWORD``
- ``OLAKE_LIVE_MONGO_URI`` (requires pymongo installed)
- the matching JDBC driver jar on the Spark classpath
  (``spark.jars`` / ``--packages``)

The matrix intentionally uses ONLY public engine surface
(``JdbcSource.read_chunked`` / ``read_numeric_partitioned`` /
``read_incremental``, the dialect discovery SQL) so a green run certifies
the code a user actually calls.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from olake_spark.plans.chunks import split_numeric_range
from olake_spark.sources.jdbc import DIALECTS, JdbcSource


def _jdbc_env(prefix: str) -> tuple[str, dict[str, str]] | None:
    url = os.environ.get(f"OLAKE_LIVE_{prefix}_URL")
    if not url:
        return None
    props = {}
    if os.environ.get(f"OLAKE_LIVE_{prefix}_USER"):
        props["user"] = os.environ[f"OLAKE_LIVE_{prefix}_USER"]
    if os.environ.get(f"OLAKE_LIVE_{prefix}_PASSWORD"):
        props["password"] = os.environ[f"OLAKE_LIVE_{prefix}_PASSWORD"]
    return url, props


def _require_driver(spark, klass: str) -> None:
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(klass)
    except Exception:
        pytest.skip(f"JDBC driver {klass} not on the Spark classpath")


def _query_df(spark, url: str, props: dict[str, str], sql: str):
    return spark.read.jdbc(url=url, table=f"({sql}) t", properties=props)


@pytest.fixture(scope="module")
def pg(spark):
    env = _jdbc_env("PG")
    if env is None:
        pytest.skip("OLAKE_LIVE_PG_URL not set")
    _require_driver(spark, "org.postgresql.Driver")
    url, props = env
    src = JdbcSource(url=url, dialect_name="postgres", properties=props)
    seed = (
        "DROP TABLE IF EXISTS olake_live_t; "
        "CREATE TABLE olake_live_t AS SELECT g AS id, g * 10 AS v, "
        "now() - (g || ' seconds')::interval AS updated_at "
        "FROM generate_series(1, 1000) g; "
        "ALTER TABLE olake_live_t ADD PRIMARY KEY (id)"
    )
    _exec_jdbc(spark, url, props, seed)
    return src


def _exec_jdbc(spark, url: str, props: dict[str, str], sql: str) -> None:
    jvm = spark.sparkContext._jvm
    p = jvm.java.util.Properties()
    for k, v in props.items():
        p.setProperty(k, v)
    conn = jvm.java.sql.DriverManager.getConnection(url, p)
    try:
        for stmt in sql.split("; "):
            conn.createStatement().execute(stmt)
    finally:
        conn.close()


def test_pg_discovery_sql_runs_live(spark, pg):
    d = DIALECTS["postgres"]
    tables = _query_df(spark, pg.url, pg.properties, d.list_tables_sql).collect()
    assert any(r[1] == "olake_live_t" for r in tables)
    pks = _query_df(
        spark,
        pg.url,
        pg.properties,
        d.primary_key_sql.format(schema="public", table="olake_live_t"),
    ).collect()
    assert [r[0] for r in pks] == ["id"]
    cols = _query_df(
        spark,
        pg.url,
        pg.properties,
        d.table_schema_sql.format(schema="public", table="olake_live_t"),
    ).collect()
    assert [c[0] for c in cols] == ["id", "v", "updated_at"]


def test_pg_chunked_backfill_round_trips(spark, pg):
    chunks = split_numeric_range(1, 1000, 8)
    df = pg.read_chunked(spark, "public", "olake_live_t", "id", chunks)
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == len(chunks)
    assert df.agg(F.sum("v")).first()[0] == sum(g * 10 for g in range(1, 1001))


def test_pg_numeric_partition_fast_path(spark, pg):
    df = pg.read_numeric_partitioned(spark, "public", "olake_live_t", "id", 1, 1000, 4)
    assert df.count() == 1000


def test_pg_incremental_cursor_scan(spark, pg):
    df = pg.read_incremental(spark, "public", "olake_live_t", "id", 900)
    got = sorted(r["id"] for r in df.collect())
    assert got == list(range(901, 1001))


@pytest.fixture(scope="module")
def mysql(spark):
    env = _jdbc_env("MYSQL")
    if env is None:
        pytest.skip("OLAKE_LIVE_MYSQL_URL not set")
    _require_driver(spark, "com.mysql.cj.jdbc.Driver")
    url, props = env
    return JdbcSource(url=url, dialect_name="mysql", properties=props)


def test_mysql_discovery_sql_runs_live(spark, mysql):
    d = DIALECTS["mysql"]
    _query_df(spark, mysql.url, mysql.properties, d.list_tables_sql).collect()


def test_mongo_split_vector_live():
    uri = os.environ.get("OLAKE_LIVE_MONGO_URI")
    if not uri:
        pytest.skip("OLAKE_LIVE_MONGO_URI not set")
    pymongo = pytest.importorskip("pymongo")
    from olake_spark.sources.mongo import bucket_auto_pipeline, regroup_split_vector

    client = pymongo.MongoClient(uri, serverSelectionTimeoutMS=5000)
    db = client.olake_live
    db.t.drop()
    db.t.insert_many({"n": i} for i in range(5000))
    buckets = list(db.t.aggregate(bucket_auto_pipeline("_id", 16)))
    assert buckets, "bucketAuto returned no buckets"
    try:
        sv = client.admin.command(
            "splitVector",
            "olake_live.t",
            keyPattern={"_id": 1},
            maxChunkSize=1,
        )
        chunks = regroup_split_vector([str(k["_id"]) for k in sv.get("splitKeys", [])])
        assert chunks
    except pymongo.errors.OperationFailure:
        pytest.skip("splitVector requires privileged access on this server")
