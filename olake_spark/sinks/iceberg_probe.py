"""Iceberg runtime feature probe + live verification suite.

The engine's Iceberg surface (``sinks.iceberg``) is SQL/DDL generation that
unit-tests everywhere; this module is the *live* half: find an Iceberg Spark
runtime jar, build a session with the Iceberg extensions against a local
Hadoop catalog, and drive the full sink behavior — append, equality-delete
MERGE upsert, partition transforms, schema evolution, snapshot properties
(the 2PC position channel) — against a real catalog.

Probe order (first hit wins):

1. ``OLAKE_SPARK_ICEBERG_JAR`` — explicit path to a vendored/offline
   ``iceberg-spark-runtime`` jar (or a directory containing one).
2. ``~/.ivy2*/jars`` — a previously ``--packages``-resolved runtime.
3. ``$SPARK_HOME/jars`` — a distribution-level Spark install (e.g.
   ``/opt/spark``), which is where this environment's Spark lives.
4. the pyspark pip package's own ``jars/`` directory.

When nothing resolves the suite is *skipped, never faked* — there is no
bundled jar and no network in some environments (including this one). Set
``OLAKE_SPARK_ICEBERG_PACKAGES`` to a Maven coordinate to let Spark resolve
it over the network instead.

Reference parity target: destination/iceberg/iceberg.go:59-288 (catalog
bootstrap, MERGE writer hand-off) and the Java writer's
BaseDeltaTaskWriter.java:51-68 row semantics.
"""

from __future__ import annotations

import glob
import os

__all__ = ["find_iceberg_jar", "iceberg_session_conf", "run_live_suite"]

_RUNTIME_GLOB = "*iceberg-spark-runtime*.jar"


def find_iceberg_jar() -> str | None:
    """Locate an Iceberg Spark runtime jar without touching the network."""
    explicit = os.environ.get("OLAKE_SPARK_ICEBERG_JAR")
    if explicit:
        if os.path.isfile(explicit):
            return explicit
        if os.path.isdir(explicit):  # vendored-jar directory
            hits = sorted(glob.glob(os.path.join(explicit, _RUNTIME_GLOB)))
            if hits:
                return hits[-1]
    candidates: list[str] = []
    for ivy in glob.glob(os.path.expanduser("~/.ivy2*")):
        candidates += glob.glob(os.path.join(ivy, "jars", _RUNTIME_GLOB))
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        candidates += glob.glob(os.path.join(spark_home, "jars", _RUNTIME_GLOB))
    candidates += glob.glob(os.path.join("/opt/spark", "jars", _RUNTIME_GLOB))
    try:
        import pyspark

        candidates += glob.glob(
            os.path.join(os.path.dirname(pyspark.__file__), "jars", _RUNTIME_GLOB)
        )
    except ImportError:  # pragma: no cover
        pass
    return sorted(candidates)[-1] if candidates else None


def iceberg_session_conf(warehouse: str, catalog: str = "local") -> dict[str, str] | None:
    """Session conf enabling Iceberg against a local Hadoop catalog, or None
    when no runtime is obtainable (no jar found, no packages override)."""
    conf = {
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
    }
    jar = find_iceberg_jar()
    if jar is not None:
        conf["spark.jars"] = jar
        return conf
    packages = os.environ.get("OLAKE_SPARK_ICEBERG_PACKAGES")
    if packages:
        conf["spark.jars.packages"] = packages
        return conf
    return None


def run_live_suite(warehouse: str) -> dict:
    """Drive the whole Iceberg sink surface against a real local catalog.

    Must run in a FRESH Python process: Iceberg extensions and jars bind at
    JVM launch and cannot be injected into an already-running gateway (the
    test harness invokes this via subprocess). Returns a step→ok dict;
    raises on the first real failure so the harness sees the traceback.
    """
    conf = iceberg_session_conf(warehouse)
    if conf is None:
        raise RuntimeError("no Iceberg runtime available (probe found nothing)")

    from pyspark.sql import Row, functions as F

    from olake_spark.functions.olake_columns import OLAKE_ID, OLAKE_TS, OP_TYPE
    from olake_spark.session import get_spark
    from olake_spark.sinks.iceberg import (
        IcebergPartitionField,
        IcebergSink,
        transform_column,
    )

    spark = get_spark("olake_spark_iceberg_live", extra_conf=conf)
    results: dict[str, bool] = {}
    tbl = "local.db.events_live"

    base = spark.createDataFrame(
        [
            Row(**{OLAKE_ID: "a", "v": 1, OP_TYPE: "c", "_cdc_timestamp": 1,
                   OLAKE_TS: "2024-03-05T10:00:00"}),
            Row(**{OLAKE_ID: "b", "v": 2, OP_TYPE: "c", "_cdc_timestamp": 1,
                   OLAKE_TS: "2024-07-20T22:00:00"}),
        ]
    ).withColumn(OLAKE_TS, F.to_timestamp(OLAKE_TS))

    sink = IcebergSink(spark, tbl)
    sink.create_from(base, partition_regex="/{now(), month}")
    sink.append(base)
    results["create_append"] = spark.table(tbl).count() == 2

    # equality-delete MERGE: update a, delete b, insert c in one batch
    batch = spark.createDataFrame(
        [
            Row(**{OLAKE_ID: "a", "v": 10, OP_TYPE: "u", "_cdc_timestamp": 2,
                   OLAKE_TS: "2024-03-06T10:00:00"}),
            Row(**{OLAKE_ID: "b", "v": 0, OP_TYPE: "d", "_cdc_timestamp": 2,
                   OLAKE_TS: "2024-07-21T22:00:00"}),
            Row(**{OLAKE_ID: "c", "v": 3, OP_TYPE: "c", "_cdc_timestamp": 2,
                   OLAKE_TS: "2024-08-01T00:00:00"}),
        ]
    ).withColumn(OLAKE_TS, F.to_timestamp(OLAKE_TS))
    sink.upsert(batch)
    state = {r[OLAKE_ID]: r["v"] for r in spark.table(tbl).collect()}
    results["merge_upsert"] = state == {"a": 10, "c": 3}

    # partition transform parity: catalog-computed month ordinal == engine expr
    parts = {
        r["partition"]["_olake_timestamp_month"]
        for r in spark.sql(f"SELECT partition FROM {tbl}.files").collect()
    }
    expected = {
        r[0]
        for r in spark.table(tbl)
        .select(transform_column(IcebergPartitionField(OLAKE_TS, "month")))
        .collect()
    }
    results["partition_transform"] = parts == expected

    # schema evolution: widen with a new column, old rows read as null
    spark.sql(f"ALTER TABLE {tbl} ADD COLUMN extra STRING")
    results["schema_evolution"] = "extra" in spark.table(tbl).columns

    # snapshot/table property — the 2PC committed-position channel
    sink.set_property("olake.state.lsn", "0/AB12")
    props = {
        r["key"]: r["value"]
        for r in spark.sql(f"SHOW TBLPROPERTIES {tbl}").collect()
    }
    results["commit_property"] = props.get("olake.state.lsn") == "0/AB12"

    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    failed = [k for k, ok in results.items() if not ok]
    if failed:
        raise AssertionError(f"iceberg live steps failed: {failed}: {results}")
    return results
