"""Kafka connector feature probe — the Kafka twin of sinks/iceberg_probe.

The engine's Kafka surface (``sources.kafka``) is planning + wire-format
decode that unit-tests everywhere; actually draining a live topic needs
the ``spark-sql-kafka-0-10`` connector (plus its runtime deps) on the
Spark classpath — config, not code. This probe finds those jars without
touching the network so the live suite lights up the moment any of these
resolves (first hit wins):

1. ``OLAKE_SPARK_KAFKA_JAR`` — explicit path to a vendored
   ``spark-sql-kafka-0-10`` jar (or a directory of connector jars).
2. ``~/.ivy2*/jars`` — a previously ``--packages``-resolved connector.
3. ``$SPARK_HOME/jars`` / ``/opt/spark/jars`` — distribution installs.
4. the pyspark pip package's own ``jars/`` directory.

When nothing resolves the live suite is *skipped, never faked* (no
bundled jar, no network, no broker in some environments — including this
one). Set ``OLAKE_SPARK_KAFKA_PACKAGES`` to a Maven coordinate (e.g.
``org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0``) to let Spark
resolve it over the network instead.

Reference parity target: drivers/kafka/internal/cdc.go:29-366 (bounded
consumer-group drain).
"""

from __future__ import annotations

import glob
import os

__all__ = ["find_kafka_jars", "kafka_session_conf"]

_CONNECTOR_GLOB = "*spark-sql-kafka-0-10*.jar"
# runtime companions the connector needs on the same classpath; globbed
# from wherever the connector itself was found
_DEP_GLOBS = (
    "*kafka-clients*.jar",
    "*spark-token-provider-kafka*.jar",
    "*commons-pool2*.jar",
)


def _jars_in(directory: str) -> list[str]:
    hits = sorted(glob.glob(os.path.join(directory, _CONNECTOR_GLOB)))
    if not hits:
        return []
    out = [hits[-1]]
    for pat in _DEP_GLOBS:
        deps = sorted(glob.glob(os.path.join(directory, pat)))
        if deps:
            out.append(deps[-1])
    return out


def find_kafka_jars() -> list[str] | None:
    """Locate the spark-sql-kafka connector (+ companion jars) without
    touching the network; None when no connector jar resolves."""
    explicit = os.environ.get("OLAKE_SPARK_KAFKA_JAR")
    if explicit:
        if os.path.isfile(explicit):
            return [explicit] + _jars_in(os.path.dirname(explicit))[1:]
        if os.path.isdir(explicit):
            found = _jars_in(explicit)
            if found:
                return found
    for ivy in glob.glob(os.path.expanduser("~/.ivy2*")):
        found = _jars_in(os.path.join(ivy, "jars"))
        if found:
            return found
    spark_home = os.environ.get("SPARK_HOME")
    if spark_home:
        found = _jars_in(os.path.join(spark_home, "jars"))
        if found:
            return found
    found = _jars_in("/opt/spark/jars")
    if found:
        return found
    try:
        import pyspark

        found = _jars_in(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
        if found:
            return found
    except ImportError:
        pass
    return None


def kafka_session_conf() -> dict[str, str] | None:
    """Session confs that put the connector on the classpath, or None when
    neither a local jar nor a packages coordinate is configured. The live
    suite skips on None — never fakes."""
    packages = os.environ.get("OLAKE_SPARK_KAFKA_PACKAGES")
    if packages:
        return {"spark.jars.packages": packages}
    jars = find_kafka_jars()
    if jars:
        return {"spark.jars": ",".join(jars)}
    return None
