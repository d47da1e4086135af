"""Live Kafka bounded-consume suite — runs wherever the spark-sql-kafka
connector jar AND a broker exist.

``kafka_probe.find_kafka_jars`` locates the connector (env var, ivy
cache, SPARK_HOME, pyspark dist); without it — or without a broker
address in ``OLAKE_SPARK_KAFKA_BOOTSTRAP`` — the live test SKIPS, never
fakes. The probe logic itself (no jar, no broker required) is covered
unconditionally below, so the escalation path stays green in sandboxes.
"""

from __future__ import annotations

import os

import pytest

from olake_spark.sources.kafka_probe import find_kafka_jars, kafka_session_conf


def test_probe_explicit_jar_env(tmp_path, monkeypatch):
    jar = tmp_path / "spark-sql-kafka-0-10_2.13-4.0.0.jar"
    jar.write_bytes(b"PK")
    (tmp_path / "kafka-clients-3.7.0.jar").write_bytes(b"PK")
    (tmp_path / "commons-pool2-2.12.0.jar").write_bytes(b"PK")
    monkeypatch.setenv("OLAKE_SPARK_KAFKA_JAR", str(tmp_path))
    jars = find_kafka_jars()
    assert jars is not None and jars[0] == str(jar)
    assert any("kafka-clients" in j for j in jars)
    conf = kafka_session_conf()
    assert conf is not None and str(jar) in conf["spark.jars"]


def test_probe_packages_env_wins(monkeypatch):
    monkeypatch.delenv("OLAKE_SPARK_KAFKA_JAR", raising=False)
    coord = "org.apache.spark:spark-sql-kafka-0-10_2.13:4.0.0"
    monkeypatch.setenv("OLAKE_SPARK_KAFKA_PACKAGES", coord)
    assert kafka_session_conf() == {"spark.jars.packages": coord}


def test_probe_none_without_jar(monkeypatch):
    monkeypatch.delenv("OLAKE_SPARK_KAFKA_JAR", raising=False)
    monkeypatch.delenv("OLAKE_SPARK_KAFKA_PACKAGES", raising=False)
    # in a jar-less sandbox this is None and the live test below skips;
    # on a machine with the connector installed it resolves — both valid
    conf = kafka_session_conf()
    assert conf is None or ("spark.jars" in conf)


_CONF = kafka_session_conf()
_BROKER = os.environ.get("OLAKE_SPARK_KAFKA_BOOTSTRAP")


@pytest.mark.skipif(
    _CONF is None or not _BROKER,
    reason="no spark-sql-kafka connector jar and/or no broker in env "
    "(set OLAKE_SPARK_KAFKA_JAR/_PACKAGES + OLAKE_SPARK_KAFKA_BOOTSTRAP)",
)
def test_live_bounded_consume():
    """Bounded drain of a live topic through the planner's options —
    executes only where a connector jar and broker are provided."""
    import subprocess
    import sys

    code = f"""
import sys
from pyspark.sql import SparkSession
from olake_spark.sources.kafka import KafkaSource

b = SparkSession.builder.master("local[2]").appName("kafka-live")
for k, v in {_CONF!r}.items():
    b = b.config(k, v)
spark = b.getOrCreate()
src = KafkaSource(bootstrap_servers={_BROKER!r}, topics=["olake-spark-live"])
df = (spark.read.format("kafka").options(**src.batch_options()).load())
df.limit(10).collect()  # connector + broker round trip
print("KAFKA_LIVE_OK", df.count())
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, timeout=300
    )
    assert "KAFKA_LIVE_OK" in out.stdout, out.stderr[-2000:]
