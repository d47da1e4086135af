"""Live Iceberg catalog suite — runs wherever an Iceberg runtime jar exists.

``iceberg_probe.find_iceberg_jar`` locates a runtime (env var, ivy cache,
pyspark jars); when nothing resolves these tests SKIP — they never fake a
catalog. The live half executes in a fresh subprocess because Iceberg
extensions bind at JVM launch and cannot be added to the already-running
test gateway.

The probe logic itself (no jar required) is covered unconditionally below.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from olake_spark.sinks.iceberg_probe import (
    find_iceberg_jar,
    iceberg_session_conf,
    run_live_suite,
)

_HAVE_RUNTIME = (
    find_iceberg_jar() is not None or os.environ.get("OLAKE_SPARK_ICEBERG_PACKAGES")
)


def test_probe_explicit_jar_env(tmp_path, monkeypatch):
    jar = tmp_path / "iceberg-spark-runtime-4.0_2.13-1.10.0.jar"
    jar.write_bytes(b"PK")
    monkeypatch.setenv("OLAKE_SPARK_ICEBERG_JAR", str(jar))
    assert find_iceberg_jar() == str(jar)
    conf = iceberg_session_conf(str(tmp_path / "wh"))
    assert conf is not None and conf["spark.jars"] == str(jar)
    assert "IcebergSparkSessionExtensions" in conf["spark.sql.extensions"]
    assert conf["spark.sql.catalog.local.type"] == "hadoop"


def test_probe_packages_fallback(tmp_path, monkeypatch):
    monkeypatch.delenv("OLAKE_SPARK_ICEBERG_JAR", raising=False)
    coord = "org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0"
    monkeypatch.setenv("OLAKE_SPARK_ICEBERG_PACKAGES", coord)
    if find_iceberg_jar() is None:
        conf = iceberg_session_conf(str(tmp_path / "wh"))
        assert conf is not None and conf["spark.jars.packages"] == coord


def test_probe_honest_none(monkeypatch):
    monkeypatch.delenv("OLAKE_SPARK_ICEBERG_JAR", raising=False)
    monkeypatch.delenv("OLAKE_SPARK_ICEBERG_PACKAGES", raising=False)
    if find_iceberg_jar() is None:
        assert iceberg_session_conf("/tmp/wh") is None
        with pytest.raises(RuntimeError, match="probe found nothing"):
            run_live_suite("/tmp/wh")


@pytest.mark.skipif(not _HAVE_RUNTIME, reason="no Iceberg runtime jar resolvable")
def test_iceberg_live_suite(tmp_path):
    """Full sink behavior against a real local Hadoop catalog (fresh JVM)."""
    code = (
        "import json, sys\n"
        "from olake_spark.sinks.iceberg_probe import run_live_suite\n"
        f"print(json.dumps(run_live_suite({str(tmp_path / 'wh')!r})))\n"
    )
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    import json

    results = json.loads(proc.stdout.strip().splitlines()[-1])
    assert all(results.values()) and set(results) == {
        "create_append",
        "merge_upsert",
        "partition_transform",
        "schema_evolution",
        "commit_property",
    }
