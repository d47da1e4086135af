"""End-to-end sync lifecycle over a file-drop source:
discover → full sync → no-op incremental → new file drop → merged → clear."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from olake_spark import cli
from olake_spark.plans.stream import Catalog
from olake_spark.sinks.table import ManagedTable
from olake_spark.sources.discover import discover_directory
from olake_spark.sync import clear_streams, run_sync


def TS_US():
    # approxQuantile is numeric-only; split on epoch micros of the ts column
    # (testdata ships ts as plain micros timestamp). Built lazily: Columns
    # need an active session, which doesn't exist at collection time.
    return F.unix_micros(F.col("ts").cast("timestamp"))


def _setup_source(spark, tmp_path):
    src = str(tmp_path / "src")
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    cut = ev.select(TS_US().alias("ts_us")).approxQuantile("ts_us", [0.5], 0.01)[0]
    ev.filter(TS_US() <= cut).write.parquet(f"{src}/events/drop0")
    spark.read.parquet("/root/testdata/sf0.001/region.parquet").write.parquet(f"{src}/region/r0")
    return src, ev, cut


def test_sync_lifecycle(spark, tmp_path):
    src, ev, cut = _setup_source(spark, tmp_path)
    dest = str(tmp_path / "dest")
    state_path = str(tmp_path / "state.json")

    cat = discover_directory(spark, src)
    by = {cs.stream.name: cs for cs in cat.streams}
    assert by["events"].stream.sync_mode == "incremental"
    assert by["region"].stream.sync_mode == "full_refresh"

    n_first = ev.filter(TS_US() <= cut).count()
    r1 = {r.stream: r for r in run_sync(spark, cat, src, dest, state_path)}
    assert r1["events"].rows == n_first
    assert r1["region"].rows == 5
    # engine columns landed
    t = ManagedTable(spark, f"{dest}/events")
    cols = set(t.read().columns)
    assert {"_olake_id", "_op_type", "_olake_timestamp", "_cdc_timestamp"} <= cols
    assert t.read().filter("_op_type != 'r'").count() == 0  # first load is backfill

    # second sync with no new data → incremental no-op
    r2 = {r.stream: r for r in run_sync(spark, cat, src, dest, state_path)}
    assert r2["events"].skipped is True
    assert ManagedTable(spark, f"{dest}/events").read().count() == n_first

    # a new file drop arrives with later cursor values
    ev.filter(TS_US() > cut).write.parquet(f"{src}/events/drop1")
    r3 = {r.stream: r for r in run_sync(spark, cat, src, dest, state_path)}
    # rows = rows written THIS run (observed on the write job itself; the
    # engine no longer re-scans the table for a post-write count)
    assert r3["events"].rows == ev.count() - n_first
    assert not r3["events"].skipped
    got = ManagedTable(spark, f"{dest}/events").read()
    assert got.count() == ev.count()
    assert got.select("_olake_id").distinct().count() == ev.count()
    assert got.filter("_op_type = 'u'").count() == ev.count() - n_first  # delta rows

    # clear drops the table and resets state
    cleared = clear_streams(spark, cat, dest, state_path, ["events"])
    assert cleared == ["events"]
    assert not ManagedTable(spark, f"{dest}/events").exists()


def test_cli_verbs(spark, tmp_path, capsys):
    src, _, _ = _setup_source(spark, tmp_path)
    dest = str(tmp_path / "dest")
    os.makedirs(dest, exist_ok=True)
    cat_path = str(tmp_path / "streams.json")
    state_path = str(tmp_path / "state.json")

    assert cli.main(["spec"]) == 0
    assert '"title"' in capsys.readouterr().out

    assert cli.main(["check", "--source-dir", src, "--dest-dir", dest]) == 0
    out = capsys.readouterr().out
    assert '"source": "ok"' in out and '"destination": "ok"' in out

    assert cli.main(["discover", "--source-dir", src, "--catalog", cat_path]) == 0
    capsys.readouterr()
    cat = Catalog.from_json(open(cat_path).read())
    assert {cs.stream.name for cs in cat.streams} == {"events", "region"}

    assert (
        cli.main(
            ["sync", "--source-dir", src, "--dest-dir", dest,
             "--catalog", cat_path, "--state", state_path]
        )
        == 0
    )
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")]
    assert len(lines) == 2

    assert (
        cli.main(
            ["clear", "--dest-dir", dest, "--catalog", cat_path,
             "--state", state_path, "--streams", "events"]
        )
        == 0
    )
    assert '"cleared": ["events"]' in capsys.readouterr().out


def test_sync_honors_catalog_destination(spark, tmp_path):
    """An explicit destination_database/table routes the sink path:
    prefix:namespace becomes directory levels, the table names the leaf."""
    import pyspark.sql.functions as F

    from olake_spark.plans.stream import (
        Catalog,
        ConfiguredStream,
        StreamMetadata,
        StreamSpec,
    )
    from olake_spark.plans.state import SyncState
    from olake_spark.sync import sync_stream

    df = spark.range(5).select(F.col("id").alias("pk"), F.lit("x").alias("v"))
    cs = ConfiguredStream(
        StreamSpec(
            "Orders", "public",
            df.schema.jsonValue(),
            source_defined_primary_key=["pk"],
            destination_database="lake:public",
            destination_table="orders_v2",
        ),
        StreamMetadata("Orders", "public"),
    )
    res = sync_stream(spark, cs, df, str(tmp_path / "dest"), SyncState())
    assert res.rows == 5
    from olake_spark.sinks.table import ManagedTable

    t = ManagedTable(spark, str(tmp_path / "dest" / "lake" / "public" / "orders_v2"))
    assert t.exists() and t.read().count() == 5


def test_default_stream_properties_seed_metadata():
    from olake_spark.plans.stream import Catalog

    doc = {
        "streams": [
            {
                "stream": {
                    "name": "t",
                    "namespace": "ns",
                    "default_stream_properties": {
                        "normalization": False,
                        "append_mode": True,
                    },
                }
            }
        ]
    }
    import json

    cat = Catalog.from_json(json.dumps(doc))
    m = cat.streams[0].metadata
    assert m.normalization is False and m.append_mode is True
