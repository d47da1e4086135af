"""streams.json catalog, state doc, projection, discover, sinks contracts."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from olake_spark.functions.projection import apply_projection
from olake_spark.plans.chunks import Chunk
from olake_spark.plans.state import SyncState
from olake_spark.plans.stream import Catalog, ConfiguredStream, StreamMetadata, StreamSpec
from olake_spark.sinks.iceberg import (
    merge_into_sql,
    parse_partition_regex,
    partition_ddl,
)
from olake_spark.sinks.parquet_sink import parse_partition_template, write_partitioned
from olake_spark.sources.discover import discover_directory, infer_schema_from_samples


def _cat() -> Catalog:
    spec = StreamSpec(
        name="orders",
        namespace="public",
        schema_json={"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": False, "metadata": {}}]},
        supported_sync_modes=["full_refresh", "incremental", "cdc"],
        source_defined_primary_key=["id"],
        available_cursor_fields=["updated_at"],
    )
    spec.sync_mode = spec.default_sync_mode()
    meta = StreamMetadata(stream_name="orders", namespace="public", filter="id > 5")
    return Catalog(selected_streams={"public": [meta]}, streams=[ConfiguredStream(spec, meta)])


def test_catalog_roundtrip_and_mode_priority():
    cat = _cat()
    assert cat.streams[0].stream.sync_mode == "cdc"  # cdc wins priority
    again = Catalog.from_json(cat.to_json())
    assert again.streams[0].stream.name == "orders"
    assert again.streams[0].metadata.filter == "id > 5"
    f = again.streams[0].metadata.stream_filter()
    assert f.to_sql() == "id > 5"


def test_catalog_merge_rediscover():
    cat = _cat()
    fresh_spec = StreamSpec(name="orders", namespace="public",
                            schema_json={"type": "struct", "fields": []},
                            supported_sync_modes=["full_refresh"])
    new_spec = StreamSpec(name="customers", namespace="public",
                          schema_json={"type": "struct", "fields": []})
    fresh = Catalog(streams=[
        ConfiguredStream(fresh_spec, StreamMetadata(stream_name="orders")),
        ConfiguredStream(new_spec, StreamMetadata(stream_name="customers")),
    ])
    merged = cat.merge_rediscovered(fresh)
    by = {cs.stream.name: cs for cs in merged.streams}
    assert by["orders"].metadata.filter == "id > 5"  # user metadata survives
    assert by["orders"].stream.sync_mode == "cdc"  # chosen mode survives
    assert "customers" in by  # new stream added
    assert merged.selected_streams["public"][0].stream_name == "orders"
    assert cat.diff(fresh) == {"added": ["public.customers"], "removed": []}


def test_state_resume_and_reconcile(tmp_path):
    st = SyncState()
    chunks = st.get_or_plan_chunks("orders", lambda: [Chunk(0, 10), Chunk(10, None)])
    assert len(chunks) == 2
    st.complete_chunk("orders", chunks[0])
    # replanning must NOT happen — pending set survives
    assert st.get_or_plan_chunks("orders", lambda: [Chunk(99, None)]) == [Chunk(10, None)]
    st.set_cursor("orders", "updated_at", 100)
    p = str(tmp_path / "state.json")
    st.save(p)
    st2 = SyncState.load(p)
    assert st2.get_cursor("orders", "updated_at") == 100
    assert st2.streams["orders"].chunks == [Chunk(10, None)]
    # 2PC: table committed ahead of local state → adopt
    assert st2.reconcile("orders", "updated_at", 150) is True
    assert st2.get_cursor("orders", "updated_at") == 150
    assert st2.reconcile("orders", "updated_at", 120) is False  # behind → keep


def test_projection_semantics(spark):
    df = spark.createDataFrame([(1, "a", 2.0, "x")], "id long, s string, v double, extra string")
    # allowlist without new-column sync: exactly the allowlist
    got = apply_projection(df, ["id", "v"], sync_new_columns=False)
    assert got.columns == ["id", "v"]
    # with sync_new_columns: 'extra' was unknown at selection time → kept;
    # 's' was known and de-selected → dropped
    got = apply_projection(df, ["id", "v"], sync_new_columns=True,
                           known_at_selection=["id", "s", "v"])
    assert got.columns == ["id", "v", "extra"]
    assert apply_projection(df, None).columns == df.columns


def test_infer_schema_from_samples():
    schema = infer_schema_from_samples([
        {"a": 1, "b": "x", "evolving": 1},
        {"a": 2**40, "c": True, "evolving": 1.5},
        {"evolving": "now a string", "nested": {"k": 1}, "arr": [1, 2]},
    ])
    types = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert types["a"] == "bigint"  # int32 ∪ int64 → int64
    assert types["evolving"] == "string"  # int ∪ double ∪ string → string
    assert types["nested"] == "string"  # object → JSON string column
    assert types["arr"] == "string"
    assert [f.name for f in schema.fields] == ["a", "b", "evolving", "c", "nested", "arr"]


def test_discover_directory(spark):
    cat = discover_directory(spark, "/root/testdata/sf0.001")
    names = {cs.stream.name for cs in cat.streams}
    assert {"orders", "lineitem", "events", "documents"} <= names
    ev = next(cs for cs in cat.streams if cs.stream.name == "events")
    assert ev.stream.source_defined_primary_key == ["event_id"]
    assert ev.stream.sync_mode == "incremental"  # has a ts cursor
    reg = next(cs for cs in cat.streams if cs.stream.name == "region")
    assert reg.stream.sync_mode == "full_refresh"


def test_partition_template_sink(spark, tmp_path):
    segs = parse_partition_template("/{o_orderdate, unknown, MM}/{o_orderstatus, na,}")
    assert [s.column for s in segs] == ["o_orderdate", "o_orderstatus"]
    assert segs[0].granularity == "MM"
    df = spark.createDataFrame(
        [(1, "2024-03-05 10:00:00", "O"), (2, None, None)],
        "id long, o_orderdate string, o_orderstatus string",
    ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp"))
    out = str(tmp_path / "part")
    cols = write_partitioned(df, out, "/{o_orderdate, unknown, MM}/{o_orderstatus, na,}",
                             mode="overwrite")
    assert cols == ["_p_o_orderdate_mm", "_p_o_orderstatus"]
    dirs = sorted(os.listdir(out))
    assert "_p_o_orderdate_mm=2024-03" in dirs
    assert "_p_o_orderdate_mm=unknown" in dirs  # null → fallback bucket
    back = spark.read.parquet(out)
    assert back.count() == 2


def test_iceberg_sql_generation():
    fields = parse_partition_regex("/{now(), day}/{l_orderkey, bucket[16]}/{name,}")
    assert fields[0].column == "_olake_timestamp" and fields[0].transform == "day"
    assert fields[1].transform == "bucket" and fields[1].n == 16
    assert fields[2].transform == "identity"
    ddl = partition_ddl("cat.db.t", fields)
    assert ddl[0] == "ALTER TABLE cat.db.t ADD PARTITION FIELD days(_olake_timestamp)"
    assert ddl[1] == "ALTER TABLE cat.db.t ADD PARTITION FIELD bucket(16, l_orderkey)"
    sql = merge_into_sql("cat.db.t", "src", ["_olake_id", "_op_type", "v"])
    assert "WHEN MATCHED AND s._op_type = 'd' THEN DELETE" in sql
    assert "WHEN NOT MATCHED AND s._op_type != 'd' THEN INSERT" in sql
    with pytest.raises(ValueError):
        parse_partition_regex("/{c, wat}")


def _mk_catalog(sync_mode="incremental", cursor=("ts",), **meta_over):
    from olake_spark.plans.stream import (
        Catalog,
        ConfiguredStream,
        StreamMetadata,
        StreamSpec,
    )

    spec = StreamSpec(
        name="events", namespace="public", sync_mode=sync_mode,
        available_cursor_fields=list(cursor),
        supported_sync_modes=["full_refresh", "incremental"],
    )
    meta = StreamMetadata(stream_name="events", namespace="public", **meta_over)
    return Catalog(
        selected_streams={"public": [meta]},
        streams=[ConfiguredStream(spec, meta)],
    )


def test_streams_delta_property_changes():
    old = _mk_catalog()
    # identical catalogs → empty delta
    assert _mk_catalog().streams_delta(_mk_catalog()).streams == []
    # metadata property change → stream in delta
    changed = _mk_catalog(normalization=False)
    d = old.streams_delta(changed)
    assert [cs.stream.name for cs in d.streams] == ["events"]
    assert d.selected_streams["public"][0].normalization is False
    # sync-mode change
    assert old.streams_delta(_mk_catalog(sync_mode="full_refresh")).streams != []
    # cursor change matters only for incremental streams
    assert old.streams_delta(_mk_catalog(cursor=("other",))).streams != []
    fr_old = _mk_catalog(sync_mode="full_refresh")
    fr_new = _mk_catalog(sync_mode="full_refresh", cursor=("other",))
    assert fr_old.streams_delta(fr_new).streams == []


def test_streams_delta_new_stream_and_artifact(tmp_path):
    from olake_spark.plans.stream import Catalog

    empty = Catalog()
    new = _mk_catalog()
    path = str(tmp_path / "difference_streams.json")
    delta = empty.write_difference(new, path)
    assert [cs.stream.name for cs in delta.streams] == ["events"]
    # the artifact is a loadable catalog document
    reloaded = Catalog.from_json(open(path).read())
    assert [cs.stream.name for cs in reloaded.streams] == ["events"]


def test_generate_destination_details():
    from olake_spark.plans.stream import generate_destination_details

    assert generate_destination_details("Public", "My-Table", "AppDB") == (
        "appdb:public",
        "my_table",
    )
    assert generate_destination_details("", "T", None, prefix="lake") == ("lake", "t")
    # no prefix, no source db: db is just the namespace marker
    assert generate_destination_details("ns", "t") == (":ns", "t")


def test_merge_preserves_destination_and_cursor():
    from olake_spark.plans.stream import (
        Catalog,
        ConfiguredStream,
        StreamMetadata,
        StreamSpec,
    )
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("a", T.LongType())]).jsonValue()
    old = Catalog(
        streams=[
            ConfiguredStream(
                StreamSpec(
                    "t1", "ns", schema, sync_mode="incremental",
                    cursor_field="a", source_defined_primary_key=["a"],
                    destination_database="lake:ns", destination_table="t1_renamed",
                ),
                StreamMetadata("t1", "ns"),
            )
        ],
        selected_streams={"ns": [StreamMetadata("t1", "ns")]},
    )
    fresh = Catalog(
        streams=[
            ConfiguredStream(StreamSpec("t1", "ns", schema), StreamMetadata("t1", "ns")),
            ConfiguredStream(StreamSpec("t2", "ns2", schema), StreamMetadata("t2", "ns2")),
        ]
    )
    merged = old.merge_rediscovered(fresh)
    by = {(c.stream.namespace, c.stream.name): c.stream for c in merged.streams}
    t1 = by[("ns", "t1")]
    assert t1.cursor_field == "a"
    assert t1.source_defined_primary_key == ["a"]
    assert (t1.destination_database, t1.destination_table) == ("lake:ns", "t1_renamed")
    # new stream inherits the prefix scheme: lake:<its namespace>
    assert by[("ns2", "t2")].destination_database == "lake:ns2"
    # new streams are NOT auto-selected
    assert "ns2" not in merged.selected_streams


def test_merge_constant_destination_db():
    from olake_spark.plans.stream import Catalog, ConfiguredStream, StreamMetadata, StreamSpec
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("a", T.LongType())]).jsonValue()
    old = Catalog(
        streams=[
            ConfiguredStream(
                StreamSpec("t1", "ns", schema, destination_database="warehouse"),
                StreamMetadata("t1", "ns"),
            )
        ]
    )
    fresh = Catalog(
        streams=[
            ConfiguredStream(StreamSpec("t1", "ns", schema), StreamMetadata("t1", "ns")),
            ConfiguredStream(StreamSpec("t9", "zz", schema), StreamMetadata("t9", "zz")),
        ]
    )
    merged = old.merge_rediscovered(fresh)
    by = {c.stream.name: c.stream for c in merged.streams}
    # constant (un-prefixed) destination db propagates verbatim to new streams
    assert by["t9"].destination_database == "warehouse"


def test_merge_selected_columns_rules():
    from olake_spark.plans.stream import StreamMetadata, StreamSpec, merge_selected_columns
    from pyspark.sql import types as T

    def spec(cols):
        return StreamSpec(
            "t", "ns",
            T.StructType([T.StructField(c, T.StringType()) for c in cols]).jsonValue(),
        )

    old = spec(["a", "b", "_olake_id"])
    new = spec(["a", "b", "c", "_olake_id"])
    # no previous selection: everything in the new schema
    m0 = merge_selected_columns(StreamMetadata("t", "ns"), old, new)
    assert set(m0.selected_columns) == {"a", "b", "c", "_olake_id"}
    # previous selection + sync_new_columns: keep a, add the new c, always
    # keep engine columns; the un-selected b stays out
    m1 = merge_selected_columns(
        StreamMetadata("t", "ns", selected_columns=["a"], sync_new_columns=True), old, new
    )
    assert set(m1.selected_columns) == {"a", "c", "_olake_id"}
    # sync_new_columns off: new column c is NOT adopted
    m2 = merge_selected_columns(
        StreamMetadata("t", "ns", selected_columns=["a"], sync_new_columns=False), old, new
    )
    assert set(m2.selected_columns) == {"a", "_olake_id"}
    # a selected column that vanished from the source drops out
    m3 = merge_selected_columns(
        StreamMetadata("t", "ns", selected_columns=["a", "gone"], sync_new_columns=False),
        old, spec(["a", "_olake_id"]),
    )
    assert set(m3.selected_columns) == {"a", "_olake_id"}


def test_delta_on_destination_rename():
    from olake_spark.plans.stream import Catalog, ConfiguredStream, StreamMetadata, StreamSpec
    from pyspark.sql import types as T

    schema = T.StructType([T.StructField("a", T.LongType())]).jsonValue()

    def cat(dest_table):
        return Catalog(
            streams=[
                ConfiguredStream(
                    StreamSpec("t1", "ns", schema, destination_table=dest_table),
                    StreamMetadata("t1", "ns"),
                )
            ],
            selected_streams={"ns": [StreamMetadata("t1", "ns")]},
        )

    delta = cat("t1").streams_delta(cat("t1_v2"))
    assert [c.stream.name for c in delta.streams] == ["t1"]
    assert cat("t1").streams_delta(cat("t1")).streams == []
