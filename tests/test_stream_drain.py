"""Bounded-drain Structured Streaming replay: drain, stop, restart, exactly-once."""

from __future__ import annotations

from pyspark.sql import types as T

from olake_spark.sinks.table import ManagedTable
from olake_spark.streaming.replay import LAST_LSN_PROP, stream_drain
from tests.test_merge_replay import SCHEMA, _gen_changelog, _oracle, _rows_to_dict

_STRUCT = T.StructType(
    [
        T.StructField("lsn", T.LongType()),
        T.StructField("_op_type", T.StringType()),
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _case_drain_exactly_once(spark, tmp_path):
    changelog = _gen_changelog(n_ops=300, n_keys=40, seed=11)
    src = str(tmp_path / "changelog")
    # three LSN-ordered file drops, zero-padded so listing order == log order
    cuts = [0, 100, 200, 300]
    for i, (a, b) in enumerate(zip(cuts, cuts[1:])):
        spark.createDataFrame(changelog[a:b], SCHEMA).coalesce(1).write.parquet(
            f"{src}/drop_{i:04d}"
        )

    t = ManagedTable(spark, str(tmp_path / "target"))
    ckpt = str(tmp_path / "ckpt")
    stream_drain(
        spark, f"{src}/drop_*", _STRUCT, t, ["k"], "lsn", ckpt, max_files_per_trigger=1
    )
    assert _rows_to_dict(t.read().collect()) == _oracle(changelog)
    assert t.properties()[LAST_LSN_PROP] == 300
    v_after_first = t._versions()[-1]

    # drain again with the same checkpoint: nothing new → no new commits
    stream_drain(spark, f"{src}/drop_*", _STRUCT, t, ["k"], "lsn", ckpt)
    assert t._versions()[-1] == v_after_first
    assert _rows_to_dict(t.read().collect()) == _oracle(changelog)

    # crash-recovery: fresh checkpoint (lost) replays every file — the LSN
    # guard must keep the result exactly-once
    stream_drain(spark, f"{src}/drop_*", _STRUCT, t, ["k"], "lsn", str(tmp_path / "ckpt2"))
    assert _rows_to_dict(t.read().collect()) == _oracle(changelog)

    # late file arrives → only its rows apply
    extra = [(301, "c", 901, "late"), (302, "d", 0, None)]
    spark.createDataFrame(extra, SCHEMA).coalesce(1).write.parquet(f"{src}/drop_0004")
    stream_drain(spark, f"{src}/drop_*", _STRUCT, t, ["k"], "lsn", ckpt)
    assert _rows_to_dict(t.read().collect()) == _oracle(changelog + extra)
    assert t.properties()[LAST_LSN_PROP] == 302
