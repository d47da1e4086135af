#!/usr/bin/env python
"""Full-load throughput experiment matrix — measure, don't guess.

Runs the headline full_load workload (scan → olake-column stamp → parquet
sink) under one named variant per fresh subprocess/JVM (cold-start excluded
via an untimed warm rep), printing rows/sec for each. Used to pick the
engine's write-path defaults against BASELINE.md's 580k rows/s reference
number.

    python tools/fullload_tune.py                 # run all variants
    python tools/fullload_tune.py current lz4     # named subset
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

VARIANTS: dict[str, dict] = {
    # name -> {conf: {...}, coalesce: N|None, spread: bool}
    "current": {},
    "lz4": {"conf": {"spark.sql.parquet.compression.codec": "lz4_raw"}},
    "zstd1": {"conf": {
        "spark.sql.parquet.compression.codec": "zstd",
        "spark.io.compression.zstd.level": "1",
    }},
    "uncompressed": {"conf": {"spark.sql.parquet.compression.codec": "uncompressed"}},
    "no_spread": {"spread": False},
    "coalesce8": {"coalesce": 8},
    "committer_v2": {"conf": {
        "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    }},
    "no_summary": {"conf": {
        "spark.hadoop.parquet.summary.metadata.level": "NONE",
        "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs": "false",
    }},
    # attribution probes (not candidate defaults — md5 _olake_id is parity):
    # how much of the wall is the identity stamp at all, and how much is
    # specifically md5 vs a cheap 64-bit hash?
    "no_stamp": {"stamp": "none"},
    "xxh64_id": {"stamp": "xxh64"},
}

_CHILD = """
import json, os, sys, tempfile, time
sys.path.insert(0, os.environ["FL_REPO"])
spec = json.loads(os.environ["FL_SPEC"])
from olake_spark.session import get_spark
spark = get_spark("fl_tune", extra_conf=spec.get("conf") or {})
from olake_spark.functions.olake_columns import stamp_olake_columns
from olake_spark.queries import table
from olake_spark.sources.files import spread

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
tmp = tempfile.mkdtemp(prefix="fl_tune_")
rows = table(spark, sf_dir, "lineitem").count()

from pyspark.sql import functions as F

def rep():
    df = table(spark, sf_dir, "lineitem")
    if spec.get("spread", True):
        df = spread(df, "l_orderkey")
    stamp = spec.get("stamp", "md5")
    if stamp == "none":
        out = df
    elif stamp == "xxh64":
        out = df.withColumn(
            "_olake_id", F.xxhash64("l_orderkey", "l_linenumber").cast("string")
        ).withColumn("_op_type", F.lit("r"))
    else:
        out = stamp_olake_columns(df, pk_cols=["l_orderkey", "l_linenumber"])
    if spec.get("coalesce"):
        out = out.coalesce(spec["coalesce"])
    out.write.mode("overwrite").parquet(tmp + "/full_load")

rep()  # warm (JIT, committer init) — untimed
walls = []
for _ in range(5):
    t0 = time.time(); rep(); walls.append(time.time() - t0)
best = min(walls)
print(json.dumps({"rows": rows, "best_s": round(best, 3),
                  "rps": round(rows / best), "walls": [round(w, 3) for w in walls]}))
"""


def main() -> int:
    names = sys.argv[1:] or list(VARIANTS)
    results = {}
    for name in names:
        env = dict(os.environ, FL_REPO=REPO, FL_SPEC=json.dumps(VARIANTS[name]))
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "-c", _CHILD], capture_output=True, text=True, env=env
        )
        line = (p.stdout.strip().splitlines() or [""])[-1]
        try:
            results[name] = json.loads(line)
        except Exception:
            results[name] = {"error": p.stderr[-500:]}
        print(name, "->", results[name], f"[{time.time()-t0:.0f}s total]", flush=True)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
