"""Warm-session subset bench: same methodology as bench.py main() (shared
JVM, warm-up, clearCache + System.gc outside the timed window, best-of-3)
but only for the query names given on argv. Numbers are comparable to the
per-query map in BENCH_FULL.json, unlike --isolated (fresh-JVM cold start).

    SPARK_GRAFT_SF_DIR=... python tools/bench_subset.py q1 q2 ...
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load0 = round(os.getloadavg()[0], 2)

    from pyspark.sql import functions as F

    from olake_spark.session import get_spark

    spark = get_spark("olake_spark_bench_subset")
    tmp = tempfile.mkdtemp(prefix="olake_bench_sub_")
    warm = spark.range(100_000).withColumn("g", F.col("id") % 7)
    warm.repartition(8, "g").groupBy("g").count().write.mode("overwrite").parquet(
        f"{tmp}/warm"
    )
    spark.read.parquet(f"{tmp}/warm").count()
    bench._warm_python_workers(spark)

    def _unpersist_rdds() -> None:
        # clearCache() only evicts SQL-cached relations; blocks pinned by
        # localCheckpoint(eager=False) in earlier reps/queries linger until
        # the ContextCleaner runs, adding storage-memory pressure a fresh
        # session would not have. Evict them so reps stay comparable to
        # BENCH_FULL.json's per-query readings.
        jsc = spark.sparkContext._jsc.sc()
        it = jsc.getPersistentRDDs().values().iterator()
        while it.hasNext():
            it.next().unpersist(False)

    timings: dict[str, float] = {}
    for name in names:
        fn = bench.make_workload(name, spark, sf_dir, tmp)
        best = None
        for _ in range(reps):
            spark.catalog.clearCache()
            _unpersist_rdds()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)
        print(f"SUBSET {name} {best:.3f}s", flush=True)

    shutil.rmtree(tmp, ignore_errors=True)
    print(
        json.dumps(
            {
                "queries": timings,
                "value": round(sum(timings.values()), 3),
                "load_at_start": load0,
            }
        )
    )


if __name__ == "__main__":
    main()
