"""Dump .explain("formatted") for registry queries into plans/<tag>/.

Usage: python tools/dump_plans.py <tag> [suffix] [query ...]

Writes plans/<tag>/<query>_<suffix>.txt (suffix defaults to "before").
With no query names, dumps every query in bench.BENCH_QUERIES (the timed
workload set). Queries whose builders issue driver-side actions during
construction (bisection loops, fixture synthesis) still produce a plan for
the RETURNED DataFrame — the plan of the final dataflow, which is what the
optimization evidence needs.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tag = args[0] if args else "r11"
    suffix = args[1] if len(args) > 1 else "before"
    names = args[2:]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from bench import BENCH_QUERIES

    from olake_spark.queries import QUERIES
    from olake_spark.session import get_spark

    spark = get_spark("olake_spark_plans")
    if not names:
        names = [n for n in BENCH_QUERIES if n in QUERIES]

    failed: list[str] = []
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(buf.getvalue())
            print(f"ok {name}")
        except Exception as exc:  # noqa: BLE001 — report and continue
            failed.append(name)
            print(f"FAIL {name}: {exc}")
    if failed:
        print(f"failed: {failed}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
