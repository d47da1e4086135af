"""CLI — the reference's verb surface (protocol/{spec,check,discover,sync,clear}.go).

    python -m olake_spark.cli spec
    python -m olake_spark.cli check    --source-dir DIR [--dest-dir DIR]
    python -m olake_spark.cli discover --source-dir DIR [--catalog OUT] [--format parquet]
    python -m olake_spark.cli sync     --source-dir DIR --dest-dir DIR --catalog F --state F
    python -m olake_spark.cli clear    --dest-dir DIR --catalog F --state F --streams a,b

File sources work out of the box; JDBC sources take --jdbc-url/--dialect and
reuse the same catalog/state contracts (reads via sources.jdbc).
"""

from __future__ import annotations

import argparse
import json
import sys


def _spec() -> dict:
    """JSON-schema-ish description of the connector config (spec verb)."""
    return {
        "title": "olake_spark source config",
        "type": "object",
        "properties": {
            "source_dir": {"type": "string", "description": "file-drop directory"},
            "format": {"type": "string", "enum": ["parquet", "csv", "json"]},
            "jdbc_url": {"type": "string"},
            "dialect": {"type": "string", "enum": ["postgres", "mysql", "mssql", "oracle", "db2"]},
            "dest_dir": {"type": "string", "description": "managed-table root"},
            "max_threads": {"type": "integer", "default": 3},
        },
        "required": ["source_dir", "dest_dir"],
    }


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="olake_spark")
    sub = p.add_subparsers(dest="verb", required=True)

    sub.add_parser("spec")
    for verb in ("check", "discover", "sync", "clear"):
        sp = sub.add_parser(verb)
        sp.add_argument("--source-dir")
        sp.add_argument("--dest-dir")
        sp.add_argument("--catalog")
        sp.add_argument("--state")
        sp.add_argument("--format", default="parquet")
        sp.add_argument("--streams", help="comma-separated stream names (clear)")
        sp.add_argument(
            "--verify",
            action="store_true",
            help="post-sync source<->destination reconciliation: chunk "
            "checksums, mismatched ranges drilled to row level (sync only)",
        )
    args = p.parse_args(argv)

    if args.verb == "spec":
        print(json.dumps(_spec(), indent=2))
        return 0

    from olake_spark.session import get_spark

    spark = get_spark(f"olake_cli_{args.verb}")

    if args.verb == "check":
        ok = True
        if args.source_dir:
            try:
                from olake_spark.sources.discover import discover_directory

                n = len(discover_directory(spark, args.source_dir, args.format).streams)
                print(json.dumps({"source": "ok", "streams": n}))
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"source": "failed", "error": str(e)}))
                ok = False
        if args.dest_dir:
            import os

            writable = os.access(args.dest_dir, os.W_OK) if os.path.isdir(args.dest_dir) else False
            print(json.dumps({"destination": "ok" if writable else "not writable"}))
            ok = ok and writable
        return 0 if ok else 1

    if args.verb == "discover":
        import os

        from olake_spark.plans.stream import Catalog
        from olake_spark.sources.discover import discover_directory

        cat = discover_directory(spark, args.source_dir, args.format)
        if args.catalog and os.path.exists(args.catalog):
            # rediscover: keep user metadata/modes, adopt fresh schemas, and
            # emit the difference artifact (protocol/discover.go:75-99)
            with open(args.catalog) as fh:
                old = Catalog.from_json(fh.read())
            diff_path = os.path.join(
                os.path.dirname(os.path.abspath(args.catalog)), "difference_streams.json"
            )
            delta = old.write_difference(cat, diff_path)
            cat = old.merge_rediscovered(cat)
            print(f"wrote {diff_path} ({len(delta.streams)} changed streams)")
        doc = cat.to_json()
        if args.catalog:
            with open(args.catalog, "w") as fh:
                fh.write(doc)
            print(f"wrote {args.catalog} ({len(cat.streams)} streams)")
        else:
            print(doc)
        return 0

    from olake_spark.plans.stream import Catalog

    with open(args.catalog) as fh:
        cat = Catalog.from_json(fh.read())

    if args.verb == "sync":
        from olake_spark.sync import run_sync

        results = run_sync(
            spark, cat, args.source_dir, args.dest_dir, args.state,
            args.format, verify=args.verify,
        )
        rc = 0
        for r in results:
            rec = {
                "stream": r.stream,
                "mode": r.mode,
                "rows": r.rows,
                "cursor": r.cursor,
                "skipped": r.skipped,
            }
            if "verify" in r.details:
                rec["verify"] = r.details["verify"]
                if r.details["verify"].get("status") != "ok":
                    rc = 3
            print(json.dumps(rec))
        return rc

    if args.verb == "clear":
        from olake_spark.sync import clear_streams

        names = (args.streams or "").split(",")
        cleared = clear_streams(spark, cat, args.dest_dir, args.state, names)
        print(json.dumps({"cleared": cleared}))
        return 0

    return 2


if __name__ == "__main__":
    sys.exit(main())
