"""CLI — config lifecycle + introspection.

Reference: crates/cli/src/main.rs (342 LoC) + docs/cli-reference.md:
init / validate / describe / search / test-connection / query. The
GitOps metadata-store commands (diff/apply/domain history/rollback)
depend on a deployment database; here `validate` + `describe` +
`test-connection` cover the operational core, and `query` gives a
one-shot governed execution.

Usage: python -m strake_spark.cli <command> [...]
"""

from __future__ import annotations

import argparse
import json
import sys

_INIT_TEMPLATE = """\
# strake-spark sources configuration
sources:
  - name: local
    type: parquet
    url: /data/warehouse
    tables:
      - name: events
  # - name: pg
  #   type: postgres
  #   url: postgresql://host:5432/db
  #   username: user
  #   password: ${PG_PASSWORD}
  #   tables:
  #     - name: users
  #       partition_column: id
query_limits:
  default_limit: 1000
  max_output_rows: 10000
  query_timeout_seconds: 300
cache:
  enabled: false
"""


def cmd_init(args) -> int:
    with open(args.path, "w") as f:
        f.write(_INIT_TEMPLATE)
    print(f"wrote {args.path}")
    return 0


def cmd_validate(args) -> int:
    from strake_spark.config import load_config
    from strake_spark.sources.registry import SOURCE_TYPES

    try:
        cfg = load_config(args.config)
    except Exception as e:
        print(f"INVALID: {e}", file=sys.stderr)
        return 1
    problems = []
    names = set()
    for s in cfg.sources:
        if s.name in names:
            problems.append(f"duplicate source name {s.name!r}")
        names.add(s.name)
        if s.type not in SOURCE_TYPES:
            problems.append(
                f"source {s.name!r}: unknown type {s.type!r} "
                f"(known: {sorted(SOURCE_TYPES)})"
            )
        if s.type in ("parquet", "csv", "json", "file") and not s.url:
            problems.append(f"source {s.name!r}: file source needs url")
    for p in problems:
        print(f"INVALID: {p}", file=sys.stderr)
    if not problems:
        print(f"OK: {len(cfg.sources)} sources")
    return 1 if problems else 0


def _engine(config):
    import strake_spark as ss

    return ss.connect(config)


def cmd_describe(args) -> int:
    eng = _engine(args.config)
    if args.table:
        print(json.dumps(eng.describe(args.table), indent=2))
    else:
        print(json.dumps(eng.list_sources(), indent=2))
    return 0


def cmd_search(args) -> int:
    from strake_spark.discovery import SchemaIndex

    eng = _engine(args.config)
    idx = SchemaIndex(eng.spark)
    idx.rebuild()
    for h in idx.search(args.query, args.limit):
        print(f"{h.table}.{h.column}\t{h.type}\t{h.source}")
    return 0


def cmd_test_connection(args) -> int:
    from strake_spark.config import load_config

    cfg = load_config(args.config)
    failures = 0
    eng = None
    for s in cfg.sources:
        if args.source and s.name != args.source:
            continue
        try:
            if eng is None:
                import strake_spark as ss

                eng = ss.StrakeEngine(config=None)
            views = eng.register(s)
            for v in views:
                eng.spark.table(v).limit(1).collect()
            print(f"OK: {s.name} ({len(views)} tables)")
        except Exception as e:
            failures += 1
            print(f"FAIL: {s.name}: {e}", file=sys.stderr)
    return 1 if failures else 0


def cmd_query(args) -> int:
    eng = _engine(args.config)
    table = eng.execute(args.sql)
    if args.format == "json":
        print(json.dumps(table.to_pylist(), default=str))
    else:
        print(table.to_pandas().to_string(index=False))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="strake-spark")
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("init", help="write a starter sources.yaml")
    sp.add_argument("path", nargs="?", default="sources.yaml")
    sp.set_defaults(fn=cmd_init)

    sp = sub.add_parser("validate", help="validate a config file")
    sp.add_argument("config")
    sp.set_defaults(fn=cmd_validate)

    sp = sub.add_parser("describe", help="list sources or dump a table schema")
    sp.add_argument("config")
    sp.add_argument("--table", default=None)
    sp.set_defaults(fn=cmd_describe)

    sp = sub.add_parser("search", help="full-text schema search")
    sp.add_argument("config")
    sp.add_argument("query")
    sp.add_argument("--limit", type=int, default=20)
    sp.set_defaults(fn=cmd_search)

    sp = sub.add_parser("test-connection", help="register each source and probe 1 row")
    sp.add_argument("config")
    sp.add_argument("--source", default=None)
    sp.set_defaults(fn=cmd_test_connection)

    sp = sub.add_parser("query", help="run one governed SQL statement")
    sp.add_argument("config")
    sp.add_argument("sql")
    sp.add_argument("--format", choices=["table", "json"], default="table")
    sp.set_defaults(fn=cmd_query)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
