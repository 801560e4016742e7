"""Driver-contract verification of the current window front.

Runs the first N entries of ``queries()`` exactly the way the grading
driver does — Spark result vs DuckDB oracle, columns sorted by name,
exact value compare (reusing tests/conftest.py's run_and_compare) —
and prints one line per entry.

Usage: python tools/verify_window.py [N] [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    from conftest import run_and_compare

    from strake_spark import inventory
    from strake_spark.session import build_session

    spark = build_session(shuffle_partitions=8)
    names = list(inventory.queries())[:n]
    failures = 0
    for name in names:
        try:
            pdf = run_and_compare(spark, name, sf_dir)
            tag = "ROWS_ONLY" if inventory.REGISTRY[name].oracle is None else "OK"
            print(f"{tag} {name} rows={len(pdf)}", flush=True)
        except Exception as e:  # noqa: BLE001 — report and continue
            failures += 1
            print(f"FAIL {name} {type(e).__name__}: {str(e)[:500]}", flush=True)
    print(f"done: {len(names)} entries, {failures} failures", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
