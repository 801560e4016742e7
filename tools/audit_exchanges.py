"""Inventory-wide EXCHANGE census (r18 — companion to
audit_dup_scans.py, same philosophy: a reusable instrument instead of
staring at plans one by one).

For every registry entry, count the shuffle-class nodes in the
EXECUTED plan:

- ``hash``   — Exchange hashpartitioning (a real all-to-all shuffle;
  the thing that becomes the bottleneck at 100 TB)
- ``range``  — Exchange rangepartitioning (usually the presentation
  ORDER BY; one per entry is expected and harmless — the driver sorts
  anyway)
- ``single`` — Exchange SinglePartition (global aggregates; tiny by
  construction AFTER partial aggregation, but worth eyeballing)
- ``bcast``  — BroadcastExchange (cheap by design: the small side)
- ``python`` — Arrow/Batch Python nodes, for cross-reference

Top offenders by hash-exchange count print first. Interpreting the
output: a high hash count is not automatically wrong (multi-stage
aggregations legitimately re-shuffle on new keys) — the signal to
chase is a hash exchange whose KEY a previous exchange already
provided (Catalyst usually reuses; a miss often means a column was
renamed mid-plan) or a shuffle carrying wide rows that a pre-projection
could slim.

Counting is by UNIQUE ``plan_id`` (r19): ``toString`` prints the FULL
cached lineage inside every ``InMemoryTableScan``, so a persisted
relation consumed N times used to count its upstream exchanges N
times — the r18 census read dedup_ngram_jaccard at 15 hash exchanges
when the executed plan holds 5 distinct exchange NODES (each runs at
most once; those inside a cached lineage run only at first
materialization). The ``dup`` column keeps the old text-occurrence
count so cache-fanout is still visible.

Usage: python tools/audit_exchanges.py [sf_dir] [top_n]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")


def _counts(plan: str) -> tuple[int, int, int, int, int, int]:
    """(hash, range, single, bcast, python, hash_text_occurrences) with
    exchange counts deduplicated by plan_id."""

    def uniq(marker: str) -> int:
        ids: set[str] = set()
        n_unmarked = 0
        for line in plan.splitlines():
            if marker not in line:
                continue
            m = re.search(r"plan_id=(\d+)", line)
            if m:
                ids.add(m.group(1))
            else:  # truncated line — count conservatively as distinct
                n_unmarked += 1
        return len(ids) + n_unmarked

    return (
        uniq("Exchange hashpartitioning"),
        uniq("Exchange rangepartitioning"),
        uniq("Exchange SinglePartition"),
        uniq("BroadcastExchange"),
        plan.count("ArrowEvalPython")
        + plan.count("BatchEvalPython")
        + plan.count("MapInPandas")
        + plan.count("MapInArrow"),
        plan.count("Exchange hashpartitioning"),
    )


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    from strake_spark import inventory
    from strake_spark.session import build_session

    spark = build_session(shuffle_partitions=8)
    spark.conf.set("spark.sql.maxToStringFields", "200")
    rows = []
    for name, spec in sorted(inventory.REGISTRY.items()):
        try:
            plan = spec.fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"SKIP {name} {type(e).__name__}", flush=True)
            continue
        rows.append((name, *_counts(plan)))
    rows.sort(key=lambda r: (-r[1], r[0]))
    print(f"{'entry':44s} hash range single bcast python dup")
    for name, h, rg, sp, bc, py, txt in rows[:top_n]:
        print(f"{name:44s} {h:4d} {rg:5d} {sp:6d} {bc:5d} {py:6d} {txt:3d}")
    total_hash = sum(r[1] for r in rows)
    print(
        f"done: {len(rows)} entries, {total_hash} unique hash exchanges total, "
        f"showing top {min(top_n, len(rows))}"
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
