"""Inventory-wide duplicate-scan audit (r17).

For every registry entry, count parquet-scan nodes per table in the
executed plan, net of InMemoryTableScan coverage: a table scanned N>1
times with fewer than N cache references means Catalyst will recompute
the scan subtree N times — the dual-consumption shape that made
dedup_ngram_jaccard 6.6 s (5 uncached consumers of one exploded
relation) and the original DSIR/tfidf drafts 2x slower than needed.

Self-joins and multi-slice reads of SMALL tables (nation, region) are
expected and fine; the signal to chase is a LARGE table (documents,
lineitem, events, embeddings) with several uncached scan nodes.

Usage: python tools/audit_dup_scans.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from strake_spark import inventory
    from strake_spark.session import build_session

    spark = build_session(shuffle_partitions=8)
    flagged = 0
    for name, spec in sorted(inventory.REGISTRY.items()):
        try:
            plan = spec.fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — report and continue
            print(f"SKIP {name} {type(e).__name__}", flush=True)
            continue
        scans = re.findall(
            r"Location: InMemoryFileIndex[^\n]*?([a-z]+)\.parquet", plan
        )
        dup = {t: c for t, c in Counter(scans).items() if c > 1}
        if dup:
            flagged += 1
            cached = plan.count("InMemoryTableScan")
            print(f"DUP {name}: {dup} cached_refs={cached}", flush=True)
    print(f"done: {flagged} entries with duplicate scans", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
