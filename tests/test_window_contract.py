"""Driver-window contract: the first 50 entries of queries() are the
round's verification window — their names must resolve, stay exactly 50,
keep oracle/column-name discipline, and include every entry that has
never had a driver row."""

from __future__ import annotations

import re

from strake_spark import inventory


def test_priority_window_is_exactly_50_known_names():
    assert len(inventory._PRIORITY) == 50
    assert len(set(inventory._PRIORITY)) == 50
    for name in inventory._PRIORITY:
        assert name in inventory.REGISTRY, name


def test_queries_order_puts_window_first():
    names = list(inventory.queries())
    assert tuple(names[:50]) == inventory._PRIORITY
    assert len(names) == len(inventory.REGISTRY)


def test_every_entry_has_oracle_or_rows_only_tag():
    for name, spec in inventory.REGISTRY.items():
        if spec.oracle is None:
            assert "rows_only" in spec.tags, (
                f"{name} has no oracle and no rows_only tag — the driver "
                "records a weaker check nobody signed off on"
            )


def test_window_front_loads_oldest_driver_evidence():
    """r10 rotation contract: with all-time coverage at 143/143, the
    window must contain every entry whose most recent driver row is the
    OLDEST round on record. Evidence range is pinned to the files that
    existed at rotation time (r01–r09) — bump the range when rotating
    for the next round so the check describes that rotation."""
    import json
    import os

    last: dict[str, int] = {}
    for rn in range(1, 10):  # pinned at rotation time; bump with each rotation
        path = f"/root/repo/CORRECTNESS_r{rn:02d}.json"
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for name in json.load(f):
                last[name] = rn
    if not last:  # driver artifacts absent (fresh clone) — nothing to pin
        return
    oldest = min(last.values())
    stale = {n for n, rn in last.items() if rn == oldest and n in inventory.REGISTRY}
    window = set(inventory._PRIORITY)
    missing = stale - window
    assert not missing, (
        f"entries with oldest driver evidence (r{oldest}) not in the "
        f"window: {sorted(missing)}"
    )


def test_oracle_sql_mentions_no_unaliased_aggregates():
    """Cheap lint for the hash-compare contract: every SELECT-list
    aggregate call in an oracle is AS-aliased (unaliased ones produce
    engine-specific column names that can never match Spark's)."""
    bare = re.compile(r"(?i)^select\s+(sum|count|avg|min|max)\(")
    for name, spec in inventory.REGISTRY.items():
        if spec.oracle is None:
            continue
        for line in spec.oracle.splitlines():
            stripped = line.strip()
            # only lint a SELECT-list head line; scalar subqueries in
            # WHERE/HAVING produce no output column and need no alias
            if bare.search(stripped) and " as " not in stripped.lower():
                raise AssertionError(f"{name}: unaliased aggregate: {stripped}")
