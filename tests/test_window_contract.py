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


def test_window_is_saturated_prefix_of_evidence_order():
    """r13 rotation contract (satisfiable by construction, replacing
    the r10 all-oldest-must-fit assertion that became structurally
    unsatisfiable once |oldest-evidence| > 50): the window must equal
    the first 50 of the sequence

      never-driver-checked entries (registration order)
      ++ entries rewritten this round (inventory._REWRITTEN)
      ++ everything else by (oldest evidence round, registration order)

    and the carryover remainder — the head of the NEXT round's fill —
    must match the in-code guidance list (inventory._NEXT_ROTATION_HEAD).
    Evidence range is pinned to the files that existed at rotation time
    (r01–r19) — bump the range in the SAME commit as every rotation so
    the check describes that rotation. r20 rotation arithmetic: no
    never-checked entries remain; the window is 1 rewritten entry
    (dedup_ngram_jaccard, gram-set backbone) + the 24 r15 rows that
    spilled from the r19 window + the 25 oldest r16 rows, spilling the
    next r16 rows to the r21 fill head."""
    import json
    import os

    last: dict[str, int] = {}
    for rn in range(1, 20):  # pinned at rotation time; bump with each rotation
        path = f"/root/repo/CORRECTNESS_r{rn:02d}.json"
        if not os.path.exists(path):
            continue
        with open(path) as f:
            for name in json.load(f):
                last[name] = rn
    if not last:  # driver artifacts absent (fresh clone) — nothing to pin
        return
    reg = list(inventory.REGISTRY)
    never = [n for n in reg if n not in last]
    rewritten = [n for n in inventory._REWRITTEN if n not in never]
    rest = sorted(
        (n for n in reg if n in last and n not in set(rewritten)),
        key=lambda n: (last[n], reg.index(n)),
    )
    expected = never + rewritten + rest
    assert tuple(inventory._PRIORITY) == tuple(expected[:50]), (
        "window is not the saturated prefix of the evidence order; "
        f"expected head: {expected[:50]}"
    )
    carry = tuple(expected[50 : 50 + len(inventory._NEXT_ROTATION_HEAD)])
    assert tuple(inventory._NEXT_ROTATION_HEAD) == carry, (
        f"carryover guidance stale: expected {carry}"
    )


def test_plan_rotation_tool_reproduces_live_rotation():
    """tools/plan_rotation.py exists so the next rotation is derived,
    not hand-computed — it must implement exactly the saturated-prefix
    order this file pins. Feeding it the current pin (evidence through
    r19) and the current _REWRITTEN must reproduce _PRIORITY."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    try:
        from plan_rotation import evidence_rounds, plan
    finally:
        sys.path.pop(0)

    last = evidence_rounds("/root/repo", max_round=19)
    if not last:  # fresh clone without driver artifacts
        return
    _, window, carry = plan(
        list(inventory.REGISTRY), last, list(inventory._REWRITTEN), 50
    )
    assert tuple(window) == inventory._PRIORITY
    assert tuple(carry[: len(inventory._NEXT_ROTATION_HEAD)]) == (
        inventory._NEXT_ROTATION_HEAD
    )


def test_rewritten_entries_resolve():
    for name in inventory._REWRITTEN:
        assert name in inventory.REGISTRY, name


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
