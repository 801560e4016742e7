"""Compute the next driver-window rotation from the evidence on disk.

The rotation contract (tests/test_window_contract.py) pins the window
as the saturated 50-prefix of

    never-driver-checked entries (registration order)
    ++ entries rewritten this round (inventory._REWRITTEN)
    ++ everything else by (oldest evidence round, registration order)

Each round the builder must bump the evidence pin, rewrite _REWRITTEN,
and re-derive _PRIORITY/_NEXT_ROTATION_HEAD by hand — this tool does
the derivation and prints paste-ready Python source, so the rotation
commit is mechanical.

Usage:
    python tools/plan_rotation.py [--max-round N] [--window 50]
        [--rewritten name1,name2,...] [--new name1,name2,...]

--max-round   highest CORRECTNESS_r*.json to count as evidence
              (default: every file present). For the r20 rotation run
              with no flags once CORRECTNESS_r19.json exists.
--rewritten   planned _REWRITTEN for the NEW round (default: empty —
              a fresh round starts with no rewrites; the in-code list
              from LAST round's rotation is never carried over).
--new         names you intend to register this round but haven't yet
              (they land in the never-checked tier, registration order
              = append order); lets you budget the window before
              writing code.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def evidence_rounds(repo: str, max_round: int | None) -> dict[str, int]:
    """name -> newest round with a driver row, honoring the pin."""
    last: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if m is None:  # e.g. a stray CORRECTNESS_r19_backup.json
            continue
        rn = int(m.group(1))
        if max_round is not None and rn > max_round:
            continue
        with open(path) as f:
            for name in json.load(f):
                last[name] = max(last.get(name, 0), rn)
    return last


def plan(reg: list[str], last: dict[str, int], rewritten: list[str],
         window: int) -> tuple[list[str], list[str], list[str]]:
    """Return (never, window_names, carryover_head). Mirrors the
    saturated-prefix order the contract test asserts."""
    never = [n for n in reg if n not in last]
    rw = [n for n in rewritten if n not in never]
    rest = sorted(
        (n for n in reg if n in last and n not in set(rw)),
        key=lambda n: (last[n], reg.index(n)),
    )
    expected = never + rw + rest
    return never, expected[:window], expected[window:]


def fmt_tuple(name: str, names: list[str]) -> str:
    lines = [f"{name}: tuple[str, ...] = ("]
    lines += [f'    "{n}",' for n in names]
    lines.append(")")
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-round", type=int, default=None)
    ap.add_argument("--window", type=int, default=50)
    ap.add_argument("--rewritten", default="")
    ap.add_argument("--new", dest="planned_new", default="")
    args = ap.parse_args()

    from strake_spark import inventory

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    reg = list(inventory.REGISTRY)
    for n in [s for s in args.planned_new.split(",") if s]:
        if n in reg:
            ap.error(f"--new {n} is already registered")
        reg.append(n)
    rewritten = [s for s in args.rewritten.split(",") if s]
    for n in rewritten:
        if n not in reg:
            ap.error(f"--rewritten {n} is not a registered (or --new) entry")
    last = evidence_rounds(repo, args.max_round)
    if not last:
        print("no CORRECTNESS_r*.json evidence found", file=sys.stderr)
        return 1
    never, window_names, carry = plan(reg, last, rewritten, args.window)

    hist: dict[int, int] = {}
    for rn in last.values():
        hist[rn] = hist.get(rn, 0) + 1
    pinned = max(last.values())
    print(f"# evidence through r{pinned:02d}; newest-round histogram: "
          + ", ".join(f"r{k}×{v}" for k, v in sorted(hist.items())))
    print(f"# tiers: {len(never)} never-checked, {len(rewritten)} rewritten, "
          f"{args.window - len(never) - len([n for n in rewritten if n not in never])} "
          "oldest-evidence rows fit")
    print(f"# carryover beyond the window: {len(carry)} entries "
          f"(oldest evidence r{min((last[n] for n in carry if n in last), default=0)})")
    print(f"# REMEMBER: bump the evidence pin in tests/test_window_contract.py "
          f"to range(1, {pinned + 1}) in the SAME commit")
    print()
    print(fmt_tuple("_REWRITTEN", rewritten))
    print()
    print(fmt_tuple("_PRIORITY", window_names))
    print()
    head = carry[: len(inventory._NEXT_ROTATION_HEAD) or 18]
    print(fmt_tuple("_NEXT_ROTATION_HEAD", head))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
