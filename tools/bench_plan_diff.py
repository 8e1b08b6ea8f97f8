"""Diff the per-query physical-plan fingerprints between two BENCH JSON
artifacts (r7 verdict #5: a plan regression — new exchange, lost
broadcast, lost codegen span — should be DIFFABLE round-over-round, not
inferred from wall time).

For every headline query present in both files it compares
``plan_fingerprint`` and, when they differ, prints a node-level unified
diff of the ``plan_nodes`` sequences (the '>' separated preorder
node-name lists bench.py records). Queries present in only one file are
listed as added/removed.

Exit code: 0 when all shared fingerprints match, 1 otherwise — so the
round notes can cite the invocation as a pass/fail check.

Usage: python tools/bench_plan_diff.py BENCH_r07.json BENCH_r08.json
"""

from __future__ import annotations

import difflib
import json
import sys


def load(path: str) -> tuple[dict, dict]:
    with open(path) as f:
        d = json.load(f)
    return d.get("plan_fingerprint", {}), d.get("plan_nodes", {})


def main(argv: list[str]) -> int:
    if len(argv) != 3:
        print(__doc__)
        return 2
    a_fp, a_nodes = load(argv[1])
    b_fp, b_nodes = load(argv[2])
    if not a_fp:
        print(f"{argv[1]}: no plan_fingerprint field (pre-r8 artifact) — "
              f"nothing to diff; {argv[2]} is the baseline for next round")
        return 0
    changed = 0
    for name in sorted(set(a_fp) | set(b_fp)):
        if name not in a_fp:
            print(f"[added]   {name}: {b_fp[name]}")
            continue
        if name not in b_fp:
            print(f"[removed] {name}: {a_fp[name]}")
            continue
        if a_fp[name] == b_fp[name]:
            continue
        changed += 1
        print(f"[CHANGED] {name}: {a_fp[name]} -> {b_fp[name]}")
        old = a_nodes.get(name, "").split(">")
        new = b_nodes.get(name, "").split(">")
        for line in difflib.unified_diff(
            old, new, argv[1], argv[2], lineterm="", n=2
        ):
            print(f"    {line}")
    same = len(set(a_fp) & set(b_fp)) - changed
    print(f"{same} unchanged, {changed} changed")
    return 1 if changed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
