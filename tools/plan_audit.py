"""Red-flag audit over a full-surface bench sidecar's plan shapes.

Reads a bench artifact that carries ``plan_nodes`` (bench_details_all.json
or bench_anchor_all.json) and flags, per query, the plan-geometry failure
modes this repo has actually hit:

* ``CartesianProduct`` anywhere (never legitimate here — every intended
  cross join is a broadcast 1-row/bounded frame, which plans as
  BroadcastNestedLoopJoin);
* plan-node count > NODE_LIMIT or parquet-scan count > SCAN_LIMIT — the
  lineage-geometry blow-up: operators that reference their input k times
  multiply the upstream subtree ~k^n when chained n deep (caught twice in
  r11: embedding_pca_top_component at 3,672 nodes / 330 scans and
  events_user_rfm at 2,346 / 212; both fixed with a localCheckpoint
  between stages — see BENCH_NOTES.md round 11);
* BroadcastNestedLoopJoin count > BNLJ_LIMIT — a handful are 1-row
  grand-total broadcasts by design, dozens mean a broadcast frame is
  being re-derived inside a loop.

SortMergeJoin is reported informationally (legitimate on large-large
joins) but never fails the audit.

Exit code 1 when any hard flag fires, so round-close notes can cite the
invocation as a pass/fail check.

Usage: python tools/plan_audit.py [bench_anchor_all.json]
"""

from __future__ import annotations

import json
import sys
from collections import Counter

# Tightened r12 (verdict #3): both r11 lineage blow-ups (2,346 and 3,672
# nodes) would have been caught at half their size with NODE_LIMIT 150;
# the healthiest iterative plans today sit well under 100 nodes and no
# legitimate plan reads more than ~15 parquet scans. Queries above the
# limits with a bounded-lineage argument go in ALLOW below, adjudicated
# in BENCH_NOTES.md.
NODE_LIMIT = 150
SCAN_LIMIT = 20
BNLJ_LIMIT = 40

# name -> justification for exceeding the NODE/SCAN limits (adjudicated
# bounded-lineage exceptions). An ALLOW entry waives ONLY those two
# limit flags — CartesianProduct and BNLJ fan-out are never waivable,
# so a later regression of those classes on an allowed query still
# fails the audit.
ALLOW: dict[str, str] = {}
_WAIVABLE = ("plan nodes", "parquet scans")


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "bench_anchor_all.json"
    with open(path) as f:
        d = json.load(f)
    nodes_by_q = d.get("plan_nodes") or {}
    if not nodes_by_q:
        print(f"{path}: no plan_nodes recorded (run with "
              "SPARK_GRAFT_BENCH_ALL=1?)")
        return 1

    hard, info = [], []
    for name, nodes in sorted(nodes_by_q.items()):
        if not nodes or nodes.startswith("err:"):
            continue
        parts = nodes.split(">")
        c = Counter(p.split("[")[0] for p in parts)
        scans = sum(v for k, v in c.items() if k.startswith("FileSourceScan"))
        flags = []
        if c.get("CartesianProduct"):
            flags.append(f"CartesianProduct x{c['CartesianProduct']}")
        if len(parts) > NODE_LIMIT:
            flags.append(f"{len(parts)} plan nodes (> {NODE_LIMIT})")
        if scans > SCAN_LIMIT:
            flags.append(f"{scans} parquet scans (> {SCAN_LIMIT})")
        if c.get("BroadcastNestedLoopJoin", 0) > BNLJ_LIMIT:
            flags.append(
                f"BroadcastNestedLoopJoin x{c['BroadcastNestedLoopJoin']}"
            )
        if flags and name in ALLOW:
            waived = [f for f in flags if any(w in f for w in _WAIVABLE)]
            flags = [f for f in flags if f not in waived]
            if waived:
                info.append(
                    (name, f"allowed ({ALLOW[name]}): " + "; ".join(waived))
                )
        if flags:
            hard.append((name, "; ".join(flags)))
        elif c.get("SortMergeJoin"):
            info.append((name, f"smj x{c['SortMergeJoin']}"))

    print(f"audited {len(nodes_by_q)} plans from {path}")
    print(f"hard flags: {len(hard)}")
    for name, why in hard:
        print(f"  x {name}: {why}")
    print(f"info (SortMergeJoin present, fine on large-large): {len(info)}")
    for name, why in info:
        print(f"  ~ {name}: {why}")
    return 1 if hard else 0


if __name__ == "__main__":
    sys.exit(main())
