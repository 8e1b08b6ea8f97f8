"""Plan-only fingerprint snapshot of the FULL registered surface.

r12 verdict #3: the 24 headline plans were diffable round-over-round
(bench.py records their fingerprints; tools/bench_plan_diff.py diffs
them against the committed anchor), but the other ~170 registered
queries relied on tools/plan_audit.py's structural limits alone — a
lost broadcast or a new exchange on a non-headline query was invisible
until wall time moved. This tool closes that gap WITHOUT the ~15-minute
full-registry bench execution: it builds every registered query's
DataFrame, fingerprints the initial physical plan (same
plancheck.plan_fingerprint the bench uses, so artifacts are
interchangeable), and writes a bench-JSON-shaped file that
tools/bench_plan_diff.py can diff against bench_anchor_all.json:

    python tools/plan_snapshot.py /root/testdata/sf0.1 plan_snapshot.json
    python tools/bench_plan_diff.py bench_anchor_all.json plan_snapshot.json

"Plan-only" is almost-free, not free: iterative queries (BPE trainers,
k-means, connected components) run real checkpoint jobs while BUILDING
their DataFrame — the snapshot costs their construction, not their
final execution (~1-2 min at sf0.1 vs ~15 min for the executed bench).

The snapshot file is UNTRACKED working output (like bench_details*.json);
the committed comparison base stays bench_anchor_all.json. Fingerprints
depend on input statistics (broadcast thresholds, AQE initial shape), so
ALWAYS snapshot at the same SF as the anchor (sf0.1).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main(argv: list[str]) -> int:
    if len(argv) not in (2, 3):
        print(__doc__)
        return 2
    sf_dir = argv[1]
    out_path = argv[2] if len(argv) == 3 else "plan_snapshot.json"

    import __spark_entry__ as entry_mod
    from flink_streaming_demo_spark.plancheck import plan_fingerprint
    from flink_streaming_demo_spark.session import get_spark

    spark = get_spark("plan-snapshot")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry_mod.queries()
    plan_fps: dict[str, str] = {}
    plan_nodes: dict[str, str] = {}
    for name, fn in qs.items():
        try:
            plan_fps[name], plan_nodes[name] = plan_fingerprint(
                fn(spark, sf_dir)
            )
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            plan_fps[name] = f"err:{type(e).__name__}"
            plan_nodes[name] = ""
    with open(out_path, "w") as f:
        json.dump(
            {
                "metric": "plan_snapshot",
                "sf_dir": sf_dir,
                "n_queries": len(plan_fps),
                "plan_fingerprint": plan_fps,
                "plan_nodes": plan_nodes,
            },
            f,
            indent=1,
        )
        f.write("\n")
    n_err = sum(1 for v in plan_fps.values() if v.startswith("err:"))
    print(f"{len(plan_fps)} plans fingerprinted ({n_err} errors) -> {out_path}")
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
