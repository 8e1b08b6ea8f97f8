"""True stateful throttle (rate limiter): per (user, event_type), keep an
event only if it is more than GAP seconds after the last KEPT event.

This is the SEQUENTIAL recurrence the gap-filter (plans/event_queries.
events_first_in_burst) only approximates: under the gap filter a burst of
events 200 s apart is ALL dropped after the first 300 s gap resets, while
the true throttle re-admits one event per 300 s of burst (each kept event
restarts the clock). The recurrence depends on kept-ness, so it is not
expressible with lag/window functions — the batch form runs the
sequential fold in Arrow-batched Python over KEY-SORTED PARTITIONS
(``mapInPandas``; the documented slow path, justified: the fold is
inherently sequential), and the DuckDB oracle computes the identical
chain with a recursive CTE (anchor = first event per key; step =
earliest event > last kept + GAP, struct-MIN tie-break on
(ts, event_id)) — so even this non-relational recurrence is
hash-checked, not just tested.

100 TB shape: one shuffle on (user_id, event_type) + a partition sort;
Python state is one int per key in the partition (tighter than any
per-group materialization); everything crosses the Python boundary in
~10k-row Arrow batches, one call per batch — NOT one per group, which
at thousands of small groups was 27x slower (see the function
docstring and BENCH_NOTES round 11).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame

THROTTLE_GAP_SECS = 300

OUT_SCHEMA = (
    "event_id long, user_id long, event_type string, ts timestamp"
)


def throttle_kept_events(
    events: DataFrame, gap_secs: int = THROTTLE_GAP_SECS
) -> DataFrame:
    """(event_id, user_id, event_type, ts) of KEPT events under the true
    throttle recurrence, per (user_id, event_type).

    Execution shape (r11): one hash shuffle on the key + a partition
    sort by (key, ts, event_id), then ``mapInPandas`` runs the fold as
    ONE streaming pass per partition, carrying the per-key last-kept
    timestamp in a dict across Arrow batches (a group split across a
    batch boundary continues exactly where it left off — batches arrive
    in partition sort order). The previous ``applyInPandas`` form paid
    one Python/Arrow round-trip PER GROUP, which dominated the wall at
    thousands of small groups (17.7 s at sf0.1 in the r11 full-surface
    bench); this form pays one per ~10k-row Arrow batch. State is one
    int per key seen in the partition — strictly smaller than any
    group's rows — so the memory bound is tighter than before, and the
    kept set is byte-identical (same recurrence, same tie order)."""
    gap_ns = int(gap_secs) * 1_000_000_000
    cols = ["event_id", "user_id", "event_type", "ts"]

    def fold_partition(batches):
        last: dict = {}
        for pdf in batches:
            if pdf.empty:
                continue
            ts_ns = pdf["ts"].astype("int64").to_numpy()
            uid = pdf["user_id"].to_numpy()
            et = pdf["event_type"].to_numpy()
            keep = [False] * len(pdf)
            for i in range(len(pdf)):
                k = (uid[i], et[i])
                prev = last.get(k)
                if prev is None or ts_ns[i] > prev + gap_ns:
                    keep[i] = True
                    last[k] = ts_ns[i]
            yield pdf.loc[pd.Series(keep, index=pdf.index), cols]

    return (
        events.select(*cols)
        .repartition("user_id", "event_type")
        .sortWithinPartitions("user_id", "event_type", "ts", "event_id")
        .mapInPandas(fold_partition, OUT_SCHEMA)
    )


def sql_throttle_kept(gap_secs: int = THROTTLE_GAP_SECS,
                      events: str = "events") -> str:
    """DuckDB twin: recursive chain over the same recurrence. Wrap in
    WITH RECURSIVE."""
    gap_us = int(gap_secs) * 1_000_000
    return f"""kept AS (
        SELECT user_id, event_type, ts, event_id
        FROM (
            SELECT user_id, event_type, ts, event_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type
                       ORDER BY ts, event_id
                   ) AS rn
            FROM {events}
        ) WHERE rn = 1
        UNION ALL
        SELECT n.user_id, n.event_type,
               (n.nxt).ts AS ts, (n.nxt).event_id AS event_id
        FROM (
            SELECT k.user_id, k.event_type,
                   MIN({{'ts': e.ts, 'event_id': e.event_id}}) AS nxt
            FROM kept k
            JOIN {events} e
              ON e.user_id = k.user_id AND e.event_type = k.event_type
             AND date_diff('microsecond', k.ts, e.ts) > {gap_us}
            GROUP BY k.user_id, k.event_type, k.ts, k.event_id
        ) n
        WHERE n.nxt IS NOT NULL
    )"""
