"""True stateful throttle (rate limiter): per (user, event_type), keep an
event only if it is more than GAP seconds after the last KEPT event.

This is the SEQUENTIAL recurrence the gap-filter (plans/event_queries.
events_first_in_burst) only approximates: under the gap filter a burst of
events 200 s apart is ALL dropped after the first 300 s gap resets, while
the true throttle re-admits one event per 300 s of burst (each kept event
restarts the clock). The recurrence depends on kept-ness, so it is not
expressible with lag/window functions — the batch form runs a per-key
sequential fold in an Arrow ``applyInPandas`` (the documented slow path,
justified: per-key data is small and the fold is inherently sequential),
and the DuckDB oracle computes the identical chain with a recursive CTE
(anchor = first event per key; step = earliest event > last kept + GAP,
struct-MIN tie-break on (ts, event_id)) — so even this non-relational
recurrence is hash-checked, not just tested.

100 TB shape: one shuffle on (user_id, event_type); per-group memory is
the group's events (bounded by per-key activity, the same bound
sessionization already accepts); everything crosses the Python boundary
once, Arrow-batched.
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
    throttle recurrence, per (user_id, event_type)."""
    gap_ns = int(gap_secs) * 1_000_000_000

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        ts_ns = pdf["ts"].astype("int64")
        keep_mask = []
        last = None
        for t in ts_ns:
            ok = last is None or t > last + gap_ns
            keep_mask.append(ok)
            if ok:
                last = t
        out = pdf[pd.Series(keep_mask, index=pdf.index)]
        return out[["event_id", "user_id", "event_type", "ts"]]

    return (
        events.select("event_id", "user_id", "event_type", "ts")
        .groupBy("user_id", "event_type")
        .applyInPandas(fold, OUT_SCHEMA)
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
