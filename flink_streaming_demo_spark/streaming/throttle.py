"""Streaming form of the true stateful throttle (operators/throttle).

Same division of labor as streaming/scd2.py: the recurrence needs per-key
EVENT-TIME order, micro-batches deliver arrival order, so each key buffers
its events in state and folds only the watermark-sealed prefix. With
delivery jitter bounded by the watermark delay (the replay contract),
the fold sees exactly the batch event-time order, so the kept set equals
the batch operator's — the equivalence test pins it.

State per key: the last KEPT event time (one long) plus the jitter
horizon's worth of buffered events — drained every micro-batch, never
history.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from flink_streaming_demo_spark.operators.throttle import THROTTLE_GAP_SECS

OUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("buf_ts", T.ArrayType(T.LongType())),  # micros
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("last_kept_us", T.LongType()),
    ]
)

_COLS = [f.name for f in OUT_SCHEMA.fields]


def _make_fn(gap_secs: int):
    gap_us = int(gap_secs) * 1_000_000

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id, event_type = int(key[0]), str(key[1])
        if state.exists:
            buf_ts, buf_eid, last_kept = state.get
            pending = list(zip(buf_ts, buf_eid))
        else:
            pending, last_kept = [], None
        if not state.hasTimedOut:
            for pdf in pdfs:
                ts_us = pdf["ts"].astype("int64") // 1000
                for t_us, eid in zip(ts_us, pdf["event_id"]):
                    pending.append((int(t_us), int(eid)))
        sealed_us = state.getCurrentWatermarkMs() * 1000
        pending.sort()
        # STRICT inequality: Spark guarantees no more rows with ts <
        # watermark, but a row with ts == watermark may still arrive
        # in a later micro-batch — folding boundary events now could
        # commit an out-of-(ts, id)-order decision. Hold them.
        ready = [p for p in pending if p[0] < sealed_us]
        hold = [p for p in pending if p[0] >= sealed_us]
        kept: list[tuple] = []
        for t_us, eid in ready:
            if last_kept is None or t_us > last_kept + gap_us:
                kept.append(
                    (eid, user_id, event_type,
                     pd.to_datetime(t_us, unit="us"))
                )
                last_kept = t_us
        state.update(
            ([p[0] for p in hold], [p[1] for p in hold], last_kept)
        )
        if hold:
            first_ms = hold[0][0] // 1000 + 1
            state.setTimeoutTimestamp(
                max(first_ms, state.getCurrentWatermarkMs() + 1)
            )
        if kept:
            yield pd.DataFrame(kept, columns=_COLS)

    return fn


def streaming_throttle(
    events: DataFrame,
    gap_secs: int = THROTTLE_GAP_SECS,
    watermark_delay: str = "60 seconds",
) -> DataFrame:
    """Input: streaming (event_id, user_id, event_type, ts). Output:
    append stream of KEPT events, identical to the batch
    throttle_kept_events once the watermark passes them."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _make_fn(gap_secs),
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
