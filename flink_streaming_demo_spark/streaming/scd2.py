"""Streaming SCD2 build: CDC change streams -> type-2 dimension rows at
ingest.

Batch twin: plans/event_queries.py:events_scd2_type_history (lag change
detect + lead interval close). The streaming form cannot use lead/lag —
change detection needs per-key EVENT-TIME order, and micro-batches
deliver arrival order. The operator therefore buffers each key's events
in state and only processes the prefix the watermark has sealed: with
delivery jitter bounded by the watermark delay (the repo's replay
contract, streaming/replay.py), every event with ts <= watermark is
already in the buffer before any of them is folded, so the fold sees
exactly the batch event-time order and emits the identical closed
intervals (equivalence pinned in tests/test_streaming.py).

Emission contract: CLOSED intervals only (append mode) — the open
interval per key lives in state, exactly like an unfinished session; a
downstream consumer unions the state-store tail if it needs is_current
rows mid-stream.

100 TB shape: state per key = the open interval plus only the
jitter-horizon's worth of buffered events (the watermark seals and
drains the buffer every micro-batch), NOT history; one shuffle on
user_id, same as the batch form.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("version", T.IntegerType()),
        T.StructField("valid_from", T.TimestampType()),
        T.StructField("valid_to", T.TimestampType()),
        T.StructField("is_current", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("buf_ts", T.ArrayType(T.LongType())),  # micros
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_type", T.ArrayType(T.StringType())),
        T.StructField("open_type", T.StringType()),
        T.StructField("open_from", T.LongType()),  # micros
        T.StructField("version", T.IntegerType()),
    ]
)

_COLS = [f.name for f in OUT_SCHEMA.fields]


def _fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id = int(key[0])
    if state.exists:
        buf_ts, buf_eid, buf_type, open_type, open_from, version = state.get
        pending = list(zip(buf_ts, buf_eid, buf_type))
    else:
        pending, open_type, open_from, version = [], None, None, 0
    if not state.hasTimedOut:
        for pdf in pdfs:
            ts_us = pdf["ts"].astype("int64") // 1000
            for t_us, eid, etype in zip(
                ts_us, pdf["event_id"], pdf["event_type"]
            ):
                pending.append((int(t_us), int(eid), str(etype)))
    wm_ms = state.getCurrentWatermarkMs()
    sealed_us = wm_ms * 1000
    pending.sort()
    # STRICT inequality: Spark guarantees no more rows with ts <
    # watermark, but a row with ts == watermark may still arrive in a
    # later micro-batch — folding boundary events now could commit an
    # out-of-(ts, id)-order decision. Hold them.
    ready = [p for p in pending if p[0] < sealed_us]
    hold = [p for p in pending if p[0] >= sealed_us]
    closed: list[tuple] = []
    for t_us, _eid, etype in ready:
        if open_type is None:
            open_type, open_from, version = etype, t_us, 1
        elif etype != open_type:
            closed.append(
                (
                    user_id,
                    open_type,
                    version,
                    pd.to_datetime(open_from, unit="us"),
                    pd.to_datetime(t_us, unit="us"),
                    False,
                )
            )
            open_type, open_from, version = etype, t_us, version + 1
    state.update(
        (
            [p[0] for p in hold],
            [p[1] for p in hold],
            [p[2] for p in hold],
            open_type,
            open_from,
            version,
        )
    )
    if hold:
        # wake when the watermark seals the earliest held event; must be
        # strictly beyond the current watermark
        first_ms = hold[0][0] // 1000 + 1
        state.setTimeoutTimestamp(max(first_ms, wm_ms + 1))
    if closed:
        yield pd.DataFrame(closed, columns=_COLS)


def streaming_scd2(
    events: DataFrame, watermark_delay: str = "60 seconds"
) -> DataFrame:
    """Input: streaming (user_id, event_id, ts, event_type). Output:
    append stream of CLOSED SCD2 intervals (OUT_SCHEMA), identical to the
    batch builder's valid_to-not-null rows once the watermark passes the
    closing change."""
    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _fn,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
