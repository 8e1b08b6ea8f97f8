"""Streaming equivalence tests (SURVEY §5.3.2): the golden invariant is
*streaming final results ≡ batch results* over the same data, in-order and
out-of-order (jitter bounded by the watermark delay -> no late drops)."""

from __future__ import annotations

import shutil
import tempfile
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from flink_streaming_demo_spark.operators.early_fire import early_fire_counts
from flink_streaming_demo_spark.plans.taxi_apps import (
    arrival_events,
    sliding_arrival_count,
    total_arrival_count,
)
from flink_streaming_demo_spark.sources.taxi import synthetic_taxi_rides
from flink_streaming_demo_spark.streaming import replay
from flink_streaming_demo_spark.streaming.early_trigger import (
    streaming_early_fire_counts,
)
from flink_streaming_demo_spark.streaming.pipelines import (
    streaming_sliding_arrival_count,
    streaming_total_arrival_count,
)
from flink_streaming_demo_spark.streaming.sinks import (
    InMemoryUpsertSink,
    write_update_stream,
)

RIDES_SCHEMA = (
    "ride_id long, ts timestamp, is_start boolean, lon double, lat double, "
    "passenger_cnt int"
)

# grid cell of the sentinel location (-73.71, 40.51); its own windows end
# beyond the final watermark and can never emit in append mode, so both
# sides of every comparison exclude it.
SENT_CELL = 98242


@pytest.fixture(scope="module")
def rides_df(spark, sf_dir):
    return synthetic_taxi_rides(spark, sf_dir).cache()


def _sentinel(spark, rides):
    """A far-future zero-passenger event that advances the watermark past
    every real window end. It must survive the pipeline's filters: Catalyst
    pushes the bbox/END filters *below* the EventTimeWatermark node, so a
    filtered-out event never advances the watermark. It contributes
    cnt=0 windows, so the batch-side expectation must include it too."""
    max_ts = rides.agg(F.max("ts")).first()[0]
    future = max_ts + timedelta(hours=2)
    return spark.createDataFrame(
        [(10**12, future, False, -73.71, 40.51, 0)], RIDES_SCHEMA
    )


def _run_stream(spark, chunk_dir, build, sink, output_mode):
    stream = replay.read_replay_stream(
        spark, chunk_dir, RIDES_SCHEMA, max_files_per_trigger=1
    )
    q = write_update_stream(build(stream), sink, "t", output_mode)
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_sliding_equals_batch_in_order(spark, rides_df):
    rides = rides_df.unionByName(_sentinel(spark, rides_df))
    chunk_dir = replay.write_replay_chunks(rides, n_chunks=6, order_col="ts")
    sink = InMemoryUpsertSink(["cell", "window_end"])
    try:
        _run_stream(
            spark, chunk_dir, streaming_sliding_arrival_count, sink, "append"
        )
        got = {
            (d["cell"], d["window_end"]): d["cnt"]
            for d in sink.snapshot()
            if d["cell"] != SENT_CELL
        }
        expected = {
            (r.cell, r.window_end): r.cnt
            for r in sliding_arrival_count(rides).filter(
                F.col("cell") != SENT_CELL
            ).collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)


def test_streaming_sliding_equals_batch_out_of_order(spark, rides_df):
    """Seeded jitter <= 60s, watermark 60s: arrival order scrambled within
    the bound -> final results identical (reference invariant, SURVEY §5.2)."""
    rides = rides_df.unionByName(_sentinel(spark, rides_df))
    jittered = replay.with_delivery_jitter(rides, max_delay_secs=60)
    # chunked by DELIVERY time -> events arrive out of event-time order,
    # bounded by 60s; the stream schema omits delivery_ts (column pruning).
    chunk_dir = replay.write_replay_chunks(
        jittered, n_chunks=6, order_col="delivery_ts"
    )
    sink = InMemoryUpsertSink(["cell", "window_end"])
    try:
        _run_stream(
            spark,
            chunk_dir,
            lambda s: streaming_sliding_arrival_count(
                s, watermark_delay="60 seconds"
            ),
            sink,
            "append",
        )
        got = {
            (d["cell"], d["window_end"]): d["cnt"]
            for d in sink.snapshot()
            if d["cell"] != SENT_CELL
        }
        expected = {
            (r.cell, r.window_end): r.cnt
            for r in sliding_arrival_count(rides).filter(
                F.col("cell") != SENT_CELL
            ).collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)


def test_streaming_running_total_converges_to_batch(spark, rides_df):
    """App 1: update mode + K3 upsert (key=cell) converges to batch totals —
    the reference's running-fold + overwrite-by-cell contract."""
    chunk_dir = replay.write_replay_chunks(rides_df, n_chunks=6, order_col="ts")
    sink = InMemoryUpsertSink(["cell"])
    try:
        _run_stream(
            spark, chunk_dir, streaming_total_arrival_count, sink, "update"
        )
        got = {(d["cell"]): (d["cnt"], d["max_ts"]) for d in sink.snapshot()}
        expected = {
            r.cell: (r.cnt, r.max_ts)
            for r in total_arrival_count(rides_df).collect()
        }
        assert got == expected
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)


def test_streaming_early_fire_converges_and_fires_early(spark):
    """App 3 streaming: partials fire mid-stream at count thresholds; the
    K4-keyed sink converges to the batch-exact final counts."""
    base = datetime(2024, 3, 1, 0, 0, 0)
    rows = []
    for i in range(12):  # one cell, 12 END events, 10 passengers each
        rows.append(
            (i, base + timedelta(seconds=10 * i), False, -73.9, 40.75, 10)
        )
    # in-bbox zero-count sentinel far in the future to close all windows
    # (out-of-bbox events never reach the watermark node — filters are
    # pushed below it)
    rows.append((999, base + timedelta(hours=2), False, -73.71, 40.51, 0))
    rides = spark.createDataFrame(rows, RIDES_SCHEMA)
    chunk_dir = replay.write_replay_chunks(rides, n_chunks=4, order_col="ts")
    sink = InMemoryUpsertSink(["cell", "window_end", "fire_seq"])
    try:
        _run_stream(
            spark,
            chunk_dir,
            lambda s: streaming_early_fire_counts(
                arrival_events(s.withWatermark("ts", "60 seconds")),
                threshold=50,
            ),
            sink,
            "append",
        )
        rowsd = sink.snapshot()
        partials = [d for d in rowsd if not d["is_final"]]
        finals = [d for d in rowsd if d["is_final"]]
        assert partials, "expected count-driven partial fires"
        # batch-exact final comparison
        expected = {
            (r.cell, r.window_end): r.cnt
            for r in early_fire_counts(
                arrival_events(rides), threshold=50
            )
            .filter(F.col("is_final") & (F.col("cell") != SENT_CELL))
            .collect()
        }
        got = {
            (d["cell"], d["window_end"]): d["cnt"]
            for d in finals
            if d["cell"] != SENT_CELL
        }
        assert got == expected
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)


def test_parquet_upsert_sink_merges_by_key(spark):
    from flink_streaming_demo_spark.streaming.sinks import ParquetUpsertSink

    d = tempfile.mkdtemp(prefix="upsert_")
    path = d + "/kv"
    sink = ParquetUpsertSink(path, ["k"])
    b1 = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    b2 = spark.createDataFrame([(2, "b2"), (3, "c")], "k int, v string")
    try:
        sink.foreach_batch(b1, 0)
        sink.foreach_batch(b2, 1)
        got = {r.k: r.v for r in sink.read(spark).collect()}
        assert got == {1: "a", 2: "b2", 3: "c"}  # last write per key wins
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_dedup_within_watermark(spark):
    """Re-delivered events (same ride_id, duplicate in a later chunk within
    the watermark horizon) are dropped; the deduped stream count equals the
    batch distinct count."""
    from flink_streaming_demo_spark.streaming.pipelines import streaming_dedup

    base = datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for i in range(40):
        ts = base + timedelta(seconds=10 * i)
        rows.append((i, ts, False, -73.9, 40.7, 1))
        if i % 4 == 0:  # duplicate delivery, 15s later in event time order
            rows.append((i, ts, False, -73.9, 40.7, 1))
    df = spark.createDataFrame(rows, RIDES_SCHEMA)
    chunk_dir = replay.write_replay_chunks(df, n_chunks=4, order_col="ts")
    try:
        stream = replay.read_replay_stream(spark, chunk_dir, RIDES_SCHEMA)
        deduped = streaming_dedup(stream, ["ride_id"], "ts", "60 seconds")
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_t")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.table("dedup_t").count()
        assert got == 40  # 10 duplicates dropped
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)


def test_streaming_session_windows_equal_batch(spark):
    """session_window streaming (append mode, finalized by watermark) must
    equal the batch session_window over the same events."""
    from flink_streaming_demo_spark.streaming.pipelines import (
        streaming_session_counts,
    )

    schema = "event_id long, ts timestamp, user_id long"
    base = datetime(2024, 3, 1, 9, 0, 0)
    rows = []
    eid = 0
    for u in range(5):
        # two sessions per user: a burst, a >30min gap, another burst
        for k in range(4):
            rows.append((eid, base + timedelta(minutes=u + k * 5), u)); eid += 1
        for k in range(3):
            rows.append(
                (eid, base + timedelta(minutes=90 + u + k * 10), u)
            ); eid += 1
    # sentinel: far-future event advances the watermark past all sessions
    rows.append((eid, base + timedelta(days=2), 999))
    df = spark.createDataFrame(rows, schema)
    chunk_dir = replay.write_replay_chunks(df, n_chunks=4, order_col="ts")
    try:
        stream = replay.read_replay_stream(spark, chunk_dir, schema)
        q = (
            streaming_session_counts(stream, "30 minutes")
            .writeStream.format("memory")
            .queryName("sess_t")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            (r.user_id, r.session_start, r.session_end): r.n_events
            for r in spark.table("sess_t").collect()
            if r.user_id != 999
        }
        batch = (
            df.filter(F.col("user_id") != 999)
            .groupBy(F.session_window("ts", "30 minutes"), "user_id")
            .count()
        )
        want = {
            (r.user_id, r["session_window"].start, r["session_window"].end): r[
                "count"
            ]
            for r in batch.collect()
        }
        assert got == want
        assert len(want) == 10  # 2 sessions x 5 users
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)
