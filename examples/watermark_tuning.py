"""Watermark-tuning cookbook, runnable as a script:

    python examples/watermark_tuning.py [sf_dir]

The event-time observability loop behind every ``withWatermark`` delay
choice (operators/lateness.py):

1. simulate an out-of-order arrival of the event stream (deterministic
   md5 jitter — the reference TaxiRideSource's maxServingDelay shape),
2. profile watermark lateness per event type
   (``events_lateness_profile``: late fraction, magnitudes,
   would-be-dropped counts),
3. read the operating-point table
   (``events_watermark_delay_tradeoff``: dropped events per candidate
   delay) and pick the smallest delay whose drop count is acceptable,
4. replay the stream through the INCREMENTAL form
   (``streaming_lateness_monitor``): the same profile maintained
   micro-batch by micro-batch with a store-carried watermark — the
   monitor a production pipeline runs next to its real queries, and
   the store converges to the batch numbers (the streaming≡batch
   equivalence the tests pin exactly).
"""

from __future__ import annotations

import sys


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    import os
    import tempfile

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from flink_streaming_demo_spark.operators import lateness as L
    from flink_streaming_demo_spark.plans.event_queries import (
        events_lateness_profile,
        events_watermark_delay_tradeoff,
    )
    from flink_streaming_demo_spark.schemas import load_table
    from flink_streaming_demo_spark.session import get_spark
    from flink_streaming_demo_spark.streaming import replay
    from flink_streaming_demo_spark.streaming.pipelines import (
        streaming_lateness_monitor,
        write_foreach_batch_stream,
    )
    from flink_streaming_demo_spark.streaming.sinks import ParquetUpsertSink

    spark = get_spark("watermark-tuning-example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1+2. lateness profile of the simulated arrival ==")
    events_lateness_profile(spark, sf_dir).orderBy("event_type").show()

    print("== 3. operating points: dropped events per candidate delay ==")
    events_watermark_delay_tradeoff(spark, sf_dir).orderBy(
        "delay_s"
    ).show()

    print("== 4. the same profile, maintained incrementally ==")
    # widened jitter (1 day) for the replay leg: with only 4 replay
    # chunks as epochs, a 10-minute jitter almost never crosses a
    # chunk boundary — the wide jitter makes the incremental late
    # counts visible at cookbook scale
    ev = L.with_md5_arrival(
        load_table(spark, sf_dir, "events").select(
            "event_id", "event_type", "ts"
        ),
        max_delay_s=86_400,
    ).select("event_id", "event_type", "ts", "ets_us", "arr_us")
    chunk_dir = replay.write_replay_chunks(
        ev, n_chunks=4, order_col="arr_us"
    )
    store = tempfile.mkdtemp(prefix="wm_tuning_") + "/store"
    sink = ParquetUpsertSink(store, ["event_type"])
    body = streaming_lateness_monitor(sink)
    stream = replay.read_replay_stream(
        spark,
        chunk_dir,
        "event_id long, event_type string, ts timestamp, "
        "ets_us long, arr_us long",
        max_files_per_trigger=1,
    )
    q = write_foreach_batch_stream(stream, body, "wm_tuning_monitor")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    sink.read(spark).orderBy("event_type").show()
    print(
        "note: the store's epochs are the 4 replay chunks (and this "
        "leg uses a widened 1-day jitter); the batch profile above "
        "uses per-minute epochs with the 10-minute jitter — same "
        "primitives, same algebra, epoch granularity is the only "
        "difference."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(
        main(*(sys.argv[1:2] or ["/root/testdata/sf0.001"]))
    )
