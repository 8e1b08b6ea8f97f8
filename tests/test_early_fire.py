"""Pin the early-fire trigger's emission sequence (W3; reference:
examples/EarlyArrivalCount.scala:117-160) on crafted fixtures — SURVEY §5.3.3."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from flink_streaming_demo_spark.operators.early_fire import early_fire_counts


def _arrivals(spark, counts_and_ts):
    rows = [
        (7, datetime(2024, 1, 1, 0, m, s), c) for (m, s, c) in counts_and_ts
    ]
    return spark.createDataFrame(
        rows, "cell int, ts timestamp, passenger_cnt int"
    )


def test_partial_fires_at_threshold_crossings(spark):
    # One cell; events inside 00:00-00:05 -> 3 overlapping 15m/5m windows.
    # Counts 20,20,20,45: counter 20,40,60>=50 fire(total=60,reset),45<50;
    # final total 105.
    df = _arrivals(
        spark, [(0, 10, 20), (1, 10, 20), (2, 10, 20), (3, 10, 45)]
    )
    out = early_fire_counts(df, threshold=50).collect()
    by_window = {}
    for r in out:
        by_window.setdefault(str(r.window_end), []).append(r)
    # every window sees the same events here -> same sequence in each
    assert len(by_window) == 3
    for fires in by_window.values():
        fires.sort(key=lambda r: r.fire_seq)
        assert [(r.cnt, r.is_final) for r in fires] == [(60, False), (105, True)]


def test_counter_resets_not_rebased(spark):
    # 49 + 1 -> fire at 50; then 49 + 1 -> fire at 100; then final.
    df = _arrivals(
        spark, [(0, 1, 49), (0, 2, 1), (0, 3, 49), (0, 4, 1), (0, 5, 2)]
    )
    out = [
        r
        for r in early_fire_counts(df, threshold=50).collect()
        if str(r.window_end).endswith("00:15:00")
    ]
    out.sort(key=lambda r: r.fire_seq)
    assert [(r.cnt, r.is_final) for r in out] == [
        (50, False),
        (100, False),
        (102, True),
    ]


def test_no_partial_below_threshold(spark):
    df = _arrivals(spark, [(0, 1, 10), (0, 2, 10)])
    out = early_fire_counts(df, threshold=50).collect()
    assert all(r.is_final for r in out)
    assert all(r.cnt == 20 for r in out)


def test_final_matches_plain_window_sum(spark, sf_dir):
    from flink_streaming_demo_spark.plans.taxi_apps import (
        arrival_events,
        sliding_arrival_count,
    )
    from flink_streaming_demo_spark.sources.taxi import synthetic_taxi_rides

    rides = synthetic_taxi_rides(spark, sf_dir)
    finals = (
        early_fire_counts(arrival_events(rides))
        .filter(F.col("is_final"))
        .select("cell", "window_end", "cnt")
    )
    expected = sliding_arrival_count(rides).select(
        "cell", "window_end", "cnt"
    )
    assert finals.subtract(expected).count() == 0
    assert expected.subtract(finals).count() == 0
