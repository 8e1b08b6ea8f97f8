"""Behavioral tests for the event-analytics queries (funnel, cohort)."""

from __future__ import annotations

from datetime import datetime, timedelta

from flink_streaming_demo_spark.plans import event_queries as EQ


def test_funnel_requires_strict_order(spark, monkeypatch):
    """A click BEFORE the first view must not advance the funnel; an
    in-order chain must; purchase before click stops at stage 2; users
    with no view are absent."""
    b = datetime(2024, 1, 1)
    rows = [
        (1, "click", b),                              # out of order
        (1, "view", b + timedelta(minutes=1)),
        (2, "view", b),                               # full chain
        (2, "click", b + timedelta(minutes=1)),
        (2, "purchase", b + timedelta(minutes=2)),
        (3, "view", b),                               # purchase too early
        (3, "purchase", b + timedelta(minutes=1)),
        (3, "click", b + timedelta(minutes=2)),
        (4, "click", b),                              # never views
    ]

    def fake_t(spark_, sf_dir_, name_):
        assert name_ == "events"
        return spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )

    monkeypatch.setattr(EQ, "t", fake_t)
    got = {
        r.user_id: r.stage
        for r in EQ.events_funnel_stages(spark, "ignored").collect()
    }
    assert got == {1: 1, 2: 3, 3: 2}


def test_cohort_retention_counts(spark, monkeypatch):
    """Two users first seen in week 0 (one returns in week 2), one user
    first seen in week 1."""
    b = datetime(2024, 1, 1)
    rows = [
        (1, "view", b),
        (1, "view", b + timedelta(days=15)),    # week 2
        (2, "view", b + timedelta(days=2)),     # week 0 only
        (3, "view", b + timedelta(days=8)),     # week 1 cohort
    ]

    def fake_t(spark_, sf_dir_, name_):
        return spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )

    monkeypatch.setattr(EQ, "t", fake_t)
    got = {
        (r.cohort_week, r.week_offset): r.n_users
        for r in EQ.events_cohort_retention(spark, "ignored").collect()
    }
    assert got == {(0, 0): 2, (0, 2): 1, (1, 0): 1}


def test_user_rfm_invariants(spark, sf_dir):
    """Quartiles are balanced (NTILE), the anchor user has recency 0,
    frequency mass equals the event count, segments are 3-digit codes."""
    from flink_streaming_demo_spark.plans.event_queries import (
        events_user_rfm,
    )

    out = events_user_rfm(spark, sf_dir).toPandas()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out["frequency"].sum() == n_events
    assert out["recency_secs"].min() == 0
    for col in ("r_score", "f_score", "m_score"):
        sizes = out.groupby(col).size()
        assert sorted(sizes.index) == [1, 2, 3, 4]
        assert sizes.max() - sizes.min() <= 1
    assert (
        out["segment"]
        == out["r_score"].astype(str)
        + out["f_score"].astype(str)
        + out["m_score"].astype(str)
    ).all()


def test_winsorized_mean_damps_outliers(spark, sf_dir):
    """Winsorized mean sits inside the [p05, p95] band, never exceeds
    the raw max effect, and clipping touches ~10% of rows per type."""
    from flink_streaming_demo_spark.plans.event_queries import (
        events_winsorized_stats,
    )

    for r in events_winsorized_stats(spark, sf_dir).collect():
        assert r.p05 <= r.winsorized_mean <= r.p95
        frac = r.n_clipped / r.n_events
        assert frac <= 0.12, (r.event_type, frac)


def test_scd2_intervals_tile_user_timeline(spark, sf_dir):
    """Per user: versions are 1..k, intervals chain exactly
    (valid_to == next valid_from), exactly one open current row, and
    consecutive intervals never carry the same type (change-only)."""
    from flink_streaming_demo_spark.plans.event_queries import (
        events_scd2_type_history,
    )

    out = events_scd2_type_history(spark, sf_dir).toPandas()
    for uid, grp in out.groupby("user_id"):
        grp = grp.sort_values("version")
        assert list(grp["version"]) == list(range(1, len(grp) + 1))
        assert grp["is_current"].sum() == 1
        assert grp.iloc[-1]["is_current"]
        closes = grp["valid_to"].iloc[:-1].tolist()
        opens = grp["valid_from"].iloc[1:].tolist()
        assert closes == opens, uid
        types = grp["event_type"].tolist()
        assert all(a != b for a, b in zip(types, types[1:])), uid


def test_key_skew_report_consistency(spark, sf_dir):
    """One row; totals reconcile with the raw table; skew stats obey
    their definitional inequalities."""
    from flink_streaming_demo_spark.plans.event_queries import (
        events_key_skew_report,
    )

    [r] = events_key_skew_report(spark, sf_dir).collect()
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert r.n_rows == ev.count()
    assert r.n_keys == ev.select("user_id").distinct().count()
    assert r.mean_cnt <= r.p99_cnt <= r.max_cnt
    assert abs(r.skew_factor - r.max_cnt / r.mean_cnt) < 1e-4
    assert 0 < r.hottest_share < 1


def test_moving_avg_range_frame_handles_gaps(spark, monkeypatch):
    """Planted series with a missing day: the RANGE frame's denominator
    shrinks across the gap (day 8's window spans days 2-8 -> 2 present
    days), which a ROWS frame would get wrong."""
    from pyspark.sql import functions as F

    import flink_streaming_demo_spark.plans.event_queries as EQ

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 1, "c", 0.0, "{}"),
            (2, "2024-01-02 00:00:00", 1, "c", 0.0, "{}"),
            (3, "2024-01-02 06:00:00", 1, "c", 0.0, "{}"),
            (4, "2024-01-08 00:00:00", 1, "c", 0.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    monkeypatch.setattr(EQ, "t", lambda *_: ev)
    got = {
        str(r.day)[:10]: (r.n_events, r.ma7, r.delta_prev_day)
        for r in EQ.events_daily_moving_avg(spark, "ignored").collect()
    }
    assert got["2024-01-01"] == (1, 1.0, None)
    assert got["2024-01-02"] == (2, 1.5, 1)
    # day 8: range frame covers days 2..8 -> only day 2 and day 8 present
    assert got["2024-01-08"] == (1, 1.5, -1)


def test_temporal_join_covers_every_event_exactly_once(spark, sf_dir):
    """Partition property of the temporal join: every event falls in
    exactly one validity interval (counts sum to the event total), the
    covering version's type always equals the event's own type, and
    interval bounds contain [first_ts, last_ts]."""
    from flink_streaming_demo_spark.plans.event_queries import (
        events_temporal_scd2_join,
    )

    out = events_temporal_scd2_join(spark, sf_dir).toPandas()
    n_events = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert out["n_events"].sum() == n_events
    assert (out["n_mismatched"] == 0).all()
    assert (out["first_ts"] <= out["last_ts"]).all()


def test_daily_anomaly_flags_planted_spike(spark, monkeypatch):
    """Flat 10-events/day baseline with one 100-event spike: the spike
    day (and only days with a valid >=3-day baseline) gets flagged; the
    self-excluding trailing window keeps the spike out of its own
    baseline."""
    from pyspark.sql import functions as F

    import flink_streaming_demo_spark.plans.event_queries as EQ

    rows = []
    eid = 0
    for d in range(1, 11):  # Jan 1..10, 10 events/day
        for k in range(10):
            rows.append((eid, f"2024-01-{d:02d} 0{k%10}:00:00"))
            eid += 1
    for k in range(90):  # spike on Jan 11 -> 100 events
        rows.append((eid, f"2024-01-11 10:{k%60:02d}:00"))
        eid += 1
    for k in range(10):
        rows.append((eid, f"2024-01-11 0{k%10}:00:00"))
        eid += 1
    ev = spark.createDataFrame(
        [(i, ts, 1, "c", 0.0, "{}") for i, ts in rows],
        "event_id long, ts string, user_id long, event_type string,"
        " value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    monkeypatch.setattr(EQ, "t", lambda *_: ev)
    got = {
        str(r.day)[:10]: r
        for r in EQ.events_daily_anomaly(spark, "ignored").collect()
    }
    assert got["2024-01-11"].is_anomaly
    assert got["2024-01-11"].baseline_mean == 10.0
    # flat days: zero-variance baseline -> null z, not flagged
    assert got["2024-01-10"].z_score is None
    assert not got["2024-01-10"].is_anomaly
    # first day has no baseline at all
    assert got["2024-01-01"].z_score is None


def test_approx_distinct_users_bounded_error(spark, sf_dir):
    """events_approx_distinct_users emits the HLL++ estimate's error
    CONTRACT rather than the engine-internal estimate itself (r11: the
    query became hash-checkable). This test independently recomputes the
    exact side and additionally pins the raw estimate to a TIGHTER bound
    than the query's 5-sigma contract: within 5% relative error of the
    exact distinct count (rsd=0.02, ~2.5 sigma), so a sketch-quality
    regression trips here before it ever threatens the driver row."""
    from pyspark.sql import functions as F

    from flink_streaming_demo_spark.plans.event_queries import (
        events_approx_distinct_users,
    )
    from flink_streaming_demo_spark.schemas import load_table

    got = {r.event_type: r for r in
           events_approx_distinct_users(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {r.event_type: r for r in
             ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("exact_users"),
                  F.count(F.lit(1)).alias("n_events"))
             .collect()}
    raw = {r.event_type: r.approx_users for r in
           ev.groupBy("event_type")
           .agg(F.approx_count_distinct("user_id", 0.02)
                .alias("approx_users"))
           .collect()}
    assert set(got) == set(exact) and got
    for et, r in got.items():
        e = exact[et]
        assert r.n_events == e.n_events, et
        assert r.exact_users == e.exact_users, et
        assert r.within_bound, et
        rel = abs(raw[et] - e.exact_users) / max(e.exact_users, 1)
        assert rel <= 0.05, (et, raw[et], e.exact_users, rel)


def test_session_window_inclusive_gap_boundary(spark, monkeypatch):
    """Pins the native session_window merge contract the oracle encodes:
    an event exactly `gap` (30 min) after the previous one MERGES into
    the session (inclusive boundary), one past the gap starts a new
    session, and session_end is last-event ts + gap."""
    b = datetime(2024, 1, 1)
    rows = [
        # user 1: 0, +30m (exact boundary -> merge), +60m (merge again)
        (1, 1, "view", b, 1.0),
        (1, 2, "view", b + timedelta(minutes=30), 1.0),
        (1, 3, "view", b + timedelta(minutes=60), 1.0),
        # user 2: 0, +30m+1s -> two sessions
        (2, 4, "view", b, 1.0),
        (2, 5, "view", b + timedelta(minutes=30, seconds=1), 1.0),
    ]

    def fake_t(spark_, sf_dir_, name_):
        assert name_ == "events"
        return spark.createDataFrame(
            rows,
            "user_id long, event_id long, event_type string,"
            " ts timestamp, value double",
        )

    monkeypatch.setattr(EQ, "t", fake_t)
    got = sorted(
        EQ.events_session_windows(spark, "ignored").collect(),
        key=lambda r: (r.user_id, r.session_start),
    )
    assert [(r.user_id, r.n_events) for r in got] == [(1, 3), (2, 1), (2, 1)]
    u1 = got[0]
    assert u1.session_start == b
    assert u1.session_end == b + timedelta(minutes=90)  # last ts + gap
    u2a, u2b = got[1], got[2]
    assert u2a.session_end == b + timedelta(minutes=30)
    assert u2b.session_start == b + timedelta(minutes=30, seconds=1)


def test_psi_flags_planted_shift_and_not_identical(spark, monkeypatch):
    """A type whose values sit in a disjoint range from the bulk must
    read 'shifted' (PSI >> 0.25); a type distributed like the global
    mix stays near 0 ('stable'); PSI is always >= 0."""
    rows = []
    eid = 0
    # bulk: two types with the same spread of values across [0, 512)
    for t_name in ("click", "view"):
        for i in range(400):
            rows.append((eid, t_name, 100 + (i * 37) % 300 + 0.5))
            eid += 1
    # shifted: all mass in the top bins (small cohort, so the bulk
    # types still mirror the global mix closely)
    for i in range(24):
        rows.append((eid, "error", 480.0 + (i % 30)))
        eid += 1

    def fake_t(spark_, sf_dir_, name_):
        assert name_ == "events"
        return spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )

    monkeypatch.setattr(EQ, "t", fake_t)
    got = {r.event_type: r for r in
           EQ.events_psi_value_drift(spark, "ignored").collect()}
    assert got["error"].verdict == "shifted"
    assert got["error"].psi > 1.0
    # click/view each mirror the global mix (error's 100 rows perturb
    # it only mildly) — they must not read as shifted
    assert got["click"].verdict in ("stable", "drifting")
    assert got["click"].psi < 0.25
    assert all(r.psi >= 0 for r in got.values())
    assert got["click"].n_events == 400 and got["error"].n_events == 24


def test_lateness_profile_bounds_and_presence(spark, sf_dir):
    """The simulated out-of-order arrival (md5 jitter <= 599 s) bounds
    every event's watermark lateness by the max delay: wm at an event's
    arrival minute only reflects events that ARRIVED earlier, whose
    event times trail their arrival by at most 599 s. The jitter must
    also actually produce late events (a profile of all-zeros would
    mean the simulation is vacuous), and the would-be-dropped count at
    a 60 s allowed lateness can never exceed the late count."""
    from flink_streaming_demo_spark.plans.event_queries import (
        events_lateness_profile,
    )

    rows = events_lateness_profile(spark, sf_dir).collect()
    assert rows, "profile must cover the observed event types"
    assert sum(r["n_late"] for r in rows) > 0
    for r in rows:
        assert 0 <= r["n_late"] <= r["n_events"]
        assert 0 <= r["max_late_s"] <= 599
        assert r["n_dropped_60s"] <= r["n_late"]
        assert 0.0 <= r["avg_late_s"] <= r["max_late_s"] + 1e-9


def test_sequence_patterns_match_python_reference(spark, sf_dir):
    """The regex-over-symbol-string CEP counts must match a plain-Python
    scan over the same ordered sequences (independent of both engines'
    regex libraries), and cover every user."""
    import re

    from flink_streaming_demo_spark.plans.event_queries import (
        events_sequence_patterns,
    )
    from flink_streaming_demo_spark.schemas import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    rows = sorted(
        ev.collect(), key=lambda r: (r.user_id, r.ts, r.event_id)
    )
    seqs: dict[int, str] = {}
    for r in rows:
        seqs[r.user_id] = seqs.get(r.user_id, "") + r.event_type[0]
    got = {
        r.user_id: (r.n_events, r.n_conversions, r.n_error_bursts)
        for r in events_sequence_patterns(spark, sf_dir).collect()
    }
    assert set(got) == set(seqs)
    for uid, seq in seqs.items():
        want = (
            len(seq),
            len(re.findall(r"c[^cp]*p", seq)),
            len(re.findall(r"ee+", seq)),
        )
        assert got[uid] == want, uid
    assert sum(v[1] for v in got.values()) > 0, "no conversions matched"


def test_watermark_delay_tradeoff_is_monotone(spark, sf_dir):
    """Operating-point sanity: dropped counts are non-increasing in the
    allowed delay, delay=600 (>= the jitter bound) drops nothing, and
    every candidate row covers the full event count."""
    from flink_streaming_demo_spark.plans.event_queries import (
        _WM_CANDIDATE_DELAYS,
        events_watermark_delay_tradeoff,
    )

    rows = {
        r["delay_s"]: r
        for r in events_watermark_delay_tradeoff(spark, sf_dir).collect()
    }
    assert set(rows) == set(_WM_CANDIDATE_DELAYS)
    totals = {r["n_events"] for r in rows.values()}
    assert len(totals) == 1
    drops = [rows[d]["n_dropped"] for d in sorted(rows)]
    assert drops == sorted(drops, reverse=True)
    assert rows[600]["n_dropped"] == 0
    assert rows[0]["n_dropped"] > 0, "zero-delay must drop late events"
