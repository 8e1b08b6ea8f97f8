"""Watermark-lateness measurement over an out-of-order event arrival.

The observability layer behind every ``withWatermark`` delay choice
(reference: the out-of-order serving simulation in
sources/TaxiRideSource.scala:53-277, SURVEY §2.2 S2): simulate (or
observe) an arrival order, advance a discretized watermark per arrival
epoch (minute, replay chunk, micro-batch — the caller picks the epoch
column), and measure each event's lateness against the watermark of its
own arrival epoch. The batch query (plans/event_queries.
events_lateness_profile) and the streaming monitor (streaming/pipelines.
streaming_lateness_monitor) compose the same primitives, so their
results are definitionally comparable — the streaming≡batch equivalence
test holds EXACTLY when the batch epochs equal the replay chunks.

All arithmetic is integer micros/seconds: profiles are exact-integer
aggregates (counts, sums, maxes), mergeable across epochs — the same
algebra class as the sketch partials, which is what makes the streaming
store maintainable by ⊕-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Arrival-delay simulation bound in seconds (the reference's
# maxServingDelay analogue); md5-derived so both engines and every rerun
# agree on each event's delay.
MAX_DELAY_S = 600
DROP_THRESHOLD_S = 60


def with_md5_arrival(ev: DataFrame, id_col: str = "event_id",
                     ts_col: str = "ts",
                     max_delay_s: int = MAX_DELAY_S) -> DataFrame:
    """Append ``ets_us`` (event-time micros) and ``arr_us`` (simulated
    arrival micros = event time + md5(id) % max_delay_s seconds)."""
    delay_s = (
        F.conv(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
        ).cast("bigint")
        % max_delay_s
    )
    return ev.withColumn("ets_us", F.unix_micros(ts_col)).withColumn(
        "arr_us", F.col("ets_us") + delay_s * F.lit(1_000_000)
    )


def lateness_vs_epoch_watermark(
    ev: DataFrame, epoch_col: str
) -> DataFrame:
    """Per-event lateness against the watermark of the event's arrival
    epoch (wm at epoch e = max ets_us over epochs STRICTLY before e).
    Appends ``is_late`` and ``late_s``.

    Scale: the per-epoch partial MAX is a map-side-combined aggregation;
    the cumulative max runs over one row per epoch (a bounded control
    table — see the plan-guard allowlist) and is broadcast back."""
    epochs = ev.groupBy(epoch_col).agg(F.max("ets_us").alias("m_max_us"))
    w = Window.orderBy(epoch_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    wm = epochs.select(
        epoch_col, F.max("m_max_us").over(w).alias("wm_us")
    )
    return ev.join(F.broadcast(wm), epoch_col).withColumn(
        "is_late",
        F.coalesce(F.col("wm_us") > F.col("ets_us"), F.lit(False)),
    ).withColumn(
        "late_s",
        F.greatest(
            F.lit(0).cast("bigint"),
            F.expr("coalesce(wm_us - ets_us, 0) div 1000000"),
        ),
    )


def lateness_vs_fixed_watermark(
    ev: DataFrame, wm_us: int | None
) -> DataFrame:
    """Per-event lateness against one known watermark value — the
    streaming monitor's per-micro-batch form (the store carries the max
    event time of all PRIOR batches; ``None`` = first batch, nothing can
    be late)."""
    if wm_us is None:
        return ev.withColumn("is_late", F.lit(False)).withColumn(
            "late_s", F.lit(0).cast("bigint")
        )
    wm = F.lit(int(wm_us)).cast("bigint")
    return ev.withColumn("is_late", wm > F.col("ets_us")).withColumn(
        "late_s",
        F.greatest(
            F.lit(0).cast("bigint"),
            F.expr(f"({int(wm_us)}L - ets_us) div 1000000"),
        ),
    )


def lateness_profile_ints(late: DataFrame) -> DataFrame:
    """Per-type EXACT-INTEGER lateness profile — counts, max, sum — the
    mergeable partial form (merge = SUM/SUM/MAX/SUM/SUM per type): the
    streaming store state, and the base the batch query derives its
    avg column from."""
    return late.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("is_late").cast("int")).cast("bigint").alias(
            "n_late"
        ),
        F.max("late_s").alias("max_late_s"),
        F.sum("late_s").cast("bigint").alias("sum_late_s"),
        F.sum((F.col("late_s") > DROP_THRESHOLD_S).cast("int"))
        .cast("bigint")
        .alias("n_dropped_60s"),
    )


def merge_profiles(cur: DataFrame, part: DataFrame) -> DataFrame:
    """⊕-merge two integer profiles (outer per type; SUM/MAX columns)."""
    return (
        cur.unionByName(part)
        .groupBy("event_type")
        .agg(
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("n_late").cast("bigint").alias("n_late"),
            F.max("max_late_s").alias("max_late_s"),
            F.sum("sum_late_s").cast("bigint").alias("sum_late_s"),
            F.sum("n_dropped_60s").cast("bigint").alias("n_dropped_60s"),
        )
    )
