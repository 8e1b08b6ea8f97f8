"""Event-time replay harness: the Spark analogue of the reference's
``TaxiRideSource`` (S1/S2; reference: sources/TaxiRideSource.scala:53-279).

The reference source paces events against wall-clock (servingSpeed), delays
them with a seeded truncated Gaussian to simulate out-of-order arrival
(getNormalDelayMsecs, reference: sources/TaxiRideSource.scala:270-277), and
emits watermarks trailing by maxDelay (reference:
sources/TaxiRideSource.scala:195,258). Spark's micro-batch model needs no
wall-clock pacing (the pull model replaces backpressure — SURVEY §4.1);
what matters semantically is the *arrival order* and the *watermark
contract*:

* arrival order — events are chunked into files by **delivery time**
  (event time + seeded jitter); the file-stream source with
  ``maxFilesPerTrigger=1`` delivers one chunk per micro-batch, so events
  can arrive up to ``max_delay`` after their event time, exactly like the
  reference's unordered mode.
* watermark — ``withWatermark(ts, max_delay)``: Spark's watermark =
  max(seen ts) − delay per micro-batch; with jitter bounded by
  ``max_delay`` no event is ever late, reproducing the reference's
  "no late events possible" invariant (SURVEY §5.2) — the golden test
  invariant *streaming final results ≡ batch results* holds.

Jitter is ``least(greatest(randn(seed)·σ + μ, 0), maxDelay)`` with
μ = σ = maxDelay/2 — the same truncated Gaussian family as the reference's
``getNormalDelayMsecs``, deterministic under a fixed seed (their seed: 7452,
reference: sources/TaxiRideSource.scala:175).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SEED = 7452  # reference: sources/TaxiRideSource.scala:175


def with_delivery_jitter(
    df: DataFrame,
    ts_col: str = "ts",
    max_delay_secs: int = 60,
    seed: int = DEFAULT_SEED,
) -> DataFrame:
    """Add a ``delivery_ts`` column = ts + truncated-Gaussian jitter in
    [0, max_delay_secs] (U6; reference: sources/TaxiRideSource.scala:270-277)."""
    mu = sigma = max_delay_secs / 2.0
    jitter = F.least(
        F.greatest(F.randn(seed) * F.lit(sigma) + F.lit(mu), F.lit(0.0)),
        F.lit(float(max_delay_secs)),
    )
    return df.withColumn(
        "delivery_ts",
        F.timestamp_micros(
            (F.unix_micros(F.col(ts_col)) + (jitter * 1_000_000).cast("long"))
        ),
    )


def write_replay_chunks(
    df: DataFrame,
    out_dir: str | None = None,
    n_chunks: int = 8,
    order_col: str = "ts",
) -> str:
    """Materialize a bounded DataFrame as n_chunks parquet files ordered by
    ``order_col`` (event time for in-order replay, delivery_ts for
    out-of-order replay). Each file is one micro-batch when streamed with
    maxFilesPerTrigger=1 — the replay analogue of the reference's paced
    source thread."""
    out_dir = out_dir or tempfile.mkdtemp(prefix="replay_")
    # Range-based chunking on the order column (same pattern as
    # operators/sampling.pack_greedy): a 1-row bounds agg + a pure map
    # expression replace the previous global-sort ntile — no
    # single-partition WindowExec for the harness either. Chunks stay
    # time-ordered (chunk i's max <= chunk i+1's min); equal timestamps
    # always land in the same chunk. Chunk sizes follow the event-time
    # density instead of being exactly equal, which is closer to the
    # reference's paced wall-clock source anyway.
    key = F.col(order_col).cast("double")
    lo, hi = df.agg(F.min(key), F.max(key)).first()
    if lo is None or hi is None or hi <= lo:
        chunk = F.lit(0)
    else:
        chunk = F.least(
            F.lit(n_chunks - 1),
            F.floor((key - F.lit(lo)) / F.lit(hi - lo) * n_chunks),
        ).cast("int")
    chunked = df.withColumn("_chunk", chunk).cache()
    # Written sequentially so file modification times follow replay order
    # (the file-stream source picks oldest files first).
    for i in range(n_chunks):
        part = chunked.filter(F.col("_chunk") == i).drop("_chunk")
        part.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"chunk_{i:04d}.parquet")
        )
    chunked.unpersist()
    return out_dir


def read_replay_stream(
    spark: SparkSession,
    chunk_dir: str,
    schema,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """File-stream source over the replay chunks: one chunk per micro-batch."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("recursiveFileLookup", "true")
        .parquet(chunk_dir)
    )


def paced_replay_stream(
    spark: SparkSession,
    df: DataFrame,
    ts_col: str = "ts",
    speedup: float = 600.0,
    ticks_per_second: int = 4,
) -> DataFrame:
    """Wall-clock-paced replay (U5 exact): deliver each event when
    ``(event_ts - min_ts) / speedup`` of wall time has elapsed — the
    reference's servingSpeed contract (reference:
    sources/TaxiRideSource.scala:265-268, toServingTime = start +
    (eventTime - dataStart) / servingSpeed).

    Spark-first shape: the ``rate`` source emits one row per tick against
    wall clock; each event is pre-assigned the tick its serving time falls
    in (floor(serving_offset * ticks_per_second)) and the stream is a
    stream-static EQUI-join rate.value == event._tick — each tick's
    micro-batch carries exactly the events due in that tick. No sleeps, no
    custom receiver thread; pacing granularity = 1/ticks_per_second.

    The static side is re-probed per micro-batch, so this is a demo /
    integration harness (like the reference's single-threaded source), not
    a 100 TB ingest path — production replay is the chunked file stream
    above. Compose with ``with_delivery_jitter`` first (pass
    ``ts_col='delivery_ts'``) for paced out-of-order arrival.
    """
    # epoch micros computed IN Spark (one tiny job): collecting a datetime
    # and calling .timestamp() would round-trip through the OS-local
    # timezone — any session/OS TZ divergence shifts every tick, and
    # negative ticks never match the rate source (value >= 0)
    t0_us = df.agg(F.min(F.unix_micros(F.col(ts_col)))).first()[0]
    prepared = df.withColumn(
        "_tick",
        F.floor(
            (F.unix_micros(F.col(ts_col)) - F.lit(t0_us))
            / F.lit(1e6 * speedup / ticks_per_second)
        ).cast("long"),
    )
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", ticks_per_second)
        .load()
    )
    return (
        rate.select(F.col("value").alias("_tick"))
        .join(prepared, "_tick", "inner")
        .drop("_tick")
    )
