"""Window-assignment helpers: per-event sliding-window expansion as pure
Column expressions (the batch analogue of what Spark's ``window()`` rewrite
does inside groupBy — exposed standalone so custom per-window operators like
the early-fire trigger can group by (key, window) explicitly)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sliding_window_starts(
    ts: Column, window_secs: int, slide_secs: int
) -> Column:
    """Array of window-start timestamps containing ``ts``: starts are
    epoch-aligned multiples of ``slide_secs`` in
    (ts - window, ts] — Spark's alignment rule
    ``start = ts - (ts - epoch) % slide - k*slide``."""
    n = window_secs // slide_secs
    slide_us = slide_secs * 1_000_000
    anchor = (F.unix_micros(ts) / slide_us).cast("long") * slide_us
    return F.transform(
        F.sequence(F.lit(0), F.lit(n - 1)),
        lambda k: F.timestamp_micros(anchor - k.cast("long") * slide_us),
    )


def assign_sliding_windows(
    df: DataFrame,
    ts_col: str = "ts",
    window_secs: int = 900,
    slide_secs: int = 300,
    start_col: str = "w_start",
    end_col: str = "w_end",
) -> DataFrame:
    """Explode each event into its overlapping sliding windows (one output
    row per (event, window) — e.g. 3 rows for 15min/5min)."""
    return df.withColumn(
        start_col,
        F.explode(
            sliding_window_starts(F.col(ts_col), window_secs, slide_secs)
        ),
    ).withColumn(
        end_col,
        F.col(start_col) + F.make_dt_interval(secs=F.lit(float(window_secs))),
    )
