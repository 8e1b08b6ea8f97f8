"""Taxi-ride batch sources: CSV reader, trip->event ETL, synthetic view.

Covers the batch/data half of the reference's source surface (SURVEY §2.1):

* S3 — typed CSV record parsing (reference: datatypes/TaxiRide.scala:68-90)
* S4 — trip -> two-event ETL (reference: src/main/scripts/convertTrips.sh:24-35)
* plus a deterministic *synthetic* taxi view over the driver's ``events``
  table, because the reference's ``data/nycTaxiData.gz`` is absent from the
  checkout and the driver's testdata carries no lon/lat. The synthetic view
  uses only integer-modulo + double arithmetic, so an ANSI-SQL oracle
  (DuckDB) reproduces it bit-for-bit.

The streaming half (S1 replay pacing, S2 watermarks) lives in
``flink_streaming_demo_spark.streaming.replay``.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_demo_spark.schemas import TAXI_RIDE_CSV_SCHEMA

# Timestamp pattern: intended semantics of the reference's joda pattern
# "yyyy-MM-DD HH:mm:ss" (reference: datatypes/TaxiRide.scala:64-66). Joda `DD`
# is day-of-year — a latent bug that happens to be harmless for the demo's
# Jan 1-6 window; we use day-of-month `dd` (SURVEY §1.3 fidelity note).
TAXI_TS_PATTERN = "yyyy-MM-dd HH:mm:ss"


def read_taxi_rides_csv(spark: SparkSession, path: str) -> DataFrame:
    """S3: read the reference's CSV wire format into the typed ride schema.

    Mirrors ``TaxiRide.fromString`` (reference: datatypes/TaxiRide.scala:68-90):
    FAILFAST on malformed rows (7 tokens required, TaxiRide.scala:71-72),
    ``isStart = col3 == "START"`` (TaxiRide.scala:78), empty lon/lat -> 0.0
    (TaxiRide.scala:79-80), empty travelDist -> 0.0 (TaxiRide.scala:82).
    Gzip input is transparent to the Spark CSV reader.
    """
    raw = (
        spark.read.schema(TAXI_RIDE_CSV_SCHEMA)
        .option("mode", "FAILFAST")
        .option("header", "false")
        .csv(path)
    )
    return raw.select(
        F.col("ride_id"),
        F.to_timestamp("time_str", TAXI_TS_PATTERN).alias("ts"),
        (F.col("start_end") == F.lit("START")).alias("is_start"),
        F.coalesce(F.col("lon"), F.lit(0.0)).alias("lon"),
        F.coalesce(F.col("lat"), F.lit(0.0)).alias("lat"),
        F.coalesce(F.col("passenger_cnt"), F.lit(0).cast("short")).alias(
            "passenger_cnt"
        ),
        F.coalesce(F.col("travel_dist"), F.lit(0.0).cast("float")).alias(
            "travel_dist"
        ),
    )


def trips_to_events(trips: DataFrame) -> DataFrame:
    """S4: one trip row -> START + END events, ordered by event time.

    Spark-first re-expression of the awk/sort ETL
    (reference: src/main/scripts/convertTrips.sh:24-35): two projections +
    ``unionAll`` + ``orderBy`` instead of a driver-side loop; at 100 TB the
    global sort becomes a range-partitioned exchange, and downstream
    consumers that don't need total order should drop the ``orderBy``.

    Expects columns: trip_id, start_ts, end_ts, start_lon, start_lat,
    end_lon, end_lat, passenger_cnt, travel_dist.
    """
    starts = trips.select(
        F.col("trip_id").alias("ride_id"),
        F.col("start_ts").alias("ts"),
        F.lit(True).alias("is_start"),
        F.col("start_lon").alias("lon"),
        F.col("start_lat").alias("lat"),
        F.col("passenger_cnt"),
        # travelDist is -1 on START events (reference: datatypes/TaxiRide.scala:34)
        F.lit(-1.0).cast("float").alias("travel_dist"),
    )
    ends = trips.select(
        F.col("trip_id").alias("ride_id"),
        F.col("end_ts").alias("ts"),
        F.lit(False).alias("is_start"),
        F.col("end_lon").alias("lon"),
        F.col("end_lat").alias("lat"),
        F.col("passenger_cnt"),
        F.col("travel_dist"),
    )
    return starts.unionAll(ends).orderBy("ts", "ride_id")


def synthetic_taxi_rides(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic taxi-ride view over the driver's ``events`` table.

    Maps the event stream into the reference's record shape
    (reference: datatypes/TaxiRide.scala:36-42) with pure arithmetic:

    * ``ride_id`` = event_id; ``is_start`` = event_id even
    * ``lon`` in [-74.1, -73.6005], ``lat`` in [40.4, 41.0993] — ranges chosen
      to straddle the NYC bbox (reference: utils/NycGeoUtils.scala:26-29) so
      the bbox filter is non-trivial
    * ``passenger_cnt`` = 1 + event_id % 4

    The exact same expressions exist as SQL in :func:`synthetic_taxi_sql`
    for the DuckDB oracle.
    """
    from flink_streaming_demo_spark.schemas import load_table

    events = load_table(spark, sf_dir, "events")
    return events.select(*_synthetic_ride_exprs())


@lru_cache(maxsize=None)
def _synthetic_ride_exprs() -> tuple:
    # df-independent Column constants, built once per process (r15):
    # see plans/taxi_apps.py for the rationale.
    return (
        F.col("event_id").alias("ride_id"),
        F.col("ts"),
        (F.col("event_id") % 2 == 0).alias("is_start"),
        (
            F.lit(-74.1)
            + ((F.col("event_id") * 7919) % 1000).cast("double") * F.lit(0.0005)
        ).alias("lon"),
        (
            F.lit(40.4)
            + ((F.col("event_id") * 104729) % 1000).cast("double") * F.lit(0.0007)
        ).alias("lat"),
        (F.lit(1) + (F.col("event_id") % 4)).cast("int").alias("passenger_cnt"),
    )


def synthetic_taxi_sql(events_table: str = "events") -> str:
    """DuckDB twin of :func:`synthetic_taxi_rides` (same IEEE double ops)."""
    return f"""
        SELECT
            event_id AS ride_id,
            CAST(ts AS TIMESTAMP) AS ts,
            (event_id % 2 = 0) AS is_start,
            (-74.1 + CAST((event_id * 7919) % 1000 AS DOUBLE) * 0.0005) AS lon,
            (40.4 + CAST((event_id * 104729) % 1000 AS DOUBLE) * 0.0007) AS lat,
            CAST(1 + (event_id % 4) AS INT) AS passenger_cnt
        FROM {events_table}
    """
