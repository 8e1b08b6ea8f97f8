from flink_streaming_demo_spark.sources.taxi import (  # noqa: F401
    read_taxi_rides_csv,
    synthetic_taxi_rides,
    trips_to_events,
)
