"""Static schemas for the engine.

The reference's single input record type is ``TaxiRide``
(reference: datatypes/TaxiRide.scala:36-42); its Spark mapping (SURVEY §1.2)
is declared here, alongside the driver-generated star-schema/event tables
(TESTDATA.md) the engine's general operator surface runs on.

GeoPoint (reference: datatypes/TaxiRide.scala:99) is flattened to two
DoubleType columns ``lon``/``lat`` — flatter plans, parquet-friendly, and
min/max row-group pruning works on each coordinate independently.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Reference: datatypes/TaxiRide.scala:36-42 — rideId, time, isStart,
# location(lon,lat), passengerCnt, travelDist (-1.0 on START events,
# semantics at TaxiRide.scala:34).
TAXI_RIDE_SCHEMA = T.StructType(
    [
        T.StructField("ride_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("is_start", T.BooleanType(), False),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("passenger_cnt", T.ShortType(), True),
        T.StructField("travel_dist", T.FloatType(), True),
    ]
)

# CSV wire format of the reference (reference: datatypes/TaxiRide.scala:68-90):
# rideId,time,(START|END),lon,lat,passengerCnt,travelDist
TAXI_RIDE_CSV_SCHEMA = T.StructType(
    [
        T.StructField("ride_id", T.LongType(), False),
        T.StructField("time_str", T.StringType(), False),
        T.StructField("start_end", T.StringType(), False),
        T.StructField("lon", T.DoubleType(), True),
        T.StructField("lat", T.DoubleType(), True),
        T.StructField("passenger_cnt", T.ShortType(), True),
        T.StructField("travel_dist", T.FloatType(), True),
    ]
)

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)

STAR_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Testdata parquet stores timestamps as INT64 TIMESTAMP(NANOS). Depending on
# the Spark build this arrives as LongType nanos (legacy
# spark.sql.legacy.parquet.nanosAsLong honored) or as TIMESTAMP_NTZ truncated
# to microseconds (current behavior); both are normalized here to plain
# TimestampType (session-TZ, UTC) at microsecond precision — matching
# DuckDB's TIMESTAMP_NS -> TIMESTAMP truncation (SURVEY §7.4) and the
# cast(ts AS BIGINT) / unix_micros(ts) expressions used across the query
# surface, which reject TIMESTAMP_NTZ.
NANO_TS_COLS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


# Metadata-only cache (r15 optimization round): the DISCOVERED parquet
# schema per (sf_dir, table). Rediscovering the schema on every
# load_table call re-lists the path and re-reads parquet footers inside
# the JVM (~0.15-0.3 s per call on the bench box; TPC-H queries call
# load_table up to 6x per build, all inside the driver's timed region) —
# at cluster scale the same repeated listing cost is guide §6's
# "file listing" tax. The cache holds ONLY the StructType (metadata, no
# rows, no results): every query execution still scans the parquet
# inputs from disk, so bench/oracle runs remain full computations.
_SCHEMA_CACHE: dict = {}


def load_table(spark, sf_dir: str, name: str):
    """Read one driver-generated parquet table (TESTDATA.md), converting
    nano-precision timestamp columns to TimestampType (microseconds).

    The raw (pre-conversion) schema is discovered once per
    (sf_dir, table) per process and cached — see _SCHEMA_CACHE. The
    nano-vs-NTZ decision is re-derived from the cached schema, so the
    returned frame is identical to an uncached read."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    path = f"{sf_dir}/{name}.parquet"
    key = (sf_dir, name)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        schema = spark.read.parquet(path).schema
        _SCHEMA_CACHE[key] = schema
    df = spark.read.schema(schema).parquet(path)
    dtypes = {f.name: f.dataType.simpleString() for f in schema.fields}
    for c in NANO_TS_COLS.get(name, ()):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
        elif dtypes.get(c) == "timestamp_ntz":
            # NTZ -> LTZ reinterprets the naive value in the session TZ
            # (pinned UTC above): same wall-clock instant, micro precision
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df
