"""Registered queries for the taxi-demo surface (SURVEY §2.1-§2.6).

Each query has a DuckDB oracle twin computing the identical arithmetic, so
the driver's order-insensitive value-hash matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_streaming_demo_spark.functions import geo
from flink_streaming_demo_spark.plans import taxi_apps
from flink_streaming_demo_spark.plans.registry import register
from flink_streaming_demo_spark.sources.taxi import (
    synthetic_taxi_rides,
    synthetic_taxi_sql,
)

_RIDES_SQL = synthetic_taxi_sql("events")


# --- F1 + F2 + P1: stateless filter/project stage ---------------------------

def taxi_end_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter END events (F1), NYC bbox (F2), project to cell/ts/cnt (P1)."""
    return taxi_apps.arrival_events(synthetic_taxi_rides(spark, sf_dir))


register(
    "taxi_end_events",
    taxi_end_events,
    f"""
    WITH rides AS ({_RIDES_SQL})
    SELECT
        {geo.sql_grid_cell('lon', 'lat')} AS cell,
        ts,
        passenger_cnt
    FROM rides
    WHERE NOT is_start AND {geo.sql_is_in_nyc('lon', 'lat')}
    """,
)


# --- U2 + U3: grid-cell mapping and its inverse ------------------------------

def taxi_cell_centers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct grid cells with their center coordinates (U2 -> U3 roundtrip;
    reference: utils/NycGeoUtils.scala:65-86)."""
    rides = synthetic_taxi_rides(spark, sf_dir)
    cells = (
        rides.filter(geo.is_in_nyc(F.col("lon"), F.col("lat")))
        .select(geo.grid_cell(F.col("lon"), F.col("lat")).alias("cell"))
        .distinct()
    )
    return cells.select(
        F.col("cell"),
        geo.cell_center_lon(F.col("cell")).alias("center_lon"),
        geo.cell_center_lat(F.col("cell")).alias("center_lat"),
    )


register(
    "taxi_cell_centers",
    taxi_cell_centers,
    f"""
    WITH rides AS ({_RIDES_SQL}),
    cells AS (
        SELECT DISTINCT {geo.sql_grid_cell('lon', 'lat')} AS cell
        FROM rides
        WHERE {geo.sql_is_in_nyc('lon', 'lat')}
    )
    SELECT
        cell,
        {geo.sql_cell_center_lon('cell')} AS center_lon,
        {geo.sql_cell_center_lat('cell')} AS center_lat
    FROM cells
    """,
)


# --- App 1: total arrival count (A1 + A2 + P2) -------------------------------

def taxi_total_arrival_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return taxi_apps.total_arrival_count(synthetic_taxi_rides(spark, sf_dir))


register(
    "taxi_total_arrival_count",
    taxi_total_arrival_count,
    taxi_apps.total_arrival_count_sql(_RIDES_SQL),
)


# --- App 2: sliding-window arrival count (W1 + W2) ---------------------------

def taxi_sliding_arrival_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return taxi_apps.sliding_arrival_count(synthetic_taxi_rides(spark, sf_dir))


register(
    "taxi_sliding_arrival_count",
    taxi_sliding_arrival_count,
    taxi_apps.sliding_arrival_count_sql(_RIDES_SQL),
)


# --- App 3: early-firing windowed count (W3) --------------------------------

def taxi_early_arrival_fires(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full emission sequence of the count-driven early trigger (partials +
    finals). The fire points are sequential (each fire re-bases the next
    threshold, reference: EarlyArrivalCount.scala:131-141), but over the
    pane's cumulative sum they are the iterated jump s_{k+1} = min{cum >=
    s_k + T}: a recursive-CTE oracle replays the exact sequence — fire k's
    emitted total IS s_k (overshoot discarded by the reset-to-zero), and
    the final row carries the pane total with fire_seq = #partials. The
    emission sequence is additionally pinned by tests/test_early_fire.py.

    This row also carries the retired taxi_early_arrival_final's
    assertion (r13 verdict #2 — the finals were the is_final slice of
    this same frame, so one oracle checks both): the fire_rows CTE
    emits every pane's final row with the full pane total, and the
    independent finals == plain-sliding-window identity stays pinned by
    the chain tests/test_early_fire.py::test_final_matches_plain_window_sum
    (fires.is_final == sliding_arrival_count, Spark-side) plus the
    driver-checked taxi_sliding_arrival_count oracle (sliding == plain
    GROUP BY SQL, DuckDB-side)."""
    from flink_streaming_demo_spark.operators.early_fire import (
        early_fire_counts,
    )

    arrivals = taxi_apps.arrival_events(synthetic_taxi_rides(spark, sf_dir))
    return early_fire_counts(arrivals)


def _early_fires_oracle() -> str:
    from flink_streaming_demo_spark.operators.early_fire import sql_fire_jump

    return f"""
    WITH RECURSIVE rides AS ({_RIDES_SQL}),
    arrivals AS (
        SELECT {geo.sql_grid_cell('lon', 'lat')} AS cell, ts, passenger_cnt
        FROM rides
        WHERE NOT is_start AND {geo.sql_is_in_nyc('lon', 'lat')}
    ),
    expanded AS (
        SELECT cell, passenger_cnt, ts,
               time_bucket(INTERVAL '5 minutes', ts)
                   - g.k * INTERVAL '5 minutes' AS w_start
        FROM arrivals, generate_series(0, 2) AS g(k)
    ),
    {sql_fire_jump('expanded')}
    SELECT cell, w_start + INTERVAL '15 minutes' AS window_end,
           cnt, is_final, fire_seq
    FROM fire_rows
    """


register(
    "taxi_early_arrival_fires", taxi_early_arrival_fires, _early_fires_oracle()
)


# taxi_early_arrival_final retired in r14 (r13 verdict #2, rotation
# budget): its frame was the is_final slice of taxi_early_arrival_fires,
# and its oracle's content is absorbed — the fires oracle checks the
# final rows (full pane total, is_final = TRUE), and the independent
# finals == plain-sliding-window identity is pinned by
# tests/test_early_fire.py::test_final_matches_plain_window_sum chained
# with the driver-checked taxi_sliding_arrival_count oracle.


# --- S4: trip -> two-event ETL ----------------------------------------------

def taxi_trip_etl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trip -> START/END event ETL (S4; reference:
    src/main/scripts/convertTrips.sh:24-35) over a synthetic trips view:
    each event row is a trip starting at ``ts`` lasting ``int(value)``
    minutes. Two projections + union; the global sort of convertTrips.sh:35
    is dropped here because the driver's compare is order-insensitive and a
    100 TB pipeline would only range-sort at the final write."""
    from flink_streaming_demo_spark.schemas import load_table

    events = load_table(spark, sf_dir, "events")
    trips = events.select(
        F.col("event_id").alias("trip_id"),
        F.col("ts").alias("start_ts"),
        (
            F.col("ts")
            + F.make_dt_interval(mins=F.floor(F.col("value")).cast("int"))
        ).alias("end_ts"),
        (
            F.lit(-74.1)
            + ((F.col("event_id") * 7919) % 1000).cast("double") * F.lit(0.0005)
        ).alias("start_lon"),
        (
            F.lit(40.4)
            + ((F.col("event_id") * 104729) % 1000).cast("double") * F.lit(0.0007)
        ).alias("start_lat"),
        (
            F.lit(-74.1)
            + ((F.col("event_id") * 104729) % 1000).cast("double") * F.lit(0.0005)
        ).alias("end_lon"),
        (
            F.lit(40.4)
            + ((F.col("event_id") * 7919) % 1000).cast("double") * F.lit(0.0007)
        ).alias("end_lat"),
        (F.lit(1) + (F.col("event_id") % 4)).cast("int").alias("passenger_cnt"),
        F.col("value").cast("float").alias("travel_dist"),
    )
    # ONE scan (r15): the two-projection unionAll read the events table
    # twice; each trip row now explodes into its START and END event in
    # a single pass — identical row multiset, half the input I/O.
    return trips.select(
        F.explode(
            F.expr(
                "array("
                " named_struct("
                "  'ride_id', trip_id, 'ts', start_ts,"
                "  'is_start', true, 'lon', start_lon, 'lat', start_lat,"
                "  'passenger_cnt', passenger_cnt,"
                "  'travel_dist', CAST(-1.0 AS FLOAT)),"
                " named_struct("
                "  'ride_id', trip_id, 'ts', end_ts,"
                "  'is_start', false, 'lon', end_lon, 'lat', end_lat,"
                "  'passenger_cnt', passenger_cnt,"
                "  'travel_dist', travel_dist))"
            )
        ).alias("e")
    ).select("e.*")


register(
    "taxi_trip_etl",
    taxi_trip_etl,
    """
    WITH trips AS (
        SELECT
            event_id AS trip_id,
            CAST(ts AS TIMESTAMP) AS start_ts,
            CAST(ts AS TIMESTAMP)
                + INTERVAL 1 MINUTE * CAST(FLOOR(value) AS INT) AS end_ts,
            (-74.1 + CAST((event_id * 7919) % 1000 AS DOUBLE) * 0.0005)
                AS start_lon,
            (40.4 + CAST((event_id * 104729) % 1000 AS DOUBLE) * 0.0007)
                AS start_lat,
            (-74.1 + CAST((event_id * 104729) % 1000 AS DOUBLE) * 0.0005)
                AS end_lon,
            (40.4 + CAST((event_id * 7919) % 1000 AS DOUBLE) * 0.0007)
                AS end_lat,
            CAST(1 + (event_id % 4) AS INT) AS passenger_cnt,
            CAST(value AS FLOAT) AS travel_dist
        FROM events
    )
    SELECT trip_id AS ride_id, start_ts AS ts, TRUE AS is_start,
           start_lon AS lon, start_lat AS lat, passenger_cnt,
           CAST(-1.0 AS FLOAT) AS travel_dist
    FROM trips
    UNION ALL
    SELECT trip_id AS ride_id, end_ts AS ts, FALSE AS is_start,
           end_lon AS lon, end_lat AS lat, passenger_cnt, travel_dist
    FROM trips
    """,
)


# --- Start/end interval join (ride durations) --------------------------------

def taxi_ride_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair each ride's START and END events and aggregate trip duration per
    start cell — the start/end interval join SURVEY §2.10 notes the
    reference's two-event-per-ride design invites but never performs.

    Scale: equi-join on the pair key (one shuffle, uniform keys), then a
    small per-cell aggregate. Event pairing key: synthetic rides use
    consecutive event ids (even=START, odd=END), so pair_id = floor(id/2).
    """
    rides = synthetic_taxi_rides(spark, sf_dir)
    starts = rides.filter(F.col("is_start")).select(
        F.floor(F.col("ride_id") / 2).cast("bigint").alias("pair_id"),
        F.col("ts").alias("start_ts"),
        geo.grid_cell(F.col("lon"), F.col("lat")).alias("start_cell"),
    )
    ends = rides.filter(~F.col("is_start")).select(
        F.floor(F.col("ride_id") / 2).cast("bigint").alias("pair_id"),
        F.col("ts").alias("end_ts"),
    )
    paired = starts.join(ends, "pair_id").select(
        "start_cell",
        (
            F.col("end_ts").cast("long") - F.col("start_ts").cast("long")
        ).alias("duration_secs"),
    )
    return paired.groupBy("start_cell").agg(
        F.count(F.lit(1)).alias("n_rides"),
        F.round(F.avg("duration_secs"), 4).alias("avg_duration_secs"),
        F.max("duration_secs").alias("max_duration_secs"),
    )


register(
    "taxi_ride_durations",
    taxi_ride_durations,
    f"""
    WITH rides AS ({_RIDES_SQL}),
    starts AS (
        SELECT
            CAST(FLOOR(ride_id / 2) AS BIGINT) AS pair_id,
            ts AS start_ts,
            {geo.sql_grid_cell('lon', 'lat')} AS start_cell
        FROM rides WHERE is_start
    ),
    ends AS (
        SELECT
            CAST(FLOOR(ride_id / 2) AS BIGINT) AS pair_id,
            ts AS end_ts
        FROM rides WHERE NOT is_start
    )
    SELECT
        start_cell,
        COUNT(*) AS n_rides,
        -- Spark's cast(ts as long) floors each timestamp to whole seconds
        -- BEFORE subtracting; mirror that (epoch() alone keeps fractions).
        ROUND(AVG(CAST(FLOOR(epoch(end_ts)) AS BIGINT)
                  - CAST(FLOOR(epoch(start_ts)) AS BIGINT)), 4)
            AS avg_duration_secs,
        MAX(CAST(FLOOR(epoch(end_ts)) AS BIGINT)
            - CAST(FLOOR(epoch(start_ts)) AS BIGINT))
            AS max_duration_secs
    FROM starts JOIN ends USING (pair_id)
    GROUP BY start_cell
    """,
)


# --- Z-order layout keys for the arrival grid --------------------------------

_Z_BITS = 9  # grid is 250 x 400: x fits in 8 bits, y in 9


def layout_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key for every grid cell observed in the
    arrival stream: de-interleave the row-major cell id back to (x, y)
    and bit-interleave them into an 18-bit z-value. Sorting/partitioning
    cell-keyed output files by z_value keeps spatially adjacent cells in
    the same file, so a lat/lon range predicate prunes to a contiguous
    z-range of files instead of striding the whole row-major keyspace —
    the data-layout lever for the 100 TB geo workload.

    Pure integer bit arithmetic (shift/and/or) on both engines; the
    observed-cell list comes from one distinct over the arrival
    projection."""
    cells = taxi_apps.arrival_events(
        synthetic_taxi_rides(spark, sf_dir)
    ).select("cell").distinct()
    x = F.col("cell") % F.lit(geo.CELL_CNT_X)
    y = (F.col("cell") - x) / F.lit(geo.CELL_CNT_X)
    out = cells.select(
        "cell",
        x.cast("int").alias("x_idx"),
        y.cast("int").alias("y_idx"),
    )
    z = F.lit(0).cast("bigint")
    for b in range(_Z_BITS):
        z = z + (
            F.shiftleft(F.shiftright(F.col("x_idx"), b) % 2, 2 * b)
            + F.shiftleft(F.shiftright(F.col("y_idx"), b) % 2, 2 * b + 1)
        ).cast("bigint")
    return out.withColumn("z_value", z)


def _sql_zorder(xcol: str, ycol: str) -> str:
    terms = []
    for b in range(_Z_BITS):
        terms.append(f"((({xcol} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({ycol} >> {b}) & 1) << {2 * b + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


register(
    "layout_zorder_cells",
    layout_zorder_cells,
    f"""
    WITH rides AS ({_RIDES_SQL}),
    arrivals AS (
        SELECT {geo.sql_grid_cell('lon', 'lat')} AS cell
        FROM rides
        WHERE NOT is_start AND {geo.sql_is_in_nyc('lon', 'lat')}
    ),
    cells AS (SELECT DISTINCT cell FROM arrivals),
    xy AS (
        SELECT cell,
               CAST(cell % {geo.CELL_CNT_X} AS INT) AS x_idx,
               CAST((cell - cell % {geo.CELL_CNT_X}) / {geo.CELL_CNT_X}
                    AS INT) AS y_idx
        FROM cells
    )
    SELECT cell, x_idx, y_idx, {_sql_zorder('x_idx', 'y_idx')} AS z_value
    FROM xy
    """,
)


def hilbert_index(df: DataFrame, bits: int = _Z_BITS) -> DataFrame:
    """Append ``h_value``: the Hilbert-curve index of (x_idx, y_idx) on
    the 2^bits x 2^bits grid — the stronger locality cousin of the
    z-value (consecutive h_values are ALWAYS 4-adjacent cells; z-order
    takes long diagonal jumps at power-of-two seams, so a z-range scan
    over-reads at those seams where an h-range never does; pinned by
    tests). Standard xy2d bit walk (quadrant digit + rotate/reflect),
    unrolled over `bits` rounds of pure integer CASE/AND/XOR arithmetic
    — per-row expressions, no Python, identical tree on both engines."""
    out = df.withColumn("_hx", F.col("x_idx").cast("bigint")) \
        .withColumn("_hy", F.col("y_idx").cast("bigint")) \
        .withColumn("h_value", F.lit(0).cast("bigint"))
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        rx = (F.col("_hx").bitwiseAND(F.lit(s)) != 0).cast("bigint")
        ry = (F.col("_hy").bitwiseAND(F.lit(s)) != 0).cast("bigint")
        flip_x = F.when(rx == 1, F.lit(s - 1) - F.col("_hx")).otherwise(
            F.col("_hx")
        )
        flip_y = F.when(rx == 1, F.lit(s - 1) - F.col("_hy")).otherwise(
            F.col("_hy")
        )
        out = out.select(
            *[c for c in out.columns if c not in ("_hx", "_hy", "h_value")],
            (
                F.col("h_value")
                + F.lit(s * s) * (F.lit(3) * rx).bitwiseXOR(ry)
            ).alias("h_value"),
            # ry == 0: reflect when rx == 1, then swap x/y; else unchanged
            F.when(ry == 0, flip_y).otherwise(F.col("_hx")).alias("_hx"),
            F.when(ry == 0, flip_x).otherwise(F.col("_hy")).alias("_hy"),
        )
    return out.drop("_hx", "_hy")


def _sql_hilbert(bits: int = _Z_BITS) -> str:
    """DuckDB twin of hilbert_index as a chain of CTEs h0..h<bits> over a
    CTE named ``xy`` with columns (cell, x_idx, y_idx)."""
    parts = [
        "h0 AS (SELECT cell, x_idx, y_idx,"
        " CAST(x_idx AS BIGINT) AS hx, CAST(y_idx AS BIGINT) AS hy,"
        " CAST(0 AS BIGINT) AS hd FROM xy)"
    ]
    for i in range(bits):
        s = 1 << (bits - 1 - i)
        rx = f"(CASE WHEN (hx & {s}) != 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) != 0 THEN 1 ELSE 0 END)"
        parts.append(
            f"h{i + 1} AS (SELECT cell, x_idx, y_idx,"
            f" CASE WHEN {ry} = 0 THEN"
            f" (CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END)"
            f" ELSE hx END AS hx,"
            f" CASE WHEN {ry} = 0 THEN"
            f" (CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END)"
            f" ELSE hy END AS hy,"
            f" hd + {s * s} * xor(3 * {rx}, {ry}) AS hd"
            f" FROM h{i})"
        )
    return ",\n    ".join(parts)


def layout_hilbert_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hilbert-curve layout key for every observed grid cell — the
    locality-optimal alternative to layout_zorder_cells for the same
    file-clustering decision: sort/partition cell-keyed files by
    h_value and any lat/lon box prunes to fewer, more-contiguous
    h-ranges than z-ranges (no power-of-two seam jumps). Same observed-
    cell distinct as the z-order query; the index itself is pure
    integer expressions (hilbert_index)."""
    cells = taxi_apps.arrival_events(
        synthetic_taxi_rides(spark, sf_dir)
    ).select("cell").distinct()
    x = F.col("cell") % F.lit(geo.CELL_CNT_X)
    y = (F.col("cell") - x) / F.lit(geo.CELL_CNT_X)
    out = cells.select(
        "cell",
        x.cast("int").alias("x_idx"),
        y.cast("int").alias("y_idx"),
    )
    return hilbert_index(out)


register(
    "layout_hilbert_cells",
    layout_hilbert_cells,
    f"""
    WITH rides AS ({_RIDES_SQL}),
    arrivals AS (
        SELECT {geo.sql_grid_cell('lon', 'lat')} AS cell
        FROM rides
        WHERE NOT is_start AND {geo.sql_is_in_nyc('lon', 'lat')}
    ),
    cells AS (SELECT DISTINCT cell FROM arrivals),
    xy AS (
        SELECT cell,
               CAST(cell % {geo.CELL_CNT_X} AS INT) AS x_idx,
               CAST((cell - cell % {geo.CELL_CNT_X}) / {geo.CELL_CNT_X}
                    AS INT) AS y_idx
        FROM cells
    ),
    {_sql_hilbert()}
    SELECT cell, x_idx, y_idx, hd AS h_value
    FROM h{_Z_BITS}
    """,
)


def zorder_index(df: DataFrame, bits: int = _Z_BITS) -> DataFrame:
    """Append ``z_value``: the Morton interleave of (x_idx, y_idx) —
    the same bit expression layout_zorder_cells inlines, packaged as a
    composable helper for queries that need several layout keys side by
    side."""
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        z = z + (
            F.shiftleft(F.shiftright(F.col("x_idx"), b) % 2, 2 * b)
            + F.shiftleft(F.shiftright(F.col("y_idx"), b) % 2, 2 * b + 1)
        ).cast("bigint")
    return df.withColumn("z_value", z)


# File-skipping simulation: cells per file, and the lat/lon box probe
# (in cell-index space) whose zone-map pruning each layout is scored on.
FILE_CELLS = 16
_BOX_X_LO, _BOX_X_HI = geo.CELL_CNT_X // 4, geo.CELL_CNT_X // 2
_BOX_Y_LO, _BOX_Y_HI = geo.CELL_CNT_Y // 4, geo.CELL_CNT_Y // 2


def layout_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map file-skipping effectiveness of three data layouts for
    the SAME spatial box predicate — the measurement that justifies
    layout_zorder_cells/layout_hilbert_cells at 100 TB. Observed cells
    are packed FILE_CELLS-per-file in each layout's sort order
    (row-major cell id, Morton z, Hilbert h); each simulated file keeps
    min/max zone maps on (x_idx, y_idx); a file is READ iff its zone
    ranges overlap the box (exactly parquet row-group pruning).
    Output per layout: file count, files read, cells scanned vs cells
    actually matching, and the read fraction — locality-preserving
    curves (z, h) should read far fewer files than row-major for the
    same answer.

    Scale: the distinct observed-cell pass is the only full-width scan;
    everything after runs on one row per cell (and then per file). The
    per-layout ROW_NUMBER partitions by layout, so no global single-
    partition window over big data — at 100 TB the cell universe is
    bounded by the grid (100k), not the input."""
    cells = taxi_apps.arrival_events(
        synthetic_taxi_rides(spark, sf_dir)
    ).select("cell").distinct()
    x = F.col("cell") % F.lit(geo.CELL_CNT_X)
    y = (F.col("cell") - x) / F.lit(geo.CELL_CNT_X)
    xy = cells.select(
        "cell",
        x.cast("int").alias("x_idx"),
        y.cast("int").alias("y_idx"),
    )
    keyed = hilbert_index(zorder_index(xy))
    melted = keyed.select(
        "x_idx",
        "y_idx",
        F.explode(
            F.array(
                F.struct(
                    F.lit("rowmajor").alias("layout"),
                    F.col("cell").cast("bigint").alias("k"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.col("z_value").alias("k"),
                ),
                F.struct(
                    F.lit("hilbert").alias("layout"),
                    F.col("h_value").alias("k"),
                ),
            )
        ).alias("lk"),
    ).select("x_idx", "y_idx", "lk.layout", "lk.k")
    rn = F.row_number().over(
        Window.partitionBy("layout").orderBy("k")
    )
    in_box = (
        F.col("x_idx").between(_BOX_X_LO, _BOX_X_HI)
        & F.col("y_idx").between(_BOX_Y_LO, _BOX_Y_HI)
    ).cast("int")
    files = (
        melted.withColumn("rn", rn)
        .withColumn("file_id", F.expr(f"(rn - 1) div {FILE_CELLS}"))
        .groupBy("layout", "file_id")
        .agg(
            F.min("x_idx").alias("min_x"),
            F.max("x_idx").alias("max_x"),
            F.min("y_idx").alias("min_y"),
            F.max("y_idx").alias("max_y"),
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(in_box).alias("n_match"),
        )
    )
    is_read = (
        (F.col("max_x") >= _BOX_X_LO)
        & (F.col("min_x") <= _BOX_X_HI)
        & (F.col("max_y") >= _BOX_Y_LO)
        & (F.col("min_y") <= _BOX_Y_HI)
    )
    return (
        files.withColumn("is_read", is_read)
        .groupBy("layout")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum(F.col("is_read").cast("int"))
            .cast("bigint")
            .alias("files_read"),
            F.sum(
                F.when(F.col("is_read"), F.col("n_cells")).otherwise(0)
            )
            .cast("bigint")
            .alias("cells_read"),
            F.sum("n_match").cast("bigint").alias("cells_matching"),
            F.round(
                F.sum(F.col("is_read").cast("int")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("read_frac"),
        )
    )


register(
    "layout_skipping_stats",
    layout_skipping_stats,
    f"""
    WITH rides AS ({_RIDES_SQL}),
    arrivals AS (
        SELECT {geo.sql_grid_cell('lon', 'lat')} AS cell
        FROM rides
        WHERE NOT is_start AND {geo.sql_is_in_nyc('lon', 'lat')}
    ),
    cells AS (SELECT DISTINCT cell FROM arrivals),
    xy AS (
        SELECT cell,
               CAST(cell % {geo.CELL_CNT_X} AS INT) AS x_idx,
               CAST((cell - cell % {geo.CELL_CNT_X}) / {geo.CELL_CNT_X}
                    AS INT) AS y_idx
        FROM cells
    ),
    {_sql_hilbert()},
    keyed AS (
        SELECT xy.cell, xy.x_idx, xy.y_idx,
               {_sql_zorder('xy.x_idx', 'xy.y_idx')} AS z_value,
               h.hd AS h_value
        FROM xy JOIN h{_Z_BITS} h USING (cell)
    ),
    melted AS (
        SELECT x_idx, y_idx, 'rowmajor' AS layout,
               CAST(cell AS BIGINT) AS k FROM keyed
        UNION ALL
        SELECT x_idx, y_idx, 'zorder', z_value FROM keyed
        UNION ALL
        SELECT x_idx, y_idx, 'hilbert', h_value FROM keyed
    ),
    numbered AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY layout ORDER BY k) AS rn
        FROM melted
    ),
    files AS (
        SELECT layout, (rn - 1) // {FILE_CELLS} AS file_id,
               MIN(x_idx) AS min_x, MAX(x_idx) AS max_x,
               MIN(y_idx) AS min_y, MAX(y_idx) AS max_y,
               COUNT(*) AS n_cells,
               SUM(CASE WHEN x_idx BETWEEN {_BOX_X_LO} AND {_BOX_X_HI}
                         AND y_idx BETWEEN {_BOX_Y_LO} AND {_BOX_Y_HI}
                        THEN 1 ELSE 0 END) AS n_match
        FROM numbered
        GROUP BY layout, (rn - 1) // {FILE_CELLS}
    ),
    flagged AS (
        SELECT *,
               (max_x >= {_BOX_X_LO} AND min_x <= {_BOX_X_HI}
                AND max_y >= {_BOX_Y_LO} AND min_y <= {_BOX_Y_HI})
                   AS is_read
        FROM files
    )
    SELECT layout,
           COUNT(*) AS n_files,
           CAST(SUM(CASE WHEN is_read THEN 1 ELSE 0 END) AS BIGINT)
               AS files_read,
           CAST(SUM(CASE WHEN is_read THEN n_cells ELSE 0 END) AS BIGINT)
               AS cells_read,
           CAST(SUM(n_match) AS BIGINT) AS cells_matching,
           ROUND(CAST(SUM(CASE WHEN is_read THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS read_frac
    FROM flagged
    GROUP BY layout
    """,
)
