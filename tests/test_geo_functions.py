"""Unit tests for the geo Column-expression library (SURVEY §2.6 U1-U3).

Pin the grid arithmetic of the reference (utils/NycGeoUtils.scala:26-86):
cell ids, center roundtrips, bbox membership.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_streaming_demo_spark.functions import geo


def _one(spark, lon, lat):
    df = spark.createDataFrame([(lon, lat)], "lon double, lat double")
    return df.select(
        geo.grid_cell(F.col("lon"), F.col("lat")).alias("cell"),
        geo.is_in_nyc(F.col("lon"), F.col("lat")).alias("in_nyc"),
    ).first()


def _py_cell(lon: float, lat: float) -> int:
    x = math.floor((abs(geo.LON_WEST) - abs(lon)) / geo.DELTA_LON)
    y = math.floor((geo.LAT_NORTH - lat) / geo.DELTA_LAT)
    return int(x + y * geo.CELL_CNT_X)


def test_grid_cell_nw_corner(spark):
    # NW corner of the grid (LON_WEST, LAT_NORTH) is cell 0.
    row = _one(spark, geo.LON_WEST, geo.LAT_NORTH)
    assert row.cell == 0
    assert row.in_nyc


def test_grid_cell_matches_python_reference(spark):
    pts = [(-74.0, 40.7), (-73.9, 40.75), (-73.75, 40.55), (-74.049, 40.999)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    rows = df.select(
        "lon", "lat", geo.grid_cell(F.col("lon"), F.col("lat")).alias("cell")
    ).collect()
    for r in rows:
        assert r.cell == _py_cell(r.lon, r.lat), (r.lon, r.lat)


def test_bbox_filter_excludes_outside(spark):
    assert not _one(spark, -73.5, 40.7).in_nyc  # east of bbox
    assert not _one(spark, -74.2, 40.7).in_nyc  # west
    assert not _one(spark, -73.9, 41.2).in_nyc  # north
    assert not _one(spark, -73.9, 40.3).in_nyc  # south
    assert _one(spark, -73.9, 40.7).in_nyc


def test_cell_center_roundtrip(spark):
    # center of any in-bbox point's cell maps back to the same cell
    pts = [(-74.0, 40.7), (-73.8123, 40.8456), (-73.701, 40.501)]
    df = spark.createDataFrame(pts, "lon double, lat double")
    out = df.select(
        geo.grid_cell(F.col("lon"), F.col("lat")).alias("cell")
    ).select(
        "cell",
        geo.cell_center_lon(F.col("cell")).alias("clon"),
        geo.cell_center_lat(F.col("cell")).alias("clat"),
    ).select(
        "cell",
        "clon",
        "clat",
        geo.grid_cell(F.col("clon"), F.col("clat")).alias("cell2"),
    ).collect()
    for r in out:
        assert r.cell == r.cell2
        # center is inside the bbox-extended grid
        assert geo.LON_WEST <= r.clon <= geo.LON_EAST + geo.DELTA_LON
        assert geo.LAT_SOUTH - geo.DELTA_LAT <= r.clat <= geo.LAT_NORTH
