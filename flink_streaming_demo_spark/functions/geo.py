"""NYC geo scalar functions as pure Column expressions.

Spark re-expression of the reference's geo utilities
(reference: utils/NycGeoUtils.scala:26-86). All four functions compile to
Catalyst expressions — no UDFs — so they fold into whole-stage codegen and
the bbox predicate pushes down to the parquet scan (SURVEY §2.6, §4.2).

Constants (reference: utils/NycGeoUtils.scala:26-38)::

    LON_EAST=-73.7  LON_WEST=-74.05  LAT_NORTH=41.0  LAT_SOUTH=40.5
    DELTA_LON=0.0014  DELTA_LAT=0.00125  CELL_CNT_X=250  CELL_CNT_Y=400

Fidelity notes (SURVEY §7.4):

* ``is_in_nyc`` implements the *intended* bounding-box semantics. The
  reference's implementation is buggy — both ``if`` statements discard their
  results and the method always returns ``true``
  (reference: utils/NycGeoUtils.scala:48-54). We implement the documented
  intent and diverge from the broken identity filter on purpose.
* ``cell_center_*`` keeps double precision instead of reproducing the
  reference's lossy ``.toFloat`` casts (reference: utils/NycGeoUtils.scala:80,83)
  so results match an ANSI-SQL oracle computing in double.
* ``grid_cell`` reproduces the reference exactly, including the
  western-hemisphere ``abs(lon)`` trick (reference: utils/NycGeoUtils.scala:66).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

LON_EAST = -73.7
LON_WEST = -74.05
LAT_NORTH = 41.0
LAT_SOUTH = 40.5
DELTA_LON = 0.0014
DELTA_LAT = 0.00125
CELL_CNT_X = 250
CELL_CNT_Y = 400


def is_in_nyc(lon: Column, lat: Column) -> Column:
    """Bounding-box membership (intended semantics of
    reference: utils/NycGeoUtils.scala:48-54; see module fidelity notes)."""
    return (
        (lon <= F.lit(LON_EAST))
        & (lon >= F.lit(LON_WEST))
        & (lat <= F.lit(LAT_NORTH))
        & (lat >= F.lit(LAT_SOUTH))
    )


def grid_cell(lon: Column, lat: Column) -> Column:
    """Map lon/lat to an Int cell id on the 250x400 grid, row-major from the
    NW corner (reference: utils/NycGeoUtils.scala:65-69)::

        xIndex = floor((abs(LON_WEST) - abs(lon)) / DELTA_LON)
        yIndex = floor((LAT_NORTH - lat) / DELTA_LAT)
        id     = xIndex + yIndex * CELL_CNT_X
    """
    x_index = F.floor((F.lit(abs(LON_WEST)) - F.abs(lon)) / F.lit(DELTA_LON))
    y_index = F.floor((F.lit(LAT_NORTH) - lat) / F.lit(DELTA_LAT))
    return (x_index + y_index * F.lit(CELL_CNT_X)).cast("int")


def cell_center_lon(cell: Column) -> Column:
    """Cell id -> center longitude (reference: utils/NycGeoUtils.scala:78-82),
    kept in double precision (see module fidelity notes)."""
    x_index = cell % F.lit(CELL_CNT_X)
    return -(
        F.lit(abs(LON_WEST))
        - x_index.cast("double") * F.lit(DELTA_LON)
        - F.lit(DELTA_LON / 2.0)
    )


def cell_center_lat(cell: Column) -> Column:
    """Cell id -> center latitude (reference: utils/NycGeoUtils.scala:83-85)."""
    x_index = cell % F.lit(CELL_CNT_X)
    y_index = (cell - x_index) / F.lit(CELL_CNT_X)
    return (
        F.lit(LAT_NORTH)
        - y_index.cast("double") * F.lit(DELTA_LAT)
        - F.lit(DELTA_LAT / 2.0)
    )


# ANSI-SQL twins of the expressions above, used to build DuckDB oracle
# queries that replicate the arithmetic operation-for-operation so
# order-insensitive value hashes match bit-for-bit.

def sql_grid_cell(lon: str, lat: str) -> str:
    return (
        f"CAST(FLOOR((74.05 - ABS({lon})) / 0.0014) "
        f"+ FLOOR((41.0 - {lat}) / 0.00125) * 250 AS INT)"
    )


def sql_is_in_nyc(lon: str, lat: str) -> str:
    return (
        f"({lon} <= -73.7 AND {lon} >= -74.05 "
        f"AND {lat} <= 41.0 AND {lat} >= 40.5)"
    )


def sql_cell_center_lon(cell: str) -> str:
    return f"-(74.05 - CAST({cell} % 250 AS DOUBLE) * 0.0014 - 0.0007)"


def sql_cell_center_lat(cell: str) -> str:
    return (
        f"(41.0 - CAST(({cell} - ({cell} % 250)) / 250 AS DOUBLE) * 0.00125 "
        f"- 0.000625)"
    )
