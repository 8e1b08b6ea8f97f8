"""Pure Column-expression scalar function libraries (no Python UDFs).

Everything here compiles to Catalyst expressions so constant folding,
predicate pushdown and whole-stage codegen apply (SURVEY §4.2 design rule 1-2).
"""

from flink_streaming_demo_spark.functions.geo import (  # noqa: F401
    CELL_CNT_X,
    CELL_CNT_Y,
    DELTA_LAT,
    DELTA_LON,
    LAT_NORTH,
    LAT_SOUTH,
    LON_EAST,
    LON_WEST,
    cell_center_lat,
    cell_center_lon,
    grid_cell,
    is_in_nyc,
)
