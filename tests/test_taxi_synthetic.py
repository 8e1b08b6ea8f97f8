"""Drift guard for the synthetic taxi view: the ride derivation exists
twice by design (Python expressions in sources/taxi.synthetic_taxi_rides,
a SQL string in synthetic_taxi_sql for the DuckDB oracle). A one-sided
edit would break oracle parity confusingly — both-sides-wrong is
impossible, but this test makes a one-sided drift fail HERE with a
cell-level diff instead of as an opaque hash mismatch in the driver."""

from __future__ import annotations

import duckdb
import pandas as pd

from flink_streaming_demo_spark.sources import taxi


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None).astype(
                "datetime64[us]"
            )
    return df.sort_values(by="ride_id", ignore_index=True)


def test_synthetic_taxi_python_and_sql_derivations_agree(spark, sf_dir):
    sdf = _canon(taxi.synthetic_taxi_rides(spark, sf_dir).toPandas())
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    odf = _canon(con.execute(taxi.synthetic_taxi_sql()).fetchdf())
    assert list(sdf.columns) == list(odf.columns)
    assert len(sdf) == len(odf) > 0
    # exact equality, doubles bit-for-bit: both sides are the same IEEE
    # integer-modulo + double arithmetic by contract
    pd.testing.assert_frame_equal(sdf, odf, check_dtype=False)


def test_zorder_roundtrip_and_locality(spark, sf_dir):
    """z_value de-interleaves back to (x, y) exactly, and neighboring
    cells in x/y differ in z by small bounded amounts at low bits."""
    from flink_streaming_demo_spark.plans.taxi_queries import (
        layout_zorder_cells,
    )

    rows = layout_zorder_cells(spark, sf_dir).collect()
    assert rows
    for r in rows:
        x = y = 0
        for b in range(9):
            x |= ((r.z_value >> (2 * b)) & 1) << b
            y |= ((r.z_value >> (2 * b + 1)) & 1) << b
        assert (x, y) == (r.x_idx, r.y_idx), r
        assert r.cell == r.x_idx + 250 * r.y_idx


def _xy2d_ref(n_side: int, x: int, y: int) -> int:
    """Independent reference: the classic Wikipedia xy2d bit walk."""
    d = 0
    s = n_side // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_bijection_adjacency_and_reference(spark):
    """On the full 32x32 grid (bits=5): h_value is a bijection onto
    0..1023, consecutive h_values are ALWAYS Manhattan-distance-1
    neighbors (the locality property z-order lacks at seams), and every
    value matches the independent Wikipedia xy2d reference."""
    from flink_streaming_demo_spark.plans.taxi_queries import hilbert_index

    side = 32
    grid = spark.createDataFrame(
        [(x + side * y, x, y) for x in range(side) for y in range(side)],
        "cell int, x_idx int, y_idx int",
    )
    rows = hilbert_index(grid, bits=5).collect()
    assert len(rows) == side * side
    by_h = {}
    for r in rows:
        assert r.h_value == _xy2d_ref(side, r.x_idx, r.y_idx), r
        by_h[r.h_value] = (r.x_idx, r.y_idx)
    assert sorted(by_h) == list(range(side * side))
    for h in range(side * side - 1):
        (x0, y0), (x1, y1) = by_h[h], by_h[h + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, (h, by_h[h], by_h[h + 1])


def test_hilbert_query_matches_reference_on_sf(spark, sf_dir):
    """The registered query's 512x512 (bits=9) index agrees with the
    independent reference on every observed cell."""
    from flink_streaming_demo_spark.plans.taxi_queries import (
        layout_hilbert_cells,
    )

    rows = layout_hilbert_cells(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.h_value == _xy2d_ref(512, r.x_idx, r.y_idx), r
        assert r.cell == r.x_idx + 250 * r.y_idx


def test_layout_skipping_stats_invariants(spark, sf_dir):
    """Zone-map simulation bookkeeping: every layout packs the SAME cell
    universe (file cell-counts sum to the universe), the matching-cell
    count is layout-invariant (the answer doesn't depend on file order),
    no layout reads fewer cells than actually match (zone maps never
    false-negative), and read_frac is consistent with the file counts."""
    from flink_streaming_demo_spark.plans.taxi_queries import (
        FILE_CELLS,
        layout_skipping_stats,
    )

    rows = {
        r["layout"]: r
        for r in layout_skipping_stats(spark, sf_dir).collect()
    }
    assert set(rows) == {"rowmajor", "zorder", "hilbert"}
    matching = {r["cells_matching"] for r in rows.values()}
    assert len(matching) == 1, "matching cells must be layout-invariant"
    for r in rows.values():
        assert r["cells_read"] >= r["cells_matching"]
        assert r["files_read"] <= r["n_files"]
        assert r["cells_read"] <= r["files_read"] * FILE_CELLS
        assert abs(
            r["read_frac"] - r["files_read"] / r["n_files"]
        ) < 1e-6


def test_zorder_index_helper_matches_query_expression(spark, sf_dir):
    """zorder_index (the composable helper) and layout_zorder_cells (the
    inlined expression) must produce identical z-values per cell."""
    from pyspark.sql import functions as F

    from flink_streaming_demo_spark.plans.taxi_queries import (
        layout_zorder_cells,
        zorder_index,
    )

    q = layout_zorder_cells(spark, sf_dir)
    h = zorder_index(q.select("cell", "x_idx", "y_idx")).withColumnRenamed(
        "z_value", "z_helper"
    )
    diff = (
        q.join(h, ["cell", "x_idx", "y_idx"])
        .filter(F.col("z_value") != F.col("z_helper"))
        .count()
    )
    assert diff == 0
