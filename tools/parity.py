"""Local replica of the driver's DuckDB-oracle correctness check.

Runs each ``queries()[name]`` on Spark and the matching ``oracle_sql()[name]``
on DuckDB over the same parquet tables, then compares row count, column
names, and order-insensitive values (exact equality; floats must match
bit-for-bit, which our oracle twins are written to achieve).

CLI: ``python tools/parity.py [sf_dir] [query ...]``
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b


def compare(name: str, spark_df, oracle_df: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    sp = spark_df.toPandas()
    if sorted(sp.columns) != sorted(oracle_df.columns):
        problems.append(
            f"columns differ: spark={sorted(sp.columns)} oracle={sorted(oracle_df.columns)}"
        )
        return problems
    if len(sp) != len(oracle_df):
        problems.append(f"row count differ: spark={len(sp)} oracle={len(oracle_df)}")
    a, b = _canon(sp), _canon(oracle_df)
    n = min(len(a), len(b))
    mismatches = 0
    for i in range(n):
        for c in a.columns:
            if not _values_equal(a.at[i, c], b.at[i, c]):
                if mismatches < 5:
                    problems.append(
                        f"row {i} col {c}: spark={a.at[i, c]!r} oracle={b.at[i, c]!r}"
                    )
                mismatches += 1
    if mismatches:
        problems.append(f"total cell mismatches: {mismatches}")
    return problems


def run(sf_dir: str, only: list[str] | None = None) -> dict[str, list[str]]:
    import __spark_entry__ as entry_mod
    from flink_streaming_demo_spark.session import get_spark

    spark = get_spark("parity-check", shuffle_partitions=8)
    con = duck_connect(sf_dir)
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    results: dict[str, list[str]] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                odf = con.execute(oracles[name]).fetchdf()
                results[name] = compare(name, sdf, odf)
            else:
                cnt = sdf.count()
                results[name] = [] if cnt >= 0 else ["count failed"]
        except Exception as e:  # noqa: BLE001
            results[name] = [f"EXCEPTION: {type(e).__name__}: {e}"]
    return results


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    results = run(sf_dir, only)
    if only:
        for name in only:
            if name not in results:
                print(f"[FAIL] {name}\n    unknown query name")
                results[name] = ["unknown query name"]
    bad = 0
    for name, problems in sorted(results.items()):
        status = "OK" if not problems else "FAIL"
        if problems:
            bad += 1
        print(f"[{status}] {name}")
        for p in problems:
            print(f"    {p}")
    print(f"{len(results) - bad}/{len(results)} queries match")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
