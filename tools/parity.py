"""Local replica of the driver's DuckDB-oracle correctness check.

Runs each ``queries()[name]`` on Spark and the matching ``oracle_sql()[name]``
on DuckDB over the same parquet tables, then compares row count, column
names, per-column pandas dtype CLASS (int/float/bool/timestamp/object —
the driver's value hash is dtype-sensitive, so ``SUM(int)`` returning
HUGEINT->float64 on the DuckDB side while Spark returns bigint is a FAIL
here even though 6930 == 6930.0), and order-insensitive values (exact
equality; floats must match bit-for-bit, which our oracle twins are
written to achieve).

History: round 7 shipped three driver-red queries whose values matched
bit-for-bit — ``==`` hid the int-vs-float dtype clash that the driver's
hash sees. The ``_dtype_class`` check exists so that defect class can
never again pass locally.

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


def _dtype_class(s: pd.Series) -> str:
    """Collapse a pandas dtype to the class the driver's hash distinguishes."""
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "timestamp"
    return "object"


def dtype_problems(sp: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    """Strict per-column dtype-class comparison (shared with the pytest)."""
    problems: list[str] = []
    for c in sorted(sp.columns):
        if c not in oracle.columns:
            continue
        a, b = _dtype_class(sp[c]), _dtype_class(oracle[c])
        if a != b:
            problems.append(
                f"dtype class differs for col {c}: spark={a} ({sp[c].dtype}) "
                f"oracle={b} ({oracle[c].dtype}) — driver hash WILL mismatch"
            )
    return problems


def _values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        if a == 0.0 and b == 0.0:
            # -0.0 == 0.0 under ==, but a byte-level value hash (the
            # driver's) distinguishes them — be signbit-strict here too
            return math.copysign(1.0, a) == math.copysign(1.0, b)
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
    problems.extend(dtype_problems(sp, oracle_df))
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


def _update_ledger(results: dict[str, list[str]], sf_dir: str) -> None:
    """Record every [OK] row in parity_ledger.json keyed by the current
    executable-content fingerprint of the query's import closure — the
    evidence `tools/coverage.py --assert-reproven` checks mechanically
    (r13 verdict #3). An [OK] after code churn resets the entry's SF
    list; a FAIL drops the entry (stale proof must not linger)."""
    import json

    from flink_streaming_demo_spark.plans.registry import QUERIES
    from tools import coverage as cov

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ledger = cov.load_ledger(repo)
    sf = os.path.basename(sf_dir.rstrip("/"))
    closure_memo: dict[str, set[str]] = {}
    fp_memo: dict[str, str | None] = {}
    for name, problems in results.items():
        if name not in QUERIES:
            continue
        if problems:
            ledger.pop(name, None)
            continue
        fp = cov.closure_exec_fp(
            repo, QUERIES[name].__module__, closure_memo, fp_memo
        )
        entry = ledger.get(name)
        if entry is None or entry.get("closure_fp") != fp:
            entry = {"closure_fp": fp, "sfs": []}
        if sf not in entry["sfs"]:
            entry["sfs"] = sorted(entry["sfs"] + [sf])
        ledger[name] = entry
    with open(os.path.join(repo, cov.LEDGER_PATH), "w") as f:
        json.dump(ledger, f, indent=1, sort_keys=True)
        f.write("\n")


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
    _update_ledger(results, sf_dir)
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
