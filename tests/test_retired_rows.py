"""Absorption pins for registry rows retired for rotation slack
(r14 verdict #2, landed r15): a retirement may drop a row from the
driver surface only if its assertion survives verbatim somewhere the
suite runs every round. doc_simhash and doc_winnow_fingerprints keep
their full DuckDB parity here (same compare as tools/parity.py);
events_hll_rollup_users keeps its defining identity (rolled-up day
partials == the driver-checked direct sketch)."""

from __future__ import annotations

import duckdb


def _duck(sf_dir: str):
    con = duckdb.connect()
    for t in ("documents", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _assert_parity(spark_df, con, sql: str) -> None:
    from tools.parity import compare

    problems = compare("retired", spark_df, con.execute(sql).fetchdf())
    assert not problems, problems


def test_doc_simhash_parity(spark, sf_dir):
    """The retired doc_simhash row's driver check, verbatim: the
    full-documents (doc_id, simhash, n_tokens) projection must
    hash-match its DuckDB oracle."""
    from flink_streaming_demo_spark.plans.text_queries import (
        DOC_SIMHASH_ORACLE,
        doc_simhash,
    )

    _assert_parity(
        doc_simhash(spark, sf_dir), _duck(sf_dir), DOC_SIMHASH_ORACLE
    )


def test_doc_winnow_fingerprints_parity(spark, sf_dir):
    """The retired doc_winnow_fingerprints row's driver check, verbatim:
    the planted-corpus winnow stats projection (n_grams, n_fingerprints,
    winnow_digest) must hash-match its DuckDB oracle."""
    from flink_streaming_demo_spark.plans.text_queries import (
        DOC_WINNOW_FP_ORACLE,
        doc_winnow_fingerprints,
    )

    _assert_parity(
        doc_winnow_fingerprints(spark, sf_dir),
        _duck(sf_dir),
        DOC_WINNOW_FP_ORACLE,
    )


def test_hll_rollup_equals_direct_sketch(spark, sf_dir):
    """The retired events_hll_rollup_users row's defining identity: HLL
    register partials built per (event_type, day) and rolled up by
    per-bucket MAX must estimate EXACTLY what the driver-checked direct
    per-type sketch (events_hll_distinct_users) estimates — the merge
    arithmetic the retired oracle proved, now chained through the
    registered row's green."""
    from flink_streaming_demo_spark.plans.event_queries import (
        events_hll_distinct_users,
        events_hll_rollup_users,
    )

    rolled = events_hll_rollup_users(spark, sf_dir)
    direct = events_hll_distinct_users(spark, sf_dir)
    assert rolled.exceptAll(direct).count() == 0
    assert direct.exceptAll(rolled).count() == 0
