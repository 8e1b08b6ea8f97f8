"""Physical-plan structural guards: automated form of the anti-pattern
sweep (no non-broadcast cartesian joins; filters reach the parquet scan).

Plan-only — queries are analyzed and planned, never executed — so the
sweep is cheap. Iterative queries (connected components, k-means) run
driver-side loops during CONSTRUCTION and are exercised elsewhere; the
sweep covers the declarative surface.
"""

from __future__ import annotations

import pytest

from flink_streaming_demo_spark.plans import registry

# Queries whose construction runs jobs (checkpointed iteration loops) or
# that are intentionally broadcast-nested-loop (documented small-side
# cross joins in similarity scoring).
_SKIP_CONSTRUCTION = {"dedup_clusters", "sim_ivf_kmeans",
                      "pipeline_clean_corpus"}


def _plan(spark, name, sf_dir) -> str:
    df = registry.QUERIES[name](spark, sf_dir)
    qe = df._jdf.queryExecution()
    return qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_no_unbroadcast_cartesian_products(spark, sf_dir):
    """CartesianProduct (non-broadcast all-pairs) must never appear in a
    registered query plan; BroadcastNestedLoopJoin is allowed only where
    a small side is broadcast by construction (similarity scoring)."""
    offenders = {}
    for name in registry.QUERIES:
        if name in _SKIP_CONSTRUCTION:
            continue
        plan = _plan(spark, name, sf_dir)
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
    assert not offenders, offenders


def test_filters_reach_parquet_scans(spark, sf_dir):
    """Scan-adjacent predicates must appear in PushedFilters — a scan
    reading everything for a filtered query is the classic silent
    scale-killer."""
    expectations = {
        # l_quantity/l_discount predicates push; (l_shipdate is derived
        # from the nano column post-scan, legitimately not pushable)
        "tpch_q6_revenue_forecast": "PushedFilters: [",
        # doc_id % 50 partition of documents pushes IsNotNull at minimum
        "decon_eval_overlap": "PushedFilters: [",
        # vec_id < N_QUERIES on the query side
        "sim_topk_cosine": "LessThan(vec_id",
    }
    for name, needle in expectations.items():
        plan = _plan(spark, name, sf_dir)
        assert needle in plan, f"{name}: {needle!r} missing from scan"


def test_quality_scan_prunes_columns(spark, sf_dir):
    """text_token_counts projects 2 columns — ReadSchema must not drag
    the full documents row (source/lang/n_chars stay unread)."""
    plan = _plan(spark, "text_token_counts", sf_dir)
    start = plan.index("ReadSchema")
    read_schema = plan[start:plan.index("\n", start)]
    assert "text" in read_schema and "doc_id" in read_schema
    for unread in ("source", "lang", "n_chars"):
        assert unread not in read_schema, (unread, read_schema)
