"""Central query registry: name -> (spark callable, DuckDB oracle SQL).

Every operator claimed as implemented (SURVEY §2) registers here; the driver
runs the Spark callable and the oracle SQL side-by-side at sf0.01 and
hash-compares results. Column names/aliases must match exactly on both sides
(the compare sorts columns by name before hashing).

Registration is decentralized: each plans/operators module calls
``register(name, fn, sql)`` at import time; this module imports them all.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(
    name: str,
    fn: Callable[[SparkSession, str], DataFrame],
    sql: str | None = None,
) -> None:
    """Add a named query. ``sql=None`` -> non-SQL-expressible op; the driver
    records a weaker rows-only check for it."""
    QUERIES[name] = fn
    if sql is not None:
        ORACLE_SQL[name] = sql


def _load_all() -> None:
    # Import for side effect: each module registers its queries.
    from flink_streaming_demo_spark.plans import (  # noqa: F401
        vector_queries,
        tpch_rest,
        tpch_queries,
        tpch_more,
        text_queries,
        taxi_queries,
        event_queries,
        sampling_queries,
    )


# The correctness driver checks the FIRST 50 registered queries per round.
# Policy: everything that CHANGED this round and everything NOT checked
# last round goes inside the window; only queries that are byte-unchanged
# AND were driver-green in at least the two preceding rounds may rotate
# out the back. Round 4 window:
#   * taxi + event queries (unchecked in r3; events_asof_latest_order and
#     the upsert-sink path changed this round),
#   * the dedup queries whose plans changed (stop-shingle rewrite,
#     simhash64 is new, pipeline_clean_corpus composes them) plus
#     dedup_simhash (unchecked in r3),
#   * the three predicate/oracle fixes (q12, q22,
#     star_customers_without_orders),
#   * the six NEW sampling/packing/decon/redaction queries,
#   * then unchanged-but-recent suites (text, tpch_rest, vector, TPC-H
#     classics) as window filler; the list is 56 long, so the last 6
#     filler entries (TPC-H classics) fall past the 50-query window.
# Rotated out: 10 star_* queries + 8 tpch_more queries + 6 TPC-H
# classics — all unchanged and green in BOTH CORRECTNESS_r02 and
# CORRECTNESS_r03. `python tools/coverage.py` prints the
# union-of-rounds evidence.
_ROUND4_WINDOW = [
    # taxi (8)
    "taxi_end_events", "taxi_cell_centers", "taxi_total_arrival_count",
    "taxi_sliding_arrival_count", "taxi_early_arrival_fires",
    "taxi_early_arrival_final", "taxi_trip_etl", "taxi_ride_durations",
    # events (8)
    "events_hourly_counts", "events_sessionization",
    "events_asof_latest_order", "events_pivot_type_counts",
    "events_approx_distinct_users", "events_user_type_arrays",
    "events_value_stats", "events_json_props",
    # changed/new dedup surface (5)
    "dedup_simhash", "dedup_simhash64", "dedup_minhash_lsh",
    "dedup_ngram_jaccard", "pipeline_clean_corpus",
    # this round's predicate/oracle fixes (3)
    "tpch_q12_ship_speed", "tpch_q22_global_sales_opportunity",
    "star_customers_without_orders",
    # new this round: sampling / packing / decon / redaction surface (6)
    "sample_hash_split", "sample_source_cap", "sample_pack_bins",
    "sample_mixture_stats", "decon_eval_overlap", "text_redact_pii",
    # window filler: unchanged, green in r3 (26)
    "dedup_exact_groups", "dedup_exact_survivors", "doc_simhash",
    "text_quality_scores", "text_token_counts", "lang_id_scores",
    "doc_fingerprints", "multimodal_features",
    "tpch_q2_min_cost_supplier", "tpch_q4_order_priority",
    "tpch_q9_product_profit", "tpch_q11_important_stock",
    "tpch_q16_parts_supplier", "tpch_q20_excess_supply",
    "tpch_q21_waiting_orders",
    "embedding_stats", "sim_topk_cosine", "sim_ann_lsh",
    "dedup_embedding_neardup", "label_centroid_distance", "sim_ivf_topk",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume", "tpch_q6_revenue_forecast",
    "tpch_q18_large_volume_customer",
]


def _apply_window_order() -> None:
    ordered = {n: QUERIES[n] for n in _ROUND4_WINDOW if n in QUERIES}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


_load_all()
_apply_window_order()
