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
    #
    # ORDER MATTERS: the correctness driver checks the first 50 registered
    # queries. Rounds 1-2 proved the events/taxi/text basics green, so the
    # vector/ANN suite, the remaining TPC-H queries, and the star function
    # queries are registered FIRST to rotate them into the checked window;
    # the already-proven basics rotate out the back.
    from flink_streaming_demo_spark.plans import (  # noqa: F401
        vector_queries,
        tpch_rest,
        tpch_queries,
        tpch_more,
        text_queries,
        taxi_queries,
        event_queries,
    )


_load_all()
