"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Query registry lives in ``flink_streaming_demo_spark.plans.registry`` —
this file stays a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_streaming_demo_spark.plans import registry
from flink_streaming_demo_spark.session import configure_for_oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (App 1, total arrival count) on sf0.001."""
    configure_for_oracle(spark)
    return registry.QUERIES["taxi_total_arrival_count"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ordered_queries, not the raw dict: driver order (window first) is
    # re-derived at call time, immune to plans-module import-order
    # effects (see registry.ordered_queries docstring)
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLE_SQL)
