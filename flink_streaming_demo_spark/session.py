"""SparkSession factory.

Spark-equivalent of the reference's local execution environment factory
(reference: utils/DemoStreamEnvironment.scala:25-34) — a single place that
pins the configs every pipeline in this engine assumes:

* ``spark.sql.session.timeZone=UTC`` — the reference parses/renders all
  timestamps in UTC (reference: datatypes/TaxiRide.scala:64-66); pinning UTC
  also makes results comparable with a DuckDB oracle (UTC-naive timestamps).
* AQE on — runtime coalescing + skew-join handling stand in for hand-tuned
  parallelism at 100 TB scale.
* shuffle partitions sized to the local core count for tests; a real cluster
  deployment overrides via ``spark.sql.shuffle.partitions`` (or leaves AQE's
  coalescing to shrink the default).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "flink-streaming-demo-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = default_cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Size-based post-shuffle coalescing (r15, guide §2.2): the
        # parallelismFirst default pins every post-shuffle stage at
        # ~defaultParallelism read tasks even when the shuffle holds a
        # few KB, so small-stage scheduling overhead dominates iterative
        # and multi-exchange operators. False = AQE sizes read partitions
        # by bytes (the advisory target below), which is also the
        # documented production setting; the advisory size is THE
        # scale knob and stays env-overridable for cluster deployments
        # (guide §9 suggests 256m on real clusters; 64m — Spark's own
        # default — keeps local parallelism for the mid-size shuffles).
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_COALESCE_PARALLELISM_FIRST", "false"),
        )
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY_PARTITION_SIZE", "64m"),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Defensive: even if an existing session was reused, pin the semantics we need.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def configure_for_oracle(spark: SparkSession) -> SparkSession:
    """Pin session semantics on a driver-provided session (timezone only —
    everything else is performance, not correctness)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
