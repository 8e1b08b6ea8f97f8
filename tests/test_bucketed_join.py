"""Bucketing eliminates the join shuffle: pre-bucketed tables on the join
key co-locate matching rows, so the sort-merge join needs no Exchange —
the 100 TB strategy for repeated fact-fact joins on a stable key."""

from __future__ import annotations

import pytest

from flink_streaming_demo_spark.schemas import load_table


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, sf_dir, no_broadcast):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    try:
        for df, name, key in [
            (orders, "b_orders", "o_custkey"),
            (cust, "b_customer", "c_custkey"),
        ]:
            (
                df.write.mode("overwrite")
                .bucketBy(8, key)
                .sortBy(key)
                .saveAsTable(name)
            )
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            spark.table("b_orders").o_custkey
            == spark.table("b_customer").c_custkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
