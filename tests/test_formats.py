"""Source/sink format coverage: the engine's tables must survive a
round-trip through every columnar/row format Spark ships (parquet is the
driver's native format; ORC, JSON, CSV are the interchange formats a
production ingest actually meets). Value-exact equality is asserted via a
canonical sorted collect, and schema fidelity is asserted per format's
contract (JSON/CSV are schema-on-read: the read back applies the written
schema explicitly, as any production reader must)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from flink_streaming_demo_spark.schemas import load_table


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    # Unpersist on module teardown: a lingering cache turns later plan
    # guards' parquet scans into InMemoryTableScans (their ReadSchema /
    # PushedFilters assertions then see the cache, not the source).
    df = load_table(spark, sf_dir, "documents").cache()
    yield df
    df.unpersist()


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_documents_roundtrip(spark, docs, fmt):
    out = tempfile.mkdtemp(prefix=f"fmt_{fmt}_")
    try:
        w = docs.write.mode("overwrite").format(fmt)
        if fmt == "csv":
            # text contains no quotes/newlines in the corpus, but a
            # production writer must not rely on that
            w = w.option("header", "true").option("quoteAll", "true")
        w.save(out)
        r = spark.read.format(fmt)
        if fmt in ("json", "csv"):
            r = r.schema(docs.schema)
        if fmt == "csv":
            r = r.option("header", "true")
        back = r.load(out)
        assert back.schema == docs.schema
        assert _canon(back) == _canon(docs)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_events_timestamp_roundtrip_orc(spark, sf_dir):
    """Timestamps (the NTZ-normalized events.ts) must survive ORC
    exactly — the format most likely to differ in timestamp encoding."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id"
    )
    out = tempfile.mkdtemp(prefix="fmt_orc_ts_")
    try:
        ev.write.mode("overwrite").orc(out)
        back = spark.read.orc(out)
        assert back.schema == ev.schema
        assert _canon(back) == _canon(ev)
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_partitioned_write_prunes_partitions(spark, docs):
    """source-partitioned layout: reading one source must scan only that
    partition (PartitionFilters in the plan, not a post-scan filter)."""
    out = tempfile.mkdtemp(prefix="fmt_part_")
    try:
        docs.write.mode("overwrite").partitionBy("source").parquet(out)
        one = spark.read.parquet(out).filter(F.col("source") == "src1")
        plan = one._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        assert "src1" in plan
        got = one.count()
        want = docs.filter(F.col("source") == "src1").count()
        assert got == want
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_schema_evolution_merge_reads_both_generations(spark, docs):
    """A corpus written in two generations (the second adding a column)
    must read back under mergeSchema with the union schema, nulls for
    the old generation — the ingest-evolution path a long-lived corpus
    store hits."""
    out = tempfile.mkdtemp(prefix="fmt_evolve_")
    try:
        g1 = docs.select("doc_id", "text").filter(F.col("doc_id") < 100)
        g2 = (
            docs.select("doc_id", "text")
            .filter(F.col("doc_id") >= 100)
            .withColumn("ingest_batch", F.lit(2))
        )
        g1.write.mode("append").parquet(out)
        g2.write.mode("append").parquet(out)
        back = spark.read.option("mergeSchema", "true").parquet(out)
        assert set(back.columns) == {"doc_id", "text", "ingest_batch"}
        assert back.count() == docs.count()
        old = back.filter(F.col("doc_id") < 100)
        assert old.filter(F.col("ingest_batch").isNotNull()).count() == 0
        new = back.filter(F.col("doc_id") >= 100)
        assert new.filter(F.col("ingest_batch") != 2).count() == 0
    finally:
        shutil.rmtree(out, ignore_errors=True)
