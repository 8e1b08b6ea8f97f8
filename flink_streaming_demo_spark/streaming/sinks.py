"""Idempotent keyed upsert sinks (K2-K4; reference:
sinks/ElasticsearchUpsertSink.scala:42-83).

The reference's sink contract: per record, insert-if-absent else update,
keyed by ``indexKey(record)`` — "last write wins per key". Combined with
update output mode this is what turns a stream of partial results into a
converged materialized view (SURVEY §3.3: "the sink, not the engine,
provides the refinement semantics").

Spark-first realization: ``writeStream.foreachBatch`` + key-based merge.
Two implementations:

* ``InMemoryUpsertSink`` — driver-side dict; tests and demos.
* ``ParquetUpsertSink`` — read-modify-write merge into a parquet key-value
  table (anti-join old keys + union + overwrite). At production scale the
  same ``foreachBatch`` body targets a real MERGE-capable store (Delta/
  Iceberg `MERGE INTO`, or an OpenSearch bulk-upsert client) — the sink
  interface is the contract, the store is pluggable. Unlike the reference's
  one-synchronous-RPC-per-record flush (bulk.flush.max.actions=1, blocking
  get() — reference: sinks/ElasticsearchUpsertSink.scala:57,80), batches are
  merged set-wise per micro-batch: idempotent under micro-batch replay,
  which is exactly Spark's at-least-once foreachBatch contract.

Key policies from the reference:
* K3 (running total): key = cell (reference: examples/TotalArrivalCount.scala:123-126)
* K4 (windowed): key = (cell, window_end) (reference:
  examples/SlidingArrivalCount.scala:135-138, EarlyArrivalCount.scala:185-188)
"""

from __future__ import annotations

import os
import threading

from pyspark.sql import DataFrame


class InMemoryUpsertSink:
    """Driver-side keyed upsert store for tests/demos."""

    def __init__(self, key_cols: list[str]):
        self.key_cols = list(key_cols)
        self.rows: dict[tuple, dict] = {}
        self._lock = threading.Lock()

    def foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        collected = batch_df.collect()
        with self._lock:
            for row in collected:
                d = row.asDict()
                key = tuple(d[k] for k in self.key_cols)
                self.rows[key] = d  # last write per key wins

    def snapshot(self) -> list[dict]:
        with self._lock:
            return list(self.rows.values())


class ParquetUpsertSink:
    """Keyed upsert into a parquet-backed table via read/anti-join/union/
    overwrite — the jar-free stand-in for ``MERGE INTO``."""

    def __init__(self, path: str, key_cols: list[str]):
        self.path = path
        self.key_cols = list(key_cols)

    def foreach_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # Within a micro-batch, keep one row per key (the one with the
        # "latest" values — batch rows for the same key are identical in
        # update mode, so dropDuplicates is sufficient).
        fresh = batch_df.dropDuplicates(self.key_cols)
        if os.path.exists(self.path):
            old = spark.read.parquet(self.path)
            keep = old.join(
                fresh.select(*self.key_cols).distinct(),
                on=self.key_cols,
                how="left_anti",
            )
            merged = keep.unionByName(fresh)
        else:
            merged = fresh
        staging = self.path + "._staging"
        merged.write.mode("overwrite").parquet(staging)
        final = spark.read.parquet(staging)
        final.write.mode("overwrite").parquet(self.path)

    def read(self, spark) -> DataFrame:
        return spark.read.parquet(self.path)


def write_update_stream(result: DataFrame, sink, query_name: str,
                        output_mode: str = "update"):
    """Attach an upsert sink to a streaming result (K2 wiring)."""
    return (
        result.writeStream.outputMode(output_mode)
        .queryName(query_name)
        .foreachBatch(sink.foreach_batch)
        .start()
    )
