"""Streaming ingest demo, runnable as a script:

    python examples/streaming_ingest.py [sf_dir]

Replays the documents table as a jittered out-of-order stream and runs
the ingest-side half of the corpus pipeline: quality gate + content-hash
dedup within the watermark + batch-vs-corpus incremental verdicts, all
landing in keyed parquet upsert stores. Prints the store contents at the
end — in production the streams never stop and the compaction pass
(clean_corpus_compact) runs on a cadence.
"""

from __future__ import annotations

import shutil
import sys
import tempfile


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from flink_streaming_demo_spark.plans.text_queries import _incoming_batch
    from flink_streaming_demo_spark.schemas import load_table
    from flink_streaming_demo_spark.session import get_spark
    from flink_streaming_demo_spark.streaming import replay
    from flink_streaming_demo_spark.streaming.pipelines import (
        streaming_clean_corpus_front,
        streaming_incremental_dedup,
        write_foreach_batch_stream,
    )
    from flink_streaming_demo_spark.streaming.sinks import (
        ParquetUpsertSink,
        write_update_stream,
    )

    spark = get_spark("streaming-ingest-example")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    incoming = _incoming_batch(spark, sf_dir)
    base_us = 1_700_000_000 * 1_000_000
    stamped = incoming.withColumn(
        "ingest_ts",
        F.timestamp_micros(
            F.lit(base_us) + (F.col("doc_id") % 240) * F.lit(1_000_000)
        ),
    )
    jittered = replay.with_delivery_jitter(
        stamped, ts_col="ingest_ts", max_delay_secs=60
    )
    chunk_dir = replay.write_replay_chunks(
        jittered, n_chunks=4, order_col="delivery_ts"
    )
    work = tempfile.mkdtemp(prefix="ingest_demo_")
    front_sink = ParquetUpsertSink(work + "/front", ["text_hash"])
    verdict_sink = ParquetUpsertSink(work + "/verdicts", ["doc_id"])
    try:
        schema = "doc_id long, text string, ingest_ts timestamp"
        q1 = write_update_stream(
            streaming_clean_corpus_front(
                replay.read_replay_stream(spark, chunk_dir, schema)
            ),
            front_sink, "front", "append",
        )
        q2 = write_foreach_batch_stream(
            replay.read_replay_stream(spark, chunk_dir, schema)
            .select("doc_id", "text"),
            streaming_incremental_dedup(base, verdict_sink),
            "verdicts",
        )
        for q in (q1, q2):
            q.processAllAvailable()
            q.stop()
        front = front_sink.read(spark)
        verdicts = verdict_sink.read(spark)
        print(f"ingested {incoming.count()} docs -> "
              f"{front.count()} distinct quality-passing contents")
        verdicts.groupBy("verdict").count().orderBy("verdict").show()
        return 0
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
