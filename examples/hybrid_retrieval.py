"""Hybrid-retrieval cookbook, runnable as a script:

    python examples/hybrid_retrieval.py [sf_dir]

The retrieval loop of an LLM-data / RAG stack, end to end on the
registered, driver-checked tier:

  1. INDEX  — streaming_bm25_index: the corpus arrives in micro-batches
              and maintains an incremental inverted index (postings +
              lengths upsert stores; replay-safe without any dedup
              bookkeeping because postings of immutable docs are
              idempotent re-upserts);
  2. LEXICAL — bm25_topk_view over the index stores, which must equal
              the batch sim_bm25_topk bit-for-bit (shared scoring tail);
  2b. BATCH  — bm25_batch_view: a 5-query TABLE served off the same live
              index in one store read (the eval/distillation shape),
              equal to the batch sim_bm25_batch_topk bit-for-bit;
  3. FUSE   — sim_hybrid_rrf: reciprocal-rank fusion of the BM25 list
              with the dense cosine list for the same query item;
  4. GRADE  — sim_hybrid_ndcg: nDCG@10 of the fused list against the
              dense exact top-10, the quality number a deployment
              watches.

Every stage is bounded-list or scan-shaped — no stage materializes a
corpus-sized intermediate beyond the index itself.
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
    from flink_streaming_demo_spark.plans.vector_queries import (
        BM25_BATCH_QUERIES,
        BM25_K,
        BM25_TERMS,
        sim_bm25_batch_topk,
        sim_bm25_topk,
        sim_hybrid_ndcg,
        sim_hybrid_rrf,
    )
    from flink_streaming_demo_spark.schemas import load_table
    from flink_streaming_demo_spark.session import get_spark
    from flink_streaming_demo_spark.streaming import replay
    from flink_streaming_demo_spark.streaming.pipelines import (
        bm25_batch_view,
        bm25_topk_view,
        streaming_bm25_index,
        write_foreach_batch_stream,
    )
    from flink_streaming_demo_spark.streaming.sinks import ParquetUpsertSink

    spark = get_spark("hybrid-retrieval-example", shuffle_partitions=8)

    # 1. INDEX: replay the corpus in 3 micro-batches into the stores.
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    chunk_dir = replay.write_replay_chunks(docs, n_chunks=3, order_col="doc_id")
    root = tempfile.mkdtemp(prefix="hybrid_idx_")
    postings = ParquetUpsertSink(root + "/postings", ["term", "doc_id"])
    lengths = ParquetUpsertSink(root + "/lengths", ["doc_id"])
    try:
        stream = replay.read_replay_stream(
            spark, chunk_dir, "doc_id long, text string",
            max_files_per_trigger=1,
        )
        q = write_foreach_batch_stream(
            stream, streaming_bm25_index(postings, lengths), "bm25_index"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        n_post = postings.read(spark).count()
        n_docs = lengths.read(spark).count()
        print(f"indexed {n_docs} docs -> {n_post} postings")

        # 2. LEXICAL: the incremental index serves the same table as batch.
        view = bm25_topk_view(
            spark, postings, lengths, BM25_TERMS, k=BM25_K
        ).orderBy("rank").collect()
        batch = sim_bm25_topk(spark, sf_dir).orderBy("rank").collect()
        agree = [tuple(r) for r in view] == [tuple(r) for r in batch]
        print(f"bm25 top-{BM25_K} for {list(BM25_TERMS)} "
              f"(view == batch: {agree}):")
        for r in view[:5]:
            print(f"  #{r.rank} doc {r.doc_id} score={r.score} "
                  f"({r.n_terms} terms)")

        # 2b. BATCH: a query TABLE served off the same live index in one
        # store read — per-query top-k, equal to the batch query.
        key = lambda r: (r.query_id, r.rank)
        bview = sorted(
            bm25_batch_view(
                spark, postings, lengths, BM25_BATCH_QUERIES, k=BM25_K
            ).collect(),
            key=key,
        )
        bbatch = sorted(
            sim_bm25_batch_topk(spark, sf_dir).collect(), key=key
        )
        bagree = [tuple(r) for r in bview] == [tuple(r) for r in bbatch]
        agree = agree and bagree
        print(f"batched bm25: {len(BM25_BATCH_QUERIES)} queries, "
              f"{len(bview)} result rows (view == batch: {bagree}); "
              f"per-query #1:")
        for r in bview:
            if r.rank == 1:
                print(f"  q{r.query_id}: doc {r.doc_id} score={r.score}")

        # 3. FUSE: lexical + dense lists, reciprocal-rank fusion.
        fused = sim_hybrid_rrf(spark, sf_dir).collect()
        print("hybrid RRF top-10 (lex_rank/vec_rank 0 = outside top-50):")
        for r in fused[:5]:
            print(f"  #{r.rank} doc {r.doc_id} rrf={r.rrf_score} "
                  f"lex={r.lex_rank} vec={r.vec_rank}")

        # 4. GRADE: fusion quality vs the dense exact top-10.
        g = sim_hybrid_ndcg(spark, sf_dir).collect()[0]
        print(f"fusion grade: nDCG@{g.k}={g.ndcg} "
              f"({g.hits}/{g.k} dense hits)")
        return 0 if agree else 1
    finally:
        shutil.rmtree(chunk_dir, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main(*sys.argv[1:]))
