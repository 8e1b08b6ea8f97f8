"""End-to-end training-corpus build, runnable as a script:

    python examples/clean_corpus_end_to_end.py [sf_dir]

Load documents -> quality gate + exact/near dedup (transitive clusters)
-> strip cross-doc duplicated spans from survivors -> train the BPE
tokenizer on the cleaned corpus -> pack into context windows under the
subword budget -> print the corpus report. Every stage is the same
operator the oracle-checked queries use; this file just wires them into
the one pipeline a user of the engine actually runs.
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from flink_streaming_demo_spark.operators import bpe, dedup, sampling
    from flink_streaming_demo_spark.plans.text_queries import strip_dup_spans
    from flink_streaming_demo_spark.schemas import load_table
    from flink_streaming_demo_spark.session import get_spark

    spark = get_spark("clean-corpus-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    n0 = docs.count()

    # 1. exact dedup + transitive near-dup cluster removal
    cleaned = dedup.drop_neardup_clusters(
        dedup.exact_dedup(docs), threshold=0.5
    )
    n1 = cleaned.count()

    # 2. strip cross-document duplicated spans from the survivors
    stripped = strip_dup_spans(cleaned.select("doc_id", "text"))
    dup_tokens = stripped.agg(F.sum("dup_token_count")).first()[0]

    # 3. train the tokenizer on the cleaned corpus, size docs by subwords
    merges = bpe.bpe_train_merges(cleaned.select("text"))
    seg = bpe.bpe_segment(cleaned, merges).select("doc_id", "n_subwords")

    # 4. pack under the subword budget
    sized = cleaned.select("doc_id", "source").join(seg, "doc_id")
    packed = sampling.pack_greedy(sized, "n_subwords", 2048,
                                  part_col="source")
    report = (
        packed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.countDistinct("bin_id").alias("bins"),
            F.sum("n_subwords").alias("subwords"),
        )
        .orderBy("source")
    )

    print(f"documents: {n0} -> {n1} after dedup "
          f"({n0 - n1} dropped); {dup_tokens} boilerplate tokens stripped")
    print("merges:", [(r.pa, r.pb) for r in merges.orderBy('rank').collect()])
    report.show(25, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
