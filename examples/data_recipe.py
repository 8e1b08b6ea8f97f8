"""Data-recipe cookbook, runnable as a script:

    python examples/data_recipe.py [sf_dir]

The mixing half of a training-data pipeline over ``documents``, end to
end, with every step a registered driver-checked query family:

  1. MEASURE   — token share per source (mixture stats);
  2. ALLOCATE  — epochs per source under a global token budget with a
                 per-source repeat cap, temperature-alpha=0.5 priorities
                 (sample_token_budget: exact capped water-filling);
  3. INSPECT   — a weight-proportional k-document sample per source
                 (sample_reservoir_weighted: deterministic A-ES race);
  4. SPLIT     — leak-proof md5 train/val/test keyed on doc_id.

Everything is Column expressions over one per-source aggregate plus a
#sources-row control table — the recipe costs two scans of the corpus
at any scale.
"""

from __future__ import annotations

import sys


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from flink_streaming_demo_spark.plans.sampling_queries import (
        sample_hash_split,
        sample_reservoir_weighted,
        sample_token_budget,
    )
    from flink_streaming_demo_spark.session import get_spark

    spark = get_spark("data-recipe-example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== epoch allocation (budget 1.5x corpus, cap 1.55/source) ==")
    alloc = sample_token_budget(spark, sf_dir).orderBy("source")
    alloc.show(alloc.count(), truncate=False)
    tot = alloc.agg(
        F.sum("alloc_tokens").alias("alloc"),
        F.sum("avail_tokens").alias("avail"),
        F.sum("capped").alias("n_capped"),
    ).first()
    print(
        f"allocated {tot.alloc:.0f} of {tot.avail} available tokens "
        f"({tot.alloc / tot.avail:.3f} epochs mean), "
        f"{tot.n_capped} sources at the repeat cap"
    )

    print("\n== weighted reservoir: 5 docs/source, P(keep) ~ tokens ==")
    res = sample_reservoir_weighted(spark, sf_dir)
    res.filter(F.col("source").isin("src0", "src1")).orderBy(
        "source", "rank"
    ).show(10, truncate=False)

    print("== md5 train/val/test split (adding data never relabels) ==")
    sample_hash_split(spark, sf_dir).groupBy("split").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("total_tokens").alias("tokens"),
    ).orderBy("split").show(truncate=False)

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:2]))
