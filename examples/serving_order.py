"""Serving-order cookbook, runnable as a script:

    python examples/serving_order.py [sf_dir]

How a trainer actually READS the corpus once the data-recipe example
has decided WHAT to read — three deterministic ordering primitives,
each a registered driver-checked query:

  1. STABLE IDS  — contiguous 1..N positions from a total order
                   (doc_stable_ids: exact_global_rank, no
                   single-reducer sort) for resumable manifests;
  2. EPOCH SHUFFLE — a fresh md5-seeded permutation per epoch, cut
                   into shard files (sample_epoch_shuffle): any
                   worker/retry/engine reproduces the same order,
                   where ORDER BY rand() reproduces nothing;
  3. INTERLEAVE  — weight-proportional smooth mixing of sources into
                   one stream (sample_interleave_sources): a window
                   of the output contains sources in weight
                   proportion, not source-sized blocks.

All three are shuffle-minimal: stable ids and the interleave rank ride
the chunked-prefix rank decomposition; the epoch shuffle's only
shuffle is the (epoch, shard) hash partition the shard writer wants
anyway.
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
        doc_stable_ids,
        sample_epoch_shuffle,
        sample_interleave_sources,
    )
    from flink_streaming_demo_spark.session import get_spark

    spark = get_spark("serving-order-example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== stable ids: contiguous 1..N, longest docs first ==")
    ids = doc_stable_ids(spark, sf_dir)
    ids.orderBy("stable_id").show(5, truncate=False)
    n = ids.count()
    lo_hi = ids.agg(
        F.min("stable_id").alias("lo"), F.max("stable_id").alias("hi")
    ).first()
    print(f"{n} docs, ids {lo_hi.lo}..{lo_hi.hi} (contiguous, no gaps)")

    print("\n== epoch shuffle: same doc, different position per epoch ==")
    sh = sample_epoch_shuffle(spark, sf_dir)
    sh.filter(F.col("doc_id") == 0).orderBy("epoch").show(truncate=False)
    sizes = sh.groupBy("epoch", "shard").count().orderBy("epoch", "shard")
    print("shard sizes per epoch (hash-balanced):")
    sizes.show(sizes.count(), truncate=False)

    print("== interleave: source shares in any prefix track weights ==")
    il = sample_interleave_sources(spark, sf_dir)
    depth = 40
    prefix_mix = (
        il.filter(F.col("global_pos") <= depth)
        .groupBy("source", "weight")
        .count()
        .orderBy(F.desc("weight"), "source")
    )
    prefix_mix.show(prefix_mix.count(), truncate=False)
    w_tot = (
        il.select("source", "weight").distinct().agg(F.sum("weight"))
    ).first()[0]
    print(
        f"first {depth} slots vs expectation depth*w/{w_tot} "
        "(off by at most one slot per source)"
    )

    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:2]))
