"""Mergeable-sketch cookbook, runnable as a script:

    python examples/sketch_rollups.py [sf_dir]

Demonstrates the incremental-view pattern shared by all five
deterministic sketches (operators/scale.py): build PARTIALS per
(event_type, day), persist them, and answer queries by ROLLUP + a
read-time estimate — history is never rescanned when a new day lands,
because every sketch's merge is an associative/commutative semigroup op:

    KMV        distinct count     merge = union, re-take k smallest
    HLL        distinct count     merge = per-bucket MAX
    Bloom      set membership     merge = per-word bit OR
    CMS        per-key frequency  merge = per-(row, col) SUM
    histogram  quantiles          merge = per-bin SUM

Each estimate prints next to its exact counterpart computed the
expensive way. The same partial/merge functions back the streaming
maintainers (streaming/pipelines.py) and the hash-checked driver queries
(plans/event_queries.py) — one algebra, three consumption shapes.
"""

from __future__ import annotations

import sys


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from flink_streaming_demo_spark.operators import scale
    from flink_streaming_demo_spark.schemas import load_table
    from flink_streaming_demo_spark.session import get_spark

    spark = get_spark("sketch-rollups-example")
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    g, gd = ["event_type"], ["event_type", "day"]

    print("== exact (the expensive way: full-history distinct/sort) ==")
    ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_distinct"),
        F.expr("percentile(value, 0.9)").alias("exact_p90"),
    ).orderBy("event_type").show()

    print("== KMV / HLL distinct from per-day partials ==")
    kmv = scale.kmv_estimate(
        scale.kmv_rollup(
            scale.kmv_partial(ev, gd, "user_id").select(*g, "kmv"), g
        )
    )
    hll = scale.hll_estimate(
        scale.hll_rollup(
            scale.hll_partial(ev, gd, "user_id").select(*g, "bucket", "rho"),
            g,
        ),
        g,
    )
    kmv.join(hll, g).orderBy("event_type").show()

    print("== histogram p90 from per-day partials ==")
    lo, hi = 0.0, 512.0
    sketch = scale.hist_rollup(
        scale.hist_partial(ev, gd, "value", lo, hi).select(
            *g, "bin", "cnt"
        ),
        g,
    )
    scale.hist_quantiles(sketch, g, [0.9], lo, hi).orderBy(
        "event_type"
    ).show()

    print("== Bloom membership + CMS frequency for one probe user ==")
    probe_user = ev.select(F.min("user_id")).first()[0]
    probes = (
        ev.select("event_type").distinct().withColumn(
            "user_id", F.lit(probe_user)
        )
    )
    bloom = scale.bloom_maybe_contains(
        scale.bloom_rollup(
            scale.bloom_partial(ev, gd, "user_id").select(
                *g, "word", "bits"
            ),
            g,
        ),
        probes,
        g,
        "user_id",
    )
    cms = scale.cms_estimate(
        scale.cms_rollup(
            scale.cms_partial(ev, gd, "user_id").select(
                *g, "row", "col", "cnt"
            ),
            g,
        ),
        probes,
        g,
        "user_id",
    )
    exact_user = ev.filter(F.col("user_id") == probe_user).groupBy(
        "event_type"
    ).agg(F.count(F.lit(1)).alias("exact_events"))
    bloom.join(cms, [*g, "user_id"]).join(exact_user, g, "left").orderBy(
        "event_type"
    ).show()

    print("== rolling 7-day WAU: the same per-day partials, fanned to")
    print("   window-ends and ⊕-merged — history never rescanned ==")
    evd = ev.withColumn("day", F.date_trunc("DAY", F.col("ts")))
    daily = scale.kmv_partial(evd, ["day"], "user_id")
    fan = daily.select(
        F.explode(
            F.expr("sequence(day, day + interval 6 days, interval 1 day)")
        ).alias("win_day"),
        "kmv",
    )
    rolled = scale.kmv_rollup(fan, ["win_day"])
    observed = daily.select(F.col("day").alias("win_day"))
    scale.kmv_estimate(rolled.join(observed, "win_day")).orderBy(
        "win_day"
    ).show(10)
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
