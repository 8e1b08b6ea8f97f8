"""Pipeline-health cookbook, runnable as a script:

    python examples/pipeline_health.py [sf_dir]

The observability pass an ingest run executes before certifying a
batch — four registered, driver-checked monitor families composed into
one report:

  1. CONTRACTS  — system_data_expectations: completeness, uniqueness,
                  ranges, referential integrity (the hard gate);
  2. DRIFT      — events_psi_value_drift: per-segment PSI vs the
                  global distribution on maintained histogram sketches
                  (the soft gate);
  3. SKEW       — events_key_skew_report: shuffle-key hot spots that
                  would straggle the next join;
  4. LATENESS   — events_lateness_profile: how late data arrives vs
                  the watermark, the input to the delay choice
                  (events_watermark_delay_tradeoff prices it).

Everything runs from partial-aggregated scans and sketch state — the
whole report is cheap enough to run per batch at any scale.
"""

from __future__ import annotations

import sys


def main(sf_dir: str = "/root/testdata/sf0.001") -> int:
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from pyspark.sql import functions as F

    from flink_streaming_demo_spark.plans.event_queries import (
        events_key_skew_report,
        events_lateness_profile,
        events_psi_value_drift,
    )
    from flink_streaming_demo_spark.plans.tpch_more import (
        system_data_expectations,
    )
    from flink_streaming_demo_spark.session import get_spark

    spark = get_spark("pipeline-health-example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1. contracts (hard gate) ==")
    exp = system_data_expectations(spark, sf_dir).orderBy("check_name")
    exp.show(truncate=False)
    n_failed = exp.filter(~F.col("passed")).count()
    print(f"gate: {'HOLD' if n_failed else 'CERTIFY'} "
          f"({n_failed} failing checks)")

    print("\n== 2. distribution drift (soft gate) ==")
    events_psi_value_drift(spark, sf_dir).orderBy("event_type").show(
        truncate=False
    )

    print("== 3. shuffle-key skew ==")
    skew = events_key_skew_report(spark, sf_dir)
    skew.show(5, truncate=False)

    print("== 4. arrival lateness vs watermark ==")
    lat = events_lateness_profile(spark, sf_dir)
    lat.show(5, truncate=False)

    print("report complete: contracts + drift + skew + lateness")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:2]))
