"""flink_streaming_demo_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of dataArtisans/flink-streaming-demo.

Brand-new, Spark-first design (DataFrame / Spark SQL / Catalyst / Structured
Streaming); NOT a port of the reference's Flink DataStream runtime. See
SURVEY.md for the operator inventory this package covers.

Layout:
  session      — SparkSession factory (UTC, AQE, shuffle sizing)
  schemas      — StructType schemas (taxi ride, events, star schema)
  functions/   — pure Column-expression scalar libraries (geo, text, vector)
  sources/     — batch readers, ETL, synthetic taxi view, streaming replay
  operators/   — dedup, similarity, as-of join, window helpers
  plans/       — the demo-app pipelines + general OLAP query library
  streaming/   — Structured Streaming pipelines, sinks, early-fire trigger
"""

__version__ = "0.1.0"
