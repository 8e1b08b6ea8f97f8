"""Registered queries for the embedding-similarity surface over
``embeddings`` (array<float> of 64 dims)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_demo_spark.operators import similarity as SIM
from flink_streaming_demo_spark.plans.registry import register
from flink_streaming_demo_spark.schemas import load_table as t

DIMS = 64
N_QUERIES = 5
TOP_K = 5


# --- Per-vector stats --------------------------------------------------------

def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dims"),
        F.round(SIM.l2_norm(F.col("embedding")), 6).alias("l2_norm"),
        F.round(
            F.element_at(F.col("embedding"), 1).cast("double"), 6
        ).alias("first_dim"),
    )


register(
    "embedding_stats",
    embedding_stats,
    f"""
    SELECT
        vec_id,
        label,
        CAST(len(embedding) AS INT) AS dims,
        ROUND({SIM.sql_l2_norm('embedding', DIMS)}, 6) AS l2_norm,
        ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_dim
    FROM embeddings
    """,
)


# --- Brute-force cosine top-k ------------------------------------------------

def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: top-5 cosine neighbors for the first 5 vectors.
    Broadcast queries x corpus scan; no Python in the scoring path."""
    emb = t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    return SIM.brute_force_topk(queries, emb, k=TOP_K)


register(
    "sim_topk_cosine",
    sim_topk_cosine,
    f"""
    WITH scored AS (
        SELECT
            q.vec_id AS query_id,
            c.vec_id AS neighbor_id,
            ROUND({SIM.sql_cosine('q.embedding', 'c.embedding', DIMS)}, 6)
                AS score
        FROM embeddings q
        JOIN embeddings c ON q.vec_id <> c.vec_id
        WHERE q.vec_id < {N_QUERIES}
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
            PARTITION BY query_id ORDER BY score DESC, neighbor_id ASC
        ) AS rank
        FROM scored
    )
    SELECT query_id, rank, neighbor_id, score
    FROM ranked WHERE rank <= {TOP_K}
    """,
)


# --- Label-centroid similarity ----------------------------------------------

def label_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean embedding per label (a 64-dim avg via posexplode + groupBy), then
    each vector's cosine to its own label centroid. The explode/re-collect is
    one shuffle keyed by (label, dim) — uniform, scales linearly."""
    emb = t(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "vec_id", "label", F.posexplode("embedding").alias("dim", "val")
    ).select("vec_id", "label", "dim", F.col("val").cast("double").alias("val"))
    centroids = (
        exploded.groupBy("label", "dim")
        .agg(F.avg("val").alias("cval"))
        .groupBy("label")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "cval"))
            ).alias("pairs")
        )
        .select(
            "label",
            F.transform(F.col("pairs"), lambda p: p.cval).alias("centroid"),
        )
    )
    joined = emb.join(F.broadcast(centroids), "label")
    return joined.select(
        "vec_id",
        "label",
        F.round(
            SIM.dot(F.col("embedding"), F.col("centroid"))
            / (
                SIM.l2_norm(F.col("embedding"))
                * SIM.l2_norm(F.col("centroid"))
            ),
            4,
        ).alias("centroid_cosine"),
    )


register(
    "label_centroid_distance",
    label_centroid_distance,
    f"""
    WITH exploded AS (
        SELECT
            vec_id,
            label,
            i - 1 AS dim,
            CAST(embedding[i] AS DOUBLE) AS val
        FROM embeddings, generate_series(1, {DIMS}) AS u(i)
    ),
    centroids AS (
        SELECT label, dim, AVG(val) AS cval
        FROM exploded
        GROUP BY label, dim
    ),
    cent_arr AS (
        SELECT label, list(cval ORDER BY dim) AS centroid
        FROM centroids
        GROUP BY label
    )
    SELECT
        e.vec_id,
        e.label,
        ROUND(
            {SIM.sql_dot('e.embedding', 'c.centroid', DIMS)}
            / ({SIM.sql_l2_norm('e.embedding', DIMS)}
               * {SIM.sql_l2_norm('c.centroid', DIMS)}), 4) AS centroid_cosine
    FROM embeddings e
    JOIN cent_arr c ON e.label = c.label
    """,
)
