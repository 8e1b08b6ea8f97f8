"""Iterative graph analytics over near-duplicate pair lists.

The dedup surface resolves pair lists into components (operators/dedup.py
``connected_components``); this module ranks WITHIN the resulting
similarity graph: PageRank over the undirected near-dup graph surfaces
the "template" documents sitting at the center of large duplicate
families (the ones worth human review before a bulk drop).

Reference parity: the reference (dataArtisans/flink-streaming-demo) has
no graph operators; this extends the engine for the LLM-curation brief
the same way dedup clustering does.

100 TB shape: like connected_components, the iteration input is the
near-dup PAIR LIST (bounded by LSH blocking, orders of magnitude smaller
than the corpus), never the corpus itself. Each iteration is one
equi-join (edges x ranks, keyed by src) + one partial-aggregated
groupBy(dst); ``localCheckpoint`` truncates lineage per round so plans
stay flat. The node count is a single driver-side count over the degree
table — one scalar, the kmeans-training precedent, not a hot-path
collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
ITERATIONS = 3


def pagerank(
    edges: DataFrame,
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
) -> DataFrame:
    """PageRank over an undirected graph given as unique (id_a < id_b)
    pairs; nodes are exactly the pair-list endpoints (every node has
    degree >= 1, so there is no dangling-mass term). Fixed iteration
    count so engine and oracle replay the identical trajectory.

    Returns (id, degree, pr) with ``pr`` rounded to 6 — rounding happens
    once at the end; intermediate ranks stay full-precision doubles on
    both engines, and per-iteration drift is ~1 ulp, far inside the
    rounding tolerance.
    """
    sym = edges.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        edges.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    # Checkpoint the symmetrized edge list BEFORE iterating: edges is
    # typically the output of the whole MinHash-LSH pipeline, and every
    # contrib join below re-executes its subtree otherwise (measured:
    # iterations+1 full signature passes) — same pattern as
    # connected_components' pair-list checkpoint. Lazy (r15): the ONE
    # unavoidable action — deg.count(), which the 1/n teleport term
    # needs — materializes both cuts in a single job.
    sym = sym.localCheckpoint(eager=False)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
    deg = deg.localCheckpoint(eager=False)
    n = deg.count()
    if n == 0:
        return deg.select(
            F.col("src").alias("id"),
            "degree",
            F.lit(0.0).alias("pr"),
        )
    # ranks carry degree AND prd = pr/degree (r15): the per-edge
    # pr/degree division was a third per-round join (sym ⋈ ranks ⋈ deg)
    # computing the SAME per-node double once per edge — summing the
    # identical doubles, so mass is bit-identical with one join less
    # and the division done n times instead of |E| times.
    ranks = deg.select(
        F.col("src").alias("id"),
        "degree",
        F.lit(1.0 / n).alias("pr"),
        (F.lit(1.0 / n) / F.col("degree")).alias("prd"),
    )
    teleport = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            sym.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("prd")).alias("mass"))
        )
        pr = F.lit(teleport) + F.lit(damping) * F.coalesce(
            F.col("mass"), F.lit(0.0)
        )
        ranks = (
            deg.select(F.col("src").alias("id"), "degree")
            .join(contrib.withColumnRenamed("dst", "id"), "id", "left")
            .select(
                "id",
                "degree",
                pr.alias("pr"),
                (pr / F.col("degree")).alias("prd"),
            )
            # Lazy (r15): the iteration count is FIXED — no
            # data-dependent control flow needs a mid-loop action, so
            # all rounds materialize in dependency order inside the
            # final consumer's job.
            .localCheckpoint(eager=False)
        )
    return ranks.select("id", "degree", F.round("pr", 6).alias("pr"))


def sql_pagerank_ctes(
    edges_cte: str,
    damping: float = DAMPING,
    iterations: int = ITERATIONS,
) -> str:
    """DuckDB twin: unrolled fixed-iteration PageRank as chained CTEs
    over ``edges_cte`` (a CTE name yielding id_a/id_b pairs). The
    teleport term is computed at runtime as ``(1.0 - damping)/n`` on
    both engines — identical IEEE ops on identical literals, so the
    trajectories are bit-aligned. Final SELECT not included."""
    parts = [
        f"""
    sym AS (
        SELECT id_a AS src, id_b AS dst FROM {edges_cte}
        UNION ALL
        SELECT id_b AS src, id_a AS dst FROM {edges_cte}
    ),
    deg AS (SELECT src, COUNT(*) AS degree FROM sym GROUP BY src),
    nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
    r0 AS (
        SELECT src AS id, 1.0 / nn.n AS pr FROM deg CROSS JOIN nn
    )"""
    ]
    for it in range(iterations):
        prev, cur = f"r{it}", f"r{it + 1}"
        parts.append(f"""
    m{it} AS (
        SELECT s.dst, SUM(r.pr / dg.degree) AS mass
        FROM sym s
        JOIN {prev} r ON r.id = s.src
        JOIN deg dg ON dg.src = s.src
        GROUP BY s.dst
    ),
    {cur} AS (
        SELECT d.src AS id,
               (1.0 - {damping}) / nn.n
                   + {damping} * COALESCE(m.mass, 0.0) AS pr
        FROM deg d
        CROSS JOIN nn
        LEFT JOIN m{it} m ON m.dst = d.src
    )""")
    return ",".join(parts)
