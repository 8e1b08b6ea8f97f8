"""Scale utilities: skew-salted joins and partitioned ingest writes.

Not part of the reference surface (it never joins); these exist for the
100 TB stance. AQE's skew-join handles skewed SORT-MERGE joins
automatically; explicit salting remains the tool when (a) the skew is in
an aggregation key, or (b) a broadcast is impossible and a handful of hot
keys dominate (power-law user_id / cell distributions).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join robust to hot keys: the skewed side gets a deterministic
    per-row salt in [0, n_salts); the other side is replicated n_salts
    times (explode of a literal range). The shuffle key becomes
    (key, salt), splitting each hot key's rows across n_salts reducers.

    The salt derives from a hash of the whole skewed row's key + a
    monotonic id surrogate — ``pmod(hash(key, monotonically_increasing_id()),
    n)`` would be nondeterministic across retries, so we hash the key with
    ``spark_partition_id`` instead: stable within a run, uniform enough to
    split hot keys. Replicating the dim side costs n_salts x its size —
    use only when dim is small-ish but above the broadcast threshold.
    """
    salt: Column = F.pmod(
        F.hash(F.col(key), F.spark_partition_id()), F.lit(n_salts)
    )
    left = skewed.withColumn("_salt", salt)
    right = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return left.join(right, [key, "_salt"], how).drop("_salt")


def salted_count(
    df: DataFrame, key: str, n_salts: int = 8
) -> DataFrame:
    """Two-phase aggregation for a skewed count: partial count per
    (key, salt), then final sum per key. The first shuffle spreads each hot
    key over n_salts reducers; the second moves only n_salts rows per key.
    (Spark's partial aggregation already does this for algebraic aggregates
    when input partitions aren't pre-clustered by key — the explicit form
    matters after an upstream repartition(key) or for exact-distinct work.)
    """
    salt = F.pmod(F.hash(F.col(key), F.spark_partition_id()), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial"))
    )
    return partial.groupBy(key).agg(
        F.sum("_partial").cast("bigint").alias("cnt")
    )


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Ingest-side layout control: hive-partition by low-cardinality
    columns (date, source) so downstream scans partition-prune, and sort
    within files on the frequent filter column so parquet row-group
    min/max stats skip aggressively. At 100 TB this layout decision is
    worth more than any single query optimization."""
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    out.write.mode("overwrite").partitionBy(*partition_cols).format(fmt).save(
        path
    )
