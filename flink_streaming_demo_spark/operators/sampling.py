"""Sampling / splitting / packing operators for training-data pipelines.

Not in the reference (no sampling surface); part of the north-star brief's
LLM-data-pipeline set. All deterministic and engine-portable: splits and
buckets derive from md5 of a key (never ``rand()``), so the same row lands
in the same split on any engine, any partitioning, any retry — the
property a 100 TB pipeline needs for reproducible train/val/test
separation and incremental re-runs.

Design:

* **hash_bucket / hash_split** — md5(key) -> 31-bit int -> pmod. Pure
  Column expressions; the split is a deterministic function of the key,
  so adding data never reshuffles old rows between splits.
* **cap_per_group** — keep at most n rows per group by a deterministic
  order (quality-score descending, id tiebreak): the "at most N docs per
  domain" data-mixing primitive. TWO-LEVEL top-N: a salted partial
  row_number keeps n rows per (group, salt), then the final rank runs
  over at most n x n_salts survivors per group — a low-cardinality group
  column (5 sources over the whole corpus) never funnels its entire row
  set through one reducer's sort, which the naive single-window form
  does at 100x scale.
* **pack_greedy** — contiguous greedy sequence packing: within each
  partition key, order docs deterministically, take the running token
  sum, and cut bins at ``capacity`` (bin = floor(cumsum_before / cap)).
  This is the one-pass streaming approximation of bin packing used for
  LLM context-window packing; exact first-fit-decreasing is inherently
  sequential and not worth a shuffle-free plan's loss. The cumsum is
  HIERARCHICAL: contiguous order-range chunks take a local window
  cumsum in parallel, and a tiny per-chunk prefix table (one row per
  chunk) broadcasts back — identical bin ids to the single-window form
  without the whole-partition sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_streaming_demo_spark.operators.scale import row_salt

HASH_MOD = 1_000_000


def hash_bucket(key: Column, n_buckets: int = HASH_MOD) -> Column:
    """Deterministic bucket in [0, n_buckets): md5 of the key's string
    form, first 8 hex chars as int. Engine-portable (DuckDB twin:
    ``CAST(('0x' || substr(md5(...), 1, 8)) AS BIGINT) % n``)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 8), 16, 10)
        .cast("long")
        % F.lit(n_buckets)
    )


def hash_split(
    key: Column, train: float = 0.8, val: float = 0.1
) -> Column:
    """'train' / 'val' / 'test' label from a deterministic key hash.
    Fractions are exact over the bucket space (not asymptotic): bucket <
    train*MOD -> train, < (train+val)*MOD -> val, else test."""
    b = hash_bucket(key, HASH_MOD)
    return (
        F.when(b < int(train * HASH_MOD), "train")
        .when(b < int((train + val) * HASH_MOD), "val")
        .otherwise("test")
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    order_cols: list[Column],
    n: int,
    n_salts: int = 16,
    salt_from: str | Column | None = None,
) -> DataFrame:
    """Keep at most ``n`` rows per group, by a deterministic order.
    Adds a ``rank`` column (1-based position within the group).

    Two-level top-N: level 1 ranks within (group, salt) — n_salts
    reducers share each group's sort — and keeps ``n`` rows per salt
    bucket; level 2 ranks the surviving <= n x n_salts rows per group.
    Any row in a group's true top-n is also in its salt bucket's top-n
    (dropping other rows never improves a row's bucket rank), so the
    result — including the rank values — is IDENTICAL to the naive
    single-window form; the plan just never sorts a whole group on one
    reducer. ``order_cols`` must be a total order (add a unique id
    tiebreak) for ranks to be deterministic; the salt derives from row
    content (scale.row_salt), so results are retry-stable.
    """
    w1 = Window.partitionBy(group_col, "_cap_salt").orderBy(*order_cols)
    partial = (
        df.withColumn("_cap_salt", row_salt(df, n_salts, salt_from))
        .withColumn("_salt_rank", F.row_number().over(w1))
        .filter(F.col("_salt_rank") <= n)
        .drop("_salt_rank")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        partial.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= n)
        .drop("_cap_salt")
    )


def pack_greedy(
    df: DataFrame,
    token_col: str,
    capacity: int,
    part_col: str | None = None,
    order_col: str = "doc_id",
    n_chunks: int = 16,
) -> DataFrame:
    """Assign each row a ``bin_id`` by contiguous offset binning: rows are
    taken in ``order_col`` order (within ``part_col`` if given) and row r
    lands in bin floor(exclusive_cumsum(tokens) / capacity) — the bin
    containing its start offset on the concatenated token stream.

    Documents are never split across bins, every bin except the last
    holds at least one row, and a bin overflows capacity by at most one
    document's tokens (the straddling row). True reset-on-overflow greedy
    packing is a sequential recurrence (each cut depends on the previous
    cut) — not expressible without a per-partition sequential pass — and
    the offset form's bound is what LLM packing pipelines accept in
    exchange for a fully parallel plan.

    The cumsum is hierarchical, not one window over the whole partition
    key: ``order_col`` (numeric) is range-split into ``n_chunks``
    contiguous chunks per partition key, each chunk cumsums locally in
    parallel, and the exclusive prefix of whole-chunk totals (a
    <= n_chunks-row table per key) joins back broadcast. Exclusive
    cumsum decomposes exactly — chunk_prefix + within_chunk_excl equals
    the global exclusive cumsum — so bin ids are IDENTICAL to the naive
    single-window form while no reducer ever sorts a whole partition
    key's rows (documents.source has 5 values; at 100x the naive window
    is a 5-straggler plan).
    """
    pc = part_col if part_col else "_pack_all"
    base = df if part_col else df.withColumn(pc, F.lit(0))
    o = F.col(order_col).cast("double")
    # contiguous chunking of the order range; +1 keeps max strictly below
    # n_chunks. Range-based (not ntile): no global sort needed, and the
    # mapping is a pure row expression once the per-key bounds broadcast.
    bounds = base.groupBy(pc).agg(
        F.min(o).alias("_o_min"), F.max(o).alias("_o_max")
    )
    chunked = base.join(F.broadcast(bounds), pc).withColumn(
        "_chunk",
        F.floor(
            (o - F.col("_o_min"))
            * F.lit(n_chunks)
            / (F.col("_o_max") - F.col("_o_min") + 1)
        ).cast("int"),
    )
    w_in = (
        Window.partitionBy(pc, "_chunk")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = chunked.withColumn(
        "_local_excl", F.sum(token_col).over(w_in) - F.col(token_col)
    )
    w_chunks = (
        Window.partitionBy(pc)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefixes = (
        chunked.groupBy(pc, "_chunk")
        .agg(F.sum(token_col).alias("_chunk_sum"))
        .withColumn(
            "_prefix", F.sum("_chunk_sum").over(w_chunks) - F.col("_chunk_sum")
        )
        .select(pc, "_chunk", "_prefix")
    )
    out = local.join(F.broadcast(prefixes), [pc, "_chunk"]).withColumn(
        "bin_id",
        F.floor(
            (F.col("_prefix") + F.col("_local_excl")) / F.lit(capacity)
        ).cast("long"),
    )
    drop = ["_o_min", "_o_max", "_chunk", "_local_excl", "_prefix"]
    if not part_col:
        drop.append(pc)
    return out.drop(*drop)
