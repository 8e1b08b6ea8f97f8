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
  domain" data-mixing primitive. One shuffle on the group key;
  per-group state is a row_number counter. Skewed groups cost a sort of
  that group; at 100 TB, pre-filter obviously-rejected rows first.
* **pack_greedy** — contiguous greedy sequence packing: within each
  partition key, order docs deterministically, take the running token
  sum, and cut bins at ``capacity`` (bin = floor(cumsum_before / cap)).
  This is the one-pass streaming approximation of bin packing used for
  LLM context-window packing; exact first-fit-decreasing is inherently
  sequential and not worth a shuffle-free plan's loss. One window scan
  per partition key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

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
) -> DataFrame:
    """Keep at most ``n`` rows per group, by a deterministic order.
    Adds a ``rank`` column (1-based position within the group)."""
    w = Window.partitionBy(group_col).orderBy(*order_cols)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n)
    )


def pack_greedy(
    df: DataFrame,
    token_col: str,
    capacity: int,
    part_col: str | None = None,
    order_col: str = "doc_id",
) -> DataFrame:
    """Assign each row a ``bin_id`` by contiguous offset binning: rows are
    taken in ``order_col`` order (within ``part_col`` if given) and row r
    lands in bin floor(exclusive_cumsum(tokens) / capacity) — the bin
    containing its start offset on the concatenated token stream.

    This is the one-window-scan SQL form of sequence packing: documents
    are never split across bins, every bin except the last holds at least
    one row, and a bin overflows capacity by at most one document's
    tokens (the straddling row). True reset-on-overflow greedy packing is
    a sequential recurrence (each cut depends on the previous cut) — not
    expressible without a per-partition sequential pass — and the offset
    form's bound is what LLM packing pipelines accept in exchange for a
    fully parallel plan.
    """
    parts = [part_col] if part_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive cumsum = inclusive - own value
    cum = F.sum(token_col).over(w) - F.col(token_col)
    return df.withColumn(
        "bin_id", F.floor(cum / F.lit(capacity)).cast("long")
    )
