"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
n-gram Jaccard, SimHash.

Not in the reference (it has no dedup surface); required by the north-star
brief. Design per operator:

* **exact** — md5 content hash + groupBy. One shuffle on the hash; at 100 TB
  the hash distributes uniformly, no skew. Keep-policy = min(doc_id).
* **minhash_lsh** — per-document signatures are computed with *array
  expressions only* (nested transform/array_min lambdas): zero shuffles,
  zero Python, fully vectorizable. The only shuffle is the LSH band-bucket
  self-join on the (small) banded projection — the classic
  shingle→minhash→band→bucket-join plan. Signature width 16, 4 bands x 4
  rows: pairs with Jaccard >= ~0.5 collide in some band with high
  probability.
* **ngram_jaccard** — exact verification: candidate pairs from a shared
  distinct-shingle equi-join (never a cross join), then
  ``|A∩B| / (|A|+|B|-|A∩B|)``. At scale this runs AFTER LSH pruning;
  standalone it is quadratic in the worst case and says so.
* **simhash** — see functions/text.simhash16; near-dup = small Hamming
  distance between 16-bit strings.

All hashes are md5-based so the DuckDB oracle reproduces results exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_streaming_demo_spark.functions.text import tokens

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = 4
SHINGLE_N = 3


def exact_dedup_groups(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Group identical texts: (text_hash, keep_id, n_copies); keep_id is the
    minimum id — the canonical survivor."""
    return (
        df.select(F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Return df with only the canonical row per exact text (min id wins)."""
    keep = exact_dedup_groups(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


def shingles(text: Column, n: int = SHINGLE_N) -> Column:
    """Distinct n-gram word shingles as an array column (pure expression)."""
    toks = tokens(text)
    starts = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    return F.array_distinct(
        F.transform(starts, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def minhash_signature(shingle_arr: Column, n_hashes: int = N_HASHES) -> Column:
    """MinHash signature as array<string>: component j is
    min over shingles of md5(j || ':' || shingle). Pure array expressions —
    no shuffle, no UDF; the j-indexed md5 family is reproducible in any
    engine with md5."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_hashes - 1)),
        lambda j: F.array_min(
            F.transform(
                shingle_arr,
                lambda s: F.md5(F.concat(j.cast("string"), F.lit(":"), s)),
            )
        ),
    )


def lsh_band_keys(sig: Column, n_bands: int = N_BANDS,
                  rows_per_band: int = ROWS_PER_BAND) -> Column:
    """Band keys: md5(b || '|' || sig[b*r+1..b*r+r] joined)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(n_bands - 1)),
        lambda b: F.md5(
            F.concat_ws(
                "|",
                b.cast("string"),
                *[
                    F.element_at(sig, b * F.lit(rows_per_band) + F.lit(r + 1))
                    for r in range(rows_per_band)
                ],
            )
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    min_tokens: int = SHINGLE_N,
) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b and estimated
    Jaccard (signature agreement fraction) >= threshold.
    """
    # Materialize the shingle array once; the 16 hash lambdas then reference
    # the bound column instead of re-deriving shingles per hash.
    sigs = (
        df.select(F.col(id_col), F.col(text_col))
        .filter(F.size(tokens(F.col(text_col))) >= min_tokens)
        .select(F.col(id_col), shingles(F.col(text_col)).alias("sh"))
        .select(F.col(id_col), minhash_signature(F.col("sh")).alias("sig"))
    )
    banded = sigs.select(
        F.col(id_col),
        F.col("sig"),
        F.explode(lsh_band_keys(F.col("sig"))).alias("band_key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.round(
        F.aggregate(
            F.zip_with(
                F.col("sig_a"),
                F.col("sig_b"),
                lambda x, y: F.when(x == y, 1).otherwise(0),
            ),
            F.lit(0),
            lambda acc, v: acc + v,
        ).cast("double")
        / F.lit(float(N_HASHES)),
        6,
    )
    return (
        cand.select("id_a", "id_b", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    min_tokens: int = SHINGLE_N,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for pairs sharing >= 1 shingle.

    Plan: explode distinct shingles -> self-equi-join on shingle (candidate
    generation) -> count shared per pair -> join per-doc shingle counts ->
    Jaccard. At 100 TB, run on LSH survivors only; hot shingles should be
    frequency-capped first (a stop-shingle filter) to avoid join skew.
    """
    sh = (
        df.select(F.col(id_col), F.col(text_col))
        .filter(F.size(tokens(F.col(text_col))) >= min_tokens)
        .select(
            F.col(id_col),
            F.explode(shingles(F.col(text_col))).alias("shingle"),
        )
    )
    counts = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ca = counts.select(
        F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")
    )
    cb = counts.select(
        F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")
    )
    jac = F.round(
        F.col("n_shared").cast("double")
        / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double"),
        6,
    )
    return (
        shared.join(ca, "id_a")
        .join(cb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# --- ANSI-SQL twins ----------------------------------------------------------

def sql_shingles(text: str, n: int = SHINGLE_N) -> str:
    return f"""
        list_distinct(list_transform(
            generate_series(1, len(string_split({text}, ' ')) - {n - 1}),
            i -> array_to_string(string_split({text}, ' ')[i:i+{n - 1}], ' ')))
    """


def sql_minhash_signature(shingle_expr: str, n_hashes: int = N_HASHES) -> str:
    return f"""
        list_transform(generate_series(0, {n_hashes - 1}), j ->
            list_min(list_transform({shingle_expr},
                s -> md5(j::VARCHAR || ':' || s))))
    """


def sql_lsh_band_keys(sig: str, n_bands: int = N_BANDS,
                      rows_per_band: int = ROWS_PER_BAND) -> str:
    parts = " || '|' || ".join(
        f"{sig}[b * {rows_per_band} + {r + 1}]" for r in range(rows_per_band)
    )
    return f"""
        list_transform(generate_series(0, {n_bands - 1}), b ->
            md5(b::VARCHAR || '|' || {parts}))
    """
