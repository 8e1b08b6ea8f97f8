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


def row_salt(
    df: DataFrame,
    n_salts: int,
    salt_from: str | Column | None = None,
) -> Column:
    """Deterministic per-row salt in [0, n_salts).

    Derive the salt from row-unique content, NOT from
    ``spark_partition_id``: if the skewed side arrives already partitioned
    by the join key (the exact situation salting exists for), a hot key
    sits in one partition, so hash(key, partition_id) is one constant per
    hot key — no splitting. ``monotonically_increasing_id`` is
    nondeterministic across task retries. So: hash a caller-supplied
    row-unique column (``salt_from``, e.g. a primary key) when given, else
    every HASHABLE column of the row (map columns can't be hashed by
    ``F.hash`` and are skipped) — retry-deterministic, and distinct rows
    of a hot key spread uniformly. (Exact duplicate rows share a salt;
    that skew is bounded by the duplication factor, not the key's row
    count — pass a unique ``salt_from`` if the input has heavy duplicate
    rows.)
    """
    if salt_from is not None:
        src = [F.col(salt_from) if isinstance(salt_from, str) else salt_from]
    else:
        from pyspark.sql.types import MapType

        src = [
            F.col(f.name)
            for f in df.schema.fields
            if not isinstance(f.dataType, MapType)
        ]
        if not src:
            raise ValueError(
                "row_salt: every column is an unhashable map type; pass "
                "salt_from to name a hashable salt source"
            )
    return F.pmod(F.hash(*src), F.lit(n_salts))


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_from: str | Column | None = None,
) -> DataFrame:
    """Equi-join robust to hot keys: the skewed side gets a deterministic
    per-row salt in [0, n_salts) (see row_salt — derived from row content,
    never partition id); the other side is replicated n_salts times
    (explode of a literal range). The shuffle key becomes (key, salt),
    splitting each hot key's rows across n_salts reducers.

    Left-side joins only (inner/left/left_semi/left_anti): the dim side is
    replicated n_salts times, so right/full outer would emit n_salts
    duplicates for each unmatched dim key. left_anti is safe — a dim key
    matches EVERY salt, so a skewed row survives iff its key is absent
    from dim, same as the unsalted anti join. Replicating the dim side
    costs n_salts x its size — use only when dim is small-ish but above
    the broadcast threshold.
    """
    allowed = ("inner", "left", "left_outer", "left_semi", "left_anti")
    if how not in allowed:
        raise ValueError(
            f"salted_join supports {'/'.join(allowed)}, not {how!r}: "
            "the replicated dim side would duplicate unmatched right rows"
        )
    salt = row_salt(skewed, n_salts, salt_from)
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
    salt = row_salt(df, n_salts)
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


# --- Incremental (mergeable) corpus statistics -------------------------------
#
# The incremental-view-maintenance pattern: keep per-source corpus stats as
# MERGEABLE partials (counts, sums, sums of squares, min/max), so a new
# ingest batch updates the stats table by merging its own partial — the
# base corpus is NEVER rescanned. Mean/variance derive from the partials at
# read time, so every stored field is a semigroup and merge is associative
# + commutative: stats(A) ⊕ stats(B) == stats(A ∪ B) exactly (the property
# test pins it). The squared sum is DECIMAL(38, 0): exact and overflow-safe
# where BIGINT would wrap (~1e12 rows of ~1e8-squared values); the derived
# variance clamps at 0 because the E[x²]−mean² form can cancel to a tiny
# negative under doubles (a Welford merge would avoid the cancellation but
# is not a plain SUM, losing the groupBy-mergeable shape this table is
# for).

STATS_FIELDS = ("n_rows", "sum_val", "sum_sq", "min_val", "max_val")


def source_stats_partial(docs: "DataFrame", key_col: str = "source",
                         n_col: str = "n_chars") -> "DataFrame":
    """Mergeable per-key partial over the integer ``n_col`` (fields are
    value-generic — n_col defaults to documents.n_chars, so the unit is
    CHARACTERS unless the caller passes a token-count column)."""
    n = F.col(n_col).cast("long")
    sq = F.col(n_col).cast("decimal(38, 0)")
    return docs.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(n).alias("sum_val"),
        F.sum(sq * sq).alias("sum_sq"),
        F.min(n).alias("min_val"),
        F.max(n).alias("max_val"),
    )


def merge_source_stats(cur: "DataFrame", delta: "DataFrame",
                       key_col: str = "source") -> "DataFrame":
    """⊕: combine two partial-stats tables (outer union on the key)."""
    return (
        cur.unionByName(delta)
        .groupBy(key_col)
        .agg(
            F.sum("n_rows").alias("n_rows"),
            F.sum("sum_val").alias("sum_val"),
            F.sum("sum_sq").cast("decimal(38, 0)").alias("sum_sq"),
            F.min("min_val").alias("min_val"),
            F.max("max_val").alias("max_val"),
        )
    )


def finalize_source_stats(partials: "DataFrame") -> "DataFrame":
    """Derive the read-time view (mean, variance) from the partials;
    variance clamps at 0 (see module note on cancellation)."""
    n = F.col("n_rows").cast("double")
    mean = F.col("sum_val").cast("double") / n
    var = F.col("sum_sq").cast("double") / n - mean * mean
    return partials.select(
        "*",
        F.round(mean, 6).alias("mean_val"),
        F.round(F.greatest(var, F.lit(0.0)), 6).alias("var_val"),
    )


# --- KMV (k-minimum-values) distinct sketch -----------------------------------
#
# The mergeable approximate-distinct sketch whose whole trajectory is
# ENGINE-REPLAYABLE: unlike HLL (register layout and hashing are
# engine-internal, so events_approx_distinct_users stays rows-only), KMV
# is "keep the k smallest hash fractions of the key set" — pure order
# statistics over md5, which DuckDB replays bit-for-bit, so the estimate
# gets a real hash-checked oracle. Estimator (Bar-Yossef et al. 2002):
# with v_k the k-th smallest of n >= k distinct uniform draws in (0,1),
# E[v_k] ~ k/(n+1), so n ~ (k-1)/v_k (the unbiased form); below k
# distinct keys the sketch IS the key set and the count is exact.
# Merge is "union the lists, re-take the k smallest" — associative,
# commutative, idempotent on duplicates (same key -> same hash), which
# the property test pins: sketch(A) ⊕ sketch(B) == sketch(A ∪ B)
# EXACTLY, the shape that lets 100 TB of per-partition/per-day partials
# roll up without rescanning anything.

KMV_K = 256
# 15 hex digits = 60 bits: exact in BIGINT, NOT in the double mantissa
# (53 bits) — the /16^15 division rounds. Engine parity rests on both
# engines applying identical IEEE-754 round-to-nearest to the same
# 60-bit integer, not on the quotient being exact; post-rounding
# collisions between distinct 60-bit values cost at most a negligible
# distinct-count underestimate (same on both engines).
_KMV_SCALE = float(16 ** 15)


def kmv_fraction(key: Column) -> Column:
    """md5 of the key's string form -> uniform double in (0, 1).
    Engine-portable (DuckDB twin: ``CAST(('0x' || substr(md5(x), 1, 15))
    AS BIGINT) / 16.0^15``)."""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10)
        .cast("long")
        / F.lit(_KMV_SCALE)
    )


def kmv_partial(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """Per-group sketch state: the SORTED array of the k smallest
    distinct hash fractions (column ``kmv``). Duplicate keys collapse
    via the pre-aggregation distinct — the sketch is multiset-blind by
    construction, not by luck. NULL keys are EXCLUDED up front (the
    ``COUNT(DISTINCT key)`` contract; a NULL hash fraction would
    otherwise burn a top-k slot under Spark's nulls-first ordering and
    then vanish in collect_list, silently shrinking the sketch — and
    DuckDB sorts NULLs last, so the engines would diverge). Scale: one
    shuffle of the distinct (group, key) pairs, then a PARTITIONED
    window top-k (sort-based, spillable); the sketch state leaving the
    stage is <= k doubles per group."""
    from pyspark.sql import Window

    u = (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, kmv_fraction(F.col(key_col)).alias("_u"))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy("_u")
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("_u")).alias("kmv"))
    )


def kmv_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """⊕: union two sketch tables, re-take the k smallest per group
    (array_distinct absorbs keys present in both sides)."""
    return kmv_rollup(a.unionByName(b), group_cols, k)


def kmv_rollup(
    partials: DataFrame, group_cols: list[str], k: int = KMV_K
) -> DataFrame:
    """n-ary ⊕ in one grouped pass: collapse finer-grained partials
    (e.g. per (type, day)) up to ``group_cols`` by unioning the lists
    and re-taking the k smallest — the incremental-view rollup that
    never rescans the base data."""
    return partials.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))),
            1,
            k,
        ).alias("kmv")
    )


def kmv_estimate(partials: DataFrame, k: int = KMV_K) -> DataFrame:
    """Read-time view: (group cols, n_sampled, kmv_distinct). Exact when
    the group held fewer than k distinct keys; otherwise floor((k-1)/v_k)
    (floor, not round: both engines floor identically, round-half rules
    differ)."""
    n = F.size("kmv")
    vk = F.element_at("kmv", -1)
    return partials.select(
        *[c for c in partials.columns if c != "kmv"],
        n.alias("n_sampled"),
        F.when(n < k, n.cast("long"))
        .otherwise(F.floor((F.lit(float(k - 1)) / vk)))
        .alias("kmv_distinct"),
    )


def sql_kmv_distinct(
    group_col: str, key_col: str, table: str, k: int = KMV_K
) -> str:
    """DuckDB twin of kmv_partial |> kmv_estimate (embed as a full query)."""
    return f"""
    WITH du AS (
        SELECT DISTINCT {group_col},
               CAST(('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))
                    AS BIGINT) / {_KMV_SCALE!r} AS u
        FROM {table}
        WHERE {key_col} IS NOT NULL
    ),
    rk AS (
        SELECT {group_col}, u,
               ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY u) AS rn
        FROM du
    )
    SELECT {group_col},
           CAST(COUNT(*) AS INT) AS n_sampled,
           CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS BIGINT)
                ELSE CAST(FLOOR({float(k - 1)!r} / MAX(u)) AS BIGINT)
           END AS kmv_distinct
    FROM rk
    WHERE rn <= {k}
    GROUP BY {group_col}
    """


def kmv_set_ops(
    partials: DataFrame, group_col: str, k: int = KMV_K
) -> DataFrame:
    """KMV multiset algebra (Beyer et al., SIGMOD 2007) over a sketch
    table: for every unordered pair of groups, estimate |A ∪ B|,
    |A ∩ B| and Jaccard FROM THE SKETCHES ALONE — no rescan of the base
    data, the whole point of keeping mergeable per-group sketches at
    100 TB.

    Per pair: the union sketch ``u`` is the k smallest of
    ``kmv_a ∪ kmv_b`` (an element of ``u`` that belongs to A is
    necessarily in A's own sketch — A ⊆ A∪B makes A's k-th-smallest
    threshold no smaller than the union's — so sketch membership tests
    are exact); ``k_int`` counts union-sketch elements present in BOTH
    sketches. Estimators: union = (k-1)/v_k (exact when |u| < k),
    intersection = k_int · union / |u| via exact BIGINT arithmetic
    (``div``; both engines truncate positives identically, no float in
    the product), Jaccard = k_int / |u|. The pair join is over GROUPS
    (one sketch row each), not base rows — a broadcast nested-loop over
    G sketch rows costs G², independent of data volume."""
    a = partials.select(
        F.col(group_col).alias("type_a"), F.col("kmv").alias("kmv_a")
    )
    b = partials.select(
        F.col(group_col).alias("type_b"), F.col("kmv").alias("kmv_b")
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    calc = pairs.select(
        "type_a",
        "type_b",
        F.slice(
            F.array_sort(F.array_distinct(F.concat("kmv_a", "kmv_b"))),
            1,
            k,
        ).alias("u"),
        F.size(
            F.array_intersect(
                F.array_intersect(
                    F.slice(
                        F.array_sort(
                            F.array_distinct(F.concat("kmv_a", "kmv_b"))
                        ),
                        1,
                        k,
                    ),
                    "kmv_a",
                ),
                "kmv_b",
            )
        ).alias("k_int"),
    ).select(
        "type_a",
        "type_b",
        F.size("u").alias("n_u"),
        F.element_at("u", -1).alias("vk"),
        "k_int",
    )
    union_est = F.when(
        F.col("n_u") < k, F.col("n_u").cast("long")
    ).otherwise(F.floor(F.lit(float(k - 1)) / F.col("vk")))
    return calc.select(
        "type_a",
        "type_b",
        union_est.alias("union_distinct"),
        F.when(F.col("n_u") < k, F.col("k_int").cast("long"))
        .otherwise(
            F.expr(
                f"CAST(k_int AS BIGINT) * "
                f"CAST(FLOOR({float(k - 1)!r} / vk) AS BIGINT) div {k}"
            )
        )
        .alias("intersect_distinct"),
        F.round(
            F.col("k_int").cast("double") / F.col("n_u"), 6
        ).alias("jaccard"),
    )


def sql_kmv_set_ops(
    group_col: str, key_col: str, table: str, k: int = KMV_K
) -> str:
    """DuckDB twin of kmv_partial |> kmv_set_ops (embed as a full query)."""
    return f"""
    WITH du AS (
        SELECT DISTINCT {group_col},
               CAST(('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))
                    AS BIGINT) / {_KMV_SCALE!r} AS u
        FROM {table}
        WHERE {key_col} IS NOT NULL
    ),
    rk AS (
        SELECT {group_col}, u,
               ROW_NUMBER() OVER (PARTITION BY {group_col} ORDER BY u) AS rn
        FROM du
    ),
    sk AS (
        SELECT {group_col}, list(u ORDER BY u) AS kmv
        FROM rk WHERE rn <= {k} GROUP BY {group_col}
    ),
    pairs AS (
        SELECT a.{group_col} AS type_a, b.{group_col} AS type_b,
               a.kmv AS kmv_a, b.kmv AS kmv_b,
               list_slice(list_sort(list_distinct(
                   list_concat(a.kmv, b.kmv))), 1, {k}) AS u
        FROM sk a JOIN sk b ON a.{group_col} < b.{group_col}
    ),
    calc AS (
        SELECT type_a, type_b, len(u) AS n_u, u[-1] AS vk,
               len(list_intersect(list_intersect(u, kmv_a), kmv_b)) AS k_int
        FROM pairs
    )
    SELECT type_a, type_b,
           CASE WHEN n_u < {k} THEN CAST(n_u AS BIGINT)
                ELSE CAST(FLOOR({float(k - 1)!r} / vk) AS BIGINT)
           END AS union_distinct,
           CASE WHEN n_u < {k} THEN CAST(k_int AS BIGINT)
                ELSE (CAST(k_int AS BIGINT)
                      * CAST(FLOOR({float(k - 1)!r} / vk) AS BIGINT)) // {k}
           END AS intersect_distinct,
           ROUND(CAST(k_int AS DOUBLE) / n_u, 6) AS jaccard
    FROM calc
    """


# --- Deterministic HLL (engine-replayable HyperLogLog registers) --------------
#
# The register-based sibling of the KMV sketch above. Spark's built-in
# approx_count_distinct is HLL++ with engine-internal hashing and
# register packing, so it can never be hash-checked against DuckDB
# (events_approx_distinct_users stays rows-only); THIS implementation
# derives both the bucket index and the leading-zero run from the md5
# hex string with pure string/arithmetic expressions that both engines
# evaluate identically, so the whole sketch trajectory — registers,
# merge, estimate — replays bit-for-bit in DuckDB and gets a real
# hash-checked oracle. Estimator per Flajolet et al. 2007 (HyperLogLog):
# E = alpha_m * m^2 / sum_j 2^(-M_j), with linear counting
# (E' = m * ln(m / V), V = zero registers) below 2.5m. Large-range
# correction is omitted: it engages near 2^32/30 distinct keys per
# group, far beyond any per-group cardinality the estimator is used for
# here, and p=8's +-6.5% error would dominate long before.
#
# Determinism across engines, term by term:
# * bucket/rho: substr/regexp_replace/CASE over the md5 hex — exact.
# * harmonic sum: each 2^(61-rho) term is an INTEGER (rho in [1, 61]);
#   summed exactly (Spark DECIMAL(38,0), DuckDB HUGEINT) — no float
#   accumulation order to diverge. The one cast to DOUBLE rounds the
#   same exact integer on both engines.
# * estimate: a single division of two identical doubles, then FLOOR
#   (round-half rules differ between engines; floor does not). The
#   linear-counting branch's ln() is the only libm call — a 1-ulp libm
#   divergence flips the floor only when m*ln(m/V) sits within ~1e-10
#   of an integer, which m=256 and integer V make irrational (never
#   exactly integral for V in [1, 255]).
#
# Scale shape: register state is <= m (bucket, rho) smallint pairs per
# group, built by one MAX aggregation over (group, bucket) — partial
# (map-side) aggregation collapses each input split to <= m rows per
# group before the shuffle, and merge/rollup is the same MAX, so per-day
# partials roll up without rescanning history (mirrors kmv_rollup).

HLL_P = 8
HLL_M = 1 << HLL_P  # 256 registers; relative error ~ 1.04/sqrt(m) = 6.5%
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
# numerator alpha * m^2 * 2^61 precomputed in Python: one double literal
# embedded verbatim in BOTH engines' expressions
_HLL_NUM = _HLL_ALPHA * HLL_M * HLL_M * float(2**61)
_HLL_LC_CUT = 2.5 * HLL_M


def hll_bucket_rho(key: Column) -> tuple[Column, Column]:
    """(bucket, rho) from md5(key): bucket = first 2 hex digits (8
    bits); rho = 1 + number of leading zero bits in the NEXT 60 bits
    (15 hex digits), computed by stripping leading '0' hex digits (4
    zero bits each) and classifying the first surviving nibble — string
    ops both engines replay exactly, unlike float log2 tricks."""
    h = F.md5(key.cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    h15 = F.substring(h, 3, 15)
    stripped = F.regexp_replace(h15, "^0+", "")
    first = F.substring(stripped, 1, 1)
    nibble_lz = (
        F.when(first.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
        .when(first.isin("4", "5", "6", "7"), 1)
        .when(first.isin("2", "3"), 2)
        .otherwise(3)
    )
    rho = (
        F.when(F.length(stripped) == 0, F.lit(61))
        .otherwise(
            (F.lit(15) - F.length(stripped)) * 4 + nibble_lz + 1
        )
        .cast("int")
    )
    return bucket, rho


def hll_partial(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """Per-group register state: (group_cols..., bucket, rho) with
    rho = MAX over the group's keys hashing to that bucket. Duplicate
    keys are idempotent under MAX by construction (same key -> same
    (bucket, rho)), so no pre-distinct pass is needed — one partial-agg
    friendly MAX straight off the scan. NULL keys are excluded (the
    COUNT(DISTINCT key) contract, same as kmv_partial)."""
    bucket, rho = hll_bucket_rho(F.col(key_col))
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_rollup(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """n-ary ⊕ in one grouped pass: registers merge by per-bucket MAX.
    Collapses finer-grained partials (e.g. per (type, day)) up to
    ``group_cols`` — associative, commutative, idempotent, so
    sketch(A) ⊕ sketch(B) == sketch(A ∪ B) EXACTLY."""
    return partials.groupBy(*group_cols, "bucket").agg(
        F.max("rho").alias("rho")
    )


def hll_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Binary ⊕: union two register tables, re-take the per-bucket MAX."""
    return hll_rollup(a.unionByName(b), group_cols)


def hll_estimate_detail(
    registers: DataFrame, group_cols: list[str]
) -> DataFrame:
    """hll_estimate plus the branch indicator: (group_cols...,
    n_registers, hll_distinct, lc_branch). ``lc_branch`` is TRUE when
    the estimate came from the linear-counting branch (raw estimate
    <= 2.5m AND at least one zero register) — exposing it as a result
    column makes WHICH branch produced each row part of the
    hash-checked contract, so a driver green on a fixture known to sit
    in the LC regime proves the ln() path executed (not just that both
    engines agreed on some number)."""
    m = HLL_M
    term = F.expr("shiftleft(CAST(1 AS BIGINT), 61 - rho)").cast(
        "decimal(38,0)"
    )
    agg = registers.groupBy(*group_cols).agg(
        F.sum(term).alias("_present_sum"),
        F.count(F.lit(1)).alias("_n_present"),
    )
    total = (
        F.col("_present_sum")
        + (F.lit(m) - F.col("_n_present"))
        * F.lit(2**61).cast("decimal(38,0)")
    ).cast("double")
    e_raw = F.lit(_HLL_NUM) / total
    v = F.lit(m) - F.col("_n_present")  # zero registers
    lc = (e_raw <= F.lit(_HLL_LC_CUT)) & (v > 0)
    e = F.when(
        lc, F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(e_raw)
    return agg.select(
        *group_cols,
        F.col("_n_present").cast("int").alias("n_registers"),
        F.floor(e).cast("long").alias("hll_distinct"),
        lc.alias("lc_branch"),
    )


def hll_estimate(
    registers: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Read-time view over a register table: (group_cols...,
    n_registers, hll_distinct). Harmonic sum is computed over EXACT
    integer terms 2^(61-rho) in DECIMAL(38,0) (absent buckets
    contribute rho=0 -> 2^61 each, added in closed form), then one
    cast to double, one division, and the linear-counting branch below
    2.5m — see the block comment above for why every step is
    engine-deterministic. (hll_estimate_detail carries the shared
    implementation and additionally exposes the branch indicator.)"""
    return hll_estimate_detail(registers, group_cols).drop("lc_branch")


def sql_hll_registers(group_col: str, key_col: str, table: str) -> str:
    """DuckDB twin of hll_partial (a CTE body: SELECT group, bucket,
    rho registers)."""
    return f"""
        SELECT {group_col},
               CAST(('0x' || substr(h, 1, 2)) AS BIGINT) AS bucket,
               MAX(CASE WHEN stripped = '' THEN 61
                        ELSE (15 - length(stripped)) * 4
                             + CASE WHEN substr(stripped, 1, 1) IN
                                        ('8','9','a','b','c','d','e','f')
                                    THEN 0
                                    WHEN substr(stripped, 1, 1) IN
                                        ('4','5','6','7') THEN 1
                                    WHEN substr(stripped, 1, 1) IN
                                        ('2','3') THEN 2
                                    ELSE 3 END + 1
                   END) AS rho
        FROM (
            SELECT {group_col}, h,
                   regexp_replace(substr(h, 3, 15), '^0+', '') AS stripped
            FROM (
                SELECT {group_col},
                       md5(CAST({key_col} AS VARCHAR)) AS h
                FROM {table}
                WHERE {key_col} IS NOT NULL
            )
        )
        GROUP BY {group_col}, CAST(('0x' || substr(h, 1, 2)) AS BIGINT)
    """


def sql_hll_estimate_from_registers(
    group_col: str, registers_cte: str, detail: bool = False
) -> str:
    """DuckDB twin of hll_estimate over a named registers CTE;
    ``detail=True`` additionally emits the lc_branch indicator
    (hll_estimate_detail's twin). The branch predicate reuses the same
    float literals embedded verbatim on both engines."""
    m = HLL_M
    lc_pred = (
        f"{_HLL_NUM!r} / total_d <= {_HLL_LC_CUT!r}"
        f" AND ({m} - n_present) > 0"
    )
    lc_col = f",\n               ({lc_pred}) AS lc_branch" if detail else ""
    return f"""
        SELECT {group_col},
               CAST(n_present AS INT) AS n_registers,
               CAST(FLOOR(
                   CASE WHEN {lc_pred}
                        THEN {float(m)!r} * LN({float(m)!r} / ({m} - n_present))
                        ELSE {_HLL_NUM!r} / total_d
                   END) AS BIGINT) AS hll_distinct{lc_col}
        FROM (
            SELECT {group_col},
                   COUNT(*) AS n_present,
                   CAST(SUM(CAST(1 AS BIGINT) << (61 - rho))
                        + CAST({m} - COUNT(*) AS HUGEINT)
                          * (CAST(1 AS BIGINT) << 61)
                        AS DOUBLE) AS total_d
            FROM {registers_cte}
            GROUP BY {group_col}
        )
    """


def sql_hll_distinct(group_col: str, key_col: str, table: str) -> str:
    """DuckDB twin of hll_partial |> hll_estimate (a full query)."""
    return f"""
    WITH hll_regs AS (
        {sql_hll_registers(group_col, key_col, table)}
    )
    {sql_hll_estimate_from_registers(group_col, "hll_regs")}
    """


# --- Deterministic Bloom filter (mergeable set-membership sketch) ------------
#
# Third member of the engine-replayable sketch family (KMV above: distinct
# order statistics; HLL above: distinct registers; Bloom: SET MEMBERSHIP).
# The 100 TB use is decontamination / blocklisting: a benchmark, canary, or
# banned-key set sketched into m bits is BROADCASTABLE (m/63 BIGINT words
# per group, ~8 KB at the default 4096 bits) where the exact key set would
# need a shuffle join; probes are then map-side. One-sided error: a present
# key is ALWAYS reported maybe-present (no false negatives — the property
# decontamination needs: you never miss a real hit), an absent key is
# maybe-present with p ~ (1 - e^(-k*n/m))^k.
#
# Engine determinism, same recipe as the HLL: bit positions come from
# md5("<j>:<key>") hex via conv/CAST (exact 60-bit integers, mod m), words
# pack 63 bits per BIGINT — bit 63 (the sign bit) is deliberately unused
# because DuckDB raises on 1::BIGINT << 63 while Spark wraps negative, the
# one place the two engines' shift semantics diverge. bit_or is
# associative/commutative/idempotent, so partial -> rollup -> merge follow
# the exact algebra of kmv_*/hll_* and sketch(A) ⊕ sketch(B) ==
# sketch(A ∪ B) bit-for-bit.

BLOOM_M_BITS = 4096   # bits per group sketch (64.5 words; ~8 KB serialized)
BLOOM_K = 5           # hash probes per key
_BLOOM_WORD_BITS = 63  # bits packed per BIGINT word (sign bit unused)


def _sketch_pos(key: Column, j: int, modulus: int) -> Column:
    """j-th deterministic position of ``key`` in [0, modulus): 60 bits of
    md5("<j>:<key>") taken exactly on both engines (conv of 15 hex digits
    fits BIGINT), reduced mod ``modulus``. Shared by Bloom and CMS."""
    h = F.md5(F.concat(F.lit(f"{j}:"), key.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint") % F.lit(
        modulus
    )


def bloom_partial(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Per-group Bloom bit table: (group_cols..., word, bits) where bits
    OR-accumulates the k probe positions of every non-NULL key. Duplicate
    keys are idempotent under OR; one partial-agg-friendly bit_or pass —
    map-side combine collapses each split to <= m/63 rows per group
    before the shuffle, the same scale shape as hll_partial's MAX."""
    wb = _BLOOM_WORD_BITS
    pos = F.explode(
        F.array(
            *[_sketch_pos(F.col(key_col), j, m_bits) for j in range(k)]
        )
    ).alias("pos")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, pos)
        .select(
            *group_cols,
            F.expr(f"pos DIV {wb}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {wb} AS INT))"
            ).alias("mask"),
        )
        .groupBy(*group_cols, "word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_rollup(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """n-ary ⊕: word tables merge by per-word bit_or — associative,
    commutative, idempotent, so finer partials (per day, per source)
    collapse to coarser sketches without rescanning history."""
    return partials.groupBy(*group_cols, "word").agg(
        F.bit_or("bits").alias("bits")
    )


def bloom_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Binary ⊕: union two word tables, re-OR per word."""
    return bloom_rollup(a.unionByName(b), group_cols)


def bloom_maybe_contains(
    sketch: DataFrame,
    probes: DataFrame,
    group_cols: list[str],
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """Membership probe: returns ``probes``'s (group_cols..., key_col)
    rows plus ``maybe_member`` — TRUE iff ALL k probe bits are set. The
    sketch side is broadcast (<= m/63 rows per group by construction),
    so the probe is a map-side join over the (large) probe set: the
    broadcast-the-small-set shape that replaces a shuffle semi-join at
    scale."""
    wb = _BLOOM_WORD_BITS
    probe_rows = probes.select(
        *group_cols,
        F.col(key_col),
        F.posexplode(
            F.array(
                *[_sketch_pos(F.col(key_col), j, m_bits) for j in range(k)]
            )
        ).alias("_j", "pos"),
    ).select(
        *group_cols,
        key_col,
        F.expr(f"pos DIV {wb}").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {wb} AS INT))"
        ).alias("mask"),
    )
    joined = probe_rows.join(
        F.broadcast(sketch), [*group_cols, "word"], "left"
    )
    hit = (
        F.col("bits").isNotNull()
        & (F.expr("bits & mask") == F.col("mask"))
    ).cast("int")
    return joined.groupBy(*group_cols, key_col).agg(
        (F.sum(hit) == F.lit(k)).alias("maybe_member")
    )


def sql_bloom_bits(
    group_col: str,
    key_col: str,
    table: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> str:
    """DuckDB twin of bloom_partial (a CTE body)."""
    wb = _BLOOM_WORD_BITS
    return f"""
        SELECT {group_col}, pos // {wb} AS word,
               bit_or(CAST(1 AS BIGINT)
                      << CAST(pos % {wb} AS INTEGER)) AS bits
        FROM (
            SELECT {group_col},
                   CAST(('0x' || substr(md5(j::VARCHAR || ':'
                        || CAST({key_col} AS VARCHAR)), 1, 15))
                        AS BIGINT) % {m_bits} AS pos
            FROM {table}, generate_series(0, {k - 1}) t(j)
            WHERE {key_col} IS NOT NULL
        )
        GROUP BY {group_col}, pos // {wb}
    """


def sql_bloom_maybe_contains(
    group_col: str,
    key_col: str,
    probes_cte: str,
    sketch_cte: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> str:
    """DuckDB twin of bloom_maybe_contains over named CTEs."""
    wb = _BLOOM_WORD_BITS
    return f"""
        SELECT {group_col}, {key_col},
               (SUM(CASE WHEN s.bits IS NOT NULL
                          AND (s.bits & p.mask) = p.mask
                         THEN 1 ELSE 0 END) = {k}) AS maybe_member
        FROM (
            SELECT {group_col}, {key_col}, pos // {wb} AS word,
                   CAST(1 AS BIGINT)
                       << CAST(pos % {wb} AS INTEGER) AS mask
            FROM (
                SELECT {group_col}, {key_col},
                       CAST(('0x' || substr(md5(j::VARCHAR || ':'
                            || CAST({key_col} AS VARCHAR)), 1, 15))
                            AS BIGINT) % {m_bits} AS pos
                FROM {probes_cte}, generate_series(0, {k - 1}) t(j)
            )
        ) p
        LEFT JOIN {sketch_cte} s USING ({group_col}, word)
        GROUP BY {group_col}, {key_col}
    """


# --- Deterministic Count-Min Sketch (mergeable frequency sketch) -------------
#
# Fourth family member: FREQUENCY. depth x width counter grid; each key
# increments one counter per row (position = row-salted hash), estimate =
# MIN over the key's depth counters. One-sided error: est >= true count
# always; overestimate <= 2N/width with prob 1 - 2^-depth (Cormode &
# Muthukrishnan 2005). Counters are plain SUMs, so partials merge by
# addition — the same partial/rollup/estimate algebra as KMV/HLL/Bloom,
# and the state per group is <= depth*width longs regardless of input.
# The 100 TB use: per-key frequency (heavy hitters, throttling thresholds,
# negative-sampling weights) where exact per-key counts would shuffle the
# full key space; the sketch is groupBy'd on (row, col) — a FIXED key
# domain — so the shuffle is bounded by depth*width, not by keys.

CMS_DEPTH = 4
CMS_WIDTH = 512


def cms_partial(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Per-group counter grid: (group_cols..., row, col, cnt). One
    explode(depth) + one partial-agg SUM; map-side combine bounds the
    shuffle at depth*width rows per group per split."""
    rc = F.posexplode(
        F.array(
            *[_sketch_pos(F.col(key_col), j, width) for j in range(depth)]
        )
    ).alias("row", "col")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(*group_cols, rc)
        .groupBy(*group_cols, "row", "col")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_rollup(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """n-ary ⊕: counters merge by per-(row, col) SUM."""
    return partials.groupBy(*group_cols, "row", "col").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    return cms_rollup(a.unionByName(b), group_cols)


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    group_cols: list[str],
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-query estimates: ``probes``'s (group_cols..., key_col) rows
    plus ``cms_count`` = MIN over the key's depth counters (absent
    counter cell -> 0). Sketch broadcast: <= depth*width rows/group."""
    probe_rows = probes.select(
        *group_cols,
        F.col(key_col),
        F.posexplode(
            F.array(
                *[_sketch_pos(F.col(key_col), j, width) for j in range(depth)]
            )
        ).alias("row", "col"),
    )
    joined = probe_rows.join(
        F.broadcast(sketch), [*group_cols, "row", "col"], "left"
    )
    return joined.groupBy(*group_cols, key_col).agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("bigint"))).alias(
            "cms_count"
        )
    )


def sql_cms_counters(
    group_col: str,
    key_col: str,
    table: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB twin of cms_partial (a CTE body)."""
    return f"""
        SELECT {group_col}, j AS row, pos AS col,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM (
            SELECT {group_col}, j,
                   CAST(('0x' || substr(md5(j::VARCHAR || ':'
                        || CAST({key_col} AS VARCHAR)), 1, 15))
                        AS BIGINT) % {width} AS pos
            FROM {table}, generate_series(0, {depth - 1}) t(j)
            WHERE {key_col} IS NOT NULL
        )
        GROUP BY {group_col}, j, pos
    """


def sql_cms_estimate(
    group_col: str,
    key_col: str,
    probes_cte: str,
    sketch_cte: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> str:
    """DuckDB twin of cms_estimate over named CTEs."""
    return f"""
        SELECT {group_col}, {key_col},
               MIN(COALESCE(s.cnt, 0)) AS cms_count
        FROM (
            SELECT {group_col}, {key_col}, j AS row,
                   CAST(('0x' || substr(md5(j::VARCHAR || ':'
                        || CAST({key_col} AS VARCHAR)), 1, 15))
                        AS BIGINT) % {width} AS col
            FROM {probes_cte}, generate_series(0, {depth - 1}) t(j)
        ) p
        LEFT JOIN {sketch_cte} s USING ({group_col}, row, col)
        GROUP BY {group_col}, {key_col}
    """


# --- Bloom-pruned semi join (map-side sketch filter) -------------------------
#
# The join-acceleration face of the Bloom sketch: the sketched key set's
# word table is <= m/63 BIGINT words (~66 longs at the default 4096 bits),
# small enough to COLLECT AT PLAN-BUILD TIME and embed as a literal array
# expression — the membership test then runs inside the scan stage (pure
# column arithmetic inside whole-stage codegen, zero shuffle), and only
# maybe-members reach the exact verification semi-join. No false negatives
# ⇒ the final result EQUALS the plain semi-join exactly; false positives
# only cost verify-join input. This is the scan-probe shape for 100 TB
# against a small key set: the alternative (shuffle semi-join of the full
# scan) moves the big side; this moves ~66 longs. (The bounded driver-side
# collect follows the approxQuantile precedent in operators/sampling.py —
# a plan-build-time action over a provably tiny frame.)


def bloom_filter_expr(
    sketch: DataFrame,
    key: Column,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> Column:
    """Boolean Column: does ``key`` probe maybe-present in the (global,
    ungrouped) Bloom ``sketch``? Collects the word table (<= m_bits/63
    rows by construction) and embeds it as a literal array, making the
    predicate map-side. NULL keys yield NULL (filter-false), matching
    semi-join semantics."""
    from functools import reduce

    wb = _BLOOM_WORD_BITS
    n_words = (m_bits + wb - 1) // wb
    words = {r["word"]: r["bits"] for r in sketch.collect()}
    arr = F.array(
        *[
            F.lit(int(words.get(w, 0))).cast("bigint")
            for w in range(n_words)
        ]
    )
    conds = []
    for j in range(k):
        pos = _sketch_pos(key, j, m_bits)
        word = F.floor(pos / wb).cast("int")  # pos >= 0: floor == div
        bit = (pos % wb).cast("int")
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("bigint"), bit
        )
        elem = F.element_at(arr, word + F.lit(1))
        conds.append(elem.bitwiseAND(mask) == mask)
    return reduce(lambda a, b: a & b, conds)


def bloom_pruned_semi_join(
    big: DataFrame,
    keys: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """``big`` semi-joined to ``keys``'s key set, accelerated by a
    map-side Bloom pre-filter: sketch the key set, prune ``big`` in the
    scan stage via bloom_filter_expr, then exactly verify the survivors
    with a broadcast semi-join (the key set is small — that is the
    operator's premise; were it not, the verify join would shuffle only
    the pruned survivors). Result is row-identical to
    ``big.join(keys, key_col, "left_semi")`` — the sketch buys scan-side
    pruning, never approximation."""
    sketch = bloom_partial(keys, [], key_col, m_bits, k)
    pred = bloom_filter_expr(sketch, F.col(key_col), m_bits, k)
    verified_keys = keys.select(key_col).distinct()
    return big.filter(pred).join(
        F.broadcast(verified_keys), key_col, "left_semi"
    )


# --- Deterministic fixed-boundary histogram (mergeable quantile sketch) ------
#
# Fifth family member: QUANTILES. Streaming-quantile sketches (t-digest,
# KLL, GK) are merge-order-sensitive — their state depends on the order
# partials combine, so no cross-engine hash check can pin them. A
# fixed-boundary histogram gives up adaptivity to keep the algebra exact:
# bins are declared up front (lo, hi, n_bins), counts merge by SUM
# (associative/commutative — same shuffle-bounded shape as CMS: the
# groupBy domain is the FIXED bin space, never the value space), and
# quantiles interpolate linearly inside the covering bin at read time.
# Error is bounded by one bin width; values outside [lo, hi) clamp into
# the edge bins (their mass is counted, the clamp is visible in the edge
# counts). The 100 TB use: per-source length/score/latency quantiles
# without a global sort — the exact competitor (exact_global_ntile /
# source_length_quantiles) ranks the full data; this reads d=n_bins longs
# per group.

HIST_N_BINS = 64


def hist_partial(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = HIST_N_BINS,
) -> DataFrame:
    """Per-group bin counts: (group_cols..., bin, cnt). NULL values are
    excluded (the aggregate contract); out-of-range values clamp to the
    edge bins. One partial-agg-friendly COUNT over the fixed bin
    domain."""
    width = (hi - lo) / n_bins
    v = F.col(value_col).cast("double")
    b = F.least(
        F.greatest(
            F.floor((v - F.lit(float(lo))) / F.lit(width)), F.lit(0)
        ),
        F.lit(n_bins - 1),
    ).cast("int")
    return (
        df.filter(v.isNotNull())
        .select(*group_cols, b.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def hist_rollup(partials: DataFrame, group_cols: list[str]) -> DataFrame:
    """n-ary ⊕: bin counts merge by per-bin SUM."""
    return partials.groupBy(*group_cols, "bin").agg(
        F.sum("cnt").alias("cnt")
    )


def hist_merge(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    return hist_rollup(a.unionByName(b), group_cols)


def hist_quantiles(
    sketch: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = HIST_N_BINS,
) -> DataFrame:
    """Read-time quantile view: one row per (group, q) with the linear
    interpolation inside the covering bin:
    est = lo + (bin + (target − cum_before)/cnt) · width, target = q·n.
    The covering bin is the first with cum >= target (ties resolved by
    the strict cum_before < target), found by a cumulative-sum window
    over the <= n_bins rows per group — every arithmetic step is written
    identically in the SQL twin, so estimates hash-check.

    ``qs`` must lie in (0, 1]: q=0 makes target=0, which no bin can
    cover under the strict cum_before < target bound, so the row would
    silently VANISH rather than return ``lo`` (identically in the SQL
    twin — parity-safe but an API trap, r10 ADVICE item 3). Guarded
    here instead of special-cased so both graders stay line-identical;
    callers wanting the minimum should read the lowest non-empty bin."""
    bad = [q for q in qs if not (0.0 < q <= 1.0)]
    if bad:
        raise ValueError(
            f"hist_quantiles: qs must be in (0, 1], got {bad} — q=0 "
            "cannot satisfy the covering-bin bound and would drop its "
            "row silently"
        )
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    w = Window.partitionBy(*group_cols).orderBy("bin")
    cum = sketch.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "cum_before", F.col("cum") - F.col("cnt")
    )
    totals = sketch.groupBy(*group_cols).agg(F.sum("cnt").alias("n"))
    qdf = totals.select(
        *group_cols,
        "n",
        F.explode(
            F.array(*[F.lit(float(q)) for q in qs])
        ).alias("q"),
    ).withColumn("target", F.col("q") * F.col("n").cast("double"))
    # empty group_cols (one global histogram): join([], ...) matches no
    # rows in Spark — the group-free equi-join is a cross join
    paired = (
        qdf.join(cum, group_cols) if group_cols else qdf.crossJoin(cum)
    )
    joined = paired.filter(
        (F.col("cum").cast("double") >= F.col("target"))
        & (F.col("cum_before").cast("double") < F.col("target"))
    )
    est = F.lit(float(lo)) + (
        F.col("bin").cast("double")
        + (F.col("target") - F.col("cum_before").cast("double"))
        / F.col("cnt").cast("double")
    ) * F.lit(width)
    return joined.select(
        *group_cols,
        "q",
        F.round(est, 6).alias("hist_quantile"),
        F.col("n"),
    )


def sql_hist_counts(
    group_col: str,
    value_col: str,
    table: str,
    lo: float,
    hi: float,
    n_bins: int = HIST_N_BINS,
) -> str:
    """DuckDB twin of hist_partial (a CTE body)."""
    width = (hi - lo) / n_bins
    return f"""
        SELECT {group_col},
               CAST(LEAST(GREATEST(FLOOR((CAST({value_col} AS DOUBLE)
                        - {float(lo)!r}) / {width!r}), 0),
                    {n_bins - 1}) AS INT) AS bin,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM {table}
        WHERE {value_col} IS NOT NULL
        GROUP BY 1, 2
    """


def sql_hist_quantiles(
    group_col: str,
    sketch_cte: str,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = HIST_N_BINS,
) -> str:
    """DuckDB twin of hist_quantiles over a named sketch CTE. Same
    (0, 1] domain guard as the Spark side (q=0 drops its row)."""
    bad = [q for q in qs if not (0.0 < q <= 1.0)]
    if bad:
        raise ValueError(f"sql_hist_quantiles: qs must be in (0, 1], got {bad}")
    width = (hi - lo) / n_bins
    q_values = ", ".join(f"({float(q)!r})" for q in qs)
    return f"""
        SELECT {group_col}, q,
               ROUND({float(lo)!r} + (CAST(bin AS DOUBLE)
                   + (target - CAST(cum_before AS DOUBLE))
                     / CAST(cnt AS DOUBLE)) * {width!r}, 6)
                   AS hist_quantile,
               n
        FROM (
            SELECT {group_col}, bin, cnt,
                   SUM(cnt) OVER (PARTITION BY {group_col}
                                  ORDER BY bin) AS cum,
                   SUM(cnt) OVER (PARTITION BY {group_col}
                                  ORDER BY bin) - cnt AS cum_before
            FROM {sketch_cte}
        ) c
        JOIN (
            -- CAST: DuckDB SUM(BIGINT) is HUGEINT, which pandas reads as
            -- object/float — an invisible dtype-class red vs Spark's BIGINT
            SELECT {group_col}, n, q, q * CAST(n AS DOUBLE) AS target
            FROM (SELECT {group_col}, CAST(SUM(cnt) AS BIGINT) AS n
                  FROM {sketch_cte} GROUP BY {group_col}),
                 (VALUES {q_values}) qv(q)
        ) t USING ({group_col})
        WHERE CAST(cum AS DOUBLE) >= target
          AND CAST(cum_before AS DOUBLE) < target
    """
