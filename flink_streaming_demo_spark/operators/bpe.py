"""BPE (byte-pair encoding) merge-table training in pure DataFrame ops.

The tokenizer-training step of an LLM data pipeline (Sennrich et al. 2016):
start from characters, repeatedly merge the most frequent adjacent symbol
pair. Classic implementations train on the word-frequency table — so does
this one: the corpus scan happens ONCE (token explode + count), and the
iterations run over the distinct-word table, whose size is bounded by
vocabulary, not corpus.

Representation trick that keeps the whole trajectory engine-replayable:
a word's symbol sequence is stored as a DELIMITED STRING — ``|sym1||sym2|
..|symN|`` (every symbol wrapped in ``|`` on both sides). Applying merge
(pa, pb) is then a plain ``replace(s, '|pa||pb|', '|papb|')``: SQL replace
scans left-to-right over non-overlapping occurrences, which is EXACTLY
BPE's greedy merge order, and because each occurrence both starts and ends
with its own ``|``, adjacent matches (``a b a b``) and overlapping repeats
(``a a a`` -> ``aa a``) behave correctly. Spark and DuckDB implement the
same replace semantics, so the oracle replays the merge trajectory with no
arrays-of-structs folding on either side.

Determinism: pair counts are exact integer sums; the winning pair per
iteration is (count DESC, pa ASC, pb ASC) — total order, both engines
compare ASCII identically. Words containing ``|`` are excluded by contract
(none exist in the corpus; the guard keeps the representation injective).

Scale: per iteration, one scan of the word table (explode to adjacent
pairs, partial-aggregated count), one top-1 (TakeOrdered, no full sort),
one broadcast of the 1-row winner, one map-only replace. The word table is
localCheckpointed per iteration to truncate lineage. No corpus re-scan, no
shuffle wider than the pair-count aggregation (keys = distinct symbol
pairs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_MERGES = 6


def word_frequency_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, cnt): the single corpus pass BPE trains on. Excludes words
    containing the representation delimiter '|' (none in practice)."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), " ")).alias("word")
        )
        .filter((F.length("word") >= 1) & (~F.col("word").contains("|")))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _to_repr(word: F.Column) -> F.Column:
    """'abc' -> '|a||b||c|' (each character a delimited symbol)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, F.lit(1)),
    )
    return F.concat(F.lit("|"), F.array_join(chars, "||"), F.lit("|"))


def _symbols(col_name: str) -> F.Column:
    """'|ab||c|' -> ['ab', 'c'] (col_name references the repr column)."""
    return F.split(
        F.expr(f"trim(BOTH '|' FROM {col_name})"), r"\|\|"
    )


def bpe_train_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = N_MERGES,
) -> DataFrame:
    """Train the merge table: (rank, pa, pb, pair_count) for the
    ``n_merges`` most frequent adjacent-pair merges, in training order."""
    vocab = word_frequency_table(docs, text_col).select(
        _to_repr(F.col("word")).alias("s"), "cnt"
    ).localCheckpoint()
    winners = []
    for rank in range(1, n_merges + 1):
        sym = _symbols("s")
        pairs = (
            vocab.select(
                F.explode(
                    F.zip_with(
                        F.slice(sym, 1, F.size(sym) - 1),
                        F.slice(sym, 2, F.size(sym) - 1),
                        lambda a, b: F.struct(
                            a.alias("pa"), b.alias("pb")
                        ),
                    )
                ).alias("p"),
                "cnt",
            )
            .groupBy("p.pa", "p.pb")
            .agg(F.sum("cnt").alias("pair_count"))
        )
        win = (
            pairs.orderBy(
                F.desc("pair_count"), F.asc("pa"), F.asc("pb")
            )
            .limit(1)
            .localCheckpoint()
        )
        winners.append(win.select(F.lit(rank).alias("rank"), "pa", "pb",
                                  "pair_count"))
        find = F.concat(
            F.lit("|"), F.col("pa"), F.lit("||"), F.col("pb"), F.lit("|")
        )
        repl = F.concat(F.lit("|"), F.col("pa"), F.col("pb"), F.lit("|"))
        vocab = (
            vocab.crossJoin(F.broadcast(win.select("pa", "pb")))
            .select(F.replace(F.col("s"), find, repl).alias("s"), "cnt")
            .localCheckpoint()
        )
    out = winners[0]
    for w in winners[1:]:
        out = out.unionAll(w)
    return out


def sql_bpe_ctes(
    n_merges: int = N_MERGES,
    corpus: str = "documents",
    text: str = "text",
) -> str:
    """DuckDB twin: CTE chain ``vocab0, pairs1, win1, vocab1 ..`` unrolling
    the merge iterations over the same delimited-string representation.
    Select the merge table from ``win1 .. win{n}`` (see sql_bpe_final)."""
    parts = [f"""vocab0 AS (
        SELECT '|' || array_to_string(list_transform(
                   generate_series(1, len(word)),
                   i -> substr(word, i, 1)), '||') || '|' AS s,
               cnt
        FROM (
            SELECT word, COUNT(*) AS cnt FROM (
                SELECT unnest(string_split({text}, ' ')) AS word
                FROM {corpus}
            )
            WHERE len(word) >= 1 AND NOT contains(word, '|')
            GROUP BY word
        )
    )"""]
    for i in range(1, n_merges + 1):
        p = i - 1
        parts.append(f"""pairs{i} AS (
        SELECT sym[j] AS pa, sym[j + 1] AS pb, SUM(cnt) AS pair_count
        FROM (
            SELECT string_split(trim(s, '|'), '||') AS sym, cnt
            FROM vocab{p}
        ), LATERAL unnest(generate_series(1, len(sym) - 1)) AS u(j)
        GROUP BY sym[j], sym[j + 1]
    )""")
        # Always exactly ONE row: if pairs{i} is empty (the corpus
        # admits fewer than n_merges merges) a sentinel ('', '') merge
        # keeps the downstream cross joins alive; its replace pattern
        # '||||' cannot occur in a valid repr (symbols are non-empty),
        # so it is a no-op, and sql_bpe_final filters it out.
        parts.append(f"""win{i} AS (
        SELECT COALESCE(w.pa, '') AS pa, COALESCE(w.pb, '') AS pb,
               COALESCE(w.pair_count, 0) AS pair_count
        FROM (SELECT 1) AS one{i}
        LEFT JOIN (
            SELECT pa, pb, CAST(pair_count AS BIGINT) AS pair_count
            FROM pairs{i}
            ORDER BY pair_count DESC, pa ASC, pb ASC LIMIT 1
        ) w ON TRUE
    )""")
        parts.append(f"""vocab{i} AS (
        SELECT replace(s, '|' || pa || '||' || pb || '|',
                       '|' || pa || pb || '|') AS s, cnt
        FROM vocab{p}, win{i}
    )""")
    return ",\n    ".join(parts)


def sql_bpe_final(n_merges: int = N_MERGES) -> str:
    """UNION of the per-iteration winners with their ranks."""
    selects = [
        f"SELECT {i} AS rank, pa, pb, pair_count FROM win{i} "
        f"WHERE pa <> ''"
        for i in range(1, n_merges + 1)
    ]
    return "\n    UNION ALL\n    ".join(selects)


def bpe_segment(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge table to every document: each word becomes
    its delimited char representation and the merges replay IN TRAINING
    ORDER (the defining BPE-apply rule) as an aggregate-fold of replaces.

    Output: (doc_id, n_words, n_subwords, seg_hash). n_subwords is what
    a context-window packer actually needs; seg_hash (md5 of the
    segmented word stream, in document order) pins the exact
    segmentation so the oracle proves apply-order correctness, not just
    counts.

    Scale: MAP-ONLY — the merge table aggregates to one rank-ordered
    array row and is broadcast (never collected to the driver); every
    document is segmented by pure array expressions with zero shuffle
    and zero explode.
    """
    ordered = merges.orderBy("rank").select(
        F.array_sort(
            F.collect_list(F.struct("rank", "pa", "pb"))
        ).alias("ms")
    )
    words = F.filter(
        F.split(F.col(text_col), " "),
        lambda w: (F.length(w) >= 1) & (~w.contains("|")),
    )

    def seg_word(w):
        return F.aggregate(
            F.col("ms"),
            _to_repr(w),
            lambda acc, m: F.replace(
                acc,
                F.concat(F.lit("|"), m.pa, F.lit("||"), m.pb, F.lit("|")),
                F.concat(F.lit("|"), m.pa, m.pb, F.lit("|")),
            ),
        )

    def n_syms(s):
        return F.size(F.split(F.btrim(s, F.lit("|")), r"\|\|"))

    return (
        docs.select(F.col(id_col), F.col(text_col))
        .crossJoin(F.broadcast(ordered))
        .select(F.col(id_col), F.transform(words, seg_word).alias("segs"))
        .select(
            id_col,
            F.size("segs").alias("n_words"),
            F.aggregate(
                F.col("segs"),
                F.lit(0).cast("long"),
                lambda acc, s: acc + n_syms(s).cast("long"),
            ).alias("n_subwords"),
            F.md5(F.concat_ws(" ", F.col("segs"))).alias("seg_hash"),
        )
    )


def sql_bpe_segment(n_merges: int = N_MERGES, corpus: str = "documents",
                    text: str = "text") -> str:
    """DuckDB twin of bpe_segment: embed after sql_bpe_ctes(); the merge
    application unrolls as nested replaces over win1..win{n} (each a
    1-row CTE cross-joined in), innermost-first = training order."""
    seg = ("'|' || array_to_string(list_transform("
           "generate_series(1, len(w)), i -> substr(w, i, 1)), '||') || '|'")
    for i in range(1, n_merges + 1):
        seg = (f"replace({seg}, '|' || w{i}.pa || '||' || w{i}.pb || '|', "
               f"'|' || w{i}.pa || w{i}.pb || '|')")
    wins = ", ".join(f"win{i} w{i}" for i in range(1, n_merges + 1))
    return f"""
    SELECT doc_id,
           CAST(len(words) AS INT) AS n_words,
           CAST(COALESCE(list_sum(list_transform(segs,
                    s -> len(string_split(trim(s, '|'), '||')))), 0)
                AS BIGINT) AS n_subwords,
           md5(COALESCE(array_to_string(segs, ' '), '')) AS seg_hash
    FROM (
        SELECT doc_id, words, list_transform(words, w -> {seg}) AS segs
        FROM (
            SELECT doc_id,
                   list_filter(string_split({text}, ' '),
                       w -> len(w) >= 1 AND NOT contains(w, '|')) AS words
            FROM {corpus}
        ), {wins}
    )
    """
