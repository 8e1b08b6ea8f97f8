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
    ).localCheckpoint(eager=False)
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
        # Lazy checkpoint (r15): the winner materializes inside its
        # first consumer's job (the broadcast build feeding the next
        # vocab rewrite), so each merge costs one job instead of two.
        win = (
            pairs.orderBy(
                F.desc("pair_count"), F.asc("pa"), F.asc("pb")
            )
            .limit(1)
            .localCheckpoint(eager=False)
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
            # Lazy too (r15): the merge count is FIXED — no
            # data-dependent control flow needs a mid-loop action, so
            # the whole trainer builds without running a single job;
            # every round's cut materializes inside the final
            # consumer's execution, in dependency order.
            .localCheckpoint(eager=False)
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
    parts = [f"""vocab0 AS MATERIALIZED (
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
        parts.append(f"""pairs{i} AS MATERIALIZED (
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
        parts.append(f"""win{i} AS MATERIALIZED (
        SELECT COALESCE(w.pa, '') AS pa, COALESCE(w.pb, '') AS pb,
               COALESCE(w.pair_count, 0) AS pair_count
        FROM (SELECT 1) AS one{i}
        LEFT JOIN (
            SELECT pa, pb, CAST(pair_count AS BIGINT) AS pair_count
            FROM pairs{i}
            ORDER BY pair_count DESC, pa ASC, pb ASC LIMIT 1
        ) w ON TRUE
    )""")
        parts.append(f"""vocab{i} AS MATERIALIZED (
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

    Scale: MAP-ONLY over the corpus — and, as of r11, the merge fold
    runs once per DISTINCT word, not once per occurrence: the
    vocabulary (one distinct pass, vocab-bounded like training) is
    segmented with the rank-ordered replace fold, collapsed to a single
    word→segmentation map row, and broadcast; documents then segment by
    map lookups instead of re-folding 64+ replaces per token occurrence
    (real tokenizers cache exactly this). Measured at sf0.1: the 64-merge
    apply fell 20.1 → 4.0 s with byte-identical output. The corpus side
    stays zero-shuffle/zero-explode; the vocab side is one distinct agg.
    At extreme vocabularies (the broadcast map is vocab-sized) swap the
    final lookup for an explode + broadcast word_seg equi-join — same
    word_seg frame, data-sized shuffle instead of a giant map literal.

    r15: the per-doc counts come from the concatenated seg STREAM via
    string ops (each word contributes syms = '||'-count + 1, so
    n_subwords = '||'-count(stream) + n_words) instead of a per-token
    interpreted aggregate that regex-split every segmentation — the
    stream is built once (it already feeds seg_hash) and scanned twice.
    A full doc-level fold (replay the merges over the whole doc as one
    string, no vocab map at all) was measured value-identical but
    ~2.4x slower at sf0.1 — n_merges full-document replace scans cost
    more than the per-token map probes on this corpus's tiny (31-word)
    vocabulary — and is the documented fallback only for vocabularies
    too large to broadcast.
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

    vocab = (
        docs.select(F.explode(words).alias("word"))
        .distinct()
        .crossJoin(F.broadcast(ordered))
        .select(F.col("word"), seg_word(F.col("word")).alias("seg"))
    )
    wmap = vocab.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "seg"))
        ).alias("wmap")
    )
    st = F.col("_stream")
    n_dseps = F.length(st) - F.length(
        F.replace(st, F.lit("||"), F.lit(""))
    )
    return (
        docs.select(F.col(id_col), F.col(text_col))
        .crossJoin(F.broadcast(wmap))
        .select(
            F.col(id_col),
            F.transform(
                words, lambda w: F.element_at(F.col("wmap"), w)
            ).alias("segs"),
        )
        # staged selects: _stream is referenced twice (count + md5), so
        # it gets its own projection — CollapseProject does not
        # re-inline non-cheap multi-referenced aliases.
        .select(
            F.col(id_col),
            F.size("segs").alias("n_words"),
            F.concat_ws(" ", F.col("segs")).alias("_stream"),
        )
        .select(
            id_col,
            "n_words",
            (n_dseps / F.lit(2) + F.col("n_words"))
            .cast("long")
            .alias("n_subwords"),
            F.md5(st).alias("seg_hash"),
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


# --- Batched merge training ---------------------------------------------------
#
# Classic BPE recomputes pair counts after EVERY merge: n_merges corpus-
# vocab scans. The batched trainer amortizes that: each PASS snapshots
# pair counts once, takes the top ``batch_k`` candidate pairs, keeps the
# subset that is pairwise NON-INTERACTING, and applies all kept merges as
# one fold. Non-interacting (candidate c vs every higher-ranked candidate
# d in the same batch): c's symbols are disjoint from d's symbols AND
# from d's merged product, and c's product is none of d's symbols (and
# products differ). Under that condition no kept replace can create or
# destroy an occurrence of another kept pattern, so the batch's replaces
# commute and the snapshot counts stay faithful for every kept merge —
# the selection is exactly the "frequent independent pairs per iteration"
# batching used by distributed tokenizer trainers.
#
# The trajectory is deterministic and engine-replayable: a FIXED number
# of passes, candidates ordered (count DESC, pa, pb), the keep-filter a
# declarative anti-join against higher-ranked candidates (no greedy
# driver state), global merge rank = cumulative kept order. The merge
# COUNT per pass is data-dependent (conflicts drop candidates) but
# identical on both engines; character-pair candidates conflict heavily
# (~4-5 kept per early pass), so the pass count drives yield: 16 passes
# x 16 candidates trains 64+ merges on the test corpora (67 at sf0.01,
# 71 at sf0.001) at ~1/4th the vocab scans sequential training needs.

BPE_BATCH_K = 16
BPE_N_BATCHES = 16

_REPL_SEP = "\x01"  # joins (pa, pb) into one fold element; never in text


def _batch_keep(cand: DataFrame) -> DataFrame:
    """Anti-join the candidate table (pa, pb, pair_count, rn) against its
    own higher-ranked rows on the interaction predicate."""
    d = cand.select(
        F.col("rn").alias("d_rn"),
        F.col("pa").alias("d_pa"),
        F.col("pb").alias("d_pb"),
    )
    prod = F.concat(F.col("pa"), F.col("pb"))
    d_prod = F.concat(F.col("d_pa"), F.col("d_pb"))
    interact = (F.col("d_rn") < F.col("rn")) & (
        (F.col("d_pa") == F.col("pa"))
        | (F.col("d_pa") == F.col("pb"))
        | (F.col("d_pb") == F.col("pa"))
        | (F.col("d_pb") == F.col("pb"))
        | (d_prod == F.col("pa"))
        | (d_prod == F.col("pb"))
        | (prod == F.col("d_pa"))
        | (prod == F.col("d_pb"))
        | (d_prod == prod)
    )
    return cand.join(F.broadcast(d), interact, "left_anti")


def bpe_train_merges_batched(
    docs: DataFrame,
    text_col: str = "text",
    n_batches: int = BPE_N_BATCHES,
    batch_k: int = BPE_BATCH_K,
) -> DataFrame:
    """Train (rank, pa, pb, pair_count) over ``n_batches`` batched passes
    (see module note above). Scale: per PASS — not per merge — one scan
    of the word-vocab table (pair explode + partial-agg count), one
    top-k (TakeOrdered), tiny candidate-table joins, one broadcast fold
    of <= batch_k replaces. All windows run over the <= batch_k-row
    candidate table."""
    from pyspark.sql import Window

    vocab = word_frequency_table(docs, text_col).select(
        _to_repr(F.col("word")).alias("s"), "cnt"
    ).localCheckpoint(eager=False)
    winners = []
    done = 0
    for _ in range(n_batches):
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
        order = [F.desc("pair_count"), F.asc("pa"), F.asc("pb")]
        cand = (
            pairs.orderBy(*order)
            .limit(batch_k)
            .withColumn("rn", F.row_number().over(Window.orderBy(*order)))
            .localCheckpoint(eager=False)
        )
        kept = (
            _batch_keep(cand)
            .withColumn(
                "rank",
                (F.row_number().over(Window.orderBy("rn")) + done).cast(
                    "int"
                ),
            )
            .localCheckpoint(eager=False)
        )
        # kept.count() is the pass's ONE driving action (r15): it
        # materializes kept and, transitively, cand — two fewer jobs
        # per pass than the eager checkpoints.
        n_kept = kept.count()
        if n_kept == 0:
            break
        done += n_kept
        winners.append(kept.select("rank", "pa", "pb", "pair_count"))
        folded = kept.agg(
            F.array_sort(
                F.collect_list(F.struct("rank", "pa", "pb"))
            ).alias("ms")
        )
        vocab = (
            vocab.crossJoin(F.broadcast(folded))
            .select(
                F.aggregate(
                    F.col("ms"),
                    F.col("s"),
                    lambda acc, m: F.replace(
                        acc,
                        F.concat(
                            F.lit("|"), m.pa, F.lit("||"), m.pb, F.lit("|")
                        ),
                        F.concat(F.lit("|"), m.pa, m.pb, F.lit("|")),
                    ),
                ).alias("s"),
                "cnt",
            )
            # Lazy (r15): the NEXT pass's kept.count() materializes this
            # fold as a side effect of scanning its pair counts — one
            # job per pass instead of two, and the final pass's rewrite
            # (which nothing consumes) never runs at all.
            .localCheckpoint(eager=False)
        )
    if not winners:
        # degenerate corpus (no adjacent pairs anywhere): same
        # empty-result contract as the sequential trainer
        return docs.sparkSession.createDataFrame(
            [], "rank int, pa string, pb string, pair_count bigint"
        )
    out = winners[0]
    for w in winners[1:]:
        out = out.unionAll(w)
    return out


def sql_bpe_ctes_batched(
    n_batches: int = BPE_N_BATCHES,
    batch_k: int = BPE_BATCH_K,
    corpus: str = "documents",
    text: str = "text",
) -> str:
    """DuckDB twin of bpe_train_merges_batched: CTE chain ``bvocab0,
    bpairs1, bcand1, bkeep1, brepl1, bvocab1, ..`` plus ``bmerges`` (the
    final rank-ordered merge table). Embed inside WITH and select from
    ``bmerges``."""
    parts = [f"""bvocab0 AS MATERIALIZED (
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
    fold = (
        "(acc, x) -> replace(acc,"
        " '|' || split_part(x, chr(1), 1) || '||'"
        " || split_part(x, chr(1), 2) || '|',"
        " '|' || split_part(x, chr(1), 1)"
        " || split_part(x, chr(1), 2) || '|')"
    )
    for i in range(1, n_batches + 1):
        p = i - 1
        parts.append(f"""bpairs{i} AS MATERIALIZED (
        SELECT sym[j] AS pa, sym[j + 1] AS pb, SUM(cnt) AS pair_count
        FROM (
            SELECT string_split(trim(s, '|'), '||') AS sym, cnt
            FROM bvocab{p}
        ), LATERAL unnest(generate_series(1, len(sym) - 1)) AS u(j)
        GROUP BY sym[j], sym[j + 1]
    )""")
        parts.append(f"""bcand{i} AS MATERIALIZED (
        SELECT pa, pb, CAST(pair_count AS BIGINT) AS pair_count,
               ROW_NUMBER() OVER (
                   ORDER BY pair_count DESC, pa ASC, pb ASC) AS rn
        FROM bpairs{i}
        ORDER BY pair_count DESC, pa ASC, pb ASC LIMIT {batch_k}
    )""")
        parts.append(f"""bkeep{i} AS MATERIALIZED (
        SELECT c.pa, c.pb, c.pair_count, c.rn
        FROM bcand{i} c
        WHERE NOT EXISTS (
            SELECT 1 FROM bcand{i} d
            WHERE d.rn < c.rn AND (
                   d.pa = c.pa OR d.pa = c.pb
                OR d.pb = c.pa OR d.pb = c.pb
                OR (d.pa || d.pb) = c.pa OR (d.pa || d.pb) = c.pb
                OR (c.pa || c.pb) = d.pa OR (c.pa || c.pb) = d.pb
                OR (d.pa || d.pb) = (c.pa || c.pb))
        )
    )""")
        parts.append(f"""brepl{i} AS MATERIALIZED (
        SELECT COALESCE(list(pa || chr(1) || pb ORDER BY rn),
                        CAST([] AS VARCHAR[])) AS rs
        FROM bkeep{i}
    )""")
        parts.append(f"""bvocab{i} AS MATERIALIZED (
        SELECT list_reduce(list_prepend(v.s, r.rs), {fold}) AS s, v.cnt
        FROM bvocab{p} v, brepl{i} r
    )""")
    unions = "\n        UNION ALL\n        ".join(
        f"SELECT {i} AS batch, rn, pa, pb, pair_count FROM bkeep{i}"
        for i in range(1, n_batches + 1)
    )
    parts.append(f"""bmerges AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY batch, rn) AS INT) AS rank,
               pa, pb, pair_count
        FROM (
        {unions}
        )
    )""")
    return ",\n    ".join(parts)


def sql_bpe_segment_from_merges(
    merge_cte: str = "bmerges",
    corpus: str = "documents",
    text: str = "text",
) -> str:
    """DuckDB twin of bpe_segment against ANY trained merge-table CTE
    ``(rank, pa, pb, ...)`` — the merge list aggregates to one rank-
    ordered array row and every word OCCURRENCE folds through it with
    list_reduce (the fixed-arity nested-replace form can't express a
    data-dependent merge count). The Spark side memoizes the fold per
    DISTINCT word behind a broadcast map (r11); the per-word fold
    itself is the same replace chain, so the segmentations — and the
    hash-checked seg_hash — are identical either way. Embed after the
    CTEs that define ``merge_cte``."""
    to_repr = (
        "'|' || array_to_string(list_transform("
        "generate_series(1, len(w)), i -> substr(w, i, 1)), '||') || '|'"
    )
    fold = (
        "(acc, x) -> replace(acc,"
        " '|' || split_part(x, chr(1), 1) || '||'"
        " || split_part(x, chr(1), 2) || '|',"
        " '|' || split_part(x, chr(1), 1)"
        " || split_part(x, chr(1), 2) || '|')"
    )
    return f"""
    SELECT doc_id,
           CAST(len(words) AS INT) AS n_words,
           CAST(COALESCE(list_sum(list_transform(segs,
                    s -> len(string_split(trim(s, '|'), '||')))), 0)
                AS BIGINT) AS n_subwords,
           md5(COALESCE(array_to_string(segs, ' '), '')) AS seg_hash
    FROM (
        SELECT doc_id, words,
               list_transform(words,
                   w -> list_reduce(list_prepend({to_repr}, ml.rs),
                                    {fold})) AS segs
        FROM (
            SELECT doc_id,
                   list_filter(string_split({text}, ' '),
                       w -> len(w) >= 1 AND NOT contains(w, '|')) AS words
            FROM {corpus}
        ), (
            SELECT COALESCE(list(pa || chr(1) || pb ORDER BY rank),
                            CAST([] AS VARCHAR[])) AS rs
            FROM {merge_cte}
        ) ml
    )
    """
