"""One-off scale probe (NOT part of bench.py's HEADLINE): measure how the
most expensive dedup/pipeline queries scale from sf0.1 to ~10x the data.

The testdata ships sf0.1 as its largest scale, so the probe DERIVES a 10x
dataset from sf0.1 deterministically (perf-only data — correctness stays
pinned to the driver's tables + DuckDB oracles):

* ``documents`` — 10 copies; copy k>0 shifts doc_id by k*10M and rewrites
  every token to ``<token><k>``. Token/char counts are preserved (quality
  filters see the same distribution) while the copies are SHINGLE-DISJOINT,
  so near-dup structure per copy matches sf0.1 exactly and a
  scale-invariant blocking scheme must produce ~10x the candidate pairs —
  any super-linear growth is the operator's own collision behavior, not an
  artifact of duplicated data.
* ``embeddings`` — 10 copies; copy k>0 shifts vec_id, cyclically rotates
  the components by k, and sign-flips a hash(i, k)-selected half: norms
  (and thus per-copy geometry) are preserved, cross-copy cosines
  decorrelate. Sign flips ALONE are not enough: same-cluster vectors
  have positive component products (v_i*w_i ≈ v_i^2), so random-sign
  sums keep a fat tail above the near-dup threshold — measured as ~41k
  spurious cross-copy pairs before the rotation was added; the rotation
  misaligns the products and kills the tail.
* ``orders``/``lineitem`` — 10 copies with orderkey shifted by k*100M;
  dimension tables (supplier, nation) stay fixed, so per-supplier fact
  fan-in grows 10x — the realistic shape of a fact-table scale-up.

Per query it reports wall seconds (2nd run, same convention as bench.py),
result rows (for pair queries: the candidate-pair count the LSH bound is
about), and shuffle read/write bytes from the executor totals.

Usage: python tools/scale_probe.py [--base /root/testdata/sf0.1]
                                   [--out /tmp/spark_graft_scale/sf1.0x]
                                   [--mult 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PROBE_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash64",
    "dedup_embedding_neardup",
    "embedding_neardup_sized",
    "tpch_q21_waiting_orders",
    "pipeline_clean_corpus",
    # round-6 late additions (see BENCH_NOTES.md "Round 6 late additions")
    "dedup_chunk_minhash",
    "dedup_repeated_ngrams",
    "decon_source_overlap",
    "events_error_after_click",
    "dedup_semantic_sized",
    # round-6 continuation additions: explode-heavy text passes (linear
    # in corpus tokens) and the iterative pagerank over the LSH-bounded
    # pair list (probe copies are shingle-disjoint -> the 10x graph is 10
    # disjoint copies, so edges and per-iteration cost must scale ~10x)
    "text_token_entropy",
    "tfidf_top_terms",
    "graph_pagerank_neardup",
    # round-6 closing additions: cross-doc span stripping (explode +
    # gram-join, linear in tokens; the per-copy token suffixes keep the
    # copies' dup-gram structure identical, so covered tokens must scale
    # ~10x), incremental batch-vs-corpus dedup (broadcast-index probes,
    # linear in corpus scan), and the two iterative trainers (PQ and
    # logreg: per-iteration corpus scans, no pairwise stage).
    "text_strip_dup_spans",
    "dedup_incremental",
    "sim_pq_adc",
    "text_quality_logreg",
    # round-8: batched BPE trainer — per PASS one vocab scan (explode +
    # partial-agg pair count) + one broadcast fold; vocab is the word
    # set, which grows ~10x under the token-suffix copies, so wall
    # should scale ~linearly in vocab size with a fixed pass count.
    "text_bpe_merges_batched",
    # round-8: KMV sketch — the probe's 10x events carry 10x DISTINCT
    # users, so the distinct shuffle scales ~10x while the sketch state
    # leaving the window stage stays <= k doubles per group; wall should
    # track the distinct pass, rows (one per event_type) stay flat.
    "events_kmv_distinct_users",
    "events_kmv_rollup_users",
    # round-9: deterministic HLL — unlike KMV there is NO distinct
    # pre-pass: one MAX aggregation straight off the scan, partial
    # (map-side) aggregation collapses each split to <= m register rows
    # per group before the shuffle, so shuffled bytes should stay
    # near-FLAT under 10x input (the register table is cardinality-
    # bounded) while KMV's distinct shuffle grows ~10x.
    "events_hll_distinct_users",
    # events_hll_rollup_users retired r15 (rotation slack): its merge
    # path is the rolling tier's per-window merge, probed below; the
    # rolled == direct identity is pinned in tests/test_retired_rows.py.
    # round-10: the rest of the sketch family. Bloom/CMS/histogram all
    # aggregate over FIXED domains (words, (row, col) counters, bins), so
    # their sketch-side shuffles must stay near-flat under 10x input; the
    # probe stages scale with the probe SET (10x distinct users for
    # bloom_flagged/cms; flat bin reads for hist). bloom_pruned_join's
    # scan doubles as the map-side-filter demonstration: its shuffle is
    # the verify join + final agg only, never the scan.
    "events_bloom_flagged_users",
    "events_cms_user_counts",
    "events_hist_value_quantiles",
    "events_bloom_pruned_join",
    # round-11: the complete rolling-window tier. Each is per-day
    # partials + a <= 7-way day->window-end fan-out + ⊕-merge; the
    # data-sized term is the per-day partial only, so wall should track
    # the single-shot sketch queries above while the post-fan-out merge
    # stays sketch-sized (days x state rows). The CMS rolling probe set
    # (distinct (day, user)) grows with users — its estimate stage is
    # the one data-shaped consumer.
    "events_kmv_rolling_distinct",
    "events_hll_rolling_users",
    "events_hist_rolling_quantiles",
    "events_cms_rolling_counts",
    # round-11 (late): hybrid retrieval. The probe's token-suffix copies
    # do NOT match the fixed query-term bag, so matched docs stay fixed
    # while the corpus grows 10x — which isolates exactly the two
    # data-sized passes (index stats scan + in-array term filter) from
    # the match-bounded tf/pivot/topk path; wall should scale with the
    # scan, shuffle stays ~flat (tf rows are match-bounded). The dense
    # side of the hybrid stays a broadcast-query corpus scan.
    "sim_bm25_topk",
    "sim_hybrid_rrf",
    # passage-level MaxP: the chunk fan-out is linear in corpus tokens
    # (the chunker's array exprs), the term-filtered tf path stays
    # match-bounded like the doc-level query, and the per-doc argmax
    # window partitions by doc — wall should track the chunk scan.
    "sim_bm25_maxp",
    # round-12: batched retrieval — same isolation as sim_bm25_topk
    # (suffix copies miss the bags), but the rank runs per query_id;
    # 10x corpus must not move the per-query rank cost (candidates stay
    # match-bounded), so wall tracks the scan like the single query.
    "sim_bm25_batch_topk",
    # round-12: multi-probe IVF recall — the probe's 10x embeddings
    # rotate/sign-flip per copy, so cells fill ~10x and each query's
    # nprobe<=4 candidate slice grows ~linearly; the per-level rank and
    # the hit joins stay slice-bounded. Wall should track the
    # assignment scan + candidate rerank, shuffle ~linear in the slice.
    "sim_ivf_multiprobe_recall",
    # round-12: the RAG-serving maintainer (custom callable below, like
    # dedup_semantic_sized): foreachBatch chunk-postings upsert into
    # fresh stores + MaxP view read. Wall is bucket-overwrite-dominated
    # at these sizes (flat), the data-sized term is the postings
    # shuffle (~linear in corpus tokens).
    "bm25_chunk_index_upsert",
    # round-12 perf pass: the vectorized-extraction rewrites. Each
    # keeps a linear data-sized pass (Arrow mapInPandas over the scan)
    # feeding bounded joins, so wall should scale ~linearly in corpus
    # tokens/rows; pair counts scale ~10x on the shingle-disjoint
    # copies like the other pair queries.
    "dedup_winnow_pairs",
    "dedup_ngram_jaccard",
    "dedup_containment",
    # one Arrow Gram-partial pass; shuffle is O(batches), output 2080
    # rows at any N — wall should track the scan, shuffle near-flat.
    "embedding_covariance",
    # two projection-pruned aggregation passes over the 10x fact table;
    # wall ~linear, output stays 6 rows.
    "system_profile_lineitem",
    # round-13: the dense-serving maintainer round-trip (registered
    # query; builds its own store at construction). 10x embeddings fill
    # the 8 cells ~10x: the three maintainer merges scale with the
    # assignment scan (broadcast-K map pass + per-vector rank exchange),
    # and the view's probed-cell read scans ~nprobe/K of the 10x store
    # (row-group pruned isin on centroid_id); the rank window stays
    # slice-bounded per query. Wall should track the store build.
    "sim_ivf_stream_topk",
    # round-13: gate-then-ingest dense dedup front. Each slice is
    # broadcast against the admitted store's same-cell rows, so the
    # gate is one store scan per slice (~linear in admitted rows);
    # verdict counts scale with the rotated copies' within-copy
    # geometry (cross-copy cosines decorrelate by construction). Wall
    # should track the 3 store merges + 2 store scans.
    "dedup_ivf_stream_gate",
    # round-14: cross-doc exact-substring spans. The token-suffix copies
    # are winnow-fingerprint-disjoint, so candidate pairs, anchor-gram
    # matches and removed spans all scale ~Nx (within-copy structure is
    # sf0.1's exactly); the viral caps bind identically per copy. Wall
    # should track the winnow index + the pair-bounded anchor join.
    "dedup_cross_doc_spans",
    # round-14: the strip form over the same intervals — adds one
    # per-doc interval collect + a map-only Arrow coverage sweep, so
    # wall should track the span report; dup_token_count mass scales
    # ~Nx with the per-copy structure, output rows = corpus rows.
    "dedup_cross_doc_strip",
    # round-14: batched dense retrieval over the label-centroid query
    # table. The corpus assignment (broadcast-K scan + per-vector rank
    # exchange) is the data-sized term and runs ONCE for the whole
    # batch; output stays labels x k. Wall should track the assignment
    # scan, shuffle ~linear in corpus rows.
    "sim_ivf_batch_topk",
    # round-14 (r13 verdict #7): the serving view read ISOLATED from the
    # store build — the store is memoized per sf_dir across probe calls,
    # so the warmup builds it and the TIMED run is the probed-cell view
    # read + rank only. input_mb is the evidence row: view-read bytes
    # must track the probed slice (~nprobe/K of the store scan at this
    # cell count), not re-read the whole store per query batch.
    "ivf_view_read_sized",
    # round-15: the streaming cross-doc ingest gate, end-to-end (three
    # gate+merge rounds incl. store builds — the dedup_ivf_stream_gate
    # probe convention). The token-suffix copies are winnow-disjoint,
    # so per-slice candidate pairs and anchor matches scale ~Nx with
    # within-copy structure unchanged; wall should track the winnow
    # extractions + the pair-bounded per-slice anchor joins, decisions
    # rows = corpus rows exactly.
    "dedup_crossdoc_stream_gate",
]

_DOC_SHIFT = 10_000_000
_ORDER_SHIFT = 100_000_000


def generate(spark, base: str, out: str, mult: int) -> None:
    from pyspark.sql import functions as F

    from flink_streaming_demo_spark.schemas import load_table

    os.makedirs(out, exist_ok=True)

    def done(name: str) -> bool:
        return os.path.exists(os.path.join(out, f"{name}.parquet"))

    def write(df, name: str, n_files: int) -> None:
        df.repartition(n_files).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )

    if not done("documents"):
        docs = load_table(spark, base, "documents")
        copies = [docs]
        for k in range(1, mult):
            copies.append(
                docs.withColumn(
                    "doc_id", F.col("doc_id") + F.lit(k * _DOC_SHIFT)
                ).withColumn(
                    # every token gets a per-copy suffix: same token/char
                    # stats, disjoint shingle space across copies
                    "text",
                    F.regexp_replace(F.col("text"), r"(\S+)", rf"$1{k}"),
                )
            )
        from functools import reduce

        write(reduce(lambda a, b: a.unionByName(b), copies), "documents", 8)

    if not done("embeddings"):
        emb = load_table(spark, base, "embeddings")
        dims = len(emb.select("embedding").head()[0])
        copies = [emb]
        for k in range(1, mult):
            # rotation amount wraps at the vector dim: for mult > dims
            # (the 100x probe) a raw k would make the slice length
            # negative and the copy generation fail. Copies k and k+dims
            # share a rotation but differ in the hash(i, k) sign mask,
            # which is enough because no 100x probe query is pairwise.
            r = k % dims
            copies.append(
                emb.withColumn(
                    "vec_id", F.col("vec_id") + F.lit(k * _DOC_SHIFT)
                ).withColumn(
                    "embedding",
                    F.expr(
                        # rotate by r, then hash-sign-flip (see docstring)
                        f"transform(concat(slice(embedding, {r + 1}, "
                        f"size(embedding) - {r}), "
                        f"slice(embedding, 1, {r})), "
                        "(x, i) -> CASE WHEN "
                        f"pmod(hash(i, {k}), 2) = 0 THEN -x ELSE x END)"
                    ),
                )
            )
        from functools import reduce

        write(reduce(lambda a, b: a.unionByName(b), copies), "embeddings", 8)

    for name, key, n_files in (
        ("orders", "o_orderkey", 16),
        ("lineitem", "l_orderkey", 32),
    ):
        if done(name):
            continue
        t = load_table(spark, base, name)
        copies = [t]
        for k in range(1, mult):
            copies.append(
                t.withColumn(key, F.col(key) + F.lit(k * _ORDER_SHIFT))
            )
        from functools import reduce

        write(reduce(lambda a, b: a.unionByName(b), copies), name, n_files)

    if not done("events"):
        ev = load_table(spark, base, "events")
        copies = [ev]
        for k in range(1, mult):
            copies.append(
                ev.withColumn(
                    "event_id", F.col("event_id") + F.lit(k * _ORDER_SHIFT)
                ).withColumn(
                    # shift the user space: per-user event density (what
                    # the interval join's cost is proportional to) stays
                    # exactly sf0.1's; the corpus gains 10x users.
                    "user_id", F.col("user_id") + F.lit(k * 1_000_000)
                )
            )
        from functools import reduce

        write(reduce(lambda a, b: a.unionByName(b), copies), "events", 8)

    # fixed dimensions + tables the probe queries don't touch: plain copy
    for name in ("region", "nation", "customer", "supplier", "part"):
        dst = os.path.join(out, f"{name}.parquet")
        if not os.path.exists(dst):
            shutil.copyfile(os.path.join(base, f"{name}.parquet"), dst)


def shuffle_totals(spark) -> tuple[int, int, int]:
    """(shuffle read, shuffle write, input bytes) executor totals —
    input bytes is the scan-volume evidence the serving-view probes
    report (pruned store reads must not re-scan the whole store)."""
    store = spark.sparkContext._jsc.sc().statusStore()
    ex = store.executorList(False)
    r = w = i_b = 0
    for i in range(ex.size()):
        s = ex.apply(i)
        r += s.totalShuffleRead()
        w += s.totalShuffleWrite()
        i_b += s.totalInputBytes()
    return r, w, i_b


def _probe_callables() -> dict:
    import __spark_entry__ as entry_mod

    qs = dict(entry_mod.queries())

    def neardup_sized(spark, sf_dir):
        """The documented scale configuration of embedding near-dup:
        data-sized bits (expected bucket ~64 rows, so candidates grow
        O(N)) + 4 bands to hold recall + viral-bucket cap."""
        from flink_streaming_demo_spark.operators import similarity as SIM
        from flink_streaming_demo_spark.schemas import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        return SIM.embedding_neardup_pairs(
            emb, threshold=0.4, n_bands=4, bits_per_band=None,
            max_bucket=1024,
        )

    qs["embedding_neardup_sized"] = neardup_sized

    def semantic_sized(spark, sf_dir):
        """The documented scale configuration of SemDeDup: k grows with
        N (target cluster ~250 rows, so the within-cluster quadratic
        term stays constant per cluster and total candidates grow O(N));
        seeds stay the deterministic vec_id < k picks. The REGISTERED
        dedup_semantic keeps k=8 because its DuckDB oracle replays that
        exact trajectory."""
        from flink_streaming_demo_spark.operators import similarity as SIM
        from flink_streaming_demo_spark.schemas import load_table
        from pyspark.sql import functions as F

        emb = load_table(spark, sf_dir, "embeddings")
        k = max(8, emb.count() // 250)
        seeds = emb.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("centroid_id"), F.col("embedding")
        )
        cent = SIM.kmeans_centroids(emb, seeds, n_iterations=3)
        return SIM.semantic_dedup(
            emb, cent, threshold=0.4, max_cluster=4096
        )

    qs["dedup_semantic_sized"] = semantic_sized

    def chunk_index_upsert(spark, sf_dir):
        """The RAG-serving maintainer (streaming_bm25_chunk_index) as a
        probe: one foreachBatch upsert of the WHOLE documents table into
        fresh chunk-index stores, then the MaxP read view. The timed
        region covers the chunk-postings pass (explode on the shared
        chunk grid + map-side (doc, chunk, term) combine), the two
        bucket-pruned parquet upserts, and the term-filtered view read —
        the full ingest-to-serve path. Fresh stores per call, so the
        measured run is a cold upsert, not a no-op re-upsert."""
        import atexit
        import shutil
        import tempfile

        from flink_streaming_demo_spark.plans.vector_queries import (
            BM25_K,
            BM25_TERMS,
        )
        from flink_streaming_demo_spark.schemas import load_table
        from flink_streaming_demo_spark.streaming.pipelines import (
            bm25_maxp_view,
            streaming_bm25_chunk_index,
        )
        from flink_streaming_demo_spark.streaming.sinks import (
            ParquetUpsertSink,
        )

        root = tempfile.mkdtemp(prefix="probe_bm25c_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        postings = ParquetUpsertSink(
            root + "/postings", ["term", "doc_id", "chunk_idx"]
        )
        lengths = ParquetUpsertSink(
            root + "/lengths", ["doc_id", "chunk_idx"]
        )
        body = streaming_bm25_chunk_index(postings, lengths)
        docs = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text"
        )
        body(docs, epoch_id=0)
        return bm25_maxp_view(spark, postings, lengths, BM25_TERMS, k=BM25_K)

    qs["bm25_chunk_index_upsert"] = chunk_index_upsert

    _ivf_stores: dict[str, object] = {}

    def ivf_view_read_sized(spark, sf_dir):
        """The IVF serving VIEW read isolated from the store build
        (r13 verdict #7): the cell store for ``sf_dir`` is built once
        (full-table streaming_ivf_index ingest) and memoized across
        calls, so probe()'s warmup call constructs it and the TIMED
        call runs ONLY ivf_topk_view — probed-cell pruned store scan +
        the shared ivf_rank tail. The tiny query/centroid frames
        (N_QUERIES=5, N_CENTROIDS=8 rows) are collected once at store
        build and replayed via createDataFrame, so the timed plan
        touches ONLY the store: re-deriving them from the embeddings
        parquet inflated input_mb with corpus scans the pruning claim
        is not about (r14 ADVICE). input_mb for the timed run is the
        store-read volume alone."""
        import atexit
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        from flink_streaming_demo_spark.plans.vector_queries import (
            IVF_STREAM_NPROBE,
            N_CENTROIDS,
            N_QUERIES,
            TOP_K,
        )
        from flink_streaming_demo_spark.schemas import load_table
        from flink_streaming_demo_spark.streaming.pipelines import (
            ivf_topk_view,
            streaming_ivf_index,
        )
        from flink_streaming_demo_spark.streaming.sinks import (
            ParquetUpsertSink,
        )

        entry = _ivf_stores.get(sf_dir)
        if entry is None:
            emb = load_table(spark, sf_dir, "embeddings").select(
                "vec_id", "embedding"
            )
            centroids = emb.filter(F.col("vec_id") < N_CENTROIDS).select(
                F.col("vec_id").alias("centroid_id"), "embedding"
            )
            queries = emb.filter(F.col("vec_id") < N_QUERIES)
            root = tempfile.mkdtemp(prefix="probe_ivfview_")
            atexit.register(shutil.rmtree, root, ignore_errors=True)
            sink = ParquetUpsertSink(root + "/cells", ["vec_id"])
            streaming_ivf_index(sink, centroids)(emb, epoch_id=0)
            entry = (
                sink,
                centroids.schema, centroids.collect(),
                queries.schema, queries.collect(),
            )
            _ivf_stores[sf_dir] = entry
        sink, cent_schema, cent_rows, q_schema, q_rows = entry
        return ivf_topk_view(
            spark, sink,
            spark.createDataFrame(q_rows, schema=q_schema),
            spark.createDataFrame(cent_rows, schema=cent_schema),
            k=TOP_K, nprobe=IVF_STREAM_NPROBE,
        )

    qs["ivf_view_read_sized"] = ivf_view_read_sized
    return qs


def probe(spark, sf_dir: str, only: list[str] | None = None) -> dict[str, dict]:
    qs = _probe_callables()
    out: dict[str, dict] = {}
    for name in (only or PROBE_QUERIES):
        # Full materialization via the noop sink (bench.py convention),
        # NOT .count(): under count, Catalyst's redundant-join elimination
        # legitimately deletes left joins against unique-keyed aggregates
        # (measured: text_strip_dup_spans collapsed to count(documents) —
        # 0 shuffle, flat wall at 10x), so count probes the pruned plan,
        # not the operator. rows still comes from a separate count.
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()  # warmup (codegen, worker spin-up)
        r0, w0, i0 = shuffle_totals(spark)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        r1, w1, i1 = shuffle_totals(spark)  # BEFORE the rows job: the
        # count below runs a join-pruned plan whose shuffle must not
        # leak into the recorded per-run metrics
        rows = qs[name](spark, sf_dir).count()
        out[name] = {
            "wall_sec": round(wall, 3),
            "rows": rows,
            "shuffle_read_mb": round((r1 - r0) / 1e6, 2),
            "shuffle_write_mb": round((w1 - w0) / 1e6, 2),
            "input_mb": round((i1 - i0) / 1e6, 2),
        }
        print(f"  {name}: {out[name]}", file=sys.stderr)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/spark_graft_scale/sf1.0x")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument(
        "--only", nargs="*", default=None,
        help="probe only these query names (default: full PROBE_QUERIES)",
    )
    args = ap.parse_args()

    from flink_streaming_demo_spark.session import get_spark

    # 12g driver heap: the default local-mode 1g fits the sf0.1 bench but
    # not the 10x probe's biggest shuffles (simhash collision pair lists).
    # On a real cluster this is ordinary executor sizing, not a plan fix.
    spark = get_spark(
        "scale-probe",
        extra_conf={
            "spark.driver.memory": "12g",
            "spark.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    print("generating derived scale data ...", file=sys.stderr)
    generate(spark, args.base, args.out, args.mult)

    print(f"probing {args.base} ...", file=sys.stderr)
    small = probe(spark, args.base, args.only)
    print(f"probing {args.out} (x{args.mult}) ...", file=sys.stderr)
    big = probe(spark, args.out, args.only)

    report = {
        "base": args.base,
        "scaled": args.out,
        "mult": args.mult,
        "queries": {
            name: {
                "base": small[name],
                "scaled": big[name],
                "wall_ratio": round(
                    big[name]["wall_sec"] / max(small[name]["wall_sec"], 1e-9),
                    2,
                ),
                "rows_ratio": round(
                    big[name]["rows"] / max(small[name]["rows"], 1), 2
                ),
            }
            for name in small  # probed names (respects --only)
        },
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
