"""Independent-model tests for the hybrid-retrieval tier: BM25 vs a
pure-Python model (same fold order, same rounding), RRF fusion vs a
hand-computed model over planted rank lists. The DuckDB oracle twins
prove engine parity; these prove the SEMANTICS against a second
implementation that shares no SQL with either engine.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest

from flink_streaming_demo_spark.operators.retrieval import (
    _check_terms,
    rrf_fuse,
)
from flink_streaming_demo_spark.plans.vector_queries import (
    BM25_BATCH_QUERIES,
    BM25_K,
    BM25_TERMS,
    sim_bm25_batch_topk,
    sim_bm25_topk,
)
from flink_streaming_demo_spark.schemas import load_table


def _round6(x: float) -> float:
    return float(
        Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def _py_bm25(toks: dict[int, list[str]], terms, k1=1.2, b=0.75):
    """Python BM25 with the operator's exact operation order (left fold
    over the fixed term list, same parenthesization per term)."""
    n_docs = len(toks)
    sum_dl = sum(len(v) for v in toks.values())
    avgdl = float(sum_dl) / n_docs
    df = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    out = {}
    for doc_id, words in toks.items():
        s = 0.0
        n_terms = 0
        for t in terms:
            tf = words.count(t)
            if tf == 0 or df[t] == 0:
                continue
            n_terms += 1
            idf = math.log(
                1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5)
            )
            dl = len(words)
            norm = 1.0 - b + (b * dl) / avgdl
            tf_d = float(tf)
            s = s + idf * ((tf_d * (k1 + 1.0)) / (tf_d + k1 * norm))
        if n_terms:
            out[doc_id] = (_round6(s), n_terms)
    return out


def test_bm25_matches_python_model(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    toks = {r.doc_id: r.text.split(" ") for r in rows}
    model = _py_bm25(toks, BM25_TERMS)
    expect = sorted(
        model.items(), key=lambda kv: (-kv[1][0], kv[0])
    )[:BM25_K]

    got = sim_bm25_topk(spark, sf_dir).orderBy("rank").collect()
    assert len(got) == BM25_K
    for r, (doc_id, (score, n_terms)) in zip(got, expect):
        assert r.doc_id == doc_id
        assert r.n_terms == n_terms
        assert abs(r.score - score) <= 1e-9, (r.doc_id, r.score, score)
    assert [r.rank for r in got] == list(range(1, BM25_K + 1))


def test_bm25_rare_term_dominates(spark, sf_dir):
    """'dup' is the corpus's one rare token (df ~ 25/500 vs ~390 for the
    common terms), so its idf puts every 'dup' doc above any
    common-terms-only doc — the whole top-10 must contain it."""
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    has_dup = {r.doc_id for r in rows if "dup" in r.text.split(" ")}
    assert len(has_dup) >= BM25_K
    got = sim_bm25_topk(spark, sf_dir).collect()
    assert all(r.doc_id in has_dup for r in got)


def test_rrf_fuse_matches_hand_model(spark):
    """Planted lists: overlap (1, 2), lexical-only (3), vector-only (4),
    and a fused tie broken by doc_id."""
    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"]
    )
    vec = spark.createDataFrame(
        [(2, 1), (1, 2), (4, 3)], ["doc_id", "rank"]
    )
    got = {
        r.doc_id: r for r in rrf_fuse(lex, vec, k=4).collect()
    }
    assert set(got) == {1, 2, 3, 4}
    # docs 1 and 2 tie exactly (ranks {1,2} vs {2,1}); doc_id breaks it
    s12 = _round6(1.0 / 61 + 1.0 / 62)
    assert got[1].rrf_score == s12 and got[2].rrf_score == s12
    assert got[1].rank == 1 and got[2].rank == 2
    # single-list docs: absent side reports rank 0 and contributes 0
    assert got[3].lex_rank == 3 and got[3].vec_rank == 0
    assert got[4].lex_rank == 0 and got[4].vec_rank == 3
    s_single = _round6(1.0 / 63)
    assert got[3].rrf_score == s_single and got[4].rrf_score == s_single
    assert got[3].rank == 3 and got[4].rank == 4  # tie -> doc_id order


def test_hybrid_ndcg_matches_python_model(spark, sf_dir):
    """nDCG grader vs a from-scratch python recomputation over the
    collected fused and dense lists (log2 discount via math.log ratio,
    same ordered accumulation)."""
    from flink_streaming_demo_spark.operators.similarity import (
        brute_force_topk,
    )
    from flink_streaming_demo_spark.plans.vector_queries import (
        HYBRID_K,
        HYBRID_QUERY_ID,
        sim_hybrid_ndcg,
        sim_hybrid_rrf,
    )

    fused = sorted(
        (r.rank, r.doc_id)
        for r in sim_hybrid_rrf(spark, sf_dir).collect()
    )
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(emb.vec_id == HYBRID_QUERY_ID)
    dense = sorted(
        (r.rank, r.neighbor_id)
        for r in brute_force_topk(q, emb, k=HYBRID_K).collect()
    )
    relevant = {doc for _, doc in dense}
    dcg = 0.0
    hits = 0
    for rank, doc in fused:
        rel = 1.0 if doc in relevant else 0.0
        hits += int(rel)
        dcg = dcg + rel * (math.log(2.0) / math.log(float(rank + 1)))
    idcg = 0.0
    for rank, _ in dense:
        idcg = idcg + math.log(2.0) / math.log(float(rank + 1))

    row = sim_hybrid_ndcg(spark, sf_dir).collect()[0]
    assert row.k == HYBRID_K and row.hits == hits
    assert abs(row.dcg - _round6(dcg)) <= 1e-9
    assert abs(row.idcg - _round6(idcg)) <= 1e-9
    assert abs(row.ndcg - _round6(dcg / idcg)) <= 1e-9
    assert 0.0 < row.ndcg <= 1.0


def test_bm25_maxp_matches_python_model(spark, sf_dir):
    """Passage-level BM25 + MaxP vs a from-scratch python replay: same
    chunk grid (64 tokens, stride 56), chunk-level index stats, same
    per-term fold order, argmax per doc with chunk_idx tie-break."""
    from flink_streaming_demo_spark.plans.text_queries import (
        CHUNK_OVERLAP,
        CHUNK_TOKENS,
        _CHUNK_STRIDE,
    )
    from flink_streaming_demo_spark.plans.vector_queries import (
        sim_bm25_maxp,
    )

    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    chunks: dict[tuple[int, int], list[str]] = {}
    for r in rows:
        words = r.text.split(" ")
        n_starts = max(len(words) - CHUNK_OVERLAP, 1)
        idx = 0
        for s in range(1, n_starts + 1, _CHUNK_STRIDE):
            chunks[(r.doc_id, idx)] = words[s - 1 : s - 1 + CHUNK_TOKENS]
            idx += 1
    model = _py_bm25(chunks, BM25_TERMS)
    # MaxP: best chunk per doc (score desc, chunk_idx asc)
    best: dict[int, tuple] = {}
    for (doc_id, chunk_idx), (score, n_terms) in model.items():
        cand = (-score, chunk_idx, n_terms)
        if doc_id not in best or cand < best[doc_id]:
            best[doc_id] = cand
    expect = sorted(
        (
            (doc_id, -neg_score, chunk_idx, n_terms)
            for doc_id, (neg_score, chunk_idx, n_terms) in best.items()
        ),
        key=lambda x: (-x[1], x[0]),
    )[:BM25_K]

    got = sim_bm25_maxp(spark, sf_dir).orderBy("rank").collect()
    assert len(got) == BM25_K
    for r, (doc_id, score, chunk_idx, n_terms) in zip(got, expect):
        assert r.doc_id == doc_id
        assert r.best_chunk_idx == chunk_idx
        assert r.n_terms == n_terms
        assert abs(r.score - score) <= 1e-9
    assert [r.rank for r in got] == list(range(1, BM25_K + 1))


def test_check_terms_guards():
    """ADVICE r11: a duplicated term silently double-counts its pivot
    contribution, an empty bag leaves s_0 unresolved, and a quoted term
    would break the interpolated oracle SQL — all three now raise at
    operator entry."""
    assert _check_terms(("spark", "dup")) == ["spark", "dup"]
    with pytest.raises(ValueError):
        _check_terms(())
    with pytest.raises(ValueError):
        _check_terms(("spark", "spark"))
    with pytest.raises(ValueError):
        _check_terms(("it's",))
    with pytest.raises(ValueError):
        _check_terms(("Upper",))


def test_bm25_batch_matches_python_model(spark, sf_dir):
    """Every query in the batch must score exactly as the single-query
    python model does with the corpus-wide df — the batch path shares
    tokenization and df across queries but may not change any float."""
    rows = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .collect()
    )
    toks = {r.doc_id: r.text.split(" ") for r in rows}
    got = sim_bm25_batch_topk(spark, sf_dir).collect()
    by_query: dict[int, list] = {}
    for r in got:
        by_query.setdefault(r.query_id, []).append(r)
    assert set(by_query) == {qid for qid, _ in BM25_BATCH_QUERIES}
    for qid, terms in BM25_BATCH_QUERIES:
        model = _py_bm25(toks, terms)
        expect = sorted(
            ((doc_id, s, n) for doc_id, (s, n) in model.items()),
            key=lambda x: (-x[1], x[0]),
        )[:BM25_K]
        mine = sorted(by_query[qid], key=lambda r: r.rank)
        assert [r.rank for r in mine] == list(
            range(1, len(expect) + 1)
        )
        for r, (doc_id, score, n_terms) in zip(mine, expect):
            assert r.doc_id == doc_id, (qid, r)
            assert r.n_terms == n_terms, (qid, r)
            assert abs(r.score - score) <= 1e-9, (qid, r)


def test_bm25_batch_rejects_bad_batches(spark, sf_dir):
    from flink_streaming_demo_spark.operators.retrieval import (
        bm25_batch_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        bm25_batch_topk(docs, [])
    with pytest.raises(ValueError):
        bm25_batch_topk(docs, [(1, ("spark",)), (1, ("dup",))])


def test_bm25_batch_plan_width_bounded_by_widest_bag(spark, sf_dir):
    """The batch pivot must be per-bag-position, never per-union-term:
    a 3-query batch over 3 distinct single-term bags (union width 3,
    widest bag 1) must plan exactly one pivot column — the property
    that keeps plan width O(widest bag) for thousand-query batches."""
    from flink_streaming_demo_spark.operators.retrieval import (
        bm25_batch_topk,
    )

    docs = load_table(spark, sf_dir, "documents")
    df = bm25_batch_topk(
        docs, [(1, ("spark",)), (2, ("window",)), (3, ("dup",))], k=3
    )
    # the analyzed plan keeps the pivot aliases (the optimizer prunes
    # them away after the score projection, so check pre-optimization)
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "s_0" in plan
    assert "s_1" not in plan and "s_2" not in plan
    # and the per-query results still rank independently
    rows = df.collect()
    assert {r.query_id for r in rows} == {1, 2, 3}
    assert all(r.n_terms == 1 for r in rows)
