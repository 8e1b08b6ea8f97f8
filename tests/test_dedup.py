"""Behavioral tests for dedup operators on crafted fixtures (the testdata
corpus has no organic duplicates; these pin down semantics)."""

from __future__ import annotations

from flink_streaming_demo_spark.operators import dedup


def _corpus(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),     # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog tail"),  # near dup
        (4, "completely different words entirely here now folks"),
        (5, "short text"),                                       # < 3 tokens
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(spark):
    out = dedup.exact_dedup(_corpus(spark)).select("doc_id").collect()
    ids = sorted(r.doc_id for r in out)
    assert ids == [1, 3, 4, 5]  # 2 dropped (dup of 1)


def test_exact_dedup_groups_counts(spark):
    groups = {
        r.keep_id: r.n_copies
        for r in dedup.exact_dedup_groups(_corpus(spark)).collect()
    }
    assert groups[1] == 2
    assert groups[3] == 1


def test_minhash_finds_near_dup_pair(spark):
    pairs = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in dedup.minhash_lsh_pairs(_corpus(spark), threshold=0.3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical text
    assert (1, 3) in pairs  # near dup collides in some band
    assert not any({a, b} == {1, 4} for a, b in pairs)  # unrelated docs


def test_ngram_jaccard_exact_values(spark):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard_pairs(_corpus(spark), threshold=0.1).collect()
    }
    assert pairs[(1, 2)] == 1.0
    # doc1 has 7 shingles, doc3 has 8, sharing 7 -> 7/8
    assert abs(pairs[(1, 3)] - 7 / 8) < 1e-9
    assert not any({a, b} == {1, 4} for a, b in pairs)


def test_short_docs_excluded(spark):
    pairs = dedup.minhash_lsh_pairs(_corpus(spark), threshold=0.0).collect()
    assert not any(5 in (r.id_a, r.id_b) for r in pairs)


def test_simhash_neardup_identical_pair(spark):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash_neardup_pairs(_corpus(spark)).collect()
    }
    assert pairs[(1, 2)] == 0  # identical text -> identical simhash
    assert not any({a, b} == {1, 4} for a, b in pairs)  # unrelated docs
    assert all(h <= 1 for h in pairs.values())


def test_simhash64_banded_recall_equals_brute_force(spark):
    """The 4x16-band equi-join must find EXACTLY the pairs a brute-force
    all-pairs hamming <= 3 scan finds (pigeonhole recall), on a corpus
    with identical, near, and unrelated docs."""
    from itertools import combinations

    from flink_streaming_demo_spark.functions.text import simhash64_agg

    df = _corpus(spark)
    got = {
        (r.id_a, r.id_b): r.hamming
        for r in dedup.simhash64_neardup_pairs(df, max_hamming=3).collect()
    }
    sigs = {r.doc_id: r.simhash for r in simhash64_agg(df).collect()}
    want = {}
    for a, b in combinations(sorted(sigs), 2):
        h = sum(x != y for x, y in zip(sigs[a], sigs[b]))
        if h <= 3:
            want[(a, b)] = h
    assert got == want
    assert got[(1, 2)] == 0  # identical text -> hamming 0
    assert not any({a, b} == {1, 4} for a, b in got)  # unrelated docs


def test_simhash64_bands_encode_signature(spark):
    """bands[k] must be exactly bits 16k+1..16k+16 of the signature string
    (the hamming computation depends on it)."""
    from flink_streaming_demo_spark.functions.text import simhash64_agg

    for r in simhash64_agg(_corpus(spark)).collect():
        assert len(r.simhash) == 64
        for k in range(4):
            assert r.bands[k] == int(r.simhash[16 * k:16 * (k + 1)], 2)


def test_simhash64_radius_guard(spark):
    import pytest

    with pytest.raises(NotImplementedError):
        dedup.simhash64_neardup_pairs(_corpus(spark), max_hamming=4)
