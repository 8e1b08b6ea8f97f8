"""Behavioral tests for the Gopher-style repetition signals (the rest of
the text scalar library is pinned by the oracle-parity gate)."""

from __future__ import annotations

from flink_streaming_demo_spark.functions import text as TX


def test_repetition_agg_counts(spark):
    rows = [
        (1, "a b a b a b"),        # 2-grams: ab ba ab ba ab -> top "a b" x3
        (2, "w x y z"),            # all distinct: wx xy yz
        (3, "solo"),               # < 2 tokens -> no rows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_2grams, r.n_distinct_2grams, r.top_2gram_count)
        for r in TX.repetition_agg(df).collect()
    }
    assert got == {1: (5, 2, 3), 2: (3, 3, 1)}
    assert 3 not in got  # single-token doc: callers coalesce to zero
