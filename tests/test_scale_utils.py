"""Equivalence tests for the scale utilities: salting must never change
results, partitioned writes must partition-prune on read."""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import functions as F

from flink_streaming_demo_spark.operators import scale
from flink_streaming_demo_spark.schemas import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = (
        orders.join(cust, "o_custkey")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    salted = (
        scale.salted_join(orders, cust, "o_custkey", n_salts=4)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salt_splits_hot_key_when_prepartitioned(spark, sf_dir):
    """The regression the salt design exists for: the skewed side arrives
    ALREADY partitioned by the join key, so a partition-id-derived salt
    would be one constant per hot key (no splitting). The row-content salt
    must still spread a hot key across all n_salts values."""
    orders = load_table(spark, sf_dir, "orders")
    hot = orders.limit(500).withColumn("o_custkey", F.lit(42))
    pre = hot.repartition(4, "o_custkey")  # hot key confined to 1 partition
    n_salts = 4
    salts = (
        pre.select(scale.row_salt(pre, n_salts).alias("_salt"))
        .distinct()
        .count()
    )
    assert salts == n_salts


def test_salted_join_rejects_outer_how(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    import pytest

    with pytest.raises(ValueError, match="salted_join supports"):
        scale.salted_join(orders, cust, "o_custkey", how="right")


def test_salted_join_left_anti_equals_plain(spark, sf_dir):
    """left_anti is safe under dim replication: a dim key matches every
    salt, so survivors == the unsalted anti join's survivors."""
    orders = load_table(spark, sf_dir, "orders")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey"))
        .distinct()
    )
    plain = orders.join(urgent, "o_custkey", "left_anti").count()
    salted = scale.salted_join(
        orders, urgent, "o_custkey", n_salts=4, how="left_anti"
    ).count()
    assert plain == salted and plain > 0


def test_row_salt_skips_unhashable_map_columns(spark):
    df = spark.createDataFrame(
        [(1, {"a": 1}), (2, {"b": 2})], "id int, m map<string,int>"
    )
    # map column skipped, id still salts the rows
    assert df.select(scale.row_salt(df, 4)).distinct().count() >= 1
    only_map = df.select("m")
    import pytest

    with pytest.raises(ValueError, match="salt_from"):
        only_map.select(scale.row_salt(only_map, 4))


def test_salted_count_equals_plain_count(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    plain = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r.event_type: r.cnt
        for r in scale.salted_count(ev, "event_type", n_salts=4).collect()
    }
    assert plain == salted


def test_write_partitioned_prunes(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.to_date("ts")
    )
    out = tempfile.mkdtemp(prefix="part_")
    try:
        scale.write_partitioned(ev, out, ["event_type"], sort_cols=["ts"])
        one = spark.read.parquet(out).filter(F.col("event_type") == "click")
        plan = one._jdf.queryExecution().executedPlan().toString()
        # Partition filter prunes directories at planning time: the scan's
        # PartitionFilters carries the predicate.
        assert "PartitionFilters" in plan and "event_type" in plan
        n_click = ev.filter(F.col("event_type") == "click").count()
        assert one.count() == n_click
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_mergeable_stats_incremental_equals_full(spark, sf_dir):
    """stats(base) ⊕ stats(batch) must equal stats(base ∪ batch) exactly
    — the incremental-view-maintenance contract: a new ingest batch
    never forces a base rescan."""
    from flink_streaming_demo_spark.operators.scale import (
        finalize_source_stats,
        merge_source_stats,
        source_stats_partial,
    )
    from flink_streaming_demo_spark.schemas import load_table

    docs = load_table(spark, sf_dir, "documents")
    base = docs.filter(F.col("doc_id") % 3 != 0)
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    merged = merge_source_stats(
        source_stats_partial(base), source_stats_partial(batch)
    )
    full = source_stats_partial(docs)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, full.collect())
    )
    # associativity/commutativity: the other association must agree too
    merged2 = merge_source_stats(
        source_stats_partial(batch), source_stats_partial(base)
    )
    assert sorted(map(tuple, merged2.collect())) == sorted(
        map(tuple, full.collect())
    )
    # finalize derives the same mean/variance from either path
    a = sorted(map(tuple, finalize_source_stats(merged).collect()))
    b = sorted(map(tuple, finalize_source_stats(full).collect()))
    assert a == b


def test_mergeable_stats_new_key_in_delta(spark):
    """A batch introducing a brand-new key must appear in the merge with
    exactly its own partial."""
    from flink_streaming_demo_spark.operators.scale import (
        merge_source_stats,
        source_stats_partial,
    )

    base = spark.createDataFrame(
        [("a", 10), ("a", 20)], "source string, n_chars long"
    )
    delta = spark.createDataFrame(
        [("b", 5)], "source string, n_chars long"
    )
    got = {
        r.source: (r.n_rows, r.sum_val, r.min_val, r.max_val)
        for r in merge_source_stats(
            source_stats_partial(base), source_stats_partial(delta)
        ).collect()
    }
    assert got == {"a": (2, 30, 10, 20), "b": (1, 5, 5, 5)}


def test_kmv_merge_equals_whole(spark, sf_dir):
    """sketch(A) ⊕ sketch(B) == sketch(A ∪ B) EXACTLY — the semigroup
    property that lets per-partition/per-day KMV partials roll up
    without rescanning. Split events by parity of event_id (users
    overlap both halves, exercising the duplicate-absorbing
    array_distinct in the merge)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    whole = scale.kmv_partial(ev, ["event_type"], "user_id")
    merged = scale.kmv_merge(
        scale.kmv_partial(a, ["event_type"], "user_id"),
        scale.kmv_partial(b, ["event_type"], "user_id"),
        ["event_type"],
    )
    got = {r.event_type: r.kmv for r in merged.collect()}
    want = {r.event_type: r.kmv for r in whole.collect()}
    assert got == want
    # and therefore identical estimates
    est_m = {
        tuple(r) for r in scale.kmv_estimate(merged).collect()
    }
    est_w = {
        tuple(r) for r in scale.kmv_estimate(whole).collect()
    }
    assert est_m == est_w


def test_kmv_estimate_bounded_error_and_exact_below_k(spark, sf_dir):
    """Estimator contract: groups under k distinct keys are EXACT;
    groups at n >= k estimate within the sketch's standard error
    (~1/sqrt(k); assert 4 sigma so the seed-free test can't flake —
    md5 is fixed, so this is deterministic per dataset anyway)."""
    ev = load_table(spark, sf_dir, "events")
    k = 64
    est = {
        r.event_type: (r.n_sampled, r.kmv_distinct)
        for r in scale.kmv_estimate(
            scale.kmv_partial(ev, ["event_type"], "user_id", k=k), k=k
        ).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for t, (n_sampled, kd) in est.items():
        if exact[t] < k:
            assert (n_sampled, kd) == (exact[t], exact[t]), t
        else:
            assert n_sampled == k, t
            rel = abs(kd - exact[t]) / exact[t]
            assert rel < 4.0 / (k ** 0.5), (t, kd, exact[t], rel)


def test_kmv_excludes_null_keys_like_count_distinct(spark):
    """NULL keys must not consume sketch slots or shrink the array (the
    COUNT(DISTINCT) contract): with k=4 and 6 real keys plus NULLs, the
    sketch must hold exactly 4 real fractions and estimate from them —
    a NULL burning slot rn=1 under nulls-first ordering then vanishing
    in collect_list would yield a k-1 array and a bogus 'exact' count."""
    rows = [("g", i if i < 6 else None) for i in range(9)]
    df = spark.createDataFrame(rows, "grp string, key long")
    part = scale.kmv_partial(df, ["grp"], "key", k=4)
    (r,) = part.collect()
    assert len(r.kmv) == 4 and all(v is not None for v in r.kmv)
    (e,) = scale.kmv_estimate(part, k=4).collect()
    assert e.n_sampled == 4  # estimator branch, not the exact one


def test_hll_merge_equals_whole_and_is_idempotent(spark, sf_dir):
    """Register sketches obey sketch(A) ⊕ sketch(B) == sketch(A ∪ B)
    EXACTLY (per-bucket MAX is associative/commutative), and re-merging
    a partial with itself is a no-op (idempotence — the property that
    makes a crash-replayed micro-batch harmless). Split events by
    event_id parity so users overlap both halves."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    whole = scale.hll_partial(ev, ["event_type"], "user_id")
    pa = scale.hll_partial(a, ["event_type"], "user_id")
    merged = scale.hll_merge(
        pa, scale.hll_partial(b, ["event_type"], "user_id"), ["event_type"]
    )
    key = lambda df: {  # noqa: E731
        (r.event_type, r.bucket): r.rho for r in df.collect()
    }
    assert key(merged) == key(whole)
    again = scale.hll_merge(pa, pa, ["event_type"])
    assert key(again) == key(pa)
    # and therefore identical estimates
    est = lambda df: {  # noqa: E731
        tuple(r) for r in scale.hll_estimate(df, ["event_type"]).collect()
    }
    assert est(merged) == est(whole)


def test_hll_estimate_bounded_error(spark, sf_dir):
    """Estimator contract: within ~4 sigma of exact for m=256 registers
    (sigma = 1.04/sqrt(256) = 6.5%; md5 is fixed so this is
    deterministic per dataset, the margin just keeps the test
    dataset-portable). Exercised on both grouping shapes: per
    event_type (small cardinality -> linear-counting branch) and the
    global ALL-rows group via a constant group column."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "one", F.lit("all")
    )
    for grp in (["event_type"], ["one"]):
        est = {
            tuple(r[c] for c in grp): r.hll_distinct
            for r in scale.hll_estimate(
                scale.hll_partial(ev, grp, "user_id"), grp
            ).collect()
        }
        exact = {
            tuple(r[c] for c in grp): r.n
            for r in ev.groupBy(*grp)
            .agg(F.countDistinct("user_id").alias("n"))
            .collect()
        }
        assert set(est) == set(exact)
        for g, n in exact.items():
            rel = abs(est[g] - n) / n
            assert rel < 4 * 1.04 / (scale.HLL_M ** 0.5), (g, est[g], n)


def test_hll_excludes_null_keys_and_caps_state(spark):
    """NULL keys are excluded (COUNT(DISTINCT) contract) and register
    state never exceeds HLL_M rows per group no matter how many keys
    hash in — the constant-state scale claim."""
    rows = [("g", i if i % 3 else None) for i in range(3000)]
    df = spark.createDataFrame(rows, "grp string, key long")
    part = scale.hll_partial(df, ["grp"], "key")
    regs = part.collect()
    assert 0 < len(regs) <= scale.HLL_M
    assert all(1 <= r.rho <= 61 and 0 <= r.bucket < scale.HLL_M
               for r in regs)
    # NULL-only input -> no registers at all, not a bogus group row
    empty = scale.hll_partial(
        spark.createDataFrame([("g", None)], "grp string, key long"),
        ["grp"], "key",
    )
    assert empty.count() == 0


def test_hll_lc_branch_fixture_takes_linear_counting(spark, sf_dir):
    """The planted-cardinality fixture (events_hll_lc_users) must
    actually exercise the linear-counting branch — the one libm (ln)
    call in the sketch: every 'lc'-tier row reports lc_branch=True, and
    the estimate sits within the sketch's small-range error of the true
    planted cardinality. sf0.001: ~30 keys/type (2 per user), m=256."""
    from flink_streaming_demo_spark.plans.event_queries import (
        events_hll_lc_users,
    )

    rows = events_hll_lc_users(spark, sf_dir).collect()
    assert rows, "fixture produced no groups"
    lc_rows = [r for r in rows if r.tier == "lc"]
    assert lc_rows and all(r.lc_branch for r in lc_rows)
    ev = load_table(spark, sf_dir, "events")
    truth = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct(
                F.concat(
                    F.col("user_id").cast("string"),
                    F.lit("#"),
                    F.pmod("event_id", F.lit(2)).cast("string"),
                )
            ).alias("n")
        )
        .collect()
    }
    for r in lc_rows:
        # LC error at V zero-registers is ~sqrt(m)-scale; 15% covers it
        # comfortably at these planted cardinalities without being loose
        # enough to pass on a broken branch (raw HLL at n<<m overshoots
        # by far more).
        assert abs(r.hll_distinct - truth[r.event_type]) <= max(
            6, 0.15 * truth[r.event_type]
        )


def test_hll_lc_branch_indicator_false_above_cut(spark, sf_dir):
    """Negative control for the branch indicator: a high-cardinality key
    (event_id over ONE global group — 1000 distinct at sf0.001, raw
    estimate far above the 2.5*m = 640 cut; per-event_type would only be
    200/group, still LC) must report lc_branch=False, proving the
    indicator discriminates rather than being constant-true."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "g", F.lit("all")
    )
    est = scale.hll_estimate_detail(
        scale.hll_partial(ev, ["g"], "event_id"), ["g"]
    ).collect()
    assert est and all(not r.lc_branch for r in est)
    # and hll_estimate is detail minus the indicator column
    slim = scale.hll_estimate(
        scale.hll_partial(ev, ["g"], "event_id"), ["g"]
    )
    assert slim.columns == ["g", "n_registers", "hll_distinct"]


def test_bloom_merge_equals_whole_and_no_false_negatives(spark, sf_dir):
    """Bloom sketch algebra: sketch(A) ⊕ sketch(B) == sketch(A ∪ B)
    bit-for-bit (bit_or associativity), merge is idempotent, and every
    key that IS in the set probes maybe_member=True (the no-false-
    negatives contract decontamination relies on)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    whole = scale.bloom_partial(ev, ["event_type"], "user_id")
    pa = scale.bloom_partial(a, ["event_type"], "user_id")
    merged = scale.bloom_merge(
        pa,
        scale.bloom_partial(b, ["event_type"], "user_id"),
        ["event_type"],
    )

    def bits(df):
        return {
            (r.event_type, r.word): r.bits for r in df.collect()
        }

    assert bits(merged) == bits(whole)
    again = scale.bloom_merge(pa, pa, ["event_type"])
    assert bits(again) == bits(pa)
    # no false negatives: probe every actually-present (type, user)
    present = ev.select("event_type", "user_id").distinct()
    probed = scale.bloom_maybe_contains(
        whole, present, ["event_type"], "user_id"
    )
    assert probed.filter(~F.col("maybe_member")).count() == 0


def test_bloom_absent_keys_mostly_rejected(spark, sf_dir):
    """The other half of the contract: keys far outside the sketched set
    should mostly probe False (false-positive rate ~ (1-e^(-kn/m))^k —
    well under 10% at n<=200 per group, m=4096, k=5). 'Mostly' is pinned
    loosely (< 25%) so the test detects a degenerate always-True sketch
    without flaking on hash luck."""
    ev = load_table(spark, sf_dir, "events")
    sketch = scale.bloom_partial(ev, ["event_type"], "user_id")
    absent = (
        ev.select("event_type")
        .distinct()
        .crossJoin(
            ev.select(
                (F.col("user_id") + 1_000_000).alias("user_id")
            ).distinct()
        )
    )
    probed = scale.bloom_maybe_contains(
        sketch, absent, ["event_type"], "user_id"
    )
    n = probed.count()
    fp = probed.filter(F.col("maybe_member")).count()
    assert n > 0 and fp / n < 0.25, (fp, n)


def test_cms_merge_equals_whole_and_never_undercounts(spark, sf_dir):
    """CMS algebra: per-(row, col) SUM merge of split sketches equals
    the whole-input sketch exactly, and every point estimate >= the true
    count (one-sided error), <= the group's total rows (sanity cap)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    whole = scale.cms_partial(ev, ["event_type"], "user_id")
    merged = scale.cms_merge(
        scale.cms_partial(a, ["event_type"], "user_id"),
        scale.cms_partial(b, ["event_type"], "user_id"),
        ["event_type"],
    )

    def grid(df):
        return {
            (r.event_type, r.row, r.col): r.cnt for r in df.collect()
        }

    assert grid(merged) == grid(whole)
    probes = ev.select("event_type", "user_id").distinct()
    est = scale.cms_estimate(whole, probes, ["event_type"], "user_id")
    exact = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    totals = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_all"))
    joined = est.join(exact, ["event_type", "user_id"]).join(
        totals, "event_type"
    )
    bad = joined.filter(
        (F.col("cms_count") < F.col("n_exact"))
        | (F.col("cms_count") > F.col("n_all"))
    )
    assert bad.count() == 0


def test_hist_merge_equals_whole_and_quantiles_within_bin_width(
    spark, sf_dir
):
    """Histogram algebra: per-bin SUM merge of split sketches equals the
    whole-input sketch, and each interpolated quantile sits within one
    bin width of the exact percentile (the sketch's error bound)."""
    lo, hi, n_bins = 0.0, 512.0, 64
    ev = load_table(spark, sf_dir, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    whole = scale.hist_partial(ev, ["event_type"], "value", lo, hi, n_bins)
    merged = scale.hist_merge(
        scale.hist_partial(a, ["event_type"], "value", lo, hi, n_bins),
        scale.hist_partial(b, ["event_type"], "value", lo, hi, n_bins),
        ["event_type"],
    )

    def grid(df):
        return {(r.event_type, r.bin): r.cnt for r in df.collect()}

    assert grid(merged) == grid(whole)
    qs = [0.5, 0.9]
    est = {
        (r.event_type, r.q): r.hist_quantile
        for r in scale.hist_quantiles(
            whole, ["event_type"], qs, lo, hi, n_bins
        ).collect()
    }
    exact = {
        (r.event_type, q): v
        for r in ev.groupBy("event_type")
        .agg(
            F.expr(
                "percentile(value, array(0.5, 0.9))"
            ).alias("p")
        )
        .collect()
        for q, v in zip(qs, r.p)
    }
    width = (hi - lo) / n_bins
    assert set(est) == set(exact)
    for key, got in est.items():
        assert abs(got - exact[key]) <= width, (key, got, exact[key])


def test_bloom_pruned_semi_join_is_exact_and_prunes(spark, sf_dir):
    """The accelerated semi-join must be ROW-IDENTICAL to the plain
    semi-join (no false negatives + exact verify), and the map-side
    Bloom predicate must actually prune (pass-count well under the
    table size for a small key set)."""
    ev = load_table(spark, sf_dir, "events")
    keys = (
        ev.filter(
            (F.col("event_type") == "purchase")
            & (F.col("user_id") % 5 == 0)
        )
        .select("user_id")
        .distinct()
    )
    got = scale.bloom_pruned_semi_join(ev, keys, "user_id")
    want = ev.join(keys, "user_id", "left_semi")
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    sketch = scale.bloom_partial(keys, [], "user_id")
    pred = scale.bloom_filter_expr(sketch, F.col("user_id"))
    n_all = ev.count()
    n_pass = ev.filter(pred).count()
    n_true = want.count()
    assert n_true <= n_pass < n_all * 0.8, (n_true, n_pass, n_all)


def test_sketches_on_empty_input(spark):
    """Empty-input contracts across the sketch family: empty data gives
    empty sketches and empty estimates; probes against an EMPTY sketch
    answer the identity of each algebra (Bloom: nothing is a member;
    CMS: every count is 0) instead of erroring; the map-side Bloom
    expression built from an empty sketch rejects every row."""
    empty = spark.createDataFrame([], "g string, key long, v double")
    probes = spark.createDataFrame([("a", 1)], "g string, key long")
    assert (
        scale.hll_estimate(
            scale.hll_partial(empty, ["g"], "key"), ["g"]
        ).count()
        == 0
    )
    assert scale.kmv_estimate(
        scale.kmv_partial(empty, ["g"], "key")
    ).count() == 0
    bl = scale.bloom_maybe_contains(
        scale.bloom_partial(empty, ["g"], "key"), probes, ["g"], "key"
    ).collect()
    assert [r.maybe_member for r in bl] == [False]
    cm = scale.cms_estimate(
        scale.cms_partial(empty, ["g"], "key"), probes, ["g"], "key"
    ).collect()
    assert [r.cms_count for r in cm] == [0]
    assert (
        scale.hist_quantiles(
            scale.hist_partial(empty, ["g"], "v", 0.0, 10.0),
            ["g"], [0.5], 0.0, 10.0,
        ).count()
        == 0
    )
    pred = scale.bloom_filter_expr(
        scale.bloom_partial(empty, [], "key"), F.col("key")
    )
    assert probes.filter(pred).count() == 0
    assert (
        scale.bloom_pruned_semi_join(
            probes, empty.select("key"), "key"
        ).count()
        == 0
    )


def test_kmv_set_ops_bounded_error(spark, sf_dir):
    """Pairwise union/intersection/Jaccard from sketches track the exact
    values. Error model (Beyer et al. 2007): union inherits the KMV
    standard error (~1/sqrt(k)); k_int is a hypergeometric sample of k
    union elements, adding ~sqrt(J(1-J)/k) to the Jaccard — assert
    4-sigma-ish combined bounds (deterministic per dataset: md5 seed)."""
    ev = load_table(spark, sf_dir, "events")
    est = {
        (r.type_a, r.type_b): r
        for r in scale.kmv_set_ops(
            scale.kmv_partial(ev, ["event_type"], "user_id"),
            "event_type",
        ).collect()
    }
    users = ev.select("event_type", "user_id").distinct().collect()
    by_type: dict[str, set] = {}
    for r in users:
        by_type.setdefault(r.event_type, set()).add(r.user_id)
    types = sorted(by_type)
    k = scale.KMV_K
    n_pairs = 0
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            n_pairs += 1
            a, b = by_type[ta], by_type[tb]
            got = est[(ta, tb)]
            exact_u, exact_i = len(a | b), len(a & b)
            if exact_u < k:
                assert got.union_distinct == exact_u
                assert got.intersect_distinct == exact_i
            else:
                assert (
                    abs(got.union_distinct - exact_u) / exact_u
                    < 4.0 / k ** 0.5
                ), (ta, tb, got.union_distinct, exact_u)
                j = exact_i / exact_u
                sigma = (j * (1 - j) / k) ** 0.5 + 1.0 / k ** 0.5
                assert abs(got.jaccard - j) < 4 * sigma + 1e-9, (
                    ta, tb, got.jaccard, j,
                )
                assert (
                    abs(got.intersect_distinct - exact_i)
                    <= 4 * sigma * exact_u + exact_u * 4.0 / k ** 0.5 + 1
                ), (ta, tb, got.intersect_distinct, exact_i)
    assert est.keys() == {
        (ta, tb) for i, ta in enumerate(types) for tb in types[i + 1:]
    } and n_pairs == len(est)


def test_kmv_set_ops_exact_below_k(spark):
    """When the pair's union fits in the sketch (|A ∪ B| < k) every
    output is exact, including Jaccard as k_int/n_u (not k_int/k)."""
    rows = [("a", i) for i in range(30)] + [("b", i) for i in range(20, 60)]
    df = spark.createDataFrame(rows, "event_type string, user_id long")
    out = scale.kmv_set_ops(
        scale.kmv_partial(df, ["event_type"], "user_id"), "event_type"
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.type_a, r.type_b) == ("a", "b")
    assert r.union_distinct == 60
    assert r.intersect_distinct == 10
    assert abs(r.jaccard - round(10 / 60, 6)) < 1e-12


def test_kmv_rolling_window_equals_direct_window_sketch(spark, sf_dir):
    """The rolling query's merged 7-day sketch must EQUAL the sketch
    computed directly over each window's events (merge associativity
    applied to a sliding window), including n_sampled and the estimate
    — the property that makes per-day partials a lossless substrate
    for ANY window over them."""
    from flink_streaming_demo_spark.plans.event_queries import (
        events_kmv_rolling_distinct,
    )

    got = {
        r.win_day: (r.n_sampled, r.kmv_distinct)
        for r in events_kmv_rolling_distinct(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("DAY", F.col("ts"))
    )
    days = [r.day for r in ev.select("day").distinct().collect()]
    import datetime

    for d in days:
        lo = d - datetime.timedelta(days=6)
        win = ev.filter((F.col("day") >= lo) & (F.col("day") <= d))
        direct = scale.kmv_estimate(
            scale.kmv_partial(win.withColumn("_g", F.lit(1)), ["_g"],
                              "user_id")
        ).collect()[0]
        assert got[d] == (direct.n_sampled, direct.kmv_distinct), d


def test_hist_rolling_window_equals_direct_window_sketch(spark, sf_dir):
    """The rolling histogram query's merged 7-day bins must EQUAL the
    bins computed directly over each window's events (SUM merge
    associativity on a sliding window) — so its quantiles inherit the
    single-window sketch's one-bin error bound unchanged."""
    from flink_streaming_demo_spark.plans.event_queries import (
        HIST_HI,
        HIST_LO,
        HIST_QS,
        events_hist_rolling_quantiles,
    )

    got = {
        (r.win_day, r.q): (r.hist_quantile, r.n)
        for r in events_hist_rolling_quantiles(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("DAY", F.col("ts"))
    )
    days = [r.day for r in ev.select("day").distinct().collect()]
    import datetime

    for d in days:
        lo = d - datetime.timedelta(days=6)
        win = ev.filter((F.col("day") >= lo) & (F.col("day") <= d))
        direct = {
            r.q: (r.hist_quantile, r.n)
            for r in scale.hist_quantiles(
                scale.hist_partial(
                    win.withColumn("_g", F.lit(1)),
                    ["_g"],
                    "value",
                    HIST_LO,
                    HIST_HI,
                ),
                ["_g"],
                list(HIST_QS),
                HIST_LO,
                HIST_HI,
            ).collect()
        }
        for q in HIST_QS:
            assert got[(d, q)] == direct[q], (d, q)


def test_cms_rolling_window_equals_direct_window_estimates(spark, sf_dir):
    """The rolling CMS query's merged 7-day counter grid must yield the
    SAME point estimates as a grid built directly over each window's
    events (SUM merge associativity) — and every estimate must keep the
    one-sided contract cms_count >= the user's exact event count in the
    window (CMS never under-counts)."""
    from flink_streaming_demo_spark.plans.event_queries import (
        events_cms_rolling_counts,
    )

    rows = events_cms_rolling_counts(spark, sf_dir).collect()
    got = {(r.win_day, r.user_id): r.cms_count for r in rows}
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("DAY", F.col("ts"))
    )
    days = sorted(
        r.day for r in ev.select("day").distinct().collect()
    )[:3]  # three windows keep the replay cheap; algebra is day-agnostic
    import datetime

    for d in days:
        lo = d - datetime.timedelta(days=6)
        win = ev.filter(
            (F.col("day") >= lo)
            & (F.col("day") <= d)
            & F.col("user_id").isNotNull()
        )
        probes = (
            ev.filter((F.col("day") == d) & F.col("user_id").isNotNull())
            .select("user_id")
            .distinct()
            .withColumn("_g", F.lit(1))
        )
        direct = {
            r.user_id: r.cms_count
            for r in scale.cms_estimate(
                scale.cms_partial(
                    win.withColumn("_g", F.lit(1)), ["_g"], "user_id"
                ),
                probes,
                ["_g"],
                "user_id",
            ).collect()
        }
        exact = {
            r.user_id: r.n
            for r in win.groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        for u, est in direct.items():
            assert got[(d, u)] == est, (d, u)
            assert est >= exact.get(u, 0), (d, u)
