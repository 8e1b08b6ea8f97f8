"""Independent-model tests for the round-10 analytics/contract queries:
basket-pair mining vs an itertools model, running revenue vs a pandas
prefix sum, data expectations vs a pandas recomputation. The DuckDB
oracle twins prove engine parity; these prove the SEMANTICS against a
second implementation that shares no SQL with either engine.
"""

from __future__ import annotations

import itertools
from collections import Counter

import pandas as pd

from flink_streaming_demo_spark.plans.tpch_more import (
    star_basket_pairs,
    system_data_expectations,
    tpch_running_revenue,
)
from flink_streaming_demo_spark.schemas import load_table


def test_basket_pairs_matches_itertools_model(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .toPandas()
    )
    # model: distinct parts per order, upper-triangle combos, count >= 2
    pair_counts: Counter = Counter()
    for _, grp in li.groupby("l_orderkey"):
        for a, b in itertools.combinations(sorted(set(grp.l_partkey)), 2):
            pair_counts[(a, b)] += 1
    expect = {p: c for p, c in pair_counts.items() if c >= 2}
    supp = li.drop_duplicates().groupby("l_partkey").size()
    n_orders = li.l_orderkey.nunique()

    got = star_basket_pairs(spark, sf_dir).toPandas()
    got_pairs = {
        (r.part_a, r.part_b): r.n_pair for r in got.itertuples()
    }
    assert got_pairs == expect
    for r in got.itertuples():
        assert r.n_a == supp[r.part_a] and r.n_b == supp[r.part_b]
        lift = r.n_pair * n_orders / (r.n_a * r.n_b)
        assert abs(r.lift - round(lift, 6)) < 1e-9


def test_running_revenue_matches_pandas_prefix_sum(spark, sf_dir):
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_shipdate", "l_extendedprice", "l_discount")
        .toPandas()
    )
    li["day"] = li.l_shipdate.dt.normalize()
    li["rev"] = li.l_extendedprice * (1 - li.l_discount)
    daily = (
        (li.groupby("day").rev.sum() * 100).round(0).astype("int64")
    ).sort_index()
    daily.index.name = "ship_date"
    running = daily.cumsum()

    got = (
        tpch_running_revenue(spark, sf_dir)
        .toPandas()
        .sort_values("ship_date")
        .set_index("ship_date")
    )
    assert len(got) == len(daily)
    pd.testing.assert_series_equal(
        got.daily_revenue,
        (daily / 100.0).round(2).rename("daily_revenue"),
        check_freq=False,
    )
    pd.testing.assert_series_equal(
        got.running_revenue,
        (running / 100.0).round(2).rename("running_revenue"),
        check_freq=False,
    )


def test_data_expectations_all_pass_and_counts_match(spark, sf_dir):
    out = (
        system_data_expectations(spark, sf_dir)
        .toPandas()
        .set_index("check_name")
    )
    assert len(out) == 8
    # the driver-generated tables satisfy every contract
    assert out.passed.all(), out[~out.passed]
    assert (out.n_violations == 0).all()
    # n_checked is the full parent-table count, also for the RI checks
    orders_n = load_table(spark, sf_dir, "orders").count()
    li_n = load_table(spark, sf_dir, "lineitem").count()
    assert out.loc["orders_custkey_in_customer", "n_checked"] == orders_n
    assert out.loc["lineitem_orderkey_in_orders", "n_checked"] == li_n
    assert out.loc["orders_custkey_not_null", "n_checked"] == orders_n


def test_data_expectations_detect_planted_violations(spark, sf_dir):
    """Same checks over a corrupted copy must flip to failed with exact
    violation counts — a gate that can't fail is not a gate."""
    import flink_streaming_demo_spark.plans.tpch_more as M
    from pyspark.sql import functions as F

    orig = M.t
    bad_rows = 7

    def corrupting_load(spark_, sf, name):
        df = orig(spark_, sf, name)
        if name == "orders":
            # send 7 orders to a custkey no customer has
            return df.withColumn(
                "o_custkey",
                F.when(
                    F.col("o_orderkey") % 100 < bad_rows, F.lit(-1)
                ).otherwise(F.col("o_custkey")),
            )
        return df

    M.t = corrupting_load
    try:
        out = (
            system_data_expectations(spark, sf_dir)
            .toPandas()
            .set_index("check_name")
        )
    finally:
        M.t = orig
    ri = out.loc["orders_custkey_in_customer"]
    assert not ri.passed
    expected_bad = (
        orig(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 < bad_rows)
        .count()
    )
    assert ri.n_violations == expected_bad
    # unrelated checks stay green
    assert out.loc["lineitem_orderkey_in_orders"].passed


def test_pca_top_component_matches_numpy_power_iteration(spark, sf_dir):
    """The engine's 3-iteration power method must track the identical
    numpy recurrence on the float covariance matrix (tolerance covers
    the 1e-6 moment quantization), and its eigval/loadings must agree
    with numpy's true dominant eigenpair to power-iteration accuracy."""
    import numpy as np

    from flink_streaming_demo_spark.plans.vector_queries import (
        PCA_ITERS,
        embedding_pca_top_component,
    )

    emb = np.array(
        [
            r.embedding
            for r in load_table(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    cov = np.cov(emb, rowvar=False, bias=True)
    v = np.full(cov.shape[0], 0.125)
    for _ in range(PCA_ITERS):
        w = cov @ v
        nrm = float(np.sqrt((w * w).sum()))
        v = w / nrm
    got = (
        embedding_pca_top_component(spark, sf_dir)
        .toPandas()
        .sort_values("dim")
    )
    assert len(got) == cov.shape[0]
    assert np.allclose(got.loading.to_numpy(), v, atol=1e-4)
    assert abs(got.eigval.iloc[0] - nrm) < 1e-3 * max(nrm, 1.0)
    # spectrum sanity: the estimate is a norm of C applied to a unit
    # vector, so it must sit inside [λ_min, λ_max]. (Alignment with the
    # TOP eigenvector is NOT asserted: the synthetic embeddings are
    # near-isotropic — λ2/λ1 ≈ 1 — so no small fixed iteration count
    # can converge direction; the contract here is the exact
    # recurrence, which the asserts above pin bit-for-bit-ish.)
    evals = np.linalg.eigvalsh(cov)
    assert evals[0] - 1e-9 <= got.eigval.iloc[0] <= evals[-1] + 1e-9


def test_mmr_matches_python_greedy_model(spark, sf_dir):
    """The MMR selection must equal an independent pure-Python greedy
    replay. The model's cosine uses the SAME left-fold association as
    SIM.cosine/sql_cosine, so scores are bit-identical doubles and the
    argmax comparison — including near-ties — is exact, not
    tolerance-based."""
    from flink_streaming_demo_spark.plans.vector_queries import (
        MMR_K,
        MMR_LAMBDA,
        MMR_MU,
        N_QUERIES,
        sim_mmr_diverse_topk,
    )

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + x * y
        return acc

    def norm(a):
        acc = 0.0
        for x in a:
            acc = acc + x * x
        return acc ** 0.5

    def cos(a, b):
        return fold_dot(a, b) / (norm(a) * norm(b))

    want = {}
    for qid in range(N_QUERIES):
        rel = {
            cid: cos(vecs[qid], v)
            for cid, v in vecs.items()
            if cid != qid
        }
        selected = []
        for step in range(1, MMR_K + 1):
            best = None
            for cid in sorted(rel):
                if cid in (s for s, _ in selected):
                    continue
                if step == 1:
                    mmr = MMR_LAMBDA * rel[cid] - MMR_MU * 0.0
                else:
                    msim = max(
                        cos(vecs[cid], vecs[s]) for s, _ in selected
                    )
                    mmr = MMR_LAMBDA * rel[cid] - MMR_MU * msim
                if best is None or mmr > best[1]:
                    best = (cid, mmr)
            selected.append(best)
            want[(qid, step)] = best[0]
    got = {
        (r.query_id, r.step): r.sel_id
        for r in sim_mmr_diverse_topk(spark, sf_dir).collect()
    }
    assert got == want


def test_kcenter_matches_python_greedy_model(spark, sf_dir):
    """Farthest-point selection must equal the pure-Python Gonzalez
    replay on bit-identical left-fold squared distances, and the
    coverage radius sequence must be non-increasing from step 3 on
    (each new center can only shrink the farthest gap)."""
    from flink_streaming_demo_spark.plans.vector_queries import (
        KC_K,
        sim_kcenter_coreset,
    )

    vecs = {
        r.vec_id: [float(x) for x in r.embedding]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def sq_l2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    selected = [min(vecs)]
    radii = [0.0]
    for _ in range(2, KC_K + 1):
        best = None
        for cid in sorted(vecs):
            if cid in selected:
                continue
            dmin = min(sq_l2(vecs[cid], vecs[s]) for s in selected)
            if best is None or dmin > best[1]:
                best = (cid, dmin)
        selected.append(best[0])
        radii.append(best[1])
    got = sorted(
        sim_kcenter_coreset(spark, sf_dir).collect(),
        key=lambda r: r.step,
    )
    assert [r.sel_id for r in got] == selected
    assert [r.radius for r in got] == [round(r, 6) for r in radii]
    assert all(
        got[i].radius >= got[i + 1].radius for i in range(2, KC_K - 1)
    )


def test_isotropy_matches_numpy_eigen_invariants(spark, sf_dir):
    """PR from the trace/Frobenius closed form must equal
    (Σλ)²/Σλ² from numpy's eigenvalues of the float covariance
    (tolerance covers the 1e-6 moment quantization), and sit in
    [1, n_dims]."""
    import numpy as np

    from flink_streaming_demo_spark.plans.vector_queries import (
        embedding_isotropy,
    )

    emb = np.array(
        [
            r.embedding
            for r in load_table(spark, sf_dir, "embeddings")
            .select("embedding")
            .collect()
        ],
        dtype=np.float64,
    )
    lam = np.linalg.eigvalsh(np.cov(emb, rowvar=False, bias=True))
    want = float(lam.sum() ** 2 / (lam**2).sum())
    got = embedding_isotropy(spark, sf_dir).collect()[0]
    assert abs(got.participation_ratio - want) < 1e-3
    assert 1.0 <= got.participation_ratio <= got.n_dims
    assert abs(got.isotropy_fraction - want / got.n_dims) < 1e-4


def test_ab_report_matches_pandas_welch_z(spark, sf_dir):
    """Arm assignment, per-arm moments, and the Welch z must match an
    independent pandas recomputation (tolerance covers the 1e-6 value
    quantization), and arm sizes must partition the events."""
    import hashlib

    from flink_streaming_demo_spark.plans.event_queries import (
        events_ab_test_report,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_type", "user_id", "value")
        .toPandas()
        .dropna(subset=["user_id"])
    )
    bucket = ev.user_id.map(
        lambda u: int(hashlib.md5(str(int(u)).encode()).hexdigest()[:8], 16)
        % 1_000_000
    )
    ev["arm_a"] = bucket % 2 == 0
    got = events_ab_test_report(spark, sf_dir).toPandas().set_index(
        "event_type"
    )
    for et, grp in ev.groupby("event_type"):
        a, b = grp[grp.arm_a].value, grp[~grp.arm_a].value
        r = got.loc[et]
        assert (r.n_a, r.n_b) == (len(a), len(b))
        assert abs(r.mean_a - a.mean()) < 1e-5
        assert abs(r.mean_b - b.mean()) < 1e-5
        va = (a**2).mean() - a.mean() ** 2
        vb = (b**2).mean() - b.mean() ** 2
        z = (a.mean() - b.mean()) / (va / len(a) + vb / len(b)) ** 0.5
        assert abs(r.z_score - z) < 1e-3
        assert r.significant == (abs(z) > 1.96)


def test_attribution_matches_pandas_replay(spark, sf_dir):
    """First/last-touch credit must equal an independent pandas replay
    of the lookback join — including zero-touch organic conversions."""
    from flink_streaming_demo_spark.plans.event_queries import (
        ATTR_LOOKBACK_S,
        events_attribution,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "ts")
        .toPandas()
    )
    purchases = ev[ev.event_type == "purchase"]
    clicks = ev[ev.event_type == "click"]
    want = {}
    for p in purchases.itertuples():
        win = clicks[
            (clicks.user_id == p.user_id)
            & (clicks.ts < p.ts)
            & (
                clicks.ts
                >= p.ts - pd.Timedelta(seconds=ATTR_LOOKBACK_S)
            )
        ]
        if len(win):
            first = win.sort_values(["ts", "event_id"]).iloc[0]
            last = win.sort_values(["ts", "event_id"]).iloc[-1]
            want[p.event_id] = (len(win), first.event_id, last.event_id)
        else:
            want[p.event_id] = (0, None, None)
    got = {
        r.purchase_id: (
            r.n_touches,
            r.first_touch_click,
            r.last_touch_click,
        )
        for r in events_attribution(spark, sf_dir).collect()
    }
    assert got == want
    assert any(v[0] == 0 for v in want.values()) or len(want) < 50


def test_curriculum_order_tiles_then_shuffles(spark, sf_dir):
    """Curriculum contract: the global order visits quartile 1..4 in
    blocks (graded difficulty), every tile's docs appear in md5-hash
    order within the tile (seeded shuffle, not length order), and the
    positions are a contiguous permutation."""
    import hashlib

    from flink_streaming_demo_spark.plans.sampling_queries import (
        sample_curriculum_order,
    )

    out = (
        sample_curriculum_order(spark, sf_dir)
        .toPandas()
        .sort_values("curriculum_pos")
        .reset_index(drop=True)
    )
    assert list(out.curriculum_pos) == list(range(1, len(out) + 1))
    # tiles appear as non-decreasing blocks
    assert list(out.tile) == sorted(out.tile)
    # within a tile: md5-bucket order, which is NOT the length order
    bucket = out.doc_id.map(
        lambda d: int(hashlib.md5(str(int(d)).encode()).hexdigest()[:8], 16)
        % 1_000_000
    )
    out["bucket"] = bucket
    for _, grp in out.groupby("tile"):
        assert list(grp.bucket) == sorted(
            grp.bucket
        ), "within-tile order is not the seeded shuffle"


def test_funnel_latency_matches_python_hist_replay(spark, sf_dir):
    """The latency quantiles must equal a pure-Python replay of the
    fixed-boundary histogram interpolation over pandas-derived
    transition latencies, and sit within one bin width (8 h) of the
    true empirical quantile."""
    import numpy as np

    from flink_streaming_demo_spark.plans.event_queries import (
        LAT_HI,
        LAT_LO,
        LAT_QS,
        events_funnel_latency,
        events_funnel_stages,
    )

    f = events_funnel_stages(spark, sf_dir).toPandas()
    lats = {
        "view_to_click": (
            (f.t_click - f.t_view).dt.total_seconds() / 3600.0
        ).dropna(),
        "click_to_purchase": (
            (f.t_purchase - f.t_click).dt.total_seconds() / 3600.0
        ).dropna(),
    }
    n_bins = 64
    width = (LAT_HI - LAT_LO) / n_bins

    def hist_quantile(vals, q):
        bins = np.clip(
            np.floor((vals - LAT_LO) / width).astype(int), 0, n_bins - 1
        )
        cnt = np.bincount(bins, minlength=n_bins)
        cum = np.cumsum(cnt)
        target = q * len(vals)
        b = int(np.searchsorted(cum, target))
        cum_before = cum[b] - cnt[b]
        return LAT_LO + (b + (target - cum_before) / cnt[b]) * width

    got = events_funnel_latency(spark, sf_dir).toPandas()
    assert set(got.transition) == set(lats)
    for r in got.itertuples():
        vals = lats[r.transition].to_numpy()
        assert r.n == len(vals)
        want = hist_quantile(vals, r.q)
        assert abs(r.hist_quantile - round(want, 6)) < 1e-6, (
            r.transition, r.q,
        )
        # the sketch's actual guarantee: the estimate lies in the bin
        # of the ceil(q*n)-th order statistic (numpy's interpolated
        # quantile can sit a sparse-tail gap away, so it is NOT the
        # right yardstick)
        order_stat = float(
            np.sort(vals)[int(np.ceil(r.q * len(vals))) - 1]
        )
        assert abs(r.hist_quantile - order_stat) <= width + 1e-9


def test_cov_partials_guards_and_halfup_fidelity():
    """_cov_partials' two loud guards (r13 ADVICE): the HALF_UP-fidelity
    envelope (|v*1e6| must stay under 2^52, i.e. |x| <~ 6.7e4) trips
    BEFORE the int64 overflow guard, and inside the envelope the
    copysign/floor quantization matches BigDecimal HALF_UP exactly on
    near-boundary magnitudes."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np
    import pandas as pd
    import pytest

    from flink_streaming_demo_spark.plans.vector_queries import (
        DIMS,
        _cov_partials,
    )

    def batch(x):
        return pd.DataFrame({"e": [[float(x)] * DIMS]})

    # inside the envelope: runs, and the diagonal product partial is the
    # HALF_UP-quantized square
    x = 12345.6789
    rows = next(_cov_partials(iter([batch(x)])))
    diag = rows[(rows.i == 1) & (rows.j == 1)].iloc[0]
    want = int(
        (Decimal(repr(x)) ** 2 * 1000000).to_integral_value(ROUND_HALF_UP)
    )
    # the float64 product x*x is what the kernel (and Spark's codegen
    # multiply) quantizes — allow the 1-ulp product difference vs the
    # exact Decimal square
    got_float = float(np.copysign(np.floor(abs(x * x * 1e6) + 0.5), 1.0))
    assert diag.sxy == int(got_float)
    assert abs(diag.sxy - want) <= 1
    assert diag.sx == int(
        (Decimal(repr(x)) * 1000000).to_integral_value(ROUND_HALF_UP)
    )

    # past the fidelity envelope (|x|^2*1e6 >= 2^52): loud, even though
    # a single row is nowhere near int64 overflow
    big = 7.0e4
    assert big * big * 1e6 >= 2.0**52
    with pytest.raises(ValueError, match="HALF_UP"):
        next(_cov_partials(iter([batch(big)])))

    # sanity: the envelope bound sits below the overflow bound for one
    # row, so the fidelity guard is the one that fires first
    assert 1 * (big * big * 1e6 + 1.0) < 2.0**62
