"""The examples/ scripts must stay runnable — they are the repo's
user-facing entry points, so a refactor that breaks them is a release
blocker even if the operator tests stay green."""

from __future__ import annotations

import subprocess
import sys

import pytest


def _run(script: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, script, "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=600,
        cwd="/root/repo",
    )


@pytest.mark.slow
def test_clean_corpus_example_runs():
    r = _run("examples/clean_corpus_end_to_end.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "after dedup" in r.stdout
    assert "merges:" in r.stdout


@pytest.mark.slow
def test_streaming_ingest_example_runs():
    r = _run("examples/streaming_ingest.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "distinct quality-passing contents" in r.stdout
    assert "exact_dup" in r.stdout


@pytest.mark.slow
def test_bench_emits_valid_json_line():
    """bench.py is the driver's per-round artifact: it must run and its
    LAST stdout line must be the documented one-line JSON contract."""
    import json
    import os
    import subprocess
    import sys

    import tempfile

    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        # keep the committed sf0.1 sidecar out of this tiny-SF run
        SPARK_GRAFT_DETAILS_DIR=tempfile.mkdtemp(prefix="benchsc_"),
    )
    r = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True,
        text=True,
        timeout=580,
        cwd="/root/repo",
        env=env,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = r.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["metric"] == "headline_queries_total_wall_sec"
    assert d["unit"] == "sec" and d["value"] > 0
    assert set(d["queries"]) >= {"tpch_q1_pricing_summary",
                                 "pipeline_clean_corpus"}


def test_sketch_rollups_example_runs():
    r = _run("examples/sketch_rollups.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "KMV / HLL distinct from per-day partials" in r.stdout
    assert "hist_quantile" in r.stdout
    assert "maybe_member" in r.stdout


def test_data_recipe_example_runs():
    r = _run("examples/data_recipe.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "sources at the repeat cap" in r.stdout
    assert "weighted reservoir" in r.stdout


@pytest.mark.slow
def test_watermark_tuning_example_runs():
    r = _run("examples/watermark_tuning.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "operating points" in r.stdout
    assert "maintained incrementally" in r.stdout
    assert "epoch granularity is the only difference" in r.stdout


def test_serving_order_example_runs():
    r = _run("examples/serving_order.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "contiguous, no gaps" in r.stdout
    assert "different position per epoch" in r.stdout
    assert "off by at most one slot per source" in r.stdout


def test_pipeline_health_example_runs():
    r = _run("examples/pipeline_health.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "gate: CERTIFY (0 failing checks)" in r.stdout
    assert "arrival lateness vs watermark" in r.stdout
    assert "report complete" in r.stdout


@pytest.mark.slow
def test_hybrid_retrieval_example_runs():
    r = _run("examples/hybrid_retrieval.py")
    assert r.returncode == 0, r.stderr[-2000:]
    assert "view == batch: True" in r.stdout
    assert "nDCG@10=" in r.stdout
