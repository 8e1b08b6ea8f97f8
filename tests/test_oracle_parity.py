"""Replicates the driver's correctness gate locally at sf0.001: every
registered query with an oracle must hash-match DuckDB (tools/parity.py)."""

from __future__ import annotations

import pytest

from tools import parity


@pytest.fixture(scope="module")
def parity_results(spark):
    return parity.run("/root/testdata/sf0.001")


def test_all_queries_registered():
    import __spark_entry__ as e

    qs = e.queries()
    assert qs, "no queries registered"
    # every oracle key has a query
    assert set(e.oracle_sql()) <= set(qs)


def test_parity(parity_results):
    failures = {k: v for k, v in parity_results.items() if v}
    assert not failures, failures


def test_driver_contract_integrity():
    """Every oracle key maps to a registered query, and the rows-only
    set (no DuckDB analogue, by design) is exactly the two documented
    cases — a new query accidentally registered without its oracle
    would silently downgrade to the weaker rows-only check."""
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert set(qs) - set(oracles) == {
        "events_approx_distinct_users",
        "taxi_early_arrival_fires",
    }
    assert len(qs) >= 134
