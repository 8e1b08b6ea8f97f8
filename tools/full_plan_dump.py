"""Dump the FULL physical plan of checkpoint-cut operators.

The engine's iterative/multi-consumer operators cut their plans with
``localCheckpoint`` (lazy), so a plain ``explain`` shows ``Scan
ExistingRDD`` stubs instead of the real tree (the r15 verdict's
evidence-gap #3). This helper patches ``localCheckpoint`` to the
identity on the CLASSIC DataFrame class (the concrete implementation in
Spark 4 — patching the abstract ``pyspark.sql.DataFrame`` base does
nothing) for the duration of a frame-building callback, so the dumped
plan shows every scan/exchange/join the operator plans, at the cost of
not reflecting the runtime checkpoint cuts. Dumps produced this way are
labeled with a header line.

Usage:
    from tools.full_plan_dump import full_plan
    txt = full_plan(lambda: build_my_frame(...))
"""

from __future__ import annotations

from contextlib import contextmanager


@contextmanager
def no_checkpoints():
    """Temporarily make DataFrame.localCheckpoint the identity."""
    from pyspark.sql.classic.dataframe import DataFrame as CDF

    orig = CDF.localCheckpoint
    CDF.localCheckpoint = lambda self, eager=True: self  # type: ignore
    try:
        yield
    finally:
        CDF.localCheckpoint = orig


def full_plan(build) -> str:
    """Build a DataFrame with checkpoints disabled and return its
    formatted physical plan, prefixed with a provenance header."""
    with no_checkpoints():
        df = build()
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
    return (
        "# full-tree dump: localCheckpoint patched to identity "
        "(tools/full_plan_dump.py) so checkpoint-cut subtrees are "
        "visible; runtime plans cut here\n" + txt
    )
