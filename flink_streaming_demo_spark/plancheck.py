"""Plan-introspection helpers for scale guards.

Used by tests (and available to operators) to assert structural
properties of Catalyst plans that the string form of ``explain`` makes
awkward to check — most importantly, that no query ships a Window with
an EMPTY partition spec over unbounded input: Spark plans that as one
SinglePartition exchange + one task sorting every row ("WindowExec: No
Partition Defined"), the canonical 100x-scale straggler.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def iter_unpartitioned_windows(df: DataFrame) -> list[str]:
    """Return the first line of every Window node in ``df``'s OPTIMIZED
    logical plan whose partition spec is empty (i.e. would execute as a
    single-partition WindowExec). Empty list = clean plan."""
    out: list[str] = []
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if (
            node.getClass().getSimpleName() == "Window"
            and node.partitionSpec().isEmpty()
        ):
            out.append(node.toString().splitlines()[0])
        children = node.children()
        for i in range(children.size()):
            stack.append(children.apply(i))
    return out
