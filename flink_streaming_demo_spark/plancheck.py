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


def physical_plan_nodes(df: DataFrame) -> list[str]:
    """Preorder node-name sequence of ``df``'s PHYSICAL plan (exchanges,
    broadcasts, codegen boundaries included). Under AQE the top node is
    AdaptiveSparkPlanExec (a leaf from the traversal's point of view);
    we descend into its current plan — before execution that is the
    initial physical plan, which is exactly the deterministic
    pre-runtime shape a round-over-round fingerprint should pin.
    Expression details (ids, literals) are excluded on purpose: the
    fingerprint should change when the plan SHAPE changes (new shuffle,
    lost broadcast, lost whole-stage span), not when a constant does."""
    out: list[str] = []
    stack = [df._jdf.queryExecution().executedPlan()]
    while stack:
        node = stack.pop()
        name = node.getClass().getSimpleName()
        # Scala object-style suffix noise ("$anon$1") never appears for
        # plan nodes, but strip the Exec suffix for readability.
        label = name[:-4] if name.endswith("Exec") else name
        if "Scan" in name:
            # pin COLUMN PRUNING: a scan whose projected width grows
            # (e.g. a refactor drops the narrow select and the scan
            # starts reading every column) must change the fingerprint,
            # not just the wall time.
            label = f"{label}[{node.output().size()}]"
        out.append(label)
        kids = []
        if name == "AdaptiveSparkPlanExec":
            kids = [node.executedPlan()]
        else:
            children = node.children()
            kids = [children.apply(i) for i in range(children.size())]
        # preorder: push children in reverse so child 0 pops first
        stack.extend(reversed(kids))
    return out


def plan_fingerprint(df: DataFrame) -> tuple[str, str]:
    """(short md5, '>'-joined node names) of the physical plan shape —
    recorded per headline query in BENCH JSON so a plan regression is
    diffable round-over-round instead of inferred from wall time."""
    import hashlib

    nodes = ">".join(physical_plan_nodes(df))
    return hashlib.md5(nodes.encode()).hexdigest()[:12], nodes


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
