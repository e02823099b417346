"""Mechanical unpartitioned-window audit over the whole contract surface.

VERDICT r5 item #5: a Window with NO partitioning funnels its entire input
through one task — the single most common scale-killer shape.  This test
walks the optimized logical plan of EVERY contract query at sf0.001 and
asserts that each unpartitioned Window sits above a provably bounded
input: a Limit or an Aggregate reached through row-preserving operators
only.  Bucket/bin/limit(k) tables are bounded; corpus-/vocabulary-/key-
table-sized inputs are not and must ride the ``_global_ranks`` sample
sort instead (hamilton_quota and zipf_stats were converted this round).

Runs the full registry, so it lives in its own file (several minutes);
invoke as ``python -m pytest tests/test_window_audit.py -x -q``.
"""

import os

import pytest

SF = "/root/testdata/sf0.001"

#: operators that neither grow their input nor bound it — keep walking.
ROW_PRESERVING = {
    "Project",
    "Filter",
    "Sort",
    "SubqueryAlias",
    "Repartition",
    "RepartitionByExpression",
    "RepartitionOperation",
    "ResolvedHint",
    "UnresolvedHint",
    "Window",
    "WindowGroupLimit",
}

#: operators that bound the row count flowing up into the window: an
#: explicit limit, or an aggregate (bucket/bin/group tables — cardinality
#: = |group keys|, orders below the data that produced them).
BOUNDED = {
    "GlobalLimit",
    "LocalLimit",
    "Limit",
    "Aggregate",
    "Deduplicate",
    # parameter-sized literal relations (vocab_growth's K-row checkpoint
    # grid is spark.range(n_checkpoints))
    "Range",
    "LocalRelation",
    "OneRowRelation",
}


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _bounded_node(node, depth=0):
    """True iff ``node``'s output size is bounded by a Limit/Aggregate
    reached through row-preserving operators; a Join follows its LEFT
    (stream) side — a bounded driving table joined against keyed lookups
    stays proportional to the bounded side (sweep_cut's top-m prefix,
    vocab_growth's K-row checkpoint table)."""
    if depth > 40:
        return False
    name = node.getClass().getSimpleName()
    if name in BOUNDED:
        return True
    if name == "Join":
        return _bounded_node(_children(node)[0], depth + 1)
    if name in ROW_PRESERVING:
        kids = _children(node)
        return len(kids) == 1 and _bounded_node(kids[0], depth + 1)
    return False


def _bounded_below(node):
    kids = _children(node)
    return len(kids) == 1 and _bounded_node(kids[0])


def _audit(node, offenders, path=""):
    name = node.getClass().getSimpleName()
    if name == "Window" and node.partitionSpec().isEmpty():
        if not _bounded_below(node):
            offenders.append(node.simpleString(200))
    for ch in _children(node):
        _audit(ch, offenders, path)


def test_no_unbounded_global_windows_anywhere(spark):
    if not os.path.isdir(SF):
        pytest.skip("testdata not present")
    import __spark_entry__ as em

    failures = {}
    for name, fn in sorted(em.queries().items()):
        try:
            df = fn(spark, SF)
        except Exception as exc:  # a broken query is its own failure
            failures[name] = [f"query construction failed: {exc}"]
            continue
        offenders = []
        _audit(df._jdf.queryExecution().optimizedPlan(), offenders)
        if offenders:
            failures[name] = offenders
        spark.catalog.clearCache()
    assert not failures, (
        "unpartitioned Window over unbounded input in: "
        + "; ".join(f"{k}: {v[0][:160]}" for k, v in sorted(failures.items()))
    )
