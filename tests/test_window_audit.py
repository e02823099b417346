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
BOUNDED = {"GlobalLimit", "LocalLimit", "Limit", "Aggregate", "Deduplicate"}


def _children(node):
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _bounded_below(node):
    """Walk the single-child chain below an unpartitioned Window; True iff
    a bounding operator appears before anything else."""
    kids = _children(node)
    while len(kids) == 1:
        name = kids[0].getClass().getSimpleName()
        if name in BOUNDED:
            return True
        if name not in ROW_PRESERVING:
            return False
        kids = _children(kids[0])
    return False


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
