"""Snapshot delta over edge tables — the recrawl maintenance pass.

A link graph is not static: every recrawl produces a new snapshot, and the
operational questions are "which edges appeared / disappeared / persisted
since last time" and "which sources churn". The reference holds one static
matrix at a time (SpParMat — include/CombBLAS/SpParMat.h); its only
incremental surface is IncrementalMCLSquare's A+delta squaring
(operators/multiply.py here), so snapshot diffing is an ingest-side op a
CombBLAS user bolts on before the matrix ever exists.

Spark-first shape: NOT a full-outer join of the two snapshots (two
shuffled sides, null-handling on every column). Each snapshot is tagged
with a presence bit and ONE map-side-combinable groupBy over the union
computes the status — the bit sum is 1 = removed, 2 = added,
3 = persisted. One shuffle on the edge key, partial aggregation upstream,
and the same plan at 100 TB: churn between two 1-trillion-edge crawls is
a single co-partitioned aggregate (bucket both snapshots by (src, dst)
and even that shuffle disappears — sources/bucketed.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

STATUS_REMOVED = 1
STATUS_ADDED = 2
STATUS_PERSISTED = 3


def edge_delta(e_old: DataFrame, e_new: DataFrame) -> DataFrame:
    """Per-edge delta status between two SIMPLE edge tables (src, dst):
    (src, dst, status) with status 1 = removed (old only), 2 = added
    (new only), 3 = persisted (both). Inputs must be duplicate-free —
    a duplicated row would alias one status as another (3 could mean
    'twice in old'), so correctness of the one-aggregate plan rests on
    the simple-graph contract the rest of the engine already enforces
    (build_graph dedups at ingest)."""
    tagged = e_old.select(
        F.col("src").cast("long").alias("src"),
        F.col("dst").cast("long").alias("dst"),
        F.lit(STATUS_REMOVED).alias("b"),
    ).unionByName(
        e_new.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.lit(STATUS_ADDED).alias("b"),
        )
    )
    return tagged.groupBy("src", "dst").agg(
        F.sum("b").cast("int").alias("status")
    )


def delta_stats(e_old: DataFrame, e_new: DataFrame) -> DataFrame:
    """Per-source churn table: (src, n_added, n_removed, n_persisted).
    Exact integers so cross-engine hashes are stable; the per-source
    Jaccard churn n_persisted / (n_added + n_removed + n_persisted) is a
    downstream one-liner left to the caller. Two map-side-combinable
    aggregates total (edge key, then src)."""
    d = edge_delta(e_old, e_new)
    return d.groupBy("src").agg(
        F.sum((F.col("status") == STATUS_ADDED).cast("long")).alias("n_added"),
        F.sum((F.col("status") == STATUS_REMOVED).cast("long")).alias(
            "n_removed"
        ),
        F.sum((F.col("status") == STATUS_PERSISTED).cast("long")).alias(
            "n_persisted"
        ),
    )
