"""Reverse Cuthill-McKee ordering — bandwidth-reducing relabeling.

Reference: /root/reference/Applications/Ordering/RCM.cpp:332-380 (RCMOrder):
BFS from a (pseudo-peripheral) source; each fringe vertex is labeled
(parent's order, own degree) (RCM.cpp:61-90 VertexType ordering), the
fringe is sorted by that label to assign the next orders, and the final
permutation is the REVERSE of the visit order. Here each BFS level is
ranked with the parallel sample-sort ranker (operators.indexing
._global_ranks) on (parent_order, degree, id) — no single-task sort.

The natural consumer is operators.reduce.bandwidth/profile: relabeling by
this permutation shrinks both on banded-able graphs (pytest asserts it).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.algorithms.bfs import bfs
from combblas_spark.operators.indexing import _global_ranks
from combblas_spark.plans.superstep import SuperstepRunner


def pseudo_peripheral_source(edges: DataFrame) -> int:
    """Min-degree vertex (ties -> min id) — the reference seeds its
    pseudo-peripheral search the same way (RCM.cpp:424-431)."""
    deg = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    row = deg.orderBy(F.col("deg").asc(), F.col("id").asc()).limit(1).collect()[0]
    return int(row["id"])


def rcm_order(
    spark: SparkSession,
    edges: DataFrame,
    source: Optional[int] = None,
    runner: Optional[SuperstepRunner] = None,
    max_depth: int = 10_000,
) -> DataFrame:
    """Returns the permutation (id, val=new index) over reached vertices.

    ``edges`` must be symmetric. Unreached vertices (other components) are
    appended after, ordered by (degree, id) — callers wanting strict
    per-component RCM run it per component. ``max_depth`` caps the BFS
    (share it with any fixed-depth oracle, like BFS_DEPTH in the contract).
    """
    if source is None:
        source = pseudo_peripheral_source(edges)
    tree = bfs(spark, edges, source, runner=runner, max_iter=max_depth)
    tree = tree.localCheckpoint()
    deg = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    ).localCheckpoint()

    max_depth = tree.agg(F.max("depth")).collect()[0][0]
    orders = tree.filter(F.col("depth") == 0).select("id", F.lit(0).cast("long").alias("ord"))
    offset = 1
    for d in range(1, max_depth + 1):
        lvl = (
            tree.filter(F.col("depth") == d)
            .join(orders.select(F.col("id").alias("parent"), F.col("ord").alias("parent_ord")),
                  on="parent")
            .join(deg, on="id")
        )
        ranked = _global_ranks(
            lvl, [F.col("parent_ord").asc(), F.col("deg").asc(), F.col("id").asc()]
        ).select("id", (F.col("rank") + F.lit(offset)).alias("ord"))
        ranked = ranked.localCheckpoint()
        offset += ranked.count()
        orders = orders.unionByName(ranked).localCheckpoint()

    # other components: appended by (degree, id) — keeps the permutation total
    rest = deg.join(orders.select("id"), on="id", how="left_anti")
    if rest.limit(1).count():
        ranked = _global_ranks(rest, [F.col("deg").asc(), F.col("id").asc()]).select(
            "id", (F.col("rank") + F.lit(offset)).alias("ord")
        )
        offset += ranked.count()
        orders = orders.unionByName(ranked)

    n = offset
    # Reverse Cuthill-McKee: new index = n-1 - visit order
    return orders.select("id", (F.lit(n - 1) - F.col("ord")).cast("long").alias("val"))
