"""Triangle counting — masked SpGEMM: sum(L*L .* L).

Reference pattern: EWiseMult as the structural mask
(/root/reference/include/CombBLAS/Friends.h:1020-1044) combined with
PSpGEMM (/root/reference/include/CombBLAS/ParFriends.h:1447); the
lower-triangular trick ensures each triangle is counted exactly once.

Scale note: the wedge join (L join L on dst==src) is the expensive stage;
ordering by degree (directing each edge from lower- to higher-degree
endpoint) bounds wedge counts on skewed graphs — provided via
``degree_ordered=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from combblas_spark.core.semiring import PLUS_TIMES
from combblas_spark.operators.multiply import spgemm
from combblas_spark.operators.ewise import ewise_mult


def _oriented(edges: DataFrame, degree_ordered: bool) -> DataFrame:
    """One direction per undirected edge, unit weights, no loops."""
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
        .withColumn("w", F.lit(1).cast("long"))
    )
    if not degree_ordered:
        return e
    # re-orient each edge from lower-degree to higher-degree endpoint
    # (tie-break on id) — classic wedge-count bound for skewed graphs
    deg = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .groupBy("v")
        .count()
    )
    ds = deg.select(F.col("v").alias("src"), F.col("count").alias("d_src"))
    dd = deg.select(F.col("v").alias("dst"), F.col("count").alias("d_dst"))
    j = e.join(ds, "src").join(dd, "dst")
    keep = (F.col("d_src") < F.col("d_dst")) | (
        (F.col("d_src") == F.col("d_dst")) & (F.col("src") < F.col("dst"))
    )
    return j.select(
        F.when(keep, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(keep, F.col("dst")).otherwise(F.col("src")).alias("dst"),
        F.col("w"),
    )


def triangles_per_edge(edges: DataFrame, degree_ordered: bool = True) -> DataFrame:
    """(src, dst, w=#triangles closed by this oriented edge) — L*L .* L."""
    L = _oriented(edges, degree_ordered)
    wedges = spgemm(L, L, PLUS_TIMES)
    return ewise_mult(wedges, L, mult=lambda a, b: a)


def triangle_count(edges: DataFrame, degree_ordered: bool = True) -> int:
    row = triangles_per_edge(edges, degree_ordered).agg(
        F.coalesce(F.sum("w"), F.lit(0)).alias("n")
    ).collect()[0]
    return int(row["n"])
