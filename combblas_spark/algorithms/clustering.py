"""Per-vertex triangle counts and local clustering coefficient.

Reference semantics: the triangle-counting masked-SpGEMM family
(/root/reference/include/CombBLAS/ParFriends.h:1447 PSpGEMM +
Friends.h:1020-1044 EWiseMult mask) extended per-vertex: each triangle is
enumerated exactly once on the degree-ordered DAG orientation (the unique
wedge a->b->c closed by a->c) and credited to all three corners; the local
clustering coefficient is 2*tri(v) / (deg(v)*(deg(v)-1)).

Scale design: the degree-ordered orientation (triangles._oriented) bounds
any vertex's out-wedges by sqrt(m)-ish on skewed graphs — the same
compact-forward bound ktruss.py uses — so the wedge join never squares a
web hub. Two hash joins + one explode + two hash aggs; no UDFs, no
windows, map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from combblas_spark.algorithms.triangles import _oriented


def per_vertex_triangles(edges: DataFrame) -> DataFrame:
    """(v, tri): number of triangles incident to each vertex.

    ``edges`` is an undirected graph given as (src, dst[, w]) pairs in
    either or both directions; loops and duplicates are ignored.
    Vertices in no triangle are absent (join clustering_coefficient for
    the dense-over-degree view).
    """
    L = _oriented(edges, degree_ordered=True).select("src", "dst")
    ab = L.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = L.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = L.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = ab.join(bc, "b").join(ac, ["a", "c"])
    corners = tris.select(
        F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("v")
    )
    return corners.groupBy("v").agg(F.count(F.lit(1)).alias("tri"))


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, deg, tri, lcc) per vertex of the undirected simple graph.

    deg = distinct-neighbor degree, tri = incident triangles, lcc =
    2*tri / (deg*(deg-1)) (0.0 when deg < 2). Column types are stable:
    BIGINT counts, lcc rounded to 6 decimals (oracle-portable).
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    tri = per_vertex_triangles(edges).select(
        F.col("v").alias("id"), F.col("tri").cast("long").alias("tri")
    )
    return (
        deg.join(tri, "id", "left")
        .select(
            "id",
            "deg",
            F.coalesce(F.col("tri"), F.lit(0).cast("long")).alias("tri"),
            F.round(
                F.when(
                    F.col("deg") >= 2,
                    2.0
                    * F.coalesce(F.col("tri"), F.lit(0))
                    / (F.col("deg") * (F.col("deg") - F.lit(1).cast("double"))),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("lcc"),
        )
    )
