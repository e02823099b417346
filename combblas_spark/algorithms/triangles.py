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


def doulion_estimate(
    edges: DataFrame,
    p_permille: int = 500,
    salt: str = "dl",
) -> DataFrame:
    """DOULION sampled triangle estimate (Tsourakakis et al., KDD'09):
    toss each UNDIRECTED edge a replayable md5-60bit coin, keep it with
    probability p, count triangles exactly on the sparsified graph, and
    scale by (1000/p)^3 — the O(p^3)-cost estimator for graphs where
    even the degree-ordered exact count is too hot. The coin keys on
    the canonical (min,max) endpoint pair so both directions live or
    die together (the same replayable-sparsification plane as the
    percolation robustness curve).

    Contract shape: ONE exact-int64 row (n_edges_kept, n_tri_sampled,
    est_triangles, n_tri_exact) — the exact count rides along so the
    estimator's error is IN the audited output, not a claim.
    ``p_permille`` must make (1000/p)^3 an exact integer (500 -> 8,
    250 -> 64, 100 -> 1000) — raises otherwise, keeping the estimate
    integer-exact and engine-portable.

    Scale note: at 100 TB you would skip n_tri_exact (that is the
    point of the estimator); it is part of this audit query so the
    oracle hash-proves both paths at test scale.
    """
    from combblas_spark.functions.dedup import md5_60bit

    if p_permille <= 0 or 1000 % p_permille != 0:
        raise ValueError("p_permille must be a positive divisor of 1000")
    scale = (1000 // p_permille) ** 3
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    coin = md5_60bit(
        F.concat_ws(
            "|", F.lit(salt), F.col("a").cast("string"),
            F.col("b").cast("string"),
        )
    ) % 1000
    keep = und.filter(coin < F.lit(int(p_permille)))
    def sym(u):  # symmetrize the canonical pairs with unit weights
        return (
            u.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .unionByName(
                u.select(F.col("b").alias("src"), F.col("a").alias("dst"))
            )
            .withColumn("w", F.lit(1.0))
        )
    n_s = triangles_per_edge(sym(keep)).agg(
        F.coalesce(F.sum("w"), F.lit(0)).cast("long").alias("n_tri_sampled")
    )
    n_f = triangles_per_edge(sym(und)).agg(
        F.coalesce(F.sum("w"), F.lit(0)).cast("long").alias("n_tri_exact")
    )
    n_e = keep.agg(F.count(F.lit(1)).cast("long").alias("n_edges_kept"))
    return (
        n_e.crossJoin(n_s)
        .crossJoin(n_f)
        .select(
            "n_edges_kept",
            "n_tri_sampled",
            (F.col("n_tri_sampled") * F.lit(int(scale)))
            .cast("long")
            .alias("est_triangles"),
            "n_tri_exact",
        )
    )
