"""One-level heavy-edge graph coarsening — the multigrid/multilevel
restriction step (METIS-style HEM).

Reference semantics: the reference builds restriction operators and coarse
grids explicitly — /root/reference/3DSpGEMM/RestrictionOp.cpp constructs R
from a matching-like aggregation and
/root/reference/ReleaseTests/GalerkinNew.cpp:105-106 forms the coarse
operator as the triple product S·A·T (= R·A·Rᵀ). This module supplies the
missing first half of that pipeline over the DataFrame engine: a
deterministic locally-dominant heavy-edge matching, the fine→coarse
restriction map, and the coarse adjacency via the repo's own
operators/multiply.galerkin (so the §2 Galerkin operator is exercised
end-to-end, not just in isolation).

Matching rule (one locally-dominant round, fully deterministic and
engine-portable): every vertex points at its heaviest neighbor (ties →
smallest neighbor id); mutually-pointing pairs are matched; a matched pair
contracts onto its smaller vertex id, everyone else stays a singleton.
Locally-dominant mutual-argmax matching is the classic parallel HEM round
(Preis 1999 / the matching family in
/root/reference/Applications/BipartiteMatchings/ApproxWeightPerfectMatching.h
uses the same locally-dominant principle); ONE round already removes the
heaviest third-to-half of matchable vertices, which is what a multilevel
V-cycle consumes per level.

Scale shape (100 TB): the undirected weighted support is one hash agg; the
argmax neighbor is one max(struct) agg on the symmetrized table (no
window); mutuality is one self-join of the O(V) best-neighbor table; the
coarse operator is two SpGEMMs (galerkin) over the restriction — every
stage is a hash join or map-side-combinable agg, no UDFs, no iteration,
no driver loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from combblas_spark.core.semiring import PLUS_TIMES
from combblas_spark.operators.multiply import galerkin


def _und_support(edges: DataFrame) -> DataFrame:
    """Canonical (a < b, summed-weight) undirected simple support."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col("w").cast("double").alias("w"),
        )
        .groupBy("a", "b")
        .agg(F.sum("w").alias("w"))
    )


def heavy_edge_matching(edges: DataFrame) -> DataFrame:
    """(id, coarse_id) for EVERY vertex of the undirected weighted support
    of ``edges`` (src, dst, w): matched pairs share min(pair) as coarse_id,
    unmatched vertices map to themselves."""
    return _matching_from_und(_und_support(edges))


def _matching_from_und(und: DataFrame) -> DataFrame:
    sym = und.select(
        F.col("a").alias("v"), F.col("b").alias("u"), "w"
    ).unionByName(und.select(F.col("b").alias("v"), F.col("a").alias("u"), "w"))
    # heaviest neighbor, ties to the SMALLEST id: max(struct(w, -u)).
    best = sym.groupBy("v").agg(
        F.max(F.struct(F.col("w"), (-F.col("u")).alias("nu"))).alias("m")
    ).select("v", (-F.col("m.nu")).alias("u"))
    b2 = best.select(F.col("v").alias("u"), F.col("u").alias("v"))
    mutual = best.join(b2, ["v", "u"], "leftsemi").filter(F.col("v") < F.col("u"))
    verts = sym.select("v").distinct()
    m1 = mutual.select(F.col("v").alias("id"), F.col("v").alias("coarse_id"))
    m2 = mutual.select(F.col("u").alias("id"), F.col("v").alias("coarse_id"))
    return (
        verts.join(m1.unionByName(m2), F.col("v") == F.col("id"), "left")
        .select(
            F.col("v").alias("id"),
            F.coalesce(F.col("coarse_id"), F.col("v")).alias("coarse_id"),
        )
    )


def coarsen(edges: DataFrame) -> DataFrame:
    """Coarse adjacency after one heavy-edge-matching round, formed as the
    Galerkin triple product R·A·Rᵀ over the SYMMETRIC weighted adjacency
    (operators/multiply.galerkin — the GalerkinNew.cpp pipeline).

    -> (src, dst, w BIGINT) upper triangle incl. diagonal (src <= dst) of
    the symmetric coarse matrix; the diagonal row is the contracted
    internal mass (each internal fine edge counted in both directions,
    exactly as A's symmetry implies). Weights are integer-exact (event
    multiplicities), so the cross-engine compare is exact."""
    # the undirected support is built ONCE and feeds both the matching
    # and the symmetric A (a single hash-agg pass over E at any scale)
    und = _und_support(edges)
    a_sym = und.select(
        F.col("a").alias("src"), F.col("b").alias("dst"), "w"
    ).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"), "w")
    )
    cmap = _matching_from_und(und)
    r = cmap.select(
        F.col("coarse_id").alias("src"),
        F.col("id").alias("dst"),
        F.lit(1.0).alias("w"),
    )
    coarse = galerkin(r, a_sym, PLUS_TIMES)
    return (
        coarse.filter(F.col("src") <= F.col("dst"))
        .select("src", "dst", F.col("w").cast("long").alias("w"))
    )
