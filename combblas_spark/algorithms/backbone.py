"""Multiscale backbone extraction — the disparity filter (Serrano,
Boguna & Vespignani, PNAS 2009): keep the edges whose weight is
statistically significant against a uniform null model at either
endpoint. The standard sparsifier applied to weighted web/citation/
traffic link graphs before visualization or downstream mining — the
"Prune by significance, not by raw weight" counterpart of the reference's
Prune/PruneI threshold family
(/root/reference/include/CombBLAS/SpParMat.cpp Prune analogs,
combblas_spark/operators/transform.py:87).

For vertex v with (distinct-neighbor) degree k_v >= 2 and strength
s_v = Σ_u w_vu, an incident edge of normalized weight p = w/s_v has

    alpha_vu = (1 - p)^(k_v - 1)

(the probability a uniformly split strength would produce a share >= p);
the edge enters the backbone when alpha < ``alpha_max`` at EITHER
endpoint. Degree-1 vertices cannot reject the null (alpha := 1.0 at that
endpoint), matching the paper's convention.

Cross-engine determinism: the keep decision compares the ROUNDED
alpha (ROUND(.,6)) against the threshold — pow() can differ between
engines in the last ulp, and rounding first makes the cut engine-portable
(the same trick the repo's rank/top-k oracles use).

Scale shape (100 TB): strength+degree is one hash aggregation over the
symmetrized support; alphas attach by two O(V)-keyed hash joins; the
filter is a pure Column expression. No windows, no UDFs, no iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def disparity_backbone(edges: DataFrame, alpha_max: float = 0.05) -> DataFrame:
    """(a, b, w BIGINT, alpha ROUND(.,6), keep BIGINT) for every canonical
    (a < b) edge of the undirected weighted support of ``edges``
    (src, dst, w): alpha = min of the two endpoint alphas, keep = 1 iff
    the edge is significant at either endpoint (rounded-alpha < alpha_max).
    Weights are summed multiplicities, integer-exact in the output."""
    from combblas_spark.algorithms.coarsen import _und_support

    und = _und_support(edges)
    sym = und.select(
        F.col("a").alias("v"), F.col("b").alias("u"), "w"
    ).unionByName(und.select(F.col("b").alias("v"), F.col("a").alias("u"), "w"))
    vstat = sym.groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("k"), F.sum("w").alias("s")
    )

    def _alpha(kcol, scol):
        return F.when(
            kcol >= 2, F.pow(F.lit(1.0) - F.col("w") / scol, (kcol - 1).cast("double"))
        ).otherwise(F.lit(1.0))

    va = vstat.select(
        F.col("v").alias("a"), F.col("k").alias("k_a"), F.col("s").alias("s_a")
    )
    vb = vstat.select(
        F.col("v").alias("b"), F.col("k").alias("k_b"), F.col("s").alias("s_b")
    )
    j = und.join(va, "a").join(vb, "b")
    al_a = F.round(_alpha(F.col("k_a"), F.col("s_a")), 6)
    al_b = F.round(_alpha(F.col("k_b"), F.col("s_b")), 6)
    return j.select(
        "a",
        "b",
        F.col("w").cast("long").alias("w"),
        F.least(al_a, al_b).alias("alpha"),
        F.when((al_a < alpha_max) | (al_b < alpha_max), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("keep"),
    )
