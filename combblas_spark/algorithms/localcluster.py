"""Local graph clustering — the PPR sweep cut (Andersen-Chung-Lang 2006,
"PageRank-Nibble"): seed a personalized PageRank, order vertices by the
degree-normalized score, and report the conductance of every prefix; the
minimum-phi prefix is the local community around the seed. The standard
seed-expansion community detector on web-scale link graphs, and the
canonical composition test of this repo's own kernels: PPR
(algorithms/pagerank.py seeds=...), degree reduce, and the conductance
arithmetic of algorithms/stats.conductance, stitched by one bounded
window.

Scale design: the PPR vector is computed by the usual superstep machinery;
the sweep examines only the TOP-M degree-normalized scores (ACL's theory
needs only the support of the approximate PPR vector, which is small) — M
is a constant, so the rank window and both prefix sums run over an
M-row table, never O(V). The internal-edge count restricts the edge table
to candidate endpoints with two semi-join-shaped hash joins before any
window. No UDFs.

Determinism: candidates rank by the ROUNDED score (val/deg, 6 decimals)
with an id tiebreak — the repo's standard engine-portable ordering; all
conductance arithmetic is integer until the final division.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from combblas_spark.plans.superstep import SuperstepRunner


def sweep_cut(
    spark: SparkSession,
    edges: DataFrame,
    seeds: list,
    alpha: float = 0.85,
    num_iters: int = 10,
    top_m: int = 100,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """(rank, id, ppr, phi) for the top-``top_m`` degree-normalized PPR
    vertices around ``seeds``: phi = conductance of the rank-<=k prefix
    (cut / min(vol, total_vol - vol), 1.0 when the denominator is 0).
    The argmin-phi prefix is the detected local community."""
    from combblas_spark.algorithms.pagerank import pagerank

    pr = pagerank(
        spark, edges, alpha=alpha, num_iters=num_iters, seeds=seeds,
        runner=runner,
    )
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    und.persist()  # feeds degrees, total volume and the internal-edge count
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    total_vol = und.agg((2 * F.count(F.lit(1))).cast("long").alias("tv"))

    scored = pr.join(deg, "id").select(
        "id", "val", "deg", F.round(F.col("val") / F.col("deg"), 6).alias("score")
    )
    # constant-M candidate set: TakeOrderedAndProject, then an M-row window
    cand = scored.orderBy(F.col("score").desc(), F.col("id").asc()).limit(top_m)
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    ranked = cand.select(
        "id", "val", "deg", F.row_number().over(w).cast("long").alias("rank")
    )
    ra = ranked.select(F.col("id").alias("a"), F.col("rank").alias("r_a"))
    rb = ranked.select(F.col("id").alias("b"), F.col("rank").alias("r_b"))
    # an internal edge joins the prefix at k = max of its endpoint ranks
    ik = (
        und.join(ra, "a").join(rb, "b")
        .groupBy(F.greatest("r_a", "r_b").alias("rank"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_int"))
    )
    wk = Window.orderBy("rank")
    sweep = (
        ranked.join(ik, "rank", "left")
        .select(
            "rank", "id", "val", "deg",
            F.coalesce(F.col("n_int"), F.lit(0).cast("long")).alias("n_int"),
        )
        .select(
            "rank", "id", "val",
            F.sum("deg").over(wk).alias("vol"),
            F.sum("n_int").over(wk).alias("cint"),
        )
        .crossJoin(F.broadcast(total_vol))
    )
    cut = F.col("vol") - 2 * F.col("cint")
    denom = F.least(F.col("vol"), F.col("tv") - F.col("vol"))
    return sweep.select(
        "rank",
        "id",
        F.round(F.col("val"), 6).alias("ppr"),
        F.round(
            F.when(denom > 0, cut / denom.cast("double")).otherwise(F.lit(1.0)), 6
        ).alias("phi"),
    )
