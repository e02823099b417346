"""SALSA (Lempel & Moran 2000) — the stochastic hubs-and-authorities walk,
the link-analysis kernel production social/web graphs run next to HITS and
PageRank (the classic "who-to-follow" recommender core).

Same two-half-step SpMV skeleton as algorithms/hits.py (the §2 SpMV of
operators/multiply.spmv, /root/reference/include/CombBLAS/ParFriends.h:2179
analog, ``reverse=True`` for the zero-movement transpose direction), but
the matrices are the ROW- and COLUMN-stochastic normalizations of A: an
authority's mass flows back uniformly (weight-proportionally) over its
in-links, then forward uniformly over the hub's out-links. L1 mass is
preserved exactly by construction, so no per-step normalization is needed
— one fewer aggregate per half-step than HITS.

Scale shape: degree normalization is two O(V)-keyed hash joins done ONCE
before the loop (the normalized edge tables are cached, hash-partitioned
by the aggregation key); per iteration the plan is exactly two
shuffle-agg SpMVs regardless of graph size; lineage truncated per
iteration. The O(V) densify join runs once after the loop (the hits.py
r5 idiom — absent ids are exact zeros).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.core.semiring import PLUS_TIMES
from combblas_spark.operators.multiply import spmv
from combblas_spark.plans.superstep import SuperstepRunner


def salsa(
    spark: SparkSession,
    edges: DataFrame,
    num_iters: int = 6,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """(id, hub, auth) for every vertex of the DIRECTED weighted graph
    ``edges`` (src, dst, w): ``num_iters`` rounds of the SALSA two-step
    walk, auth0 uniform over vertices with in-links.

        hub(i)  = Σ_j  (w_ij / indeg_w(j))  · auth(j)   (backward step)
        auth(j) = Σ_i  (w_ij / outdeg_w(i)) · hub(i)    (forward step)

    Vertices with no out-edges get hub 0; with no in-edges auth 0. Scores
    are L1-stochastic by construction (each column of either walk matrix
    sums to 1), so iterates stay on the simplex without renormalizing.
    """
    if num_iters < 1:
        raise ValueError(f"num_iters must be >= 1, got {num_iters}")
    runner = runner or SuperstepRunner(spark)
    par = spark.sparkContext.defaultParallelism
    # persist the base triples (hits.py idiom): ind/outd/ein/eout/verts all
    # fan out from e — without the cache each re-runs the upstream edge
    # build (a full source-table scan + agg) before iteration even starts
    e = edges.select("src", "dst", "w")
    e.persist()
    ind = e.groupBy("dst").agg(F.sum("w").alias("dw"))
    outd = e.groupBy("src").agg(F.sum("w").alias("dw"))
    # backward-walk matrix: column-stochastic over in-links; the loop
    # aggregates it by src (reverse spmv), so partition by src
    ein = (
        e.join(ind, "dst")
        .select("src", "dst", (F.col("w") / F.col("dw")).alias("w"))
        .repartition(par, "src")
    )
    # forward-walk matrix: row-stochastic over out-links; aggregated by dst
    eout = (
        e.join(outd, "src")
        .select("src", "dst", (F.col("w") / F.col("dw")).alias("w"))
        .repartition(par, "dst")
    )
    ein.persist()
    eout.persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    verts.persist()
    try:
        na = ind.agg(F.count(F.lit(1)).cast("double").alias("n"))
        auth = runner.truncate(
            ind.crossJoin(F.broadcast(na)).select(
                F.col("dst").alias("id"), (F.lit(1.0) / F.col("n")).alias("val")
            )
        )
        hub = None
        for _ in range(num_iters):
            # sparse half-steps, ONE lineage cut per iteration (hits.py
            # idiom): hub stays a lazy plan inside auth's checkpoint job
            hub = spmv(ein, auth, PLUS_TIMES, reverse=True)
            auth = runner.truncate(spmv(eout, hub, PLUS_TIMES))
        hub = runner.truncate(hub)
        return (
            verts.join(hub.select("id", F.col("val").alias("hub")), "id", "left")
            .join(auth.select("id", F.col("val").alias("auth")), "id", "left")
            .select(
                "id",
                F.round(F.coalesce(F.col("hub"), F.lit(0.0)), 6).alias("hub"),
                F.round(F.coalesce(F.col("auth"), F.lit(0.0)), 6).alias("auth"),
            )
        )
    finally:
        e.unpersist()
        ein.unpersist()
        eout.unpersist()
        verts.unpersist()
