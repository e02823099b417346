"""Eigenvector centrality (Bonacich 1972) — the principal-eigenvector
importance score, the eigen-kernel PageRank/Katz/HITS all descend from.

Power iteration x <- (A^T / wdmax) x from x0 = 1, where wdmax is the max
total in-weight (max column sum of A) — the SAME spectral bound
algorithms/katz.py uses: rho(A^T) <= wdmax for w >= 0, so the scaled
iterate never overflows (x[v] <= wd(v)/wdmax <= 1 after one step) and the
loop needs NO normalization aggregate at all; scaling by a constant does
not change the eigenvector direction. One L2 normalization runs once
after the loop (with the final O(V) densify join — the hits.py round-5
idiom: absent ids are exact zeros for both the norm and every multiply).

Same SpMV superstep as pagerank/katz (/root/reference/include/CombBLAS/
ParFriends.h:2379 dense-vector SpMV analog, operators/multiply.spmv);
fixed-iteration mode so a DuckDB oracle replays it exactly. On a
connected non-bipartite symmetric graph the iterate converges to the
Perron vector; on a digraph it is the defined k-step walk-count profile.

Scale shape (identical to pagerank's): edges cached + hash-partitioned by
dst ONCE; per superstep one join + one partial agg moving only the O(V)
vector; lineage truncated per superstep. The per-step divisor is the
driver-injected literal wdmax, and the division (never a reciprocal
multiply — a different IEEE op) is replayed verbatim by the oracle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.core.semiring import PLUS_TIMES
from combblas_spark.core.tuning import BROADCAST_MAX_ROWS
from combblas_spark.operators.multiply import spmv
from combblas_spark.plans.superstep import SuperstepRunner


def eigenvector_centrality(
    spark: SparkSession,
    edges: DataFrame,
    num_iters: int = 6,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """(id, val) eigenvector centrality of ``edges`` (src, dst, w) after
    exactly ``num_iters`` power-iteration supersteps from x0 = 1,
    L2-normalized once at the end and rounded to 6 places (the
    engine-portable fixed-iteration contract). Vertices unreachable by any
    length-``num_iters`` walk score exactly 0."""
    if num_iters < 1:
        raise ValueError(f"num_iters must be >= 1, got {num_iters}")
    runner = runner or SuperstepRunner(spark)
    e = edges.select("src", "dst", "w").repartition(
        spark.sparkContext.defaultParallelism, "dst"
    )
    e.persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    verts.persist()
    try:
        wdmax = (
            e.groupBy("dst").agg(F.sum("w").alias("s")).agg(F.max("s")).collect()[0][0]
        )
        n = verts.count()
        bb = n <= BROADCAST_MAX_ROWS
        x = runner.truncate(verts.select("id", F.lit(1.0).alias("val")))
        for it in range(num_iters):
            # sparse superstep: ids with no in-walk drop out and stay 0.
            # Fixed-iteration chain: lazy lineage cuts, final superstep
            # materialized eagerly while e/verts are still cached.
            nxt = spmv(e, x, PLUS_TIMES, broadcast_x=bb).select(
                "id", (F.col("val") / F.lit(wdmax)).alias("val")
            )
            x = (
                runner.truncate(nxt)
                if it == num_iters - 1
                else runner.truncate_lazy(nxt)
            )
        dense = verts.join(x, on="id", how="left").select(
            "id", F.coalesce(F.col("val"), F.lit(0.0)).alias("val")
        )
        nrm = dense.agg(
            F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm")
        )
        return dense.crossJoin(F.broadcast(nrm)).select(
            "id", F.round(F.col("val") / F.col("nrm"), 6).alias("val")
        )
    finally:
        e.unpersist()
        verts.unpersist()
