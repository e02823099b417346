"""Katz centrality — the attenuated-walk-count centrality.

x[v] = beta + a_eff * sum_{(u,v) in E} w(u,v) * x[u], iterated from
x0 = beta — i.e. x = beta * sum_k (a_eff * A^T)^k 1, every walk INTO v
counted with attenuation a_eff^len. The third classic link-analysis
eigen-kernel next to PageRank (algorithms/pagerank.py) and HITS
(algorithms/hits.py); same SpMV superstep as both
(/root/reference/include/CombBLAS/ParFriends.h:2379 dense-vector SpMV
analog, operators/multiply.spmv).

The user passes a RELATIVE ``alpha`` in (0, 1); the effective attenuation
is a_eff = alpha / max_in_weight, where max_in_weight = max over vertices
of the total in-edge weight. For a non-negative matrix the spectral
radius is bounded by the max column sum, so a_eff * rho(A^T) <= alpha < 1
and the series converges unconditionally — no per-graph hand tuning, and
the one extra aggregate is computed once before the loop (the classic
alpha < 1/lambda_max condition, Katz 1953).

Scale shape (identical to pagerank's): edges cached + hash-partitioned by
dst (the aggregation key) ONCE; each superstep is one join + one partial
agg moving only the O(V) vector; lineage truncated per superstep
(plans/superstep.py) so Catalyst stats never compound. No normalization
aggregate is needed inside the loop — attenuation keeps values in
[beta, beta / (1 - alpha)].
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.core.semiring import PLUS_TIMES
from combblas_spark.core.tuning import BROADCAST_MAX_ROWS
from combblas_spark.operators.multiply import spmv
from combblas_spark.plans.superstep import SuperstepRunner


def katz(
    spark: SparkSession,
    edges: DataFrame,
    alpha: float = 0.5,
    beta: float = 1.0,
    num_iters: int = 8,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """(id, val) Katz centrality of the DIRECTED graph ``edges``
    (src, dst, w) after exactly ``num_iters`` supersteps (fixed-iteration
    mode, oracle-replayable; the truncation error after k iterations is
    <= beta * alpha^(k+1) / (1 - alpha)).

    ``alpha`` is relative to the max-in-weight spectral bound (see module
    docstring); ``beta`` is the per-vertex base score.
    """
    if num_iters < 1:
        raise ValueError(f"num_iters must be >= 1, got {num_iters}")
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
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
        # one-time spectral bound: max total in-weight (max column sum of A
        # = max row sum of A^T >= rho(A^T) for w >= 0). Exact-integer
        # weights make the division the same IEEE op in any engine.
        wdmax = (
            e.groupBy("dst").agg(F.sum("w").alias("s")).agg(F.max("s")).collect()[0][0]
        )
        a_eff = alpha / wdmax
        n = verts.count()
        bb = n <= BROADCAST_MAX_ROWS

        x = runner.truncate(verts.select("id", F.lit(beta).alias("val")))
        for it in range(num_iters):
            contrib = spmv(e, x, PLUS_TIMES, broadcast_x=bb)
            if bb:
                contrib = F.broadcast(contrib)
            # fixed-iteration chain: lazy lineage cuts, final superstep
            # materialized eagerly while e/verts are still cached
            nxt = verts.join(contrib, on="id", how="left").select(
                "id",
                (
                    F.lit(beta)
                    + F.lit(a_eff) * F.coalesce(F.col("val"), F.lit(0.0))
                ).alias("val"),
            )
            x = (
                runner.truncate(nxt)
                if it == num_iters - 1
                else runner.truncate_lazy(nxt)
            )
        return x
    finally:
        e.unpersist()
        verts.unpersist()
