"""HITS (hubs & authorities) — the other classic link-graph eigenvector
kernel next to PageRank (Kleinberg 1999).

Same SpMV-superstep skeleton as algorithms/pagerank.py, but TWO half-steps
per iteration over the directed edge table: auth = normalize(A^T hub), then
hub = normalize(A auth) — both are the repo's §2 SpMV
(operators/multiply.spmv, /root/reference/include/CombBLAS/ParFriends.h:2179
analog), with ``reverse=True`` providing the transpose direction with zero
data movement.

Scale shape: edges cached and hash-partitioned once; the L2 norm is a
1-row aggregate crossJoined back (broadcast, no driver action, no collect);
lineage truncated per iteration (plans/superstep.py) so Catalyst stats
never compound. The per-iteration plan is two shuffles (agg by dst, agg by
src) regardless of graph size — the same invariance that carries pagerank
from scale 23 to 25.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.core.semiring import PLUS_TIMES
from combblas_spark.core.tuning import partition_by_key
from combblas_spark.operators.multiply import spmv
from combblas_spark.plans.superstep import SuperstepRunner


def _l2_normalize(vec: DataFrame) -> DataFrame:
    """val / sqrt(sum(val^2)) via a broadcast 1-row aggregate — stays a
    lazy plan node, no driver action. An all-zero vector passes through
    unchanged (norm 0 guard) rather than producing NaNs."""
    nrm = vec.agg(
        F.sqrt(F.sum(F.col("val") * F.col("val"))).alias("nrm")
    )
    return vec.crossJoin(F.broadcast(nrm)).select(
        "id",
        F.when(F.col("nrm") > 0.0, F.col("val") / F.col("nrm"))
        .otherwise(F.col("val"))
        .alias("val"),
    )


def hits(
    spark: SparkSession,
    edges: DataFrame,
    num_iters: int = 8,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """(id, hub, auth) for every vertex of the DIRECTED graph ``edges``
    (src, dst, w): ``num_iters`` rounds of auth[d] = Σ w·hub[s] then
    hub[s] = Σ w·auth[d], each L2-normalized — weighted HITS, hub0 = 1.

    Vertices with no out-edges get hub 0; no in-edges get auth 0.

    The loop iterates SPARSE: absent ids are exact zeros, which change
    neither the L2 norm nor the next SpMV (they contribute nothing to
    either sum), so values are bit-identical to the dense iteration — the
    O(V) re-densify join runs ONCE after the loop, not twice per iteration.
    """
    if num_iters < 1:
        raise ValueError(f"num_iters must be >= 1, got {num_iters}")
    runner = runner or SuperstepRunner(spark)
    e = partition_by_key(edges.select("src", "dst", "w"), "dst")
    e.persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    verts.persist()
    try:
        hub = runner.truncate(verts.select("id", F.lit(1.0).alias("val")))
        auth = None
        for _ in range(num_iters):
            # sparse half-steps: spmv output only has ids with in-(resp.
            # out-)edges; missing ids are exact zeros and affect neither the
            # norm nor the next multiply, so no per-iteration verts join.
            # ONE lineage cut per full iteration (not per half-step), and
            # the cut is LAZY: the fixed-iteration chain executes as one
            # job at the output truncation below instead of a job per
            # iteration; Catalyst plans stay flat either way.
            auth = _l2_normalize(spmv(e, hub, PLUS_TIMES))
            hub = runner.truncate_lazy(
                _l2_normalize(spmv(e, auth, PLUS_TIMES, reverse=True))
            )
        # densify ONCE: every input vertex gets a row, absent scores are 0.
        # The EAGER truncate of the output materializes the whole lazy
        # superstep chain in one job while e/verts are still cached.
        auth = runner.truncate_lazy(auth)
        return runner.truncate(
            verts.join(hub.select("id", F.col("val").alias("hub")), on="id", how="left")
            .join(auth.select("id", F.col("val").alias("auth")), on="id", how="left")
            .select(
                "id",
                F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
                F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth"),
            )
        )
    finally:
        e.unpersist()
        verts.unpersist()
