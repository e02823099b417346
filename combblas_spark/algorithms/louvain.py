"""Louvain phase-1: synchronized modularity-gain moves.

Blondel et al., "Fast unfolding of communities in large networks" (2008),
first phase — each vertex moves to the neighboring community with the
largest modularity gain — in the synchronized (Jaccard-vertex-parallel)
variant: every vertex evaluates its move against the SAME previous-round
assignment, then all moves apply at once. This is the
modularity-OPTIMIZING counterpart to label_propagation (which maximizes
incident label weight with no null model); HipMCL-style pipelines run it
as the community step after graph cleaning. One level only — the
coarsening that stacks levels is operators' coarsen (quotient graph),
already a separate audited kernel.

Determinism across engines (the repo-wide oracle discipline): modularity
gain comparisons are evaluated in exact int64. For vertex i with degree
k_i, candidate community c (tot_c = sum of degrees in c, k_ic = edges
from i into c, M = 2m = rows of the symmetric simple edge table), the
usual gain ordering over candidates reduces to

    score(i, c) = M * k_ic - k_i * (tot_c - [c = comm(i)] * k_i)

(the removal-from-own-community term is constant across candidates, so
it cancels; subtracting k_i from tot of the OWN community accounts for
i not being its own neighbor). Argmax by (score DESC, own-community
first, community id ASC) — ties keep the vertex in place, so a round is
a no-op exactly when no strict gain exists, and the whole unrolled
trajectory replays bit-identically in SQL with no floats.

Scale shape: a round is one (src-keyed) edge->assignment hash join, two
map-side-combinable aggregations (k_ic and tot), one per-vertex argmax
window partitioned by vertex id (candidate count per vertex <= degree),
and a lineage truncation. Degrees and M are computed once. The int64
products M * k_ic and k_i * tot_c hold to ~10^9-edge graphs per factor
pairing; beyond that the same columns widen to decimal(38,0).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from combblas_spark.plans.superstep import SuperstepRunner


def louvain_round(
    e: DataFrame, asg: DataFrame, deg: DataFrame, big_m: int
) -> DataFrame:
    """One synchronized move round: (id, comm) -> (id, comm). Exposed so
    the physical plan of a single round is assertable (tests/test_plans):
    equi-joins + two aggs + one per-vertex argmax window, no cartesian."""
    tot = (
        asg.join(deg, on="id")
        .groupBy("comm")
        .agg(F.sum("k").alias("tot"))
    )
    a_dst = asg.select(F.col("id").alias("dst"), "comm")
    kic = (
        e.join(a_dst, on="dst")
        .groupBy(F.col("src").alias("id"), "comm")
        .agg(F.count(F.lit(1)).cast("long").alias("kic"))
    )
    # own community is always a candidate, even with zero neighbors
    # inside it (staying put must be scoreable)
    cand = (
        kic.unionByName(
            asg.select("id", "comm", F.lit(0).cast("long").alias("kic"))
        )
        .groupBy("id", "comm")
        .agg(F.max("kic").alias("kic"))
    )
    own = asg.select("id", F.col("comm").alias("_own"))
    scored = (
        cand.join(own, on="id")
        .join(tot, on="comm")
        .join(deg, on="id")
        .withColumn("_is_own", (F.col("comm") == F.col("_own")).cast("int"))
        .withColumn(
            "_score",
            F.lit(big_m) * F.col("kic")
            - F.col("k") * (F.col("tot") - F.col("_is_own") * F.col("k")),
        )
    )
    w = Window.partitionBy("id").orderBy(
        F.col("_score").desc(), F.col("_is_own").desc(), F.col("comm").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("id", "comm")
    )


def louvain_moves(
    spark: SparkSession,
    edges: DataFrame,
    rounds: int = 2,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """(id, comm) after ``rounds`` synchronized Louvain phase-1 rounds on
    the SYMMETRIC simple graph ``edges`` (src, dst; one row per direction,
    deduped, no loops), starting from singleton communities comm = id."""
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    runner = runner or SuperstepRunner(spark)
    e = edges.select("src", "dst").repartition(
        spark.sparkContext.defaultParallelism, "src"
    )
    e.persist()
    try:
        big_m = e.count()  # = 2m on a symmetric table
        deg = runner.truncate(
            e.groupBy(F.col("dst").alias("id")).agg(
                F.count(F.lit(1)).cast("long").alias("k")
            )
        )
        asg = runner.truncate(deg.select("id", F.col("id").alias("comm")))
        # fixed-round kernel: intermediate rounds are lazy lineage cuts (no
        # in-loop action); the LAST round materializes eagerly while e is
        # still cached, evaluating the whole chain in one job
        for r in range(rounds):
            step = louvain_round(e, asg, deg, big_m)
            asg = (
                runner.truncate(step)
                if r == rounds - 1
                else runner.truncate_lazy(step)
            )
        return asg
    finally:
        e.unpersist()
