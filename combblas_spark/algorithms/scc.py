"""Strongly connected components — forward-coloring / backward-closure
peeling (Orzan's coloring algorithm, the label-propagation SCC used by
distributed engines; the web bow-tie decomposition's workhorse).

CombBLAS ships no SCC Application; this composes the repo's §2 operator
set: per peel, (1) a forward MAX-label fixpoint over the remaining
subgraph (the same SpMV-shaped max-aggregation superstep as cc_minlabel,
/root/reference/Applications/CC.h analog with max instead of min and
directed edges), (2) a backward closure from the color roots restricted to
their color class, (3) peel the finished SCCs and repeat.

Scale shape: the forward fixpoint is one hash join + one aggregation on the
(shrinking) remaining edge table per superstep; the backward closure is a
FRONTIER-DELTA walk (bfs.py idiom) — each step joins the edge table against
only the newly reached vertices and anti-joins the visited set, so a
depth-D closure costs sum-of-frontier-indegrees total, not D full edge
passes + D full-set distincts. Fixpoints are detected with ONE driver
aggregate per superstep (a monotone checksum for the forward pass, a
frontier count for the closure); lineage is truncated per superstep. Peels
needed in practice are few (real graphs: the giant SCC plus singleton
tails go in peel 1-2).
"""

from __future__ import annotations

import warnings
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.plans.superstep import SuperstepRunner


def scc(
    spark: SparkSession,
    edges: DataFrame,
    max_peels: int = 50,
    max_depth: int = 200,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """(id, scc_id) for every vertex of the DIRECTED graph ``edges``
    (src, dst, ...): scc_id = the max vertex id of the component (the
    coloring root), so labels are canonical and engine-portable."""
    runner = runner or SuperstepRunner(spark)
    e_all = edges.select("src", "dst").distinct().repartition(
        spark.sparkContext.defaultParallelism, "dst"
    )
    e_all.persist()
    verts = (
        e_all.select(F.col("src").alias("id"))
        .union(e_all.select(F.col("dst").alias("id")))
        .distinct()
    )
    try:
        rem, rrow = runner.truncate_agg(verts, F.count(F.lit(1)).alias("n"))
        n_rem = int(rrow["n"] or 0)
        labels = None
        for _ in range(max_peels):
            if n_rem == 0:
                break
            er = runner.truncate(
                e_all.join(rem.select(F.col("id").alias("src")), on="src", how="leftsemi")
                .join(rem.select(F.col("id").alias("dst")), on="dst", how="leftsemi")
                .select("src", "dst")
            )
            # forward MAX-color fixpoint; colors only grow, so the sum of
            # colors is a monotone convergence checksum — truncate_agg folds
            # it into the materializing job (ONE action/step)
            c, crow = runner.truncate_agg(
                rem.select("id", F.col("id").alias("col")),
                F.sum("col").alias("s"),
            )
            csum = crow["s"]
            for _ in range(max_depth):
                mx = (
                    er.join(c.withColumnRenamed("id", "src"), on="src")
                    .groupBy("dst")
                    .agg(F.max("col").alias("mx"))
                    .withColumnRenamed("dst", "id")
                )
                c, crow = runner.truncate_agg(
                    c.join(mx, on="id", how="left").select(
                        "id", F.greatest(F.col("col"), F.coalesce(F.col("mx"), F.col("col"))).alias("col")
                    ),
                    F.sum("col").alias("s"),
                )
                s2 = crow["s"]
                if s2 == csum:
                    break
                csum = s2
            # backward closure from roots, restricted to the root's color.
            # FRONTIER-DELTA idiom (same as bfs.py): each step joins the
            # edge table against only the NEWLY reached vertices, anti-joins
            # the visited set, and unions WITHOUT a distinct — the visited
            # set stays distinct by construction (the frontier is distinct
            # and disjoint from it). Per-step work is sum-of-frontier-
            # indegrees, not O(E) + O(|visited|) distinct.
            b, brow = runner.truncate_agg(
                c.filter(F.col("col") == F.col("id")).select(
                    "id", F.col("id").alias("root")
                ),
                F.count(F.lit(1)).alias("n"),
            )
            frontier = b
            nf = int(brow["n"] or 0)
            for _ in range(max_depth):
                if nf == 0:
                    break
                add = (
                    er.join(frontier.withColumnRenamed("id", "dst"), on="dst")
                    .select(F.col("src").alias("id"), "root")
                    .join(
                        c.select("id", F.col("col").alias("root")),
                        on=["id", "root"],
                        how="leftsemi",
                    )
                    .distinct()
                    .join(b.select("id"), on="id", how="left_anti")
                )
                # ONE action per step: frontier count folds into the
                # checkpoint; the visited set is a union of checkpointed
                # frontiers (flat lineage — the old re-truncate rewrote the
                # whole visited set every step)
                frontier, frow = runner.truncate_agg(
                    add, F.count(F.lit(1)).alias("n")
                )
                nf = int(frow["n"] or 0)
                if nf == 0:
                    break
                b = b.unionByName(frontier)
            if nf != 0:
                warnings.warn(
                    "scc: backward closure hit max_depth before the frontier "
                    "emptied — result may merge distinct SCCs; raise max_depth.",
                    RuntimeWarning,
                    stacklevel=2,
                )
            lab = b.select("id", F.col("root").alias("scc_id"))
            # plain union of checkpointed terms: flat lineage, no rewrite
            labels = lab if labels is None else labels.unionByName(lab)
            rem, rrow = runner.truncate_agg(
                rem.join(b.select("id"), on="id", how="left_anti"),
                F.count(F.lit(1)).alias("n"),
            )
            n_rem = int(rrow["n"] or 0)
        if n_rem != 0:
            # max_peels exhausted with vertices left: emit them with the
            # sentinel label -1 (never a valid max-vertex-id root) instead of
            # silently dropping them, and say so.
            warnings.warn(
                "scc: max_peels exhausted before all vertices were labeled; "
                "leftover vertices get sentinel scc_id=-1. Raise max_peels.",
                RuntimeWarning,
                stacklevel=2,
            )
            leftover = rem.select("id", F.lit(-1).cast(rem.schema["id"].dataType).alias("scc_id"))
            labels = leftover if labels is None else labels.unionByName(leftover)
        if labels is None:
            return verts.select("id", F.col("id").alias("scc_id")).filter(
                F.lit(False)
            )
        return labels
    finally:
        e_all.unpersist()


def bowtie(
    spark: SparkSession,
    edges: DataFrame,
    max_depth: int = 200,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """Web bow-tie decomposition (Broder et al. 2000) of the DIRECTED graph
    ``edges``: (id, region) with region in {'core', 'in', 'out', 'tendril'}
    — core = the largest SCC (ties: min scc_id), in = reaches the core but
    is not reachable from it, out = reachable from the core but cannot
    reach it, tendril = everything else. The classic large-scale link-graph
    structure report.

    Built by composition: scc() for the core, then two boolean reachability
    closures (forward and backward frontier supersteps over the cached edge
    table — the BFS visited-set idiom without depths), one count per
    superstep for convergence.
    """
    runner = runner or SuperstepRunner(spark)
    e = edges.select("src", "dst").distinct().repartition(
        spark.sparkContext.defaultParallelism, "dst"
    )
    e.persist()
    try:
        labels = scc(spark, e)
        giant = (
            labels.groupBy("scc_id")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), F.col("scc_id").asc())
            .limit(1)
            .collect()[0]["scc_id"]
        )
        core = runner.truncate(
            labels.filter(F.col("scc_id") == giant).select("id")
        )

        def closure(seed: DataFrame, forward: bool) -> DataFrame:
            # frontier-delta closure (bfs.py idiom): join edges against only
            # the newly reached frontier, anti-join visited, union without
            # distinct — per-step cost is sum-of-frontier-degrees, never a
            # full edge pass + full-set distinct.
            vis = seed
            frontier = seed
            nf = frontier.count()
            for _ in range(max_depth):
                if nf == 0:
                    break
                if forward:
                    nxt = e.join(
                        frontier.withColumnRenamed("id", "src"), on="src"
                    ).select(F.col("dst").alias("id"))
                else:
                    nxt = e.join(
                        frontier.withColumnRenamed("id", "dst"), on="dst"
                    ).select(F.col("src").alias("id"))
                # ONE action per step (count folded into the checkpoint);
                # visited = union of checkpointed frontiers, never rewritten
                frontier, frow = runner.truncate_agg(
                    nxt.distinct().join(vis, on="id", how="left_anti"),
                    F.count(F.lit(1)).alias("n"),
                )
                nf = int(frow["n"] or 0)
                if nf == 0:
                    break
                vis = vis.unionByName(frontier)
            if nf != 0:
                warnings.warn(
                    "bowtie: reachability closure hit max_depth before the "
                    "frontier emptied — region labels may be incomplete; "
                    "raise max_depth.",
                    RuntimeWarning,
                    stacklevel=2,
                )
            return vis

        fwd = closure(core, True)    # core + OUT
        bwd = closure(core, False)   # core + IN
        return (
            labels.select("id")
            .join(core.withColumn("_c", F.lit(1)), on="id", how="left")
            .join(fwd.withColumn("_f", F.lit(1)), on="id", how="left")
            .join(bwd.withColumn("_b", F.lit(1)), on="id", how="left")
            .select(
                "id",
                F.when(F.col("_c").isNotNull(), F.lit("core"))
                .when(F.col("_b").isNotNull(), F.lit("in"))
                .when(F.col("_f").isNotNull(), F.lit("out"))
                .otherwise(F.lit("tendril"))
                .alias("region"),
            )
        )
    finally:
        e.unpersist()
