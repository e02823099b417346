"""Strongly connected components — forward-coloring / backward-closure
peeling (Orzan's coloring algorithm, the label-propagation SCC used by
distributed engines; the web bow-tie decomposition's workhorse).

CombBLAS ships no SCC Application; this composes the repo's §2 operator
set: per peel, (1) a forward MAX-label fixpoint over the remaining
subgraph (the same SpMV-shaped max-aggregation superstep as cc_minlabel,
/root/reference/Applications/CC.h analog with max instead of min and
directed edges), (2) a backward closure from the color roots restricted to
their color class, (3) peel the finished SCCs and repeat.

Scale shape: every inner step is one hash join + one aggregation on the
(shrinking) remaining edge table; fixpoints are detected with ONE driver
aggregate per superstep (a monotone checksum for the forward pass, a count
for the closure); lineage is truncated per superstep. Peels needed in
practice are few (real graphs: the giant SCC plus singleton tails go in
peel 1-2).
"""

from __future__ import annotations

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
        rem = runner.truncate(verts)
        labels = None
        for _ in range(max_peels):
            if rem.limit(1).count() == 0:
                break
            er = runner.truncate(
                e_all.join(rem.select(F.col("id").alias("src")), on="src", how="leftsemi")
                .join(rem.select(F.col("id").alias("dst")), on="dst", how="leftsemi")
                .select("src", "dst")
            )
            # forward MAX-color fixpoint; colors only grow, so the sum of
            # colors is a monotone convergence checksum (one action/step)
            c = runner.truncate(rem.select("id", F.col("id").alias("col")))
            csum = c.agg(F.sum("col")).collect()[0][0]
            for _ in range(max_depth):
                mx = (
                    er.join(c.withColumnRenamed("id", "src"), on="src")
                    .groupBy("dst")
                    .agg(F.max("col").alias("mx"))
                    .withColumnRenamed("dst", "id")
                )
                c = runner.truncate(
                    c.join(mx, on="id", how="left").select(
                        "id", F.greatest(F.col("col"), F.coalesce(F.col("mx"), F.col("col"))).alias("col")
                    )
                )
                s2 = c.agg(F.sum("col")).collect()[0][0]
                if s2 == csum:
                    break
                csum = s2
            # backward closure from roots, restricted to the root's color
            b = runner.truncate(
                c.filter(F.col("col") == F.col("id")).select(
                    "id", F.col("id").alias("root")
                )
            )
            nb = b.count()
            for _ in range(max_depth):
                add = (
                    er.join(b.withColumnRenamed("id", "dst"), on="dst")
                    .select(F.col("src").alias("id"), "root")
                    .join(
                        c.select("id", F.col("col").alias("root")),
                        on=["id", "root"],
                        how="leftsemi",
                    )
                )
                b = runner.truncate(b.unionByName(add).distinct())
                n2 = b.count()
                if n2 == nb:
                    break
                nb = n2
            lab = b.select("id", F.col("root").alias("scc_id"))
            labels = lab if labels is None else runner.truncate(
                labels.unionByName(lab)
            )
            rem = runner.truncate(
                rem.join(b.select("id"), on="id", how="left_anti")
            )
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
            vis = seed
            n = vis.count()
            for _ in range(max_depth):
                if forward:
                    nxt = e.join(
                        vis.withColumnRenamed("id", "src"), on="src"
                    ).select(F.col("dst").alias("id"))
                else:
                    nxt = e.join(
                        vis.withColumnRenamed("id", "dst"), on="dst"
                    ).select(F.col("src").alias("id"))
                vis = runner.truncate(vis.unionByName(nxt).distinct())
                n2 = vis.count()
                if n2 == n:
                    break
                n = n2
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
