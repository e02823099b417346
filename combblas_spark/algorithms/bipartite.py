"""Bipartiteness testing via 2-coloring — BFS-parity conflict census.

Reference semantics: CombBLAS applications repeatedly special-case
bipartite structure (the whole BipartiteMatchings/ family assumes a
two-sided vertex set; awpm_driver validates its inputs are bipartite
before matching). This kernel makes that validation a first-class
distributed operator: 2-color every weakly-connected component by BFS
depth parity from the component's canonical root and count the
monochromatic ("conflict") edges — a graph is bipartite iff a BFS
2-coloring has zero conflicts (equivalently: no odd cycle).

Per component: (comp, n_vertices, n_edges, n_conflicts, is_bipartite),
comp = the min vertex id (the same canonical label cc_minlabel emits), so
output is engine-portable.

Scale shape (100 TB): component labels ride the audited cc_minlabel
superstep plan; the parity BFS is the frontier-delta idiom (join edges
against only the NEW frontier, anti-join the visited set, union without a
full-set distinct — bfs.py's shape, sum-of-frontier-degrees total work);
the conflict census is two vertex-keyed hash joins onto the undirected
edge list plus one component-keyed aggregation. Lineage cut per
superstep; one frontier-count driver action per level.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.plans.superstep import SuperstepRunner


def bipartite_check(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 24,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """Per weakly-connected component of the undirected simple support of
    ``edges``: (comp BIGINT, n_vertices, n_edges, n_conflicts BIGINT,
    is_bipartite BIGINT 0/1). ``max_iter`` bounds BOTH the component
    labeling and the parity BFS (the two need the same eccentricity
    bound); both fixpoints exit early on convergence.
    """
    from combblas_spark.algorithms.cc import cc_minlabel

    runner = runner or SuperstepRunner(spark)
    par = spark.sparkContext.defaultParallelism
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    und.persist()
    sym = (
        und.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(und.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .repartition(par, "src")
    )
    sym.persist()

    labels = cc_minlabel(
        spark,
        sym.withColumn("w", F.lit(1.0)),
        max_iter=max_iter,
        runner=runner,
    )  # (id, val = min id in component)
    labels.persist()

    # multi-source BFS from every component root, frontier-delta idiom
    roots = labels.filter(F.col("id") == F.col("val")).select(
        "id", F.lit(0).cast("long").alias("d")
    )
    dist = runner.truncate(roots)
    frontier = dist
    for k in range(1, max_iter + 1):
        nxt = (
            sym.join(
                frontier.select(F.col("id").alias("src")), "src"
            )
            .select(F.col("dst").alias("id"))
            .distinct()
            .join(dist, "id", "left_anti")
            .select("id", F.lit(k).cast("long").alias("d"))
        )
        # ONE action per level: the frontier count folds into the
        # checkpoint; the distance table is a union of checkpointed
        # frontiers (flat lineage, never rewritten)
        nxt, row = runner.truncate_agg(nxt, F.count(F.lit(1)).alias("n"))
        if int(row["n"] or 0) == 0:
            break
        dist = dist.unionByName(nxt)
        frontier = nxt

    pa = dist.select(F.col("id").alias("a"), (F.col("d") % 2).alias("pa"))
    pb = dist.select(F.col("id").alias("b"), (F.col("d") % 2).alias("pb"))
    lab_a = labels.select(F.col("id").alias("a"), F.col("val").alias("comp"))
    ec = (
        und.join(pa, "a")
        .join(pb, "b")
        .join(lab_a, "a")
        .groupBy("comp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum(
                F.when(F.col("pa") == F.col("pb"), 1).otherwise(0)
            ).cast("long").alias("n_conflicts"),
        )
    )
    nv = labels.groupBy(F.col("val").alias("comp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices")
    )
    out = (
        nv.join(ec, "comp", "left")
        .select(
            F.col("comp").cast("long").alias("comp"),
            "n_vertices",
            F.coalesce(F.col("n_edges"), F.lit(0)).cast("long").alias("n_edges"),
            F.coalesce(F.col("n_conflicts"), F.lit(0))
            .cast("long")
            .alias("n_conflicts"),
        )
        .withColumn(
            "is_bipartite",
            F.when(F.col("n_conflicts") == 0, 1).otherwise(0).cast("long"),
        )
    )
    und.unpersist()
    sym.unpersist()
    labels.unpersist()
    return out
