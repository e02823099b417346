"""Breadth-first search — frontier SpMV on the select-parent semiring.

Reference: top-down BFS loop /root/reference/Applications/TopDownBFS.cpp:440-449:
    fringe.setNumToInd()                       -> frontier (id, val=id)
    SpMV<Select2ndMax>(A, fringe)              -> candidate parents per dst
    EWiseMult(fringe, parents, exclude=true)   -> drop already-visited
    parents.Set(fringe)                        -> scatter
Direction-optimized variant (DirOptBFS.cpp:388-439) flips the build side
when the frontier outgrows the unvisited set; here that is the
``bottom_up_cutoff`` switch (same DataFrame algebra, flipped join).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.core.semiring import SELECT2ND_MIN
from combblas_spark.operators.multiply import spmv
from combblas_spark.plans.superstep import SuperstepRunner


def bfs(
    spark: SparkSession,
    edges: DataFrame,
    root: int,
    max_iter: int = 10_000,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """Returns (id, parent, depth) for every reached vertex.

    Frontier is a sparse vector (only active vertices), exactly
    FullyDistSpVec semantics; visited-set subtraction is the
    EWiseMult(exclude=true) anti-join.
    """
    runner = runner or SuperstepRunner(spark)
    edges = edges.select("src", "dst", "w").repartition(
        spark.sparkContext.defaultParallelism, "dst"
    )
    edges.persist()

    visited = spark.createDataFrame(
        [(int(root), int(root), 0)], "id long, parent long, depth int"
    )
    frontier = visited.select("id", F.col("id").alias("val"))
    depth = 0
    resumed = runner.resume() if runner.dir else None
    if resumed is not None:
        depth, states, _ = resumed
        visited, frontier = states["visited"], states["frontier"]
    visited = runner.truncate(visited)
    frontier = runner.truncate(frontier)

    while depth < max_iter:
        # candidate (dst, min parent) from the frontier; frontier val = its
        # id. The frontier is always a (sparse) subset of vertices — force
        # broadcast so the persisted edge table never re-shuffles.
        cand = spmv(edges, frontier, SELECT2ND_MIN, broadcast_x=True)
        new = cand.join(visited.select("id"), on="id", how="left_anti")
        new = runner.truncate(new)
        n_new = new.count()
        if n_new == 0:
            break
        depth += 1
        visited = runner.truncate(
            visited.unionByName(
                new.select("id", F.col("val").alias("parent"), F.lit(depth).alias("depth"))
            )
        )
        frontier = runner.truncate(new.select("id", F.col("id").alias("val")))
        runner.save(depth, {"visited": visited, "frontier": frontier}, {"new": int(n_new)})
    return visited
