"""Betweenness centrality — batched-BFS Brandes as DataFrame supersteps.

Reference: /root/reference/Applications/BetwCent.cpp:86-208 — a batch of
``batchSize`` BFS sources advances in lock-step as columns of a fringe
matrix (SpGEMM per level), recording per-level path counts (nsp), then a
backward sweep accumulates dependencies (bu = fringe ./ nsp, bc += nsp .*
SpGEMM(A, bu)). Here the batch is fused as a key column instead of a matrix
dimension: state is keyed by (s, v) — one row per (source, reached vertex)
— so a level advance is ONE join + groupBy for the whole batch, exactly the
batched SpGEMM's work, and Catalyst handles the blocking.

Scale notes: per-level state is |batch| * |level| rows, hash-partitioned on
(s, v); levels are localCheckpointed (lineage cut per superstep). Exact BC
on a 100 TB graph is batched sampling in the reference too (nPasses) —
callers choose the source batch.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.plans.superstep import SuperstepRunner


def betweenness(
    spark: SparkSession,
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int = 32,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """Unweighted betweenness from the given source batch.

    ``edges`` directed (pass a symmetrized table for undirected BC);
    ``sources`` is (id). Returns (id, bc) for EVERY vertex incident to an
    edge (bc = 0.0 when no shortest path passes through). Exact for the
    given sources; Brandes' algorithm, forward levels then dependency
    back-propagation.
    """
    runner = runner or SuperstepRunner(spark)
    e = edges.select("src", "dst").distinct()
    e = e.repartition(spark.sparkContext.defaultParallelism, "src").persist()
    try:
        # ---- forward sweep: levels[d] = (s, v, sigma) --------------------
        lvl = runner.truncate(
            sources.select(F.col("id").alias("s"), F.col("id").alias("v"),
                           F.lit(1.0).alias("sigma"))
        )
        visited = lvl.select("s", "v")
        levels = [lvl]
        for d in range(1, max_depth + 1):
            cand = (
                lvl.join(e, on=lvl["v"] == e["src"])
                .select("s", e["dst"].alias("v"), "sigma")
            )
            nxt = (
                cand.join(visited, on=["s", "v"], how="left_anti")
                .groupBy("s", "v")
                .agg(F.sum("sigma").alias("sigma"))
            )
            nxt = runner.truncate(nxt)
            if nxt.limit(1).count() == 0:
                break
            visited = runner.truncate(visited.unionByName(nxt.select("s", "v")))
            levels.append(nxt)
            lvl = nxt
            runner.save(d, {"level": nxt}, {"rows": None})

        # ---- backward sweep: delta over levels D-1 .. 1 ------------------
        # delta_d(s,v) = sum_{(v,w) in E, w in level d+1} sigma_v/sigma_w * (1 + delta_w)
        deepest = levels[-1]
        delta = runner.truncate(
            deepest.select("s", "v", "sigma", F.lit(0.0).alias("delta"))
        )
        acc = [delta] if len(levels) > 1 else []
        for d in range(len(levels) - 2, 0, -1):
            nx = delta.select(
                "s", F.col("v").alias("w"), F.col("sigma").alias("sigma_w"),
                F.col("delta").alias("delta_w"),
            )
            contrib = (
                levels[d].join(e, on=levels[d]["v"] == e["src"])
                .select("s", "v", "sigma", e["dst"].alias("w"))
                .join(nx, on=["s", "w"])
                .groupBy("s", "v", "sigma")
                .agg(
                    F.sum(
                        F.col("sigma") / F.col("sigma_w") * (F.lit(1.0) + F.col("delta_w"))
                    ).alias("delta")
                )
            )
            delta = runner.truncate(
                levels[d].join(contrib.select("s", "v", "delta"), on=["s", "v"], how="left")
                .select("s", "v", "sigma", F.coalesce(F.col("delta"), F.lit(0.0)).alias("delta"))
            )
            acc.append(delta)

        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        if not acc:
            return verts.select("id", F.lit(0.0).alias("bc"))
        alld = acc[0]
        for a in acc[1:]:
            alld = alld.unionByName(a)
        bc = (
            alld.filter(F.col("v") != F.col("s"))  # delta_s(s) never counts
            .groupBy(F.col("v").alias("id"))
            .agg(F.sum("delta").alias("bc"))
        )
        return verts.join(bc, on="id", how="left").select(
            "id", F.coalesce(F.col("bc"), F.lit(0.0)).alias("bc")
        )
    finally:
        e.unpersist()
