"""Incremental Markov clustering — the IncClust pipeline.

Reference: /root/reference/Applications/Incremental/IncClust.h —
``IncrementalMCL`` (:619) re-clusters a graph after new vertices/edges
arrive without paying full-graph MCL again. The moving parts:

* ``RemoveInterClusterEdges`` (:291-300): the previous round's matrix is
  reduced to a CLUSTER SUMMARY — only intra-cluster edges survive (the
  reference builds a row-label mask with DimApply + PruneColumn and
  subtracts; a Spark inner join on "both endpoints share a cluster" is the
  same set).
* ``PrepIncMat`` (:922): the incremental matrix is assembled from four
  blocks [[Mpp-summary, Mpn], [Mnp, Mnn]] over a shared vertex numbering.
  With a global edge triple table the assembly is a union — no permutation
  bookkeeping needed (Spark's hash partitioning replaces the reference's
  shuffled position map, which exists purely for MPI load balance).
* the MCL loop then expands with ``IncrementalMCLSquare``
  (ParFriends.h:844-940) — A² with the diagonal split out, since the
  summary concentrates weight on near-diagonal self-affinity
  (operators.multiply.incremental_mcl_square).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.plans.superstep import SuperstepRunner


def cluster_summary(edges: DataFrame, clusters: DataFrame) -> DataFrame:
    """Intra-cluster subgraph (RemoveInterClusterEdges, IncClust.h:291-300
    inverted: the reference DELETES the intra-cluster mask from M to find
    what changed; the summary kept for the next round is that mask itself).

    ``clusters`` is (id, val=cluster id) as returned by mcl().
    """
    cs = clusters.select(F.col("id").alias("src"), F.col("val").alias("_cs"))
    cd = clusters.select(F.col("id").alias("dst"), F.col("val").alias("_cd"))
    return (
        edges.join(cs, on="src").join(cd, on="dst")
        .filter(F.col("_cs") == F.col("_cd"))
        .select("src", "dst", "w")
    )


def prep_inc_mat(*blocks: DataFrame) -> DataFrame:
    """Assemble the incremental matrix (PrepIncMat, IncClust.h:922) from its
    blocks — typically (previous clusters' summary, old<->new bridge +
    new-vertex edges; Mpn/Mnp arrive as one undirected edge set). All
    blocks share the global vertex id space; assembly is a union +
    re-aggregation. On a (src,dst) conflict the LATER block wins (the
    caller passes new_edges last, so a re-delivered edge's fresh weight
    replaces the stale summary value — even a lower one); duplicates within
    one block keep the max weight.
    """
    tagged = [
        b.select("src", "dst", "w", F.lit(i).alias("_blk"))
        for i, b in enumerate(blocks)
    ]
    u = tagged[0]
    for b in tagged[1:]:
        u = u.unionByName(b)
    return (
        u.groupBy("src", "dst")
        .agg(F.max(F.struct(F.col("_blk"), F.col("w"))).alias("_m"))
        .select("src", "dst", F.col("_m.w").alias("w"))
    )


def incremental_mcl(
    spark: SparkSession,
    prev_edges: DataFrame,
    prev_clusters: DataFrame,
    new_edges: DataFrame,
    runner: Optional[SuperstepRunner] = None,
    **mcl_kwargs,
) -> DataFrame:
    """Re-cluster after ``new_edges`` arrive (IncrementalMCL, IncClust.h:619).

    ``prev_edges``/``prev_clusters`` are the previous round's graph and
    mcl() output; ``new_edges`` may introduce new vertices and/or bridge
    edges between old clusters. Old intra-cluster structure enters as the
    summary block, so unchanged clusters converge in one or two expansions;
    inter-cluster edges deleted by the previous round never re-enter.
    Returns (id, val=cluster id) over old + new vertices, like mcl().
    """
    from combblas_spark.algorithms.labelprop import mcl

    summary = cluster_summary(prev_edges, prev_clusters)
    inc = prep_inc_mat(summary, new_edges)
    return mcl(spark, inc, runner=runner, incremental_square=True, **mcl_kwargs)
