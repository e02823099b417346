"""Bipartite maximal matching — proposal rounds as DataFrame supersteps.

Reference: /root/reference/Applications/BipartiteMatchings/
BPMaximalMatching.h:35-172 (MaximalMatching, init DMD): per round every
unmatched row vertex proposes along an incident edge to an unmatched column
vertex (SpMV<Select2ndMin> over the active subgraph), each column accepts
exactly one proposer (min), matched pairs leave the graph, repeat until no
row can propose. Greedy maximal: no augmenting, >= 1/2 optimum.

Determinism: the reference breaks ties by processor order; here both the
proposal (min column neighbor) and the acceptance (min proposer) use vertex
ids — the result is a pure function of the edge set, so a SQL oracle can
replay it round-by-round.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.plans.superstep import SuperstepRunner


def maximal_matching(
    spark: SparkSession,
    edges: DataFrame,
    max_rounds: int = 64,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """Greedy maximal matching on a bipartite edge table (src = one side,
    dst = the other; e.g. part -> supplier). Returns (src, dst) matched
    pairs. Invariants (pytest): each src and dst appears at most once; no
    remaining edge joins two unmatched vertices (maximality).
    """
    runner = runner or SuperstepRunner(spark)
    active = runner.truncate(edges.select("src", "dst").distinct())
    matched = None
    for rnd in range(max_rounds):
        if active.limit(1).count() == 0:
            break
        # each src proposes to its min active dst; each dst accepts min proposer
        proposals = active.groupBy("src").agg(F.min("dst").alias("dst"))
        accepted = proposals.groupBy("dst").agg(F.min("src").alias("src")).select("src", "dst")
        accepted = runner.truncate(accepted)
        matched = accepted if matched is None else runner.truncate(matched.unionByName(accepted))
        # drop every edge touching a newly matched endpoint
        active = runner.truncate(
            active.join(accepted.select("src"), on="src", how="left_anti")
            .join(accepted.select("dst"), on="dst", how="left_anti")
            .select("src", "dst")
        )
        runner.save(rnd + 1, {"matched": matched, "active": active}, {})
    if matched is None:
        return edges.select("src", "dst").filter(F.lit(False))
    return matched
