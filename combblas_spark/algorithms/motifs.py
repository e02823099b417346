"""Directed triangle motif census — reciprocated edges, feed-forward loops
and 3-cycles (Milo et al. 2002's two directed-triangle motifs, the classic
"is this network hierarchy or feedback" structure signal; social/web graphs
report it next to reciprocity and assortativity).

CombBLAS expresses motif counting as masked multiplies over the directed
adjacency — the FFL count is nnz-sum of (A·A) ⊙ A and the cycle count is
nnz-sum of (A·A) ⊙ Aᵀ (the same L·L⊙L composition as the undirected
triangle kernel, /root/reference/Applications/MCL.h-style masked SpGEMM;
triangles: /root/reference/include/CombBLAS/ParFriends.h:1447 multiply +
EWiseMult mask). Here the wedge SpGEMM is ONE self-join of the distinct
edge table enumerated once and closed twice (Catalyst's ReuseExchange
dedupes the shared wedge scan), so every count is an exact integer.

Scale shape: wedges through a center vertex b number indeg(b)·outdeg(b) —
a web hub squares. ``max_degree`` caps the wedge CENTER's total distinct
degree (the adamic_adar/cocitation anti-quadratic production shape); the
contract oracle replays the cap so the capped count is engine-portable.
The two closing joins are plain hash joins on the (a, c) pair against the
distinct edge table; no aggregation state beyond three scalar counts.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def triad_motifs(edges: DataFrame, max_degree: Optional[int] = None) -> DataFrame:
    """One row (n_recip, n_ffl, n_cycle) over the DIRECTED graph ``edges``
    (src, dst, ...), counted on the DISTINCT loop-free edge set:

    * n_recip — unordered pairs {a, b} with both a→b and b→a;
    * n_ffl   — ordered triples (a, b, c), vertices distinct, with a→b,
      b→c and the transitive shortcut a→c (feed-forward instances; a
      triangle of reciprocated edges contributes once per role-cast);
    * n_cycle — directed 3-cycles a→b→c→a, each counted once (anchored at
      its minimum vertex id).

    ``max_degree`` drops wedges whose CENTER b has more than that many
    distinct in+out neighbors-edges (indeg+outdeg on the distinct edge
    set); None counts exactly. Counts are BIGINT, so results hash exactly
    across engines.
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    e.persist()
    # reciprocated pairs: A ⊙ Aᵀ above the diagonal
    recip = (
        e.alias("x")
        .join(
            e.alias("y"),
            (F.col("x.src") == F.col("y.dst")) & (F.col("x.dst") == F.col("y.src")),
        )
        .filter(F.col("x.src") < F.col("x.dst"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_recip"))
    )
    # wedge stage (the A·A SpGEMM): a→b→c through center b
    e1 = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    if max_degree is not None:
        deg = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("d"))
            .filter(F.col("d") <= max_degree)
            .select(F.col("id").alias("b"))
        )
        e1 = e1.join(deg, on="b", how="leftsemi")
    wedges = e1.join(e2, on="b")
    # transitive closure a→c: (A·A) ⊙ A
    ffl = wedges.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("c")), on=["a", "c"]
    ).agg(F.count(F.lit(1)).cast("long").alias("n_ffl"))
    # cyclic closure c→a anchored at min id: (A·A) ⊙ Aᵀ, each cycle once
    cyc = (
        wedges.join(
            e.select(F.col("dst").alias("a"), F.col("src").alias("c")), on=["a", "c"]
        )
        .filter((F.col("a") < F.col("b")) & (F.col("a") < F.col("c")))
        .agg(F.count(F.lit(1)).cast("long").alias("n_cycle"))
    )
    return recip.crossJoin(ffl).crossJoin(cyc)
