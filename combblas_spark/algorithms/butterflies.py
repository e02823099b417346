"""Butterfly (bipartite 4-cycle) counting.

Reference semantics: the bipartite analog of the masked-SpGEMM triangle
family (/root/reference/include/CombBLAS/ParFriends.h:1447) — the ps
part—supplier graph is genuinely bipartite, where the smallest non-trivial
motif is the butterfly (4-cycle u–z1–v–z2), the unit of bipartite
clustering and of parbutterfly-style analytics.

Counting identity: with c(u,v) = number of common neighbors of the
unordered pair (u,v), every 4-cycle is counted by exactly TWO pairs (its
two diagonals), so

    n_4cycles = ( sum over pairs of C(c(u,v), 2) ) / 2

which on a bipartite graph equals the butterfly count. All arithmetic is
integer-exact.

Scale design: wedges enumerate through each center z — a degree-d center
contributes C(d, 2) pair rows, so ``max_degree`` caps centers the same
way adamic_adar does (the standard hub cut; a web-scale run samples or
caps hubs, and the contract query replays the cap in its oracle). One
self-join keyed on the center + two map-side-combinable aggregates; no
windows, no UDFs.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def butterfly_count(
    edges: DataFrame, max_degree: Optional[int] = None
) -> DataFrame:
    """One-row butterfly/4-cycle census of the undirected simple support:
    (n_wedges BIGINT, n_pairs BIGINT, n_butterflies BIGINT) where n_wedges
    counts wedge pair-slots (sum over pairs of c(u,v) = sum over centers of
    C(deg, 2)), n_pairs the distinct co-neighbor pairs, and n_butterflies
    the 4-cycles. ``max_degree`` drops wedge centers above the cap."""
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("z")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    centers = deg.filter(F.col("deg") >= 2)
    if max_degree is not None:
        centers = centers.filter(F.col("deg") <= max_degree)
    inc = sym.select(F.col("a").alias("z"), F.col("b").alias("v")).join(
        centers.select("z"), "z"
    )
    left = inc.select("z", F.col("v").alias("u"))
    right = inc.select("z", F.col("v").alias("v"))
    pairs = (
        left.join(right, "z")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return pairs.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_wedges"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        (
            F.coalesce(F.sum(F.col("c") * (F.col("c") - 1) / 2), F.lit(0)) / 2
        ).cast("long").alias("n_butterflies"),
    )
