"""Link prediction over the two-hop neighborhood: Adamic-Adar / common
neighbors.

Reference semantics: the wedge-enumeration shape is the reference's
masked-SpGEMM triangle family (/root/reference/include/CombBLAS/
ParFriends.h:1447 PSpGEMM; Friends.h:1020-1044 EWiseMult mask) with the
mask INVERTED — score pairs that are NOT yet edges. A(x)A^T over the
plus-times semiring with per-neighbor weight 1/ln(deg(z)) is exactly the
Adamic-Adar score matrix; common-neighbor counting is the same product
over plus-ones.

Scale design (100 TB): wedges are enumerated through each common neighbor
z, so a web hub with degree d contributes d^2 candidate pairs —
``max_degree`` caps the wedge centers (the standard practicality cut for
AA at scale: hubs carry ~zero information anyway since 1/ln(deg) -> 0).
The final top-k is a deterministic sort-limit that executes as
TakeOrderedAndProject (no global sort materialization).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def adamic_adar(
    edges: DataFrame,
    k: int = 1000,
    max_degree: Optional[int] = None,
) -> DataFrame:
    """Top-k non-edge pairs by Adamic-Adar score.

    -> (a, b, n_common BIGINT, aa_score) with a < b, existing edges of the
    undirected simple support excluded, ordered by (aa_score DESC, a, b)
    and limited to ``k`` (fully deterministic). aa_score = sum over common
    neighbors z of 1/ln(deg(z)), rounded to 6 decimals; wedge centers need
    deg(z) >= 2 (a degree-1 vertex cannot be a common neighbor).

    ``max_degree`` drops wedge centers with deg(z) above the cap — bounds
    the d^2 blowup of hubs; None enumerates exactly.
    """
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
    # incidences keyed by the wedge center z, weighted 1/ln(deg(z))
    inc = sym.select(F.col("a").alias("z"), F.col("b").alias("v")).join(
        centers.select("z", (1.0 / F.log(F.col("deg").cast("double"))).alias("wz")),
        "z",
    )
    left = inc.select("z", F.col("v").alias("a"), "wz")
    right = inc.select("z", F.col("v").alias("b"))
    pairs = (
        left.join(right, "z")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_common"),
            F.sum("wz").alias("aa"),
        )
        .join(und, ["a", "b"], "left_anti")  # score NON-edges only
    )
    return (
        pairs.select("a", "b", "n_common", F.round("aa", 6).alias("aa_score"))
        .orderBy(F.col("aa_score").desc(), "a", "b")
        .limit(k)
    )
