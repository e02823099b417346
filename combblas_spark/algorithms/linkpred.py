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


def cocitation(
    edges: DataFrame,
    max_degree: Optional[int] = None,
    coupling: bool = False,
) -> DataFrame:
    """Co-citation strength (Small 1973): for every pair of DISTINCT
    vertices (a, b), the number of vertices that link to BOTH — the
    classic link-analysis similarity matrix C = A^T A off-diagonal. With
    ``coupling=True`` computes bibliographic coupling instead (Kessler
    1963): common OUT-neighbors, B = A A^T — the same wedge enumeration
    with the incidence direction flipped.

    -> (a, b, n_common BIGINT) with a < b over the directed simple
    loop-free edge set; pairs with no common linker don't appear.

    Scale design (100 TB): wedges are enumerated through the linking
    vertex z (out-degree d contributes C(d, 2) pairs), so ``max_degree``
    caps the wedge centers exactly like adamic_adar / butterflies — a
    directory page linking to 10^6 targets would otherwise emit 10^12
    pairs. One self-join keyed on the center + one map-side-combinable
    count; no UDFs, no cartesian.
    """
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    # wedge center z and its fan: z->x for co-citation (x co-cited BY z),
    # x->z flipped into (z, x) for coupling (x cites z... direction note
    # below): coupling pairs share an OUT-neighbor, so the center is the
    # common TARGET and the fan are its citers.
    if coupling:
        inc = e.select(F.col("dst").alias("z"), F.col("src").alias("x"))
    else:
        inc = e.select(F.col("src").alias("z"), F.col("dst").alias("x"))
    if max_degree is not None:
        zdeg = inc.groupBy("z").agg(F.count(F.lit(1)).alias("_d"))
        inc = inc.join(
            zdeg.filter(F.col("_d") <= max_degree).select("z"), "z", "leftsemi"
        )
    l = inc.select("z", F.col("x").alias("a"))
    r = inc.select("z", F.col("x").alias("b"))
    return (
        l.join(r, "z")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )


def fof_recommend(
    edges: DataFrame,
    k: int = 3,
    max_middle_degree: int = 10_000,
    salt: int = 16,
) -> DataFrame:
    """Friend-of-friend link recommendations — the SERVING query link
    prediction exists for: per vertex, the top-k non-neighbor
    candidates ranked by common-neighbor count (ties by candidate id —
    a total order, so the rec list is replayable).

    Wedge enumeration through a middle vertex costs deg^2; middles
    above ``max_middle_degree`` are dropped (the standard
    super-hub-is-uninformative cut — a celebrity neighbor says nothing
    about affinity; documented, deterministic, and replicated by the
    oracle). Top-k per source runs the two-phase salted shape (local
    top-k per (source, candidate-hash salt), global top-k over the
    <= salt*k survivors) so a vertex with a huge candidate set never
    sorts through one task. Output (id, rec, n_common, rank).
    """
    from pyspark.sql import Window

    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    deg = und.groupBy("src").agg(F.count(F.lit(1)).alias("_d"))
    mid_ok = deg.filter(F.col("_d") <= int(max_middle_degree)).select(
        F.col("src").alias("_m")
    )
    left = und.select(F.col("dst").alias("_m"), F.col("src").alias("u"))
    right = und.select(F.col("src").alias("_m"), F.col("dst").alias("w"))
    wedges = (
        left.join(mid_ok, on="_m")
        .join(right, on="_m")
        .filter(F.col("u") != F.col("w"))
    )
    cand = wedges.groupBy("u", "w").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    non_nbr = cand.join(
        und.select(F.col("src").alias("u"), F.col("dst").alias("w")),
        on=["u", "w"],
        how="left_anti",
    )
    from combblas_spark.functions.dedup import md5_60bit

    local_w = Window.partitionBy(
        "u", F.pmod(md5_60bit(F.col("w").cast("string")), F.lit(int(salt)))
    ).orderBy(F.col("n_common").desc(), F.col("w").asc())
    survivors = (
        non_nbr.withColumn("_rn", F.row_number().over(local_w))
        .filter(F.col("_rn") <= int(k))
        .drop("_rn")
    )
    glob_w = Window.partitionBy("u").orderBy(
        F.col("n_common").desc(), F.col("w").asc()
    )
    return (
        survivors.withColumn("rank", F.row_number().over(glob_w))
        .filter(F.col("rank") <= int(k))
        .select(
            F.col("u").alias("id"),
            F.col("w").alias("rec"),
            "n_common",
            F.col("rank").cast("long").alias("rank"),
        )
    )
