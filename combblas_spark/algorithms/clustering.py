"""Per-vertex triangle counts and local clustering coefficient.

Reference semantics: the triangle-counting masked-SpGEMM family
(/root/reference/include/CombBLAS/ParFriends.h:1447 PSpGEMM +
Friends.h:1020-1044 EWiseMult mask) extended per-vertex: each triangle is
enumerated exactly once on the degree-ordered DAG orientation (the unique
wedge a->b->c closed by a->c) and credited to all three corners; the local
clustering coefficient is 2*tri(v) / (deg(v)*(deg(v)-1)).

Scale design: the degree-ordered orientation (triangles._oriented) bounds
any vertex's out-wedges by sqrt(m)-ish on skewed graphs — the same
compact-forward bound ktruss.py uses — so the wedge join never squares a
web hub. Two hash joins + one explode + two hash aggs; no UDFs, no
windows, map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from combblas_spark.algorithms.triangles import _oriented


def _tris(edges: DataFrame) -> DataFrame:
    """(a, b, c) — every triangle of the undirected simple support exactly
    once, enumerated on the degree-ordered DAG orientation (the unique
    wedge a->b->c closed by a->c; compact-forward hub bound). The single
    source of truth for all triangle consumers in this module."""
    L = _oriented(edges, degree_ordered=True).select("src", "dst")
    ab = L.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = L.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = L.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return ab.join(bc, "b").join(ac, ["a", "c"])


def per_vertex_triangles(edges: DataFrame) -> DataFrame:
    """(v, tri): number of triangles incident to each vertex.

    ``edges`` is an undirected graph given as (src, dst[, w]) pairs in
    either or both directions; loops and duplicates are ignored.
    Vertices in no triangle are absent (join clustering_coefficient for
    the dense-over-degree view).
    """
    tris = _tris(edges)
    corners = tris.select(
        F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias("v")
    )
    return corners.groupBy("v").agg(F.count(F.lit(1)).alias("tri"))


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """(id, deg, tri, lcc) per vertex of the undirected simple graph.

    deg = distinct-neighbor degree, tri = incident triangles, lcc =
    2*tri / (deg*(deg-1)) (0.0 when deg < 2). Column types are stable:
    BIGINT counts, lcc rounded to 6 decimals (oracle-portable).
    """
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    sym = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    deg = sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    tri = per_vertex_triangles(edges).select(
        F.col("v").alias("id"), F.col("tri").cast("long").alias("tri")
    )
    return (
        deg.join(tri, "id", "left")
        .select(
            "id",
            "deg",
            F.coalesce(F.col("tri"), F.lit(0).cast("long")).alias("tri"),
            F.round(
                F.when(
                    F.col("deg") >= 2,
                    2.0
                    * F.coalesce(F.col("tri"), F.lit(0))
                    / (F.col("deg") * (F.col("deg") - F.lit(1).cast("double"))),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("lcc"),
        )
    )


def transitivity(edges: DataFrame) -> DataFrame:
    """One-row global transitivity ratio: 3 * triangles / wedges — the
    whole-graph companion of the per-vertex lcc (same masked-SpGEMM
    enumeration, one more aggregate).

    -> (n_triangles BIGINT, n_wedges BIGINT, transitivity) with
    n_wedges = sum_v deg(v)*(deg(v)-1)/2 (integer-exact) and the ratio
    rounded to 6 decimals; 0.0 on wedge-free graphs.
    """
    from combblas_spark.algorithms.triangles import triangles_per_edge

    tri = triangles_per_edge(edges).agg(
        F.coalesce(F.sum("w"), F.lit(0)).cast("long").alias("n_triangles")
    )
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    wedges = (
        sym.groupBy("a")
        .agg(F.count(F.lit(1)).alias("deg"))
        .agg(
            F.coalesce(
                F.sum(F.col("deg") * (F.col("deg") - 1) / 2), F.lit(0)
            ).cast("long").alias("n_wedges")
        )
    )
    return tri.crossJoin(wedges).select(
        "n_triangles",
        "n_wedges",
        F.round(
            F.when(
                F.col("n_wedges") > 0,
                3.0 * F.col("n_triangles") / F.col("n_wedges"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("transitivity"),
    )


def edge_jaccard(edges: DataFrame) -> DataFrame:
    """Per-edge neighborhood Jaccard similarity — the tie-strength signal
    (Easley-Kleinberg embeddedness): for each undirected edge (a, b),
    jac = |N(a) ∩ N(b)| / |N(a) ∪ N(b)| over OPEN neighborhoods with the
    endpoints excluded, i.e. union = (deg(a)-1) + (deg(b)-1) - common.

    -> (a, b, n_common BIGINT, jac) per undirected simple edge, a < b,
    jac rounded to 6 (0.0 when the union is empty — an isolated edge).

    Scale shape: triangles enumerated ONCE on the degree-ordered DAG (the
    compact-forward hub bound), each credited to its three edges by one
    explode; degrees attach by two O(V)-keyed hash joins. No windows.
    """
    tris = _tris(edges)
    tri_edges = tris.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
                ),
                F.struct(
                    F.least("b", "c").alias("a"), F.greatest("b", "c").alias("b")
                ),
                F.struct(
                    F.least("a", "c").alias("a"), F.greatest("a", "c").alias("b")
                ),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    common = tri_edges.groupBy("a", "b").agg(
        F.count(F.lit(1)).cast("long").alias("n_common")
    )
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy(F.col("a").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("deg")
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    j = (
        und.join(common, ["a", "b"], "left")
        .join(da, "a")
        .join(db, "b")
        .select(
            "a", "b",
            F.coalesce(F.col("n_common"), F.lit(0).cast("long")).alias("n_common"),
            (F.col("deg_a") + F.col("deg_b") - 2).alias("un_base"),
        )
    )
    union = F.col("un_base") - F.col("n_common")
    return j.select(
        "a", "b", "n_common",
        F.round(
            F.when(union > 0, F.col("n_common") / union.cast("double")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("jac"),
    )


def triangle_centrality(edges: DataFrame) -> DataFrame:
    """Triangle centrality (Burkhardt 2021, arXiv:2105.00110) — the
    triangle-native importance measure designed for linear-algebra graph
    engines: a vertex is central when its NEIGHBORHOOD is triangle-dense,
    whether or not the vertex itself closes them.

      TC(v) = ( (t(v) + Σ_{u ∈ N_T(v)} t(u)) / 3
                + Σ_{w ∈ N(v)\\N_T(v)} t(w) ) / T

    with t(x) = triangles containing x, T = total triangles, N_T(v) = the
    neighbors whose edge to v lies in at least one triangle. Every vertex
    of a lone triangle scores exactly 1.

    Returns (id, n_tri BIGINT, tc ROUND(.,6)) for every vertex of the
    undirected simple support; 0.0 everywhere on triangle-free graphs.

    Scale shape: ONE degree-ordered triple enumeration (the
    per_vertex_triangles wedge join, compact-forward bounded on skewed
    graphs) collapses straight into the small per-edge support table
    (one row per in-triangle edge), which is persisted and eagerly
    materialized so the expensive wedge join runs EXACTLY once — all three
    derived tables come from support by integer identities:
    Σ_incident support = 2·t(v) and Σ support = 3·T. The per-vertex
    neighbor sums are one symmetrized hash join against the O(V) t(v)
    table plus one conditional aggregation. No windows, no UDFs, no
    iteration. (Per the repo convention, the persisted intermediate is
    left for the session harness to clearCache between queries.)
    """
    tris = _tris(edges)
    sup = (
        tris.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionByName(tris.select(F.col("b").alias("x"), F.col("c").alias("y")))
        .unionByName(tris.select(F.col("a").alias("x"), F.col("c").alias("y")))
        .select(F.least("x", "y").alias("a"), F.greatest("x", "y").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("long").alias("support"))
    )
    sup.persist()
    sup.count()  # eager: the wedge join runs once, here
    # each triangle at v covers exactly 2 of v's incident edges
    tv = (
        sup.select(
            F.explode(F.array(F.col("a"), F.col("b"))).alias("v"), "support"
        )
        .groupBy("v")
        .agg((F.sum("support") / 2).cast("long").alias("t"))
    )
    tedge = sup.select("a", "b").withColumn("intri", F.lit(1))
    # each triangle contributes its 3 sides once
    tot = sup.agg((F.coalesce(F.sum("support"), F.lit(0)) / 3).cast("double").alias("tot"))

    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    fl = und.join(tedge, ["a", "b"], "left").select(
        "a", "b", F.coalesce(F.col("intri"), F.lit(0)).alias("intri")
    )
    symf = fl.select(
        F.col("a").alias("v"), F.col("b").alias("u"), "intri"
    ).unionByName(
        fl.select(F.col("b").alias("v"), F.col("a").alias("u"), "intri")
    )
    nbr = symf.join(
        tv.select(F.col("v").alias("u"), F.col("t").alias("t_u")), "u", "left"
    ).select("v", "intri", F.coalesce(F.col("t_u"), F.lit(0)).alias("t_u"))
    agg = nbr.groupBy("v").agg(
        F.sum(F.when(F.col("intri") == 1, F.col("t_u")).otherwise(0)).alias("s_t"),
        F.sum(F.when(F.col("intri") == 0, F.col("t_u")).otherwise(0)).alias("s_n"),
    )
    out = (
        agg.join(tv, "v", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("v").alias("id"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_tri"),
            F.round(
                F.when(
                    F.col("tot") > 0,
                    (
                        (F.coalesce(F.col("t"), F.lit(0)) + F.col("s_t")) / 3.0
                        + F.col("s_n")
                    )
                    / F.col("tot"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("tc"),
        )
    )
    return out


def clique_communities(spark, edges: DataFrame, max_iter: int = 64) -> DataFrame:
    """3-clique percolation communities (Palla et al., Nature 435:814,
    2005): two triangles are adjacent iff they share an edge; a
    community is a connected set of triangles, and a vertex belongs to
    every community whose triangles contain it (overlapping membership
    — the property k-clique percolation exists for).

    Output (id, comm) — one row per (vertex, community) membership;
    comm is the minimum canonical triangle id in the community, where a
    triangle (x < y < z) encodes as (x*2^20 + y)*2^20 + z. Vertices in
    no triangle are absent. Ids must be < 2^20 (raises at execution
    otherwise — rename first for bigger graphs; the encode keeps the
    whole pipeline in exact int64).

    Scale shape: triangles from the degree-ordered wedge join (_tris,
    compact-forward hub bound); per shared edge the adjacency is the
    STAR to the edge's minimum triangle — |tris on edge| - 1 rows
    instead of the quadratic clique, same connectivity — so the
    triangle graph is linear in the triangle-edge incidence; CC over it
    is the standard min-label superstep kernel (cc_minlabel).
    """
    S = 1 << 20
    tris = _tris(edges)
    x = F.least("a", "b", "c")
    z = F.greatest("a", "b", "c")
    y = F.col("a") + F.col("b") + F.col("c") - x - z
    tid = F.when(
        z < S, (x * S + y) * S + z
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("clique_communities: vertex id >= 2^20 at "),
                z.cast("string"),
            )
        )
    )
    t = tris.select(
        x.alias("x"), y.alias("y"), z.alias("z"), tid.alias("tid")
    ).localCheckpoint()
    tedge = t.select(
        "tid",
        F.explode(
            F.array(
                F.struct(F.col("x").alias("u"), F.col("y").alias("v")),
                F.struct(F.col("x").alias("u"), F.col("z").alias("v")),
                F.struct(F.col("y").alias("u"), F.col("z").alias("v")),
            )
        ).alias("e"),
    )
    # ROOT-GRAPH CONTRACTION: community connectivity flows only through the
    # per-edge minimum triangles ("roots") — a leaf triangle merely bridges
    # its <= 3 roots — so CC runs over the O(roots) quotient (measured 18x
    # fewer vertices than triangles at sf0.1) and every triangle recovers
    # its label as min over its roots' labels in ONE post-CC join. Proof of
    # equivalence: the community minimum m is minimal on each of its edges
    # (all triangles sharing an edge with m are in m's community), so m is
    # itself a root and per-root min-labels are exactly the star-graph CC
    # fixpoint restricted to roots; a leaf's star-graph label is the min of
    # its roots' labels (its only neighbors). Verified bit-identical to the
    # star-graph formulation on the sf0.1 fixture.
    er = tedge.groupBy("e").agg(F.min("tid").alias("root"))
    troots = tedge.join(er, on="e").select("tid", "root").localCheckpoint()
    rg = troots.groupBy("tid").agg(
        F.min("root").alias("rmin"), F.collect_set("root").alias("rs")
    )
    rge = (
        rg.select(F.col("rmin").alias("src"), F.explode("rs").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    rsym = rge.select("src", "dst", F.lit(1.0).alias("w")).unionByName(
        rge.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            F.lit(1.0).alias("w"),
        )
    )
    from combblas_spark.algorithms.cc import cc_minlabel

    rlabels = cc_minlabel(
        spark, rsym, max_iter=max_iter,
        vertices=troots.select(F.col("root").alias("id")).distinct(),
    )
    lab = (
        troots.join(
            rlabels.select(F.col("id").alias("root"), "val"), on="root"
        )
        .groupBy("tid")
        .agg(F.min("val").alias("val"))
    )
    member = t.join(lab, on="tid").select(
        F.explode(F.array("x", "y", "z")).alias("id"),
        F.col("val").alias("comm"),
    )
    return member.distinct()
