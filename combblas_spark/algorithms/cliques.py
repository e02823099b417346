"""4-clique census — the K4 subgraph count, one rung above triangles.

Enumeration on an acyclically oriented edge set: orient every undirected
edge from lower to higher rank, then a K4 {a,b,c,d} appears as exactly one
oriented chain a->b->c->d with all six oriented edges present — each clique
is counted once, for ANY total-order ranking. The Spark side ranks by
(degree, id) (the compact-forward orientation triangles.py uses, which
bounds per-source fanout by graph arboricity on skewed inputs); the DuckDB
oracle ranks by id — different intermediates, identical census, which is
the cross-engine determinism property we want.

Reference anchor: the masked-SpGEMM triangle pattern
(/root/reference/include/CombBLAS/ParFriends.h:1447, Friends.h:1020-1044)
extended one multiply deeper: K4s are triangles (L*L .* L) extended by a
common out-neighbor, i.e. ((L*L .* L) * L) .* L in semiring terms — here
expressed directly as the three-join chain so Catalyst sees one pipeline.

Scale shape: with degree ordering, the wedge stage is O(sum of squared
out-degrees) = O(m * arboricity); the extension stage touches only actual
triangles. Dense cores must be pre-sparsified (sources/graphs.py
events_thinned_graph) — a near-complete 100-vertex core alone holds ~4M K4s.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def _rank_oriented(edges: DataFrame) -> DataFrame:
    """(src, dst) with each undirected edge directed from lower to higher
    (degree, id) rank. Input may be directed/duplicated; loops dropped."""
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
    deg = (
        e.select(F.col("src").alias("v"))
        .unionByName(e.select(F.col("dst").alias("v")))
        .groupBy("v")
        .count()
    )
    ds = deg.select(F.col("v").alias("src"), F.col("count").alias("d_src"))
    dd = deg.select(F.col("v").alias("dst"), F.col("count").alias("d_dst"))
    j = e.join(ds, "src").join(dd, "dst")
    keep = (F.col("d_src") < F.col("d_dst")) | (
        (F.col("d_src") == F.col("d_dst")) & (F.col("src") < F.col("dst"))
    )
    return j.select(
        F.when(keep, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(keep, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )


def four_cliques(edges: DataFrame) -> DataFrame:
    """Enumerate K4s of the undirected graph ``edges`` (src, dst) and return
    per-vertex participation counts (id, n_quads BIGINT) — every vertex of
    every 4-clique contributes 1. Vertices in no K4 are absent (sparse)."""
    o = _rank_oriented(edges)
    e1 = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = o.select(F.col("src").alias("a2"), F.col("dst").alias("c2"))
    tris = (
        e1.join(e2, on="b")
        .join(
            e3,
            on=(F.col("a") == F.col("a2")) & (F.col("c") == F.col("c2")),
        )
        .select("a", "b", "c")
    )
    x1 = o.select(F.col("src").alias("c"), F.col("dst").alias("d"))
    x2 = o.select(F.col("src").alias("b"), F.col("dst").alias("d2"))
    x3 = o.select(F.col("src").alias("a"), F.col("dst").alias("d3"))
    # the post-join equality filters are lifted into the hash-join keys by
    # Catalyst (PushPredicateThroughJoin), so each stage is an equi-join on
    # (vertex, d) — no fanout beyond actual clique extensions
    quads = (
        tris.join(x1, on="c")
        .join(x2, on="b")
        .filter(F.col("d") == F.col("d2"))
        .join(x3, on="a")
        .filter(F.col("d") == F.col("d3"))
        .select("a", "b", "c", "d")
    )
    members = (
        quads.select(F.col("a").alias("id"))
        .unionByName(quads.select(F.col("b").alias("id")))
        .unionByName(quads.select(F.col("c").alias("id")))
        .unionByName(quads.select(F.col("d").alias("id")))
    )
    return members.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_quads")
    )
