"""Fill-reducing / bandwidth-reducing orderings: RCM and minimum degree.

Reference: /root/reference/Applications/Ordering/RCM.cpp:332-380 (RCMOrder):
BFS from a (pseudo-peripheral) source; each fringe vertex is labeled
(parent's order, own degree) (RCM.cpp:61-90 VertexType ordering), the
fringe is sorted by that label to assign the next orders, and the final
permutation is the REVERSE of the visit order. Here each BFS level is
ranked with the parallel sample-sort ranker (operators.indexing
._global_ranks) on (parent_order, degree, id) — no single-task sort.

The natural consumer is operators.reduce.bandwidth/profile: relabeling by
this permutation shrinks both on banded-able graphs (pytest asserts it).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.algorithms.bfs import bfs
from combblas_spark.core.semiring import MAX_PLUS, PLUS_TIMES
from combblas_spark.operators.indexing import _global_ranks
from combblas_spark.operators.multiply import spmv
from combblas_spark.plans.superstep import SuperstepRunner


def pseudo_peripheral_source(edges: DataFrame) -> int:
    """Min-degree vertex (ties -> min id) — the reference seeds its
    pseudo-peripheral search the same way (RCM.cpp:424-431)."""
    deg = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    row = deg.orderBy(F.col("deg").asc(), F.col("id").asc()).limit(1).collect()[0]
    return int(row["id"])


def rcm_order(
    spark: SparkSession,
    edges: DataFrame,
    source: Optional[int] = None,
    runner: Optional[SuperstepRunner] = None,
    max_depth: int = 10_000,
) -> DataFrame:
    """Returns the permutation (id, val=new index) over reached vertices.

    ``edges`` must be symmetric. Unreached vertices (other components) are
    appended after, ordered by (degree, id) — callers wanting strict
    per-component RCM run it per component. ``max_depth`` caps the BFS
    (share it with any fixed-depth oracle, like BFS_DEPTH in the contract).
    """
    if source is None:
        source = pseudo_peripheral_source(edges)
    tree = bfs(spark, edges, source, runner=runner, max_iter=max_depth)
    tree = tree.localCheckpoint()
    deg = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    ).localCheckpoint()

    max_depth = tree.agg(F.max("depth")).collect()[0][0]
    orders = tree.filter(F.col("depth") == 0).select("id", F.lit(0).cast("long").alias("ord"))
    offset = 1
    for d in range(1, max_depth + 1):
        lvl = (
            tree.filter(F.col("depth") == d)
            .join(orders.select(F.col("id").alias("parent"), F.col("ord").alias("parent_ord")),
                  on="parent")
            .join(deg, on="id")
        )
        ranked = _global_ranks(
            lvl, [F.col("parent_ord").asc(), F.col("deg").asc(), F.col("id").asc()]
        ).select("id", (F.col("rank") + F.lit(offset)).alias("ord"))
        ranked = ranked.localCheckpoint()
        offset += ranked.count()
        orders = orders.unionByName(ranked).localCheckpoint()

    # other components: appended by (degree, id) — keeps the permutation total
    rest = deg.join(orders.select("id"), on="id", how="left_anti")
    if rest.limit(1).count():
        ranked = _global_ranks(rest, [F.col("deg").asc(), F.col("id").asc()]).select(
            "id", (F.col("rank") + F.lit(offset)).alias("ord")
        )
        offset += ranked.count()
        orders = orders.unionByName(ranked)

    n = offset
    # Reverse Cuthill-McKee: new index = n-1 - visit order
    return orders.select("id", (F.lit(n - 1) - F.col("ord")).cast("long").alias("val"))


def _md_block(ids: list, srcs: list, dsts: list) -> list:
    """Minimum-degree elimination of ONE block, pure python/numpy.

    Mirrors /root/reference/Applications/Ordering/MD.cpp:289-350: repeat
    (pick min-degree vertex s [ties -> min id], eliminate, reach(s) = the
    non-eliminated vertices connected to s THROUGH eliminated ones
    [getReach, MD.cpp:23-45], set each reached vertex's degree to the size
    of ITS reach [getReachesSPMM]). Returns [(vertex id, elimination
    position)]. The reference's own loop eliminates one vertex per
    distributed superstep — inherently sequential — so the Spark-idiomatic
    deployment is per-block (see md_order_blocked), not per-superstep.
    """
    import numpy as np

    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    adj = [set() for _ in range(n)]
    for s, d in zip(srcs, dsts):
        si, di = idx[s], idx[d]
        if si != di:
            adj[si].add(di)
            adj[di].add(si)
    eliminated = np.zeros(n, dtype=bool)
    deg = np.array([len(a) for a in adj], dtype=np.int64)
    ids_arr = np.asarray(ids, dtype=np.int64)
    order = []

    def reach(s: int) -> set:
        seen = {s}
        frontier = [s]
        out = set()
        while frontier:
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v in seen:
                        continue
                    seen.add(v)
                    if eliminated[v]:
                        nxt.append(v)  # traverse THROUGH eliminated nodes
                    else:
                        out.add(v)
            frontier = nxt
        return out

    for pos in range(n):
        cand = np.flatnonzero(~eliminated)
        s = int(cand[np.lexsort((ids_arr[cand], deg[cand]))[0]])
        order.append((int(ids_arr[s]), pos))
        eliminated[s] = True
        for v in reach(s):
            deg[v] = len(reach(v))
    return order


def md_order_blocked(
    spark: SparkSession,
    edges: DataFrame,
    assignment: Optional[DataFrame] = None,
) -> DataFrame:
    """Minimum-degree ordering (MD.cpp analog), block-local.

    The reference's distributed MD eliminates ONE vertex per superstep
    (MD.cpp:308 loop over every vertex) — a research prototype that cannot
    scale past small n. The practical distributed shape is block-diagonal:
    partition the graph (``assignment``: (id, val=block), e.g. connected
    components or a clustering), route each block's induced subgraph to one
    task (InducedSubgraphs2Procs, operators.indexing.induced_subgraphs) and
    run the exact reference elimination per block in one Arrow batch.
    Returns (cluster, id, val=within-block elimination position).

    With ``assignment=None`` every vertex lands in one block — the
    small-graph path matching the reference tool's single-matrix usage.

    The result is a TOTAL ordering of ``assignment``: a vertex with no
    intra-block edge (isolated, or all its edges cross blocks under a
    general clustering) has degree 0 in its block and is appended after the
    eliminated ones, min-id first — exactly where the elimination loop would
    pick it if the induced subgraph had carried it as an isolated node.
    """
    import pandas as pd
    from pyspark.sql import Window

    from combblas_spark.operators.indexing import induced_subgraphs

    if assignment is None:
        verts = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        assignment = verts.select("id", F.lit(0).cast("long").alias("val"))
    sub = induced_subgraphs(edges, assignment)

    def block_md(pdf: pd.DataFrame) -> pd.DataFrame:
        cluster = pdf["cluster"].iloc[0]
        ids = sorted(set(pdf["src"]).union(pdf["dst"]))
        order = _md_block(ids, pdf["src"].tolist(), pdf["dst"].tolist())
        return pd.DataFrame(
            {"cluster": cluster, "id": [i for i, _ in order], "val": [p for _, p in order]}
        )

    ordered = sub.groupBy("cluster").applyInPandas(
        block_md, schema="cluster long, id long, val long"
    )
    # trailing positions for vertices the induced subgraph never saw
    missing = assignment.select(
        F.col("val").alias("cluster"), "id"
    ).join(ordered.select("id"), on="id", how="left_anti")
    base = ordered.groupBy("cluster").agg((F.max("val") + 1).alias("_base"))
    w_tail = Window.partitionBy("cluster").orderBy("id")
    tail = (
        missing.join(base, on="cluster", how="left")
        .select(
            "cluster",
            "id",
            (
                F.coalesce(F.col("_base"), F.lit(0))
                + F.row_number().over(w_tail)
                - 1
            ).cast("long").alias("val"),
        )
    )
    return ordered.unionByName(tail)


def level_schedule(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 64,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """Dependency level sets over a DAG — the sparse triangular-solve
    (SpTRSV) level-scheduling pass: level(v) = length of the longest
    dependency chain into v, so every vertex in a level can execute in
    parallel once prior levels are done (Anderson-Saad / Saltz wavefront
    scheduling; the ordering-analytics sibling of RCM above — reference
    orderings live in ApplyPermutation/RCM.cpp territory, reference has
    no level-set kernel itself).

    One MAX_PLUS SpMV per superstep (longest-path relaxation is the
    max-plus analogue of sssp's MIN_PLUS), merged with the standing
    levels via a coalesced GREATEST; edges stay cached and
    dst-partitioned while the level vector is broadcast per superstep;
    lineage cut via runner.truncate. Raises on non-convergence within
    ``max_iter`` — a truncated fixpoint would silently mis-level every
    downstream vertex (and a cycle never converges: cycles make level
    sets undefined, so raising is the contract).

    ``edges``: (src, dst) meaning dst depends on src. Returns
    (id, level BIGINT).
    """
    runner = runner or SuperstepRunner(spark)
    e = (
        edges.select("src", "dst")
        .distinct()
        .withColumn("w", F.lit(1).cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, "dst")
    )
    e.persist()
    try:
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        lvl = runner.truncate(
            verts.select("id", F.lit(0).cast("long").alias("val"))
        )
        for _ in range(max_iter):
            contrib = spmv(e, lvl, MAX_PLUS, broadcast_x=True).select(
                "id", F.col("val").alias("cand")
            )
            # moved flag computed inline; truncate_agg folds the
            # convergence count into the materializing job (ONE action
            # per superstep, no old-vs-new re-join)
            merged = (
                lvl.join(contrib, "id", "left")
                .select(
                    "id",
                    F.greatest(
                        F.col("val"), F.coalesce(F.col("cand"), F.lit(0))
                    ).alias("val"),
                    (F.coalesce(F.col("cand"), F.lit(0)) > F.col("val"))
                    .cast("long")
                    .alias("_moved"),
                )
            )
            new_lvl, row = runner.truncate_agg(
                merged, F.sum("_moved").alias("m")
            )
            lvl = new_lvl.select("id", "val")
            if int(row["m"] or 0) == 0:
                return lvl.select("id", F.col("val").alias("level"))
        raise RuntimeError(
            f"level_schedule: no fixpoint within max_iter={max_iter} "
            "supersteps — the longest dependency chain exceeds the "
            "budget, or the input graph has a cycle (level sets are "
            "undefined on cycles)."
        )
    finally:
        e.unpersist()


def path_count(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 64,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """Source-to-vertex path counting over a DAG: n_paths(v) = number of
    distinct root->v paths, roots = vertices with no in-edge, each root
    counting its own empty path. Completes the wavefront semiring
    triptych — sssp relaxes MIN_PLUS, :func:`level_schedule` MAX_PLUS,
    and this is the PLUS_TIMES member (path enumeration IS the
    plus-times closure A* over the DAG; reference semiring catalogue at
    /root/reference/include/CombBLAS/Operations.h, which has min/max/
    plus monoids but no DAG path kernel).

    Plan shape: the frontier y_t holds the count of length-t paths
    ending at each vertex — one PLUS_TIMES SpMV per superstep
    (y_{t+1}[d] = sum over edges (s,d) of y_t[s]) against the cached
    dst-partitioned edge table with the (small, O(active)) frontier
    broadcast, drained into a union accumulator that one final groupBy
    SUM collapses. On a DAG the frontier empties within longest-path
    supersteps; a cycle never drains, so exhausting ``max_iter``
    RAISES rather than returning truncated counts (a cycle makes the
    path count infinite — any finite answer would be wrong).

    ``edges``: (src, dst). Returns (id, n_paths BIGINT) for every
    vertex reachable from a root, roots included. Counts are exact
    int64 — callers on dense layered DAGs must bound depth*fanin so
    the count stays under 2^63 (the layered contract fixture does).
    A cycle UNREACHABLE from any root simply contributes no rows (no
    root path enters it — on a fully root-less input the output is
    empty); only a root-fed cycle trips the non-convergence raise.
    """
    runner = runner or SuperstepRunner(spark)
    e = (
        edges.select("src", "dst")
        .distinct()
        .withColumn("w", F.lit(1).cast("long"))
        .repartition(spark.sparkContext.defaultParallelism, "dst")
    )
    e.persist()
    try:
        dsts = e.select(F.col("dst").alias("id")).distinct()
        roots = (
            e.select(F.col("src").alias("id"))
            .distinct()
            .join(dsts, "id", "left_anti")
        )
        y = runner.truncate(
            roots.select("id", F.lit(1).cast("long").alias("val"))
        )
        acc = y
        for _ in range(max_iter):
            # ONE action per superstep: frontier count folds into the
            # checkpoint; the accumulator is a union of checkpointed
            # frontiers (flat lineage, never rewritten)
            y, row = runner.truncate_agg(
                spmv(e, y, PLUS_TIMES, broadcast_x=True),
                F.count(F.lit(1)).alias("n"),
            )
            if int(row["n"] or 0) == 0:
                return acc.groupBy("id").agg(
                    F.sum("val").cast("long").alias("n_paths")
                )
            acc = acc.unionByName(y)
        raise RuntimeError(
            f"path_count: frontier not drained within max_iter={max_iter} "
            "supersteps — the longest root-path exceeds the budget, or "
            "the input graph has a cycle (path counts are infinite on "
            "cycles); refusing to return truncated counts."
        )
    finally:
        e.unpersist()


def topological_order(
    spark: SparkSession,
    edges: DataFrame,
    max_iter: int = 64,
) -> DataFrame:
    """Deterministic total topological ordering of a DAG.

    Composition: wavefront level via :func:`level_schedule` (MAX_PLUS
    longest-chain fixpoint — its cycle raise makes a cyclic input loud,
    never a bogus order), then a global dense rank over (level, id)
    through the range-partitioned sample sort
    (operators/indexing._global_ranks — no single-task window). Every
    edge goes from a strictly lower rank to a higher one: level
    strictly increases along edges by the fixpoint, and rank respects
    (level, id) lexicographic order. Output (id, level, rank).
    """
    from combblas_spark.operators.indexing import _global_ranks

    lv = level_schedule(spark, edges, max_iter=max_iter)
    return _global_ranks(
        lv, [F.col("level").asc(), F.col("id").asc()]
    ).select("id", "level", F.col("rank").cast("long").alias("rank"))
