"""Breadth-first search — frontier SpMV with direction optimization.

Reference: top-down BFS loop /root/reference/Applications/TopDownBFS.cpp:440-449:
    fringe.setNumToInd()                       -> frontier (id, val=id)
    SpMV<Select2ndMax>(A, fringe)              -> candidate parents per dst
    EWiseMult(fringe, parents, exclude=true)   -> drop already-visited
    parents.Set(fringe)                        -> scatter
Direction-optimized variant /root/reference/Applications/DirOptBFS.cpp:388-439:
when the frontier outgrows the unvisited remainder, flip to a bottom-up
step — each unvisited vertex looks for ANY frontier in-neighbor. In
DataFrame algebra the flip is which side drives the edge probe:

* top-down:  edges ⋈ frontier (frontier broadcast while it is small)
* bottom-up: edges ⋈ unvisited (unvisited is the small side by
  construction past the peak), then the surviving candidate edges —
  at most sum(indeg(unvisited)) rows — join the frontier. BFS invariant:
  every visited in-neighbor of a still-unvisited vertex is at the current
  depth, so candidates ⋈ frontier loses nothing.

The O(V)-row frontier broadcast that a fixed top-down plan forces at the
peak superstep (round-1 scale-killer) never happens: by the time the
frontier is large, unvisited is small and the plan has flipped.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.core.semiring import SELECT2ND_MIN
from combblas_spark.operators.multiply import spmv
from combblas_spark.plans.superstep import SuperstepRunner

# shared gate (core/tuning.py): above this many frontier rows, never force
# a broadcast join — fall back to a shuffle join (AQE may still broadcast
# from runtime stats). Re-exported here for existing importers.
from combblas_spark.core.tuning import (  # noqa: E402
    BROADCAST_MAX_ROWS,
    partition_by_key,
)


def bfs(
    spark: SparkSession,
    edges: DataFrame,
    root: int,
    max_iter: int = 10_000,
    runner: Optional[SuperstepRunner] = None,
    mode: str = "auto",
    bottom_up_cutoff: float = 4.0,
    parent_select: str = "min",
    seed: int = 17,
) -> DataFrame:
    """Returns (id, parent, depth) for every reached vertex.

    ``mode``: 'auto' (direction-optimized, DirOptBFS.cpp:388-439 semantics),
    'topdown' (TopDownBFS.cpp loop), or 'bottomup' (always flipped — test
    hook). 'auto' flips to bottom-up when
    ``n_frontier * bottom_up_cutoff > n_unvisited`` (the Beamer-style
    vertex-count heuristic the reference drives with edge counts).
    Frontier/unvisited broadcasts are size-gated, never forced at O(V).

    ``parent_select``: 'min' (Select2nd-min semiring, the deterministic
    default) or 'rand' — each discovered vertex picks a parent uniformly
    among its frontier in-neighbors via a per-(edge, level) hash priority,
    the SelectRandSRing semantics of
    /root/reference/Applications/RandomParentBFS.cpp:92-115 made
    replayable (same ``seed`` -> same tree). Depth labels are identical
    under either rule; only the tree edges differ.
    """
    if mode not in ("auto", "topdown", "bottomup"):
        raise ValueError(mode)
    if parent_select not in ("min", "rand"):
        raise ValueError(parent_select)
    runner = runner or SuperstepRunner(spark)
    edges = partition_by_key(edges.select("src", "dst", "w"), "dst")
    edges.persist()
    try:
        verts = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )

        visited = spark.createDataFrame(
            [(int(root), int(root), 0)], "id long, parent long, depth int"
        )
        frontier = visited.select("id", F.col("id").alias("val"))
        depth = 0
        resumed = runner.resume() if runner.dir else None
        if resumed is not None:
            depth, states, _ = resumed
            visited, frontier = states["visited"], states["frontier"]
        visited = runner.truncate(visited)
        frontier = runner.truncate(frontier)
        unvisited = runner.truncate(verts.join(visited.select("id"), on="id", how="left_anti"))
        n_frontier = frontier.count()
        n_unvisited = unvisited.count()

        while depth < max_iter:
            bottom_up = mode == "bottomup" or (
                mode == "auto" and n_frontier * bottom_up_cutoff > n_unvisited
            )
            # parent choice among this level's proposing in-neighbors:
            # 'min' = min src id; 'rand' = argmin of a per-(edge, level)
            # hash priority (RandomParentBFS.cpp's GlobalMT.rand() per
            # multiply, made deterministic)
            def _pick(grouped):
                if parent_select == "min":
                    return grouped.agg(F.min("src").alias("val"))
                pri = F.xxhash64(F.col("src"), F.col("dst"), F.lit(depth), F.lit(seed))
                return grouped.agg(F.min_by("src", pri).alias("val"))

            if not bottom_up:
                if parent_select == "min":
                    # top-down: probe edges with the frontier; broadcast
                    # only while the frontier is genuinely small
                    cand = spmv(
                        edges, frontier, SELECT2ND_MIN,
                        broadcast_x=True if n_frontier <= BROADCAST_MAX_ROWS else None,
                    )
                else:
                    fr = frontier.select(F.col("id").alias("src"))
                    if n_frontier <= BROADCAST_MAX_ROWS:
                        fr = F.broadcast(fr)
                    cand = _pick(edges.join(fr, on="src").groupBy(F.col("dst").alias("id")))
                new = cand.join(visited.select("id"), on="id", how="left_anti")
            else:
                # bottom-up: keep only edges INTO unvisited vertices, then
                # require the source to be on the frontier
                unv = unvisited.select(F.col("id").alias("dst"))
                if n_unvisited <= BROADCAST_MAX_ROWS:
                    unv = F.broadcast(unv)
                cand_e = edges.join(unv, on="dst")
                fr = frontier.select(F.col("id").alias("src"))
                new = _pick(cand_e.join(fr, on="src").groupBy(F.col("dst").alias("id")))
            # ONE action per level: the lazy cut of `new` materializes at
            # this count (and pulls the previous level's lazy visited /
            # unvisited chains through with it); the level's other states
            # derive from the already-checkpointed `new` without their own
            # materializing jobs.
            new = runner.truncate_lazy(new)
            n_new = new.count()
            if n_new == 0:
                break
            depth += 1
            visited = runner.truncate_lazy(
                visited.unionByName(
                    new.select("id", F.col("val").alias("parent"), F.lit(depth).alias("depth"))
                )
            )
            frontier = new.select("id", F.col("id").alias("val"))
            unvisited = runner.truncate_lazy(unvisited.join(new.select("id"), on="id", how="left_anti"))
            n_frontier = n_new
            n_unvisited -= n_new
            runner.save(
                depth,
                {"visited": visited, "frontier": frontier},
                {"new": int(n_new), "bottom_up": bool(bottom_up)},
            )
        visited.count()  # materialize while the edge layout is still cached
        return visited
    finally:
        edges.unpersist()


def msbfs(
    spark: SparkSession,
    edges: DataFrame,
    roots: list[int],
    max_iter: int = 10_000,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """Batched multi-source BFS: (s, id, depth) for every (source, reached
    vertex) pair, ALL sources advancing in one frontier join per superstep —
    the reference's batched-fringe pattern
    (/root/reference/Applications/BetwCent.cpp:185: fringe is a
    |V| x n_sources matrix and one PSpGEMM advances every source at once;
    the SpMM shape of operators/multiply.spmm).

    Scale design: the per-superstep work is ONE edges-join keyed on the
    vertex id regardless of how many sources run — k separate bfs() calls
    would pay k full edge-table probes per level. The frontier carries the
    source tag s, so the groupBy key is (s, dst) and per-source visited
    sets stay independent through one anti-join on (s, id). Frontier
    broadcast is size-gated on TOTAL rows across sources (the k-times-
    bigger frontier crosses the gate k times sooner — by design). No
    bottom-up flip: the unvisited remainder differs per source, so the
    flip has no single pivot; batched BFS is the many-small-traversals
    tool (centrality sampling), not the one-giant-traversal tool.
    """
    runner = runner or SuperstepRunner(spark)
    edges = partition_by_key(edges.select("src", "dst"), "dst")
    edges.persist()
    try:
        visited = spark.createDataFrame(
            [(int(r), int(r), 0) for r in roots], "s long, id long, depth int"
        )
        frontier = visited.select("s", "id")
        depth = 0
        visited = runner.truncate(visited)
        frontier = runner.truncate(frontier)
        n_frontier = frontier.count()
        while depth < max_iter and n_frontier > 0:
            fr = frontier.select("s", F.col("id").alias("src"))
            if n_frontier <= BROADCAST_MAX_ROWS:
                fr = F.broadcast(fr)
            cand = (
                edges.join(fr, on="src")
                .select("s", F.col("dst").alias("id"))
                .distinct()
            )
            # ONE action per level (same shape as bfs): lazy cut + count
            new = runner.truncate_lazy(
                cand.join(visited.select("s", "id"), on=["s", "id"], how="left_anti")
            )
            n_frontier = new.count()
            if n_frontier == 0:
                break
            depth += 1
            visited = runner.truncate_lazy(
                visited.unionByName(new.select("s", "id", F.lit(depth).alias("depth")))
            )
            frontier = new
        visited.count()  # materialize while the edge layout is still cached
        return visited
    finally:
        edges.unpersist()


def single_child_frontier(new: DataFrame, seed: int = 17) -> DataFrame:
    """One (id, val=parent) row per distinct parent, chosen by hash
    priority — the ``fringe.Uniq(RandReduce)`` projection of
    /root/reference/Applications/SingleChildBFS.cpp:282 (SpVec Uniq with a
    random selector over entries sharing a VALUE), deterministic here so a
    replay reproduces the same child set."""
    pri = F.xxhash64(F.col("id"), F.lit(seed))
    return (
        new.groupBy(F.col("val"))
        .agg(F.min_by("id", pri).alias("id"))
        .select("id", "val")
    )


def bfs_validate(edges, tree):
    """Graph500 result-validation kernel
    (/root/reference/Applications/TopDownBFS.cpp's Graph500-spec checks,
    distributed): given the SYMMETRIC edge table and a BFS ``tree``
    (id, parent, depth), verify

      1. the root is its own parent at depth 0, and exactly one root exists;
      2. every non-root (parent, id) tree link is a graph edge;
      3. every tree link spans exactly one level (depth[id] ==
         depth[parent] + 1);
      4. no graph edge connects a visited and an unvisited vertex (the
         visited set is edge-closed = a whole component was traversed);
      5. no graph edge spans more than one BFS level.

    Returns a 1-row DataFrame of violation counts (all-zero = valid) —
    an aggregate, so the validation itself runs as three hash joins +
    map-side counts, never a collect of the tree.
    """
    import pyspark.sql.functions as F

    t = tree.select("id", "parent", F.col("depth").cast("long").alias("depth"))
    e = edges.select("src", "dst")

    roots = t.filter(F.col("id") == F.col("parent"))
    n_bad_root = roots.filter(F.col("depth") != 0).count() + abs(
        roots.count() - 1
    )

    nonroot = t.filter(F.col("id") != F.col("parent"))
    links = nonroot.select(
        F.col("parent").alias("src"), F.col("id").alias("dst"), "depth"
    )
    n_phantom = links.join(e, on=["src", "dst"], how="left_anti").count()

    pd = t.select(F.col("id").alias("parent"), F.col("depth").alias("pdepth"))
    n_bad_level = (
        nonroot.join(pd, on="parent", how="left")
        .filter(
            F.col("pdepth").isNull() | (F.col("depth") != F.col("pdepth") + 1)
        )
        .count()
    )

    ds = t.select(F.col("id").alias("src"), F.col("depth").alias("d_src"))
    dd = t.select(F.col("id").alias("dst"), F.col("depth").alias("d_dst"))
    ej = e.join(ds, on="src", how="left").join(dd, on="dst", how="left")
    n_cross = ej.filter(F.col("d_src").isNull() != F.col("d_dst").isNull()).count()
    n_skip = ej.filter(
        F.col("d_src").isNotNull()
        & F.col("d_dst").isNotNull()
        & (F.abs(F.col("d_src") - F.col("d_dst")) > 1)
    ).count()

    spark = tree.sparkSession
    return spark.createDataFrame(
        [(n_bad_root, n_phantom, n_bad_level, n_cross, n_skip)],
        "n_bad_root long, n_phantom_link long, n_bad_level long, "
        "n_cross_edge long, n_skip_edge long",
    )


def top_degree_landmarks(edges: DataFrame, k: int) -> list[int]:
    """Deterministic landmark pick: the k highest-degree vertices
    (ties broken by id) — the standard landmark-selection heuristic
    (Potamias et al., CIKM'09: high-degree landmarks cover the most
    shortest paths). One count-aggregate + a k-row driver collect."""
    return [
        r["id"]
        for r in edges.groupBy(F.col("src").alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.desc("deg"), "id")
        .limit(k)
        .collect()
    ]


def landmark_estimates(
    spark: SparkSession,
    edges: DataFrame,
    landmarks: list[int],
    pairs: DataFrame,
    max_iter: int = 10_000,
) -> DataFrame:
    """Landmark (2-hop sketch) distance estimation: est(a,b) =
    min over landmarks l of d(a,l) + d(l,b) — the triangle-inequality
    upper bound every web-scale distance service actually serves,
    because exact pairwise BFS over 10^10 vertices is not a query-time
    operation. One batched msbfs from the landmark set (k sources, ONE
    edge probe per level — the BetwCent batched-fringe shape), then the
    query pairs join the O(k*V) landmark-distance table twice and take a
    MIN: no BFS at query time at all.

    ``pairs``: (a, b). Returns (a, b, est); pairs with no landmark in a
    common component are dropped (no estimate exists).
    """
    ld = msbfs(spark, edges, roots=landmarks, max_iter=max_iter)
    da = ld.select(
        F.col("s").alias("l"), F.col("id").alias("a"),
        F.col("depth").alias("d_a"),
    )
    db = ld.select(
        F.col("s").alias("l"), F.col("id").alias("b"),
        F.col("depth").alias("d_b"),
    )
    return (
        pairs.join(da, "a")
        .join(db, ["l", "b"])
        .groupBy("a", "b")
        .agg(F.min(F.col("d_a") + F.col("d_b")).cast("long").alias("est"))
    )
