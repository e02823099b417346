"""Deterministic random walks — graph sampling for embedding / GNN
training pipelines (DeepWalk-style corpus generation).

The per-step "random" choice is an argmin over an engine-portable hash
priority md5(salt|walk_id|step|candidate), the same seeded-replayable idiom
as BFS parent_select='rand' (algorithms/bfs.py, RandomParentBFS.cpp's
SelectRandSRing analog): uniform over the distinct neighbor set, yet every
engine replays the identical walk — which is what makes the contract query
oracle-checkable in DuckDB.

Scale shape: one join + one hash aggregation per step (the frontier is
|walks| rows, edges are pre-partitioned by src once); lineage truncated per
step. Dead-end vertices terminate their walk (no row emitted at that step)
— the standard DeepWalk behavior for directed graphs.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.core.tuning import BROADCAST_MAX_ROWS
from combblas_spark.plans.superstep import SuperstepRunner


# adaptive-salt sizing: bound any single local-window task's group to about
# this many rows; the salt modulus is derived from the observed max degree.
_TARGET_LOCAL_GROUP = 4096
_MAX_SALT = 4096


def neighbor_sample(
    edges: DataFrame,
    fanout: int,
    salt: str = "nbr",
) -> DataFrame:
    """GraphSAGE-style deterministic neighbor sampling: keep at most
    ``fanout`` out-neighbors per vertex, chosen by the engine-portable hash
    priority md5(salt|src|dst) (ties by dst) — the mini-batch fanout cap
    every GNN training pipeline applies before feature gather. Returns
    (src, dst).

    Scale shape: the same salted two-phase top-k as operators/kselect.py,
    with the salt modulus DERIVED FROM THE DATA — one exact max-degree
    aggregate sizes it to ceil(max_degree / 4096), capped at 4096, so a
    web-hub vertex of degree 10^8 lands ~24k rows per local-window task
    instead of degree/16. A local window keyed by (src, hash-salt) keeps
    top-fanout per bucket, then a global window ranks the at most
    salt*fanout survivors per src. The result is identical to a plain
    per-src window (the global phase picks the true top-fanout; every
    bucket keeps its own top-fanout, a superset of the global winners) and
    deterministic across partitionings (salt is a pure hash of dst, the
    modulus a pure function of the degree distribution).
    """
    from pyspark.sql import Window

    prio = F.md5(
        F.concat_ws(
            "|", F.lit(salt), F.col("src").cast("string"), F.col("dst").cast("string")
        )
    )
    d = edges.select("src", "dst").distinct().withColumn("_p", prio)
    max_deg = (
        d.groupBy("src").agg(F.count(F.lit(1)).alias("c")).agg(F.max("c")).collect()[0][0]
    )
    n_salt = max(1, min(_MAX_SALT, -(-int(max_deg or 0) // _TARGET_LOCAL_GROUP)))
    if n_salt > 1:
        salted = d.withColumn("_salt", F.pmod(F.xxhash64("dst"), F.lit(n_salt)))
        w_local = Window.partitionBy("src", "_salt").orderBy(
            F.col("_p").asc(), F.col("dst").asc()
        )
        d = (
            salted.withColumn("_rn", F.row_number().over(w_local))
            .filter(F.col("_rn") <= fanout)
            .drop("_salt", "_rn")
        )
    w_glob = Window.partitionBy("src").orderBy(F.col("_p").asc(), F.col("dst").asc())
    return (
        d.withColumn("_rn", F.row_number().over(w_glob))
        .filter(F.col("_rn") <= fanout)
        .select("src", "dst")
    )


def random_walks(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    length: int,
    salt: str = "walk",
    walks_per_seed: int = 1,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """(walk_id, step, vertex): ``walks_per_seed`` walks per seed row
    (walk_id = seed_id * walks_per_seed + rep — DeepWalk corpora run many
    walks per vertex), step 0 = the seed itself, up to ``length``
    hash-priority steps; the rep index participates in the hash via
    walk_id, so every replica walks an independent deterministic path.

    ``seeds`` is a (id) DataFrame; ``edges`` (src, dst, ...) is used as the
    directed neighbor relation (pass a symmetrized table for undirected
    walks, the repo's build_graph default).
    """
    runner = runner or SuperstepRunner(spark)
    e = edges.select("src", "dst").repartition(
        spark.sparkContext.defaultParallelism, "src"
    )
    e.persist()
    try:
        cur = seeds.select(
            F.col("id").alias("walk_id"), F.col("id").alias("vertex")
        )
        if walks_per_seed > 1:
            cur = seeds.select(
                F.explode(
                    F.sequence(F.lit(0), F.lit(walks_per_seed - 1))
                ).alias("rep"),
                F.col("id"),
            ).select(
                (F.col("id") * walks_per_seed + F.col("rep")).cast("long").alias(
                    "walk_id"
                ),
                F.col("id").alias("vertex"),
            )
        cur = runner.truncate(cur)
        # truncate() deliberately drops Catalyst stats (see SuperstepRunner),
        # so a bare join would default the frontier to "huge" and sort-merge
        # the full edge table every step. The walk count is fixed for the
        # whole run (walks only terminate, never split), so gate the
        # broadcast ONCE on it — the bfs.py frontier idiom. Past the gate
        # (DeepWalk-scale O(V*replicas) corpora) the frontier shuffles to
        # the edge layout instead and AQE decides locally.
        n_walks = cur.count()
        bcast = n_walks <= BROADCAST_MAX_ROWS
        levels = [cur.select("walk_id", F.lit(0).cast("long").alias("step"), "vertex")]
        for step in range(1, length + 1):
            fr = F.broadcast(cur) if bcast else cur.repartition(
                spark.sparkContext.defaultParallelism, "vertex"
            )
            cand = fr.join(
                e, on=fr["vertex"] == e["src"], how="inner"
            ).select("walk_id", "dst")
            prio = F.md5(
                F.concat_ws(
                    "|",
                    F.lit(salt),
                    F.col("walk_id").cast("string"),
                    F.lit(str(step)),
                    F.col("dst").cast("string"),
                )
            )
            nxt = (
                cand.groupBy("walk_id")
                .agg(
                    F.min(
                        F.struct(prio.alias("k"), F.col("dst").alias("d"))
                    ).alias("m")
                )
                .select("walk_id", F.col("m.d").alias("vertex"))
            )
            # fixed-length walk: lazy lineage cuts chain the steps into the
            # single materializing truncate below (run while e is cached)
            cur = runner.truncate_lazy(nxt)
            levels.append(
                cur.select(
                    "walk_id", F.lit(step).cast("long").alias("step"), "vertex"
                )
            )
        out = levels[0]
        for lv in levels[1:]:
            out = out.unionByName(lv)
        return runner.truncate(out)
    finally:
        e.unpersist()


def walk_cooccurrence(walks: DataFrame, window: int = 2) -> DataFrame:
    """Skip-gram co-occurrence counts over a walk corpus — the step that
    turns random_walks/node2vec_walks output into word2vec-style training
    pairs (DeepWalk §4.2 trains SkipGram on exactly these): for every walk
    and every position pair at distance 1..``window``, count the ordered
    (center, context) pair. Both directions are emitted (SkipGram's
    context window is symmetric), so n(a, b) == n(b, a).

    -> (center, context, n BIGINT), n = number of co-occurrences across
    the whole corpus.

    Scale shape: NO per-walk array collection and NO window function —
    contexts explode to ``window`` probe rows keyed (walk_id, step - d),
    one hash equi-join on the composite (walk_id, step) matches them to
    centers, and the count is a map-side-combinable aggregate keyed by
    the (center, context) vocabulary pair, NOT by walk — skew is bounded
    by vocabulary frequency exactly like a word-count. Dead-end walks
    simply stop contributing probe rows (missing steps never match).
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    w = walks.select("walk_id", "step", "vertex")
    centers = w.select("walk_id", "step", F.col("vertex").alias("center"))
    probes = w.select(
        "walk_id",
        F.explode(F.sequence(F.lit(1), F.lit(window))).alias("_d"),
        F.col("step").alias("_cstep"),
        F.col("vertex").alias("context"),
    ).select(
        "walk_id", (F.col("_cstep") - F.col("_d")).alias("step"), "context"
    )
    fwd = centers.join(probes, on=["walk_id", "step"]).select("center", "context")
    both = fwd.unionByName(
        fwd.select(
            F.col("context").alias("center"), F.col("center").alias("context")
        )
    )
    return both.groupBy("center", "context").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )


def negative_sample(
    spark: SparkSession,
    edges: DataFrame,
    k: int = 3,
    proposals: int = 8,
    seed: int = 42,
    salt: str = "neg",
) -> DataFrame:
    """Deterministic negative-edge sampling — the link-prediction /
    contrastive-GNN training counterpart of neighbor_sample: for every
    vertex u, up to ``k`` vertices v with NO directed edge (u, v), drawn
    uniformly from the vertex set by replayable hashes. Returns
    (src, dst, rank) with rank 1..k per src in hash-priority order.

    Construction (every stage engine-portable, no RNG state):
      1. a seeded md5-60bit random permutation of the vertex set
         (operators/indexing.randperm — parallel sample sort, no global
         window task);
      2. ``proposals`` candidate positions per vertex,
         md5_60(salt|u|j) mod |V|, joined against the permutation on the
         position key (an equi-join, never a cartesian);
      3. reject self-pairs and real edges (one anti-join against the
         distinct edge set);
      4. keep the top-k survivors per src by md5(salt|pick|u|v).

    Vertices whose proposals all collide with real neighbors return fewer
    than k rows (Bernoulli under-fill, ~(deg/|V|)^proposals — negligible
    except for near-total hubs); production pipelines re-run survivors
    with a second salt, the same shape. Scale: the permutation is
    vertex-sized, proposals are |V|*proposals rows hash-joined on rank
    then anti-joined on the edge key — map-side combinable throughout,
    and the per-src window holds at most ``proposals`` rows.
    """
    from pyspark.sql import Window

    from combblas_spark.operators.indexing import randperm

    if k < 1 or proposals < k:
        raise ValueError(
            f"need proposals >= k >= 1, got k={k} proposals={proposals}"
        )
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    verts.persist()
    try:
        n_v = verts.count()
        perm = randperm(verts, seed=seed).select(
            F.col("val").alias("_rk"), F.col("id").alias("dst")
        )
        props = verts.select(
            F.col("id").alias("src"),
            F.explode(F.sequence(F.lit(1), F.lit(proposals))).alias("_j"),
        ).select(
            "src",
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat_ws(
                                "|",
                                F.lit(salt),
                                F.col("src").cast("string"),
                                F.col("_j").cast("string"),
                            )
                        ),
                        1, 15,
                    ),
                    16, 10,
                ).cast("long"),
                F.lit(n_v),
            ).alias("_rk"),
        )
        cand = (
            props.join(perm, on="_rk")
            .filter(F.col("dst") != F.col("src"))
            .select("src", "dst")
            .distinct()
        )
        neg = cand.join(
            edges.select("src", "dst").distinct(), on=["src", "dst"], how="left_anti"
        )
        prio = F.md5(
            F.concat_ws(
                "|", F.lit(salt), F.lit("pick"),
                F.col("src").cast("string"), F.col("dst").cast("string"),
            )
        )
        w = Window.partitionBy("src").orderBy(prio.asc(), F.col("dst").asc())
        return (
            neg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("src", "dst", F.col("rank").cast("long").alias("rank"))
        )
    finally:
        verts.unpersist()


def node2vec_walks(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    length: int,
    p: float = 4.0,
    q: float = 0.25,
    salt: str = "n2v",
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """Second-order biased random walks (node2vec, Grover & Leskovec 2016)
    — (walk_id, step, vertex), step 0 = seed. The step from cur with
    predecessor prev reweights each out-neighbor d by the node2vec alpha:
    1/p if d == prev (return), 1 if (prev, d) is an edge (stay local),
    1/q otherwise (explore). p > 1, q < 1 -> DFS-like community walks;
    the reverse -> BFS-like structural walks.

    The weighted choice is an EXPONENTIAL RACE on replayable hashes:
    u = (md5_60(salt|walk|step|d) + 1) / 2^60 is a deterministic uniform
    in (0, 1], and argmin_d of key = -ln(u_d) * m_d (m = p / 1 / q, the
    inverse alpha) draws d with probability proportional to alpha_d —
    weighted sampling with no RNG state, replayable by a SQL oracle.
    (Cross-engine ln() may differ in the last ulp, but an argmin between
    hash-separated keys never flips on an ulp.)

    Per step: one join of the walk state against the edge table (on cur)
    plus one LEFT join on the (prev, d) key for the distance-1 test, then
    a per-walk min-struct — two equi-joins and an aggregate, lineage
    truncated per step; dead ends terminate the walk (DeepWalk semantics,
    same as random_walks). Step 1 has no predecessor and is the uniform
    hash-argmin choice.
    """
    if p <= 0.0 or q <= 0.0:
        raise ValueError(f"node2vec p and q must be > 0, got p={p} q={q}")
    runner = runner or SuperstepRunner(spark)
    e = edges.select("src", "dst").distinct()
    e = e.repartition(spark.sparkContext.defaultParallelism, "src")
    e.persist()
    try:
        state = seeds.select(
            F.col("id").alias("walk_id"),
            F.col("id").alias("prev"),
            F.col("id").alias("vertex"),
        )
        state = runner.truncate(state)
        n_walks = state.count()
        bcast = n_walks <= BROADCAST_MAX_ROWS
        # the distance-1 probe table: (prev, cand) edge existence
        eflag = e.select(
            F.col("src").alias("prev"), F.col("dst").alias("_d"),
            F.lit(1).alias("_nbr"),
        )
        levels = [state.select("walk_id", F.lit(0).cast("long").alias("step"), "vertex")]
        for step in range(1, length + 1):
            fr = F.broadcast(state) if bcast else state.repartition(
                spark.sparkContext.defaultParallelism, "vertex"
            )
            cand = fr.join(e, on=fr["vertex"] == e["src"], how="inner").select(
                "walk_id", "prev", F.col("vertex").alias("cur"),
                F.col("dst").alias("_d"),
            )
            h = F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "|", F.lit(salt), F.col("walk_id").cast("string"),
                            F.lit(str(step)), F.col("_d").cast("string"),
                        )
                    ),
                    1, 15,
                ),
                16, 10,
            ).cast("long")
            u = (h.cast("double") + F.lit(1.0)) / F.lit(1152921504606846976.0)
            if step == 1:
                key = -F.log(u)  # no predecessor: uniform race
            else:
                m = (
                    F.when(F.col("_d") == F.col("prev"), F.lit(p))
                    .when(F.col("_nbr").isNotNull(), F.lit(1.0))
                    .otherwise(F.lit(q))
                )
                cand = cand.join(eflag, on=["prev", "_d"], how="left")
                key = -F.log(u) * m
            nxt = (
                cand.groupBy("walk_id")
                .agg(
                    F.min(
                        F.struct(
                            key.alias("k"), F.col("_d").alias("d"),
                            F.col("cur").alias("c"),
                        )
                    ).alias("m")
                )
                .select(
                    "walk_id",
                    F.col("m.c").alias("prev"),
                    F.col("m.d").alias("vertex"),
                )
            )
            # fixed-length walk: lazy lineage cuts, one materializing
            # truncate at the end while e is still cached
            state = runner.truncate_lazy(nxt)
            levels.append(
                state.select(
                    "walk_id", F.lit(step).cast("long").alias("step"), "vertex"
                )
            )
        out = levels[0]
        for lv in levels[1:]:
            out = out.unionByName(lv)
        return runner.truncate(out)
    finally:
        e.unpersist()
