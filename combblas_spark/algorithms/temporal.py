"""Time-respecting reachability — earliest-arrival over a temporal graph.

A temporal edge (src, dst, ts_us) is traversable only at its own timestamp,
and a time-respecting path must use non-decreasing timestamps: you can leave
``src`` along the edge only if you had already arrived at ``src`` by
``ts_us``. The fixpoint arr[v] = min over edges (u,v) with ts >= arr[u] of
ts (seeds start at arrival 0) is the earliest-arrival vector — the temporal
analog of BFS depth.

This is iterated SpMV on a time-gated min semiring: the same superstep shape
as SSSP's Bellman-Ford relaxation (algorithms/sssp.py, reference tropical
semiring /root/reference/include/CombBLAS/Semirings.h:236-255) with the
multiply replaced by "select ts where ts >= arr[src]" — monotone, so the
relaxation converges like min-plus does. The relax condition is a join-side
filter, not a new operator: Catalyst pushes ``ts_us >= val`` into the join.

Scale shape: the temporal edge table is cached hash-partitioned by dst (the
aggregation key) once; the arrival vector is O(V) and broadcast-gated per
superstep; lineage cut per superstep via SuperstepRunner.truncate. All
values are exact integers (epoch microseconds), so oracle hashes match
bit-for-bit with no rounding discipline.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.core.tuning import BROADCAST_MAX_ROWS
from combblas_spark.plans.superstep import SuperstepRunner


def temporal_reach(
    spark: SparkSession,
    edges: DataFrame,
    source: int,
    num_iters: Optional[int] = None,
    max_iter: int = 10_000,
    runner: Optional[SuperstepRunner] = None,
    broadcast_vectors: bool = True,
) -> DataFrame:
    """(id, arrival_us) earliest time-respecting arrival from ``source``.

    ``edges`` is (src, dst, ts_us BIGINT); duplicate (src, dst) rows at
    different timestamps are distinct temporal edges (do NOT dedup them).
    The arrival vector is SPARSE — temporally unreachable vertices are
    absent. ``num_iters`` fixes the superstep count (oracle-parity mode);
    otherwise run to fixpoint.
    """
    runner = runner or SuperstepRunner(spark)
    e = edges.select("src", "dst", F.col("ts_us").cast("long")).repartition(
        spark.sparkContext.defaultParallelism, "dst"
    )
    e.persist()
    try:
        arr = spark.createDataFrame(
            [(int(source), 0)], "id long, arrival_us long"
        )
        arr = runner.truncate(arr)
        n_arr = 1

        iters = num_iters if num_iters is not None else max_iter
        for it in range(iters):
            gated = broadcast_vectors and n_arr <= BROADCAST_MAX_ROWS
            x = arr.select(F.col("id").alias("src"), "arrival_us")
            if gated:
                x = F.broadcast(x)
            relax = (
                e.join(x, on="src")
                .filter(F.col("ts_us") >= F.col("arrival_us"))
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("ts_us").alias("mn"))
            )
            # moved flag inline (arrived-for-the-first-time or improved);
            # truncate_agg folds size + convergence into the materializing
            # job — ONE action per superstep, no old-vs-new re-join
            merged = (
                arr.join(relax, on="id", how="full")
                .select(
                    "id",
                    F.least(
                        F.coalesce(F.col("arrival_us"), F.col("mn")),
                        F.coalesce(F.col("mn"), F.col("arrival_us")),
                    ).alias("arrival_us"),
                    (
                        F.col("arrival_us").isNull()
                        | (F.col("mn") < F.col("arrival_us"))
                    )
                    .cast("long")
                    .alias("_moved"),
                )
            )
            stepped, row = runner.truncate_agg(
                merged,
                F.count(F.lit(1)).alias("n"),
                F.sum("_moved").alias("m"),
            )
            arr = stepped.select("id", "arrival_us")
            n_arr = int(row["n"] or 0)
            if num_iters is None:
                changed = int(row["m"] or 0)
                runner.save(it + 1, {"arr": arr}, {"changed": changed})
                if changed == 0:
                    break
            else:
                runner.save(it + 1, {"arr": arr}, {})
        return arr
    finally:
        e.unpersist()


def temporal_wedges(
    edges: DataFrame, delta_us: int, bucket_us: Optional[int] = None
) -> DataFrame:
    """Time-respecting wedge census — per middle vertex v, the number of
    ordered temporal-edge pairs (u->v @ t1, v->w @ t2) with
    t1 <= t2 <= t1 + delta_us: the 2-edge building block of temporal motif
    counting (Paranjape et al. 2017) and the temporal analog of the wedge
    stage in the triangle kernels.

    This is an INTERVAL JOIN, and the scale shape is the standard bucketed
    range join: in-edges land in time bucket floor(t1/b); each out-edge
    probes its own bucket and the previous one (valid whenever
    delta_us <= b, asserted), so the join is a pure equi-join on
    (v, bucket) — never a per-vertex cross product over the whole history —
    followed by the exact range filter. Each out-edge probe carries a
    DIFFERENT bucket value, so no pair can match twice. Per-(v, bucket)
    work is bounded by the busiest vertex-day, not the busiest vertex.

    -> (id, n_wedges BIGINT), vertices with no wedge absent (sparse).
    """
    b = int(bucket_us or delta_us)
    if delta_us > b:
        raise ValueError(f"bucket_us ({b}) must be >= delta_us ({delta_us})")
    ine = edges.select(
        F.col("dst").alias("v"),
        F.col("ts_us").alias("t1"),
        F.floor(F.col("ts_us") / b).alias("bk"),
    )
    t2bk = F.floor(F.col("t2") / b)
    oute = (
        edges.select(F.col("src").alias("v"), F.col("ts_us").alias("t2"))
        .withColumn("bk", F.explode(F.array(t2bk - 1, t2bk)))
    )
    j = ine.join(oute, on=["v", "bk"]).filter(
        (F.col("t2") >= F.col("t1"))
        & (F.col("t2") <= F.col("t1") + F.lit(int(delta_us)))
    )
    return j.groupBy(F.col("v").alias("id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_wedges")
    )
