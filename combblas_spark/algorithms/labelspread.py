"""Semi-supervised label spreading — seeded multi-class propagation
with clamped seeds (Zhu & Ghahramani 2002 harmonic label propagation),
ALL-INTEGER so every superstep is bit-exact across engines.

Class masses are int64 micro-units (scale = 1e6). A superstep is:

1. gather:    raw[v, c]  = sum over in-edges (u, v) of mass[u, c]
2. normalize: mass[v, c] = (raw[v, c] * scale) DIV (sum_c raw[v, c])
   — INTEGER division over INTEGER sums, so there is no
   floating-point addition-order hazard anywhere (the reason this
   kernel avoids the textbook double-valued formulation)
3. clamp:     seed vertices are reset to their label at full scale

After ``num_iters`` supersteps the argmax class per vertex (mass
descending, label ascending — a total order over exact integers) is
the prediction. Unreached vertices are absent from the output.

Scale shape: the same SpMV-superstep layout as pagerank/katz — edges
cached and hash-partitioned by dst (the aggregation key) once, each
superstep one join + partial agg over the O(V * classes) sparse mass
table, lineage truncated per superstep. The unlabeled mass table
never densifies: only (vertex, class) slots with positive mass exist.

Distinct from algorithms/labelprop.py (unsupervised mode-label
community detection): here labels are GIVEN on a seed set and the
question is how they extend — node classification, not clustering.
Semantic anchor: the reference's SpMV-with-semiring surface
(/root/reference/include/CombBLAS/ParFriends.h SpMV); the clamp step
is an EWiseApply-with-mask analog.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.plans.superstep import SuperstepRunner

__all__ = ["label_spread"]

LS_SCALE = 1_000_000


def label_spread(
    spark: SparkSession,
    edges: DataFrame,
    seeds: DataFrame,
    num_iters: int = 4,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """(id, label, mass) — predicted class per reached vertex after
    ``num_iters`` integer-mass spreading supersteps.

    ``edges``: (src, dst[, w]) — treated as UNWEIGHTED directed edges
    (pass a symmetric table for undirected semantics). ``seeds``:
    (id, label) with one label per seed id (duplicate seed ids raise).
    ``mass`` is the winning class's micro-unit mass — seeds always
    read (seed, its label, 1e6).
    """
    if num_iters < 1:
        raise ValueError(f"num_iters must be >= 1, got {num_iters}")
    runner = runner or SuperstepRunner(spark)
    # checkpoint the seed table once: it is re-read every superstep (the
    # clamp union and the seed anti-join) and is often derived from the
    # full graph build — without the cut each reference re-runs that scan
    sd = runner.truncate(
        seeds.select(F.col("id"), F.col("label").cast("long").alias("c"))
    )
    dup = sd.groupBy("id").count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError("label_spread: duplicate seed ids")
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(spark.sparkContext.defaultParallelism, "dst")
    )
    e.persist()
    clamped = sd.select(
        "id", "c", F.lit(LS_SCALE).cast("long").alias("mass")
    )
    try:
        state = runner.truncate(clamped)
        for it in range(num_iters):
            gathered = (
                e.join(state, on=e.src == state.id)
                .groupBy(F.col("dst").alias("vid"), "c")
                .agg(F.sum("mass").alias("raw"))
            )
            tot = gathered.groupBy("vid").agg(F.sum("raw").alias("t"))
            normed = (
                gathered.join(tot, on="vid")
                .select(
                    F.col("vid").alias("id"),
                    "c",
                    F.expr(f"(raw * {LS_SCALE}) DIV t").alias("mass"),
                )
                .filter(F.col("mass") > 0)
            )
            # fixed-iteration kernel: lazy lineage cuts chain the
            # supersteps into one job; the LAST superstep materializes
            # eagerly while e is still cached (superstep.py contract)
            nxt = normed.join(
                sd.select("id"), on="id", how="left_anti"
            ).unionByName(clamped)
            state = (
                runner.truncate(nxt)
                if it == num_iters - 1
                else runner.truncate_lazy(nxt)
            )
        from pyspark.sql import Window

        w = Window.partitionBy("id").orderBy(
            F.col("mass").desc(), F.col("c").asc()
        )
        return (
            state.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select("id", F.col("c").alias("label"), "mass")
        )
    finally:
        e.unpersist()
