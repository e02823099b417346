"""K-tips detection — dead-end path removal in assembly-style graphs.

Reference: /root/reference/ReleaseTests/KTipsTest.cpp:76-141. A "tip" is a
path hanging off the graph that starts at a degree-1 vertex and reaches a
branching vertex (frontier fans out to >= 2) within ``l`` steps. The
reference drives one boolean-semiring SpGEMM per step over a frontier
matrix with ONE COLUMN PER TIP CANDIDATE:

    D  = A.Reduce(Column, +)            # degrees
    R  = D.Find(== 1)                   # tip candidates
    F0 = FrontierMat(A, R)              # n x k selection matrix
    F1 = PSpGEMM<KTipsSR>(A, F0)        # bool or.and
    loop k = 1..l:
      F2 = PSpGEMM<KTipsSR>(A, F1); F2.SetDifference(V); V += F2
      Ns = F2.Reduce(Column, +)         # frontier size per candidate
      Tc = Ns.Find(>= 2)                # branch reached -> tip confirmed
      source = LastNzRowIdxPerCol(F0), dest = LastNzRowIdxPerCol(F1)
      Td = Ns.Find(!= 1); F1.PruneColumnByIndex(Td); F2.PruneColumnByIndex(Td)
      F0 = F1; F1 = F2

Here the frontier matrix is an edge table (src=row, dst=candidate column)
and every step is the same boolean SpGEMM (add=max, mult=least over 1.0
weights), set_difference, per-column count, and column pruning — all §2
operators. "Last nonzero row index" per column is MAX(src) per dst, exactly
the reference helper's semantics on a column-major scan.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.core.semiring import Semiring
from combblas_spark.operators.multiply import spgemm
from combblas_spark.operators.ewise import set_difference
from combblas_spark.plans.superstep import SuperstepRunner

#: or.and over {0.0, 1.0} DOUBLE weights (KTipsSR, KTipsTest.cpp:12-21).
#: Deliberately NOT core.semiring.BOOL_OR_AND: that one casts w to boolean,
#: which would break this module's unionByName with the double-typed
#: frontier matrices — keep the weight domain numeric here.
KTIPS_SR = Semiring("ktips_or_and", F.least, F.max)


def k_tips(
    spark: SparkSession,
    edges: DataFrame,
    l: int = 3,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """Returns (tip, source, dest): for every degree-1 vertex ``tip`` whose
    hanging path reaches a branching vertex within ``l`` steps, the last
    path vertex before the branch step on the previous two frontiers —
    (LastNzRowIdxPerCol(F0), LastNzRowIdxPerCol(F1)), i.e. MAX row per
    column. Expects a SYMMETRIC edge table.
    """
    runner = runner or SuperstepRunner(spark)
    a = edges.select("src", "dst", F.lit(1.0).alias("w"))
    a = a.repartition(spark.sparkContext.defaultParallelism, "dst")
    a.persist()
    try:
        deg = a.groupBy("dst").agg(F.count(F.lit(1)).alias("n"))
        tips = deg.filter(F.col("n") == 1).select(F.col("dst").alias("id"))
        # n x k frontier: column c holds candidate c's current frontier rows
        f0 = runner.truncate(
            tips.select(
                F.col("id").alias("src"), F.col("id").alias("dst"),
                F.lit(1.0).alias("w"),
            )
        )
        f1 = runner.truncate(spgemm(a, f0, KTIPS_SR))
        # V = F0; V += F1 (KTipsTest.cpp:107-108) — per-column visited sets
        v = runner.truncate(
            f0.unionByName(f1).groupBy("src", "dst").agg(F.max("w").alias("w"))
        )
        results = None
        for _ in range(1, l + 1):
            f2 = runner.truncate(set_difference(spgemm(a, f1, KTIPS_SR), v))
            v = runner.truncate(
                v.unionByName(f2).groupBy("src", "dst").agg(F.max("w").alias("w"))
            )
            ns = f2.groupBy("dst").agg(F.count(F.lit(1)).alias("n"))
            tc = ns.filter(F.col("n") >= 2).select("dst")
            found = (
                tc.join(
                    f0.groupBy("dst").agg(F.max("src").alias("source")), on="dst"
                )
                .join(f1.groupBy("dst").agg(F.max("src").alias("dest")), on="dst")
                .select(F.col("dst").alias("tip"), "source", "dest")
            )
            results = (
                runner.truncate(found)
                if results is None
                else runner.truncate(results.unionByName(found))
            )
            # prune finished columns: confirmed tips (>= 2) and dead ends
            # (a column of F1 absent from Ns has frontier size 0)
            keep = ns.filter(F.col("n") == 1).select("dst")
            f0 = f1.join(keep, on="dst", how="inner")
            f1 = runner.truncate(f2.join(keep, on="dst", how="inner"))
        return results if results is not None else (
            f0.select(
                F.col("dst").alias("tip"),
                F.col("src").alias("source"),
                F.col("src").alias("dest"),
            ).filter(F.lit(False))
        )
    finally:
        a.unpersist()
