"""SimRank — "two objects are similar if referenced by similar objects".

Jeh & Widom 2002: S(a,a) = 1, and for a != b
    S(a,b) = C / (|I(a)||I(b)|) * sum_{u in I(a), v in I(b)} S(u,v)
with I(.) the in-neighbor set; pairs where either side has no in-neighbors
score 0. Iterated from S_0 = I, each superstep is structurally an SpGEMM
SANDWICH — S' = C * D A^T S A D (D the inverse-in-degree diagonal) — i.e.
two multiply stages per iteration, expressed here as two hash joins of the
sparse pair table against the (deduplicated, unweighted) edge list plus one
aggregate, the same plan family as operators/multiply.spgemm.

Scale shape: the pair table is SPARSE (absent = 0) and every stage is an
equi-join + partial/final aggregate; lineage is cut per superstep
(SuperstepRunner). The pair space is inherently quadratic in the number of
in-linked vertices — production use caps it by running over a quotient
graph (operators/transform.quotient) or a seed-restricted vertex subset,
the standard SimRank deployment; this is documented, not hidden
(cf. the cosine_topk crossJoin flag in tests/test_plans.py).

Determinism discipline: scores are carried as 1e9-SCALED INTEGERS with a
FLOOR after each iteration's rescale. A double-valued SimRank sums
engine-order-dependently (one value landed exactly on a ROUND(.,6)
boundary in testing); with integer fixed-point every SUM is exact, every
derived double starts from exact integers, so both engines compute
bit-identical values — the same trick as the repo's value_milli totals.
The per-iteration quantization error is 1e-9, far below any use of a
similarity score. Sums stay < 2^53 for in-degrees up to ~3000² pairs per
bucket; beyond that, drop SCALE a decade.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.plans.superstep import SuperstepRunner


SIMRANK_SCALE = 1_000_000_000  # fixed-point denominator (see module doc)


def simrank(
    spark: SparkSession,
    edges: DataFrame,
    c: float = 0.8,
    num_iters: int = 2,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """Sparse SimRank pair table (a, b, val_e9 BIGINT) of the DIRECTED
    graph ``edges`` after exactly ``num_iters`` iterations — scores are
    similarity * 1e9 fixed-point integers (diagonal rows at SIMRANK_SCALE,
    absent pairs exact zeros). Edge multiplicity is ignored (classic
    unweighted SimRank: edges are deduplicated).
    """
    if num_iters < 1:
        raise ValueError(f"num_iters must be >= 1, got {num_iters}")
    if not 0.0 < c < 1.0:
        raise ValueError(f"c must be in (0, 1), got {c}")
    runner = runner or SuperstepRunner(spark)
    de = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    de.persist()
    try:
        verts = (
            de.select(F.col("src").alias("id"))
            .union(de.select(F.col("dst").alias("id")))
            .distinct()
        )
        verts.persist()
        ind = de.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).cast("double").alias("ind")
        )
        ind.persist()

        diag = verts.select(
            F.col("id").alias("a"), F.col("id").alias("b"),
            F.lit(SIMRANK_SCALE).cast("long").alias("val_e9"),
        )
        s = runner.truncate(diag)
        e1 = de.select(F.col("src").alias("a"), F.col("dst").alias("na"))
        e2 = de.select(F.col("src").alias("b"), F.col("dst").alias("nb"))
        ia = ind.select(F.col("id").alias("na"), F.col("ind").alias("ind_a"))
        ib = ind.select(F.col("id").alias("nb"), F.col("ind").alias("ind_b"))
        for it in range(num_iters):
            raw = (
                s.join(e1, on="a")
                .join(e2, on="b")
                .filter(F.col("na") != F.col("nb"))
                .groupBy("na", "nb")
                .agg(F.sum("val_e9").cast("long").alias("sv"))
            )
            off = (
                raw.join(ia, on="na")
                .join(ib, on="nb")
                .select(
                    F.col("na").alias("a"),
                    F.col("nb").alias("b"),
                    F.floor(
                        F.lit(c) * F.col("sv")
                        / (F.col("ind_a") * F.col("ind_b"))
                    ).cast("long").alias("val_e9"),
                )
            )
            # fixed-iteration chain: lazy cuts, final iteration eager so
            # the chain evaluates while de/ind are still cached
            nxt = diag.unionByName(off)
            s = (
                runner.truncate(nxt)
                if it == num_iters - 1
                else runner.truncate_lazy(nxt)
            )
        return s
    finally:
        de.unpersist()
