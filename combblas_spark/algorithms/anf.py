"""ANF — approximate neighborhood function via KMV sketch supersteps.

Palmer/Gibbons/Faloutsos ANF (KDD 2002) / Boldi-Vigna HyperBall lineage:
per vertex and hop h, estimate |ball(v, h)| (vertices within distance h)
by iterating mergeable distinct-count sketches along edges — THE
linear-cost way to get distance distributions and centrality screens on
a web-scale graph (k·V state per hop instead of the V² distance matrix).

This implementation uses the repo's engine-portable KMV sketch
(functions/sketch.py rationale: md5-60bit + k-minimum-values is exactly
replayable in the DuckDB oracle, unlike HLL registers) and leans on the
KMV EXACTNESS-UNDER-MERGE property: the k smallest hashes of a union are
contained in the union of each input's k smallest, so the hop-h sketch
equals the k smallest hashes of the TRUE ball — the oracle can therefore
compute balls by plain unrolled reachability and take k-minima, no
sketch replay needed.

Superstep = one SpMV-shaped gather: neighbor sketches explode to
(id, hash) rows, distinct, then the two-phase salted k-min
(operators/kselect.py pattern) — a hub's merge window is bounded by
salt, never by degree. Reference anchor: the per-hop frontier expansion
of /root/reference/Applications/TopDownBFS.cpp:442-449 with a sketch
union replacing the parent select.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
import pyspark.sql.functions as F

from combblas_spark.functions.dedup import md5_60bit
from combblas_spark.plans.superstep import SuperstepRunner

_SALT = 16
_TWO_POW_60 = float(1 << 60)


def _estimates(sk: DataFrame, h: int, k: int) -> DataFrame:
    """(id, h, est) from a sketch table: exact below k (the sketch IS the
    ball's distinct-hash set), else the KMV estimator on the k-th value."""
    return sk.select(
        "id",
        F.lit(h).cast("long").alias("h"),
        F.round(
            F.when(
                F.size("sketch") >= k,
                (k - 1) * _TWO_POW_60 / F.element_at("sketch", k),
            ).otherwise(F.size("sketch").cast("double")),
            6,
        ).alias("est"),
    )


def anf(
    spark: SparkSession,
    edges: DataFrame,
    hops: int = 3,
    k: int = 16,
    salt: str = "anf",
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """(id, h, est) for h = 0..hops: estimated |ball(id, h)| over the
    graph ``edges`` (pass a symmetrized table for undirected balls;
    a directed table gives out-reachability counts).

    est is EXACT (the true distinct-hash count, double-cast) while the
    ball holds < k distinct md5-60bit hashes, else the KMV estimate
    (k-1)*2^60 / h_(k) rounded to 6 — identical arithmetic to
    functions/sketch.kmv_distinct, replayed verbatim by the oracle.
    """
    if hops < 0:
        raise ValueError(f"hops must be >= 0, got {hops}")
    runner = runner or SuperstepRunner(spark)
    e = edges.select("src", "dst").distinct().repartition(
        spark.sparkContext.defaultParallelism, "dst"
    )
    e.persist()
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    sk = runner.truncate(
        verts.select(
            "id",
            F.array(
                md5_60bit(F.concat(F.lit(salt + "|"), F.col("id").cast("string")))
            ).alias("sketch"),
        )
    )
    out = _estimates(sk, 0, k)
    try:
        for h in range(1, hops + 1):
            # gather neighbor sketches + own, explode to hash rows
            nbr = e.join(
                sk.select(F.col("id").alias("src"), "sketch"), on="src"
            ).select(F.col("dst").alias("id"), "sketch")
            pairs = (
                nbr.unionByName(sk)
                .select("id", F.explode("sketch").alias("hv"))
                .distinct()
            )
            # one rank pass per hop: row_number <= k plans as a two-phase
            # WindowGroupLimit (per-map-task group top-k before the
            # exchange, final top-k after), so a hub's merge window is
            # bounded map-side without the extra salted pre-window — the
            # dedup exchange on (id, hv) plus ONE exchange on id per hop
            glob_w = Window.partitionBy("id").orderBy(F.col("hv").asc())
            kmin = (
                pairs.withColumn("_rn", F.row_number().over(glob_w))
                .filter(F.col("_rn") <= k)
            )
            # groupBy(id) reuses the window's hash partitioning: no exchange
            sk = runner.truncate_lazy(
                kmin.groupBy("id").agg(
                    F.sort_array(F.collect_list("hv")).alias("sketch")
                )
            )
            out = out.unionByName(_estimates(sk, h, k))
        # fixed-hop kernel: the lazy superstep chain evaluates in one job at
        # the caller's action; materialize while e is still cached
        out = runner.truncate(out)
        return out
    finally:
        e.unpersist()
