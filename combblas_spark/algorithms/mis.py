"""Maximal independent set — Luby's algorithm with deterministic priorities.

Reference: /root/reference/Applications/FilteredMIS.cpp:157-233 — per round,
every candidate vertex draws a random value (GenRandomVec), a vertex joins
the MIS when its value beats every candidate neighbor's
(SpMV<Select2ndMin> over the candidate-induced subgraph + EWiseApply
is_smaller), then winners and their neighbors leave the candidate set.

Determinism: the reference draws MPI-rank-dependent randoms; here the
priority is md5-derived from (seed, round, vertex id) — partition-
independent AND replayable byte-for-byte by a SQL oracle (same trick as the
minhash universe). Ties are impossible in practice (60-bit hash) and break
toward the smaller id, so the result is a pure function of the edge set.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.plans.superstep import SuperstepRunner


def _priority(id_col: F.Column, rnd: int, seed: int) -> F.Column:
    """60-bit md5 priority, portable across engines (see dedup.md5_60bit)."""
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(seed), F.lit(rnd), id_col.cast("string"))),
            1, 15,
        ),
        16, 10,
    ).cast("long")


def mis_luby(
    spark: SparkSession,
    edges: DataFrame,
    seed: int = 42,
    max_rounds: int = 64,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """Returns (id, in_mis: boolean) over all vertices of the symmetric
    ``edges``. Independent (no two MIS vertices adjacent) and maximal
    (every non-member has a MIS neighbor) — both pytest invariants.
    """
    runner = runner or SuperstepRunner(spark)
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    e = e.repartition(spark.sparkContext.defaultParallelism, "dst").persist()
    try:
        verts = (
            e.select(F.col("src").alias("id"))
            .unionByName(e.select(F.col("dst").alias("id")))
            .distinct()
        )
        # one action per round: the candidate set's truncate_agg folds the
        # remaining-candidate count into the materializing job, so the next
        # round's emptiness check costs no extra job (superstep.py idiom)
        cand, row = runner.truncate_agg(verts, F.count(F.lit(1)).alias("n"))
        n_cand = int(row["n"] or 0)
        mis = None
        for rnd in range(max_rounds):
            if n_cand == 0:
                break
            p = cand.select("id", _priority(F.col("id"), rnd, seed).alias("p"))
            # min (priority, id) among CANDIDATE neighbors — the
            # SpMV<Select2ndMin> over the candidate-induced subgraph
            ps = p.select(F.col("id").alias("src"), F.col("p").alias("p_src"),
                          F.col("id").alias("sid"))
            nbr_min = (
                e.join(ps, on="src")
                .join(p.select(F.col("id").alias("dst")), on="dst")  # dst candidate too
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min(F.struct(F.col("p_src"), F.col("sid"))).alias("m"))
                .select("id", F.col("m.p_src").alias("nbr_p"), F.col("m.sid").alias("nbr_id"))
            )
            winners = (
                p.join(nbr_min, on="id", how="left")
                .filter(
                    F.col("nbr_p").isNull()
                    | (F.col("p") < F.col("nbr_p"))
                    | ((F.col("p") == F.col("nbr_p")) & (F.col("id") < F.col("nbr_id")))
                )
                .select("id")
            )
            # lazy cut: the winners checkpoint materializes (and caches) as
            # part of the candidate set's truncate_agg action below — both
            # its consumers (the MIS union, the wn anti-join) then read the
            # cached partitions, so each round is ONE Spark job
            winners = runner.truncate_lazy(winners)
            # the running MIS union is only needed for resume snapshots and
            # the final answer — build it lazily (each term is checkpointed,
            # so the union's lineage stays flat; no per-round re-checkpoint job)
            mis = winners if mis is None else mis.unionByName(winners)
            # remove winners and their neighbors from the candidate set
            # no distinct: left_anti ignores duplicate keys on the right
            wn = (
                e.join(winners.select(F.col("id").alias("src")), on="src")
                .select(F.col("dst").alias("id"))
                .unionByName(winners)
            )
            cand, row = runner.truncate_agg(
                cand.join(wn, on="id", how="left_anti"),
                F.count(F.lit(1)).alias("n"),
            )
            n_cand = int(row["n"] or 0)
            runner.save(rnd + 1, {"cand": cand, "mis": mis}, {})
        mis = mis if mis is not None else verts.filter(F.lit(False))
        return verts.join(
            mis.select("id", F.lit(True).alias("in_mis")), on="id", how="left"
        ).select("id", F.coalesce(F.col("in_mis"), F.lit(False)).alias("in_mis"))
    finally:
        e.unpersist()
