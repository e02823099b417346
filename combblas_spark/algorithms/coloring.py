"""Distance-1 graph coloring — Luby/Jones-Plassmann independent-set rounds.

Reference semantics: the reference's MIS machinery
(/root/reference/Applications/FilteredMIS.cpp:160-220 — random-priority
local-maxima selection over the remaining graph) iterated to a coloring:
round c removes one independent set (everything that is a strict local
priority maximum among STILL-UNCOLORED neighbors) and assigns it color c —
the Jones-Plassmann schedule with one color class per round.

Determinism / oracle portability: the priority is the md5-60bit of
"seed|id" (the randperm/mis trick) so a SQL oracle replays every round
byte-for-byte; priorities are unique per id in practice, so ties cannot
occur and the winner set is a well-defined independent set.

Scale design: per round ONE join of the remaining symmetric edge table
against the uncolored set (both sides shrink monotonically), one
max-aggregation per uncolored vertex, one anti-join to retire winners;
lineage cut per round via runner.truncate, early exit on empty remainder.
An uncolored vertex with no uncolored neighbors wins automatically, so
every round makes progress and isolated vertices color in round 1.
"""

from __future__ import annotations

from typing import Optional
import warnings

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.plans.superstep import SuperstepRunner


def _priority(col):
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", F.lit("jp"), col.cast("string"))), 1, 15),
        16, 10,
    ).cast("long")


def jp_coloring(
    spark: SparkSession,
    edges: DataFrame,
    max_colors: int = 8,
    runner: Optional[SuperstepRunner] = None,
) -> DataFrame:
    """(id, color) proper distance-1 coloring of the undirected simple
    support of ``edges``; color in [1..max_colors] is the round the vertex
    won its independent set, color 0 marks vertices still uncolored when
    the round budget ran out (a warning fires — same contract as
    kcore/ktruss truncation). Adjacent vertices never share a nonzero
    color; round counts needed in practice track the greedy color count,
    NOT the vertex count (each round colors a whole independent set).
    """
    runner = runner or SuperstepRunner(spark)
    und = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .distinct()
    )
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    sym = sym.repartition(spark.sparkContext.defaultParallelism, "a")
    sym.persist()
    try:
        verts = sym.select(F.col("a").alias("id")).distinct()
        rem = runner.truncate(verts.select("id", _priority(F.col("id")).alias("pri")))
        colored: Optional[DataFrame] = None
        n_rem = rem.count()
        color = 0
        while n_rem > 0 and color < max_colors:
            color += 1
            # edges with BOTH ends uncolored; max uncolored-neighbor priority
            ra = rem.select(F.col("id").alias("a"))
            rb = rem.select(F.col("id").alias("b"), F.col("pri").alias("pri_b"))
            nbr_max = (
                sym.join(ra, "a").join(rb, "b")
                .groupBy(F.col("a").alias("id"))
                .agg(F.max("pri_b").alias("mx"))
            )
            winners = (
                rem.join(nbr_max, "id", "left")
                .filter(F.col("mx").isNull() | (F.col("pri") > F.col("mx")))
                .select("id", F.lit(color).alias("color"))
            )
            winners = runner.truncate(winners)
            n_win = winners.count()
            if n_win == 0:  # cannot happen with unique priorities; guard anyway
                break
            batch = winners.select("id", F.col("color").cast("long").alias("color"))
            colored = batch if colored is None else colored.unionByName(batch)
            colored = runner.truncate(colored)
            rem = runner.truncate(rem.join(winners.select("id"), "id", "left_anti"))
            n_rem -= n_win
        if n_rem > 0:
            warnings.warn(
                "jp_coloring: max_colors exhausted before every vertex was "
                "colored; leftover vertices get color 0. Raise max_colors.",
                stacklevel=2,
            )
            leftover = rem.select("id", F.lit(0).cast("long").alias("color"))
            colored = leftover if colored is None else colored.unionByName(leftover)
        return colored if colored is not None else verts.select(
            "id", F.lit(0).cast("long").alias("color")
        )
    finally:
        sym.unpersist()
