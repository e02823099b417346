"""Densest-subgraph extraction by parallel greedy peeling.

Bahmani, Kumar & Vassilvitskii, "Densest Subgraph in Streaming and
MapReduce" (VLDB 2012): repeatedly delete EVERY vertex whose degree is
<= 2(1+eps) * density(current subgraph); the densest of the O(log n)
intermediate subgraphs is a 2(1+eps)-approximation of the densest
subgraph. The dense-core primitive behind spam-farm detection, community
seeding and graph cleaning — the same Reduce(degree) + semi-join Prune
composition as kcore.py (CombBLAS ships the primitives, not the loop),
but with a DENSITY-ADAPTIVE threshold instead of a fixed k.

Determinism across engines: the removal test is evaluated in exact
integer arithmetic. With M = |rows| of the symmetric edge table (= 2m)
and n vertices, "deg <= (num/den) * M / n" becomes
``den * deg * n <= num * M`` — no floats anywhere in the peel, so the
DuckDB oracle replays it bit-exactly. num/den = 1 + eps (default 3/2,
i.e. eps = 1/2 -> a 3-approximation in <= log_{1.5} n rounds).

Scale shape: each round is ONE hash aggregation over the shrinking edge
table plus two semi-joins against the keep-set, with lineage truncated
per round; n and M are two scalar counts (Spark actions, no collect of
data rows). The per-round profile is O(log n) driver-side scalars. The
long products den*deg*n and num*M stay within int64 up to ~10^9 edges
per factor pairing; at the 100 TB extreme the same expressions move to
decimal(38,0) unchanged.
"""

from __future__ import annotations

import warnings
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.plans.superstep import SuperstepRunner


def densest_subgraph(
    spark: SparkSession,
    edges: DataFrame,
    num: int = 3,
    den: int = 2,
    max_rounds: int = 60,
    runner: Optional[SuperstepRunner] = None,
) -> tuple[DataFrame, DataFrame]:
    """Peel the SYMMETRIC simple graph ``edges`` (src, dst; one row per
    direction, no loops, no duplicates) with threshold factor
    1 + eps = num/den > 1.

    Returns ``(profile, members)``:

    * ``profile`` — one row per non-empty round, BEFORE that round's
      removal: (round, n_vertices, m_edges, density) with
      density = ROUND(m_edges / n_vertices, 6).
    * ``members`` — (id) vertex rows of the densest recorded round, the
      2(1+eps)-approximate densest subgraph itself.
    """
    if num <= den or den <= 0:
        raise ValueError(f"need num/den > 1, got {num}/{den}")
    runner = runner or SuperstepRunner(spark)
    e = runner.truncate(
        edges.select("src", "dst").repartition(
            spark.sparkContext.defaultParallelism, "dst"
        )
    )
    profile: list[tuple[int, int, int]] = []  # (round, n, M)
    best: tuple[int, int, DataFrame] | None = None  # (m, n, members)
    emptied = False
    for r in range(max_rounds):
        big_m = e.count()
        if big_m == 0:
            emptied = True
            break
        deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("c"))
        verts = runner.truncate(deg.select(F.col("dst").alias("id")))
        n = verts.count()
        profile.append((r, n, big_m))
        if best is None or big_m * best[1] > best[0] * 2 * n:  # m/n > best
            best = (big_m // 2, n, verts)
        keep = deg.filter(
            F.lit(den) * F.col("c") * F.lit(n) > F.lit(num) * F.lit(big_m)
        ).select("dst")
        e = runner.truncate(
            e.join(keep.select(F.col("dst").alias("src")), on="src", how="leftsemi")
            .join(keep, on="dst", how="leftsemi")
            .select("src", "dst")
        )
    if not emptied:
        warnings.warn(
            "densest_subgraph: max_rounds exhausted before the peel "
            "emptied — the profile (and hence the approximation "
            "guarantee) is truncated. Rounds needed are "
            "log_{num/den}(n); raise max_rounds.",
            RuntimeWarning,
            stacklevel=2,
        )
    prof_df = spark.createDataFrame(
        [(r, n, big_m // 2) for r, n, big_m in profile],
        "round long, n_vertices long, m_edges long",
    ).withColumn(
        "density", F.round(F.col("m_edges") / F.col("n_vertices"), 6)
    )
    return prof_df, best[2].select("id")
