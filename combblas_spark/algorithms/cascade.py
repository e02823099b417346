"""Independent-cascade (IC) influence spread with replayable edge coins.

The IC model (Kempe-Kleinberg-Tardos, KDD'03): when a vertex first
activates, each out-edge gets ONE chance to activate its head, with
probability p. Because every edge flips exactly one coin in the whole
process, a cascade realization is EXACTLY reachability over the
subgraph of successful edges — so the activation round is the
multi-source BFS depth from the seed set on the coin-filtered graph
(the standard "live-edge graph" equivalence the KKT proof itself uses).
That turns influence simulation into the engine's bread and butter: one
pure-Column coin filter + the batched-fringe msbfs, no per-round
randomness, and the md5-60bit coin makes the realization replayable in
any engine (reference semantics anchor: propagation loops of
/root/reference/Applications/TopDownBFS.cpp:442-449; the IC layer is
analytics the reference leaves to its callers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.algorithms.bfs import msbfs
from combblas_spark.functions.urls import _h60


def live_edges(
    edges: DataFrame, p_num: int, p_den: int, salt: str = "ic"
) -> DataFrame:
    """The live-edge subgraph of one IC realization: edge (u, v)
    succeeds iff md5-60bit(salt|u|v) % p_den < p_num (deterministic,
    engine-replayable; independent across edges)."""
    coin = _h60(
        salt,
        F.concat(
            F.col("src").cast("string"), F.lit("|"), F.col("dst").cast("string")
        ),
    )
    return edges.filter(coin % p_den < p_num)


def ic_cascade(
    spark: SparkSession,
    edges: DataFrame,
    seeds: list[int],
    p_num: int,
    p_den: int,
    salt: str = "ic",
    max_iter: int = 10_000,
) -> DataFrame:
    """One IC realization from ``seeds``: (id, round) with round the
    activation superstep (0 = seed). Multi-source BFS over the live
    subgraph, min round per vertex across seeds."""
    live = live_edges(edges, p_num, p_den, salt)
    return (
        msbfs(spark, live, roots=seeds, max_iter=max_iter)
        .groupBy("id")
        .agg(F.min("depth").cast("long").alias("round"))
    )
