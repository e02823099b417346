"""Filtered semantic graphs — typed edge payloads + predicate-pushdown BFS.

Reference: /root/reference/Applications/TwitterEdge.h:15-27 — edges carry a
payload (count, follower flag, latest-retweet time) and BFS runs over the
subgraph passing a payload predicate (TweetWithinInterval / TweetSince,
FilteredBFS.cpp — the SEJITS "filtered semantic graph" demo). In Spark the
payload is just extra columns and the predicate is a Column expression:
Catalyst pushes it into the parquet scan (PushedFilters), so the filtered
traversal never materializes the excluded edges — what the reference needs
custom semiring filtering for is free here.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.algorithms.bfs import bfs
from combblas_spark.plans.superstep import SuperstepRunner


def filtered_bfs(
    spark: SparkSession,
    edges: DataFrame,
    root: int,
    predicate: Column,
    runner: Optional[SuperstepRunner] = None,
    **bfs_kwargs,
) -> DataFrame:
    """BFS over the payload-filtered subgraph.

    ``edges`` may carry arbitrary payload columns (timestamps, types,
    counters); ``predicate`` is any Column over them, e.g.::

        filtered_bfs(spark, e, root=0,
                     predicate=(F.col("ts") >= t0) & (F.col("ts") < t1))

    mirrors FilteredBFS's TweetWithinInterval traversal. The filter is
    applied BEFORE the edge table is cached/partitioned, so it reaches the
    source scan and the superstep loop only ever sees surviving edges.
    """
    sub = edges.filter(predicate)
    if "w" not in sub.columns:
        sub = sub.withColumn("w", F.lit(1.0))
    return bfs(spark, sub.select("src", "dst", "w"), root, runner=runner, **bfs_kwargs)
