"""MCL cluster output keyed by vertex name.

Reference: /root/reference/Applications/WriteMCLClusters.h:44-120
(WriteMCLClusters): vertices belonging to a cluster are written on a
single line separated by spaces, either by integer id or by the vertex's
string label (HipMCLClusterSaveHandler). This is that surface as a
DataFrame pipeline: labels(id, val=cluster) [⋈ vertices(id, key)] →
groupBy cluster → sorted member list → one text line per cluster.

Scale shape: the per-cluster collect_list is bounded by the cluster size,
which the one-line-per-cluster FORMAT itself requires (same as the
reference's per-cluster gather); everything before it is hash-partitioned
by cluster id. Determinism: members sort lexicographically within a line
and lines sort by cluster id, so the output is a pure function of the
input tables.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def write_clusters(
    labels: DataFrame,
    path: str,
    vertices: Optional[DataFrame] = None,
    single_file: bool = True,
) -> None:
    """Write (id, val=cluster id) as one line of members per cluster.

    ``vertices`` (id, key) maps vertex ids to string names first —
    WriteMCLClusters.h's vtxLabels overload; without it members print as
    integer ids. ``single_file`` mirrors the reference's one-file write
    (coalesce(1)); at scale pass False and read the parts directory back.
    """
    m = labels.select("id", "val")
    if vertices is not None:
        m = (
            m.join(vertices.select("id", "key"), on="id")
            .select(F.col("key").alias("id"), "val")
        )
    lines = (
        m.groupBy("val")
        .agg(F.sort_array(F.collect_list(F.col("id").cast("string"))).alias("ms"))
        .select(F.col("val"), F.concat_ws(" ", "ms").alias("value"))
        .orderBy("val")
        .select("value")
    )
    if single_file:
        lines = lines.coalesce(1)
    lines.write.mode("overwrite").text(path)


def read_clusters(spark: SparkSession, path: str) -> DataFrame:
    """Inverse of write_clusters for round-trips: -> (member string,
    cluster_line) where cluster_line is the 0-based line order is NOT
    recoverable from a parts directory — instead each cluster is re-keyed
    by its lexicographically-smallest member (canonical, order-free)."""
    raw = spark.read.text(path).filter(F.trim("value") != "")
    ms = F.split(F.trim("value"), " ")
    return raw.select(
        F.explode(ms).alias("member"),
        F.array_min(ms).alias("cluster_key"),
    )
