"""Seeded Graph500 R-MAT edge generator — vectorized, partition-independent.

Reference: DistEdgeList::GenGraph500Data
(/root/reference/src/DistEdgeList.cpp:223-287) with the Graph500 initiator
{.57,.19,.19,.05} and edgefactor 16 (/root/reference/Applications/TopDownBFS.cpp:49,272).

Design: determinism must not depend on Spark partitioning, so randomness is
COUNTER-BASED — every (edge index, recursion level) pair hashes through
splitmix64 to a uniform in [0,1). The generator is a mapInPandas over
spark.range(num_edges): pure numpy uint64 arithmetic, no Python row loops,
no RNG state. Identical output for any partition count — which is also what
makes the two-parallelism scaling benchmark an apples-to-apples comparison.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

A, B, C = 0.57, 0.19, 0.19  # D = 0.05

_EDGE_SCHEMA = "src long, dst long, w double"


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer — public-domain mixing constants."""
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def _uniform(idx: np.ndarray, level: int, seed: int) -> np.ndarray:
    h = _splitmix64(idx ^ _splitmix64(np.uint64(seed * 0x10001 + level)))
    return h.astype(np.float64) / 18446744073709551616.0  # 2**64


def rmat_batch(idx: np.ndarray, scale: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized R-MAT recursion for a batch of edge indices."""
    n = idx.shape[0]
    src = np.zeros(n, dtype=np.uint64)
    dst = np.zeros(n, dtype=np.uint64)
    for level in range(scale):
        u = _uniform(idx, level, seed)
        # quadrants in order A(0,0) B(0,1) C(1,0) D(1,1)
        src_bit = (u >= A + B).astype(np.uint64)  # quadrants C, D set src bit
        dst_bit = ((u >= A) & (u < A + B) | (u >= A + B + C)).astype(np.uint64)
        src = (src << np.uint64(1)) | src_bit
        dst = (dst << np.uint64(1)) | dst_bit
    return src.astype(np.int64), dst.astype(np.int64)


def rmat_edges(
    spark: SparkSession,
    scale: int,
    edgefactor: int = 16,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """num_edges = edgefactor * 2**scale raw directed edges, w = 1.0.
    Post-processing (dedup / symmetrize / loop removal) is the caller's
    pipeline, mirroring TopDownBFS.cpp:308-355."""
    num_edges = edgefactor * (1 << scale)
    base = spark.range(0, num_edges, 1, num_partitions or spark.sparkContext.defaultParallelism * 2)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            idx = pdf["id"].to_numpy(dtype=np.uint64)
            src, dst = rmat_batch(idx, scale, seed)
            yield pd.DataFrame(
                {"src": src, "dst": dst, "w": np.ones(len(src), dtype=np.float64)}
            )

    return base.mapInPandas(gen, schema=_EDGE_SCHEMA)


def rmat_prepared(
    spark: SparkSession, scale: int, edgefactor: int = 16, seed: int = 42
) -> DataFrame:
    """Graph500 Kernel-1 analog: dedup (sum), remove loops, symmetrize."""
    from combblas_spark.operators.transform import remove_loops, symmetrize
    import pyspark.sql.functions as F

    raw = rmat_edges(spark, scale, edgefactor, seed)
    dedup = raw.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    return symmetrize(remove_loops(dedup), add=F.sum)


def uniform_edges(
    spark: SparkSession,
    num_vertices: int,
    num_edges: int,
    seed: int = 1,
) -> DataFrame:
    """Counter-based uniform G(n, m) (Erdős–Rényi with replacement) —
    the flat-degree control graph next to rmat_edges' skewed one: edge i
    is (xxhash64(i, seed) mod n, xxhash64(i, seed+1) mod n).

    Pure Column expressions over spark.range (JVM-side, no Python, no
    RNG state): identical output for ANY partition count, same
    determinism contract as the R-MAT generator. Self-loops and
    multi-edges occur as in the with-replacement model — strip with
    remove_loops / distinct downstream if the experiment needs simple
    graphs.
    """
    if num_vertices < 1 or num_edges < 0:
        raise ValueError(f"bad G(n,m) sizes: n={num_vertices}, m={num_edges}")
    import pyspark.sql.functions as F

    e = spark.range(num_edges)
    return e.select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(num_vertices)).alias("src"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(num_vertices)).alias("dst"),
        F.lit(1.0).alias("w"),
    )
