"""Similarity search over an embedding column (array<float>).

* ``cosine_topk``  — brute-force exact top-k: the correctness baseline.
  Dot products are sequential folds over the array (F.aggregate over
  zip_with), deterministic order -> bitwise-reproducible in a SQL oracle.
* ``lsh_ann_topk`` — random-hyperplane LSH bucketing: the scale path.
  Planes are a deterministic seeded literal (few KB, shipped in the plan);
  search is bucket-local, so the join is |bucket| x |bucket| instead of n^2.

At 100 TB the brute-force path is only for reranking candidates; LSH (or an
IVF built from it) bounds the candidate set per query.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("nrm", norm(F.col(vec_col)))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    (query_id, neighbor_id, cos) — ties broken by neighbor_id asc; the
    query itself is excluded. ``queries`` has (query_id, qvec)."""
    e = with_norm(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"), F.col("nrm")
    )
    q = queries.select(
        F.col("query_id"), F.col("qvec"), norm(F.col("qvec")).alias("qnrm")
    )
    scored = (
        q.crossJoin(e)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("_rn").alias("rank"))
    )


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): sign pattern of the vector against n_planes seeded
    random hyperplanes, packed into a long."""
    planes = _planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket.bitwiseOR(
            F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), bucket.alias("bucket"))


def lsh_ann_topk(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 10_000,
) -> DataFrame:
    """Approximate all-pairs top-k: candidates limited to same-bucket pairs.

    Buckets larger than ``max_bucket`` are dropped before the self-join —
    without the cap one degenerate hyperplane bucket (all-near-zero vectors,
    boilerplate embeddings) costs |bucket|^2 at corpus scale; same guard as
    dedup.lsh_candidate_pairs.
    """
    b = lsh_buckets(emb, n_planes, seed, dim, id_col, vec_col)
    b = b.withColumn("nrm", norm(F.col("vec")))
    b = b.join(
        b.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bsz")), on="bucket"
    ).filter(F.col("_bsz") <= max_bucket)
    lhs = b.select("bucket", F.col("id").alias("query_id"), F.col("vec").alias("qvec"), F.col("nrm").alias("qnrm"))
    rhs = b.select("bucket", F.col("id").alias("neighbor_id"), F.col("vec").alias("vec"), F.col("nrm"))
    scored = (
        lhs.join(rhs, on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("_rn").alias("rank"))
    )
