"""Matrix Market I/O — the reference's native exchange format.

Reference:
* ParallelReadMM  /root/reference/include/CombBLAS/SpParMat.cpp:3993-4130
  (MPI-IO byte-range split; banner handling: `symmetric` duplicates entries;
  duplicate (i,j) merged with a user binop)
* ParallelWriteMM /root/reference/include/CombBLAS/SpParMat.cpp:4133-4222

Spark design: `spark.read.text` byte-range-splits the file across tasks
(the MPI-IO analog); parsing is pure Column ops (split + cast). The banner
and the size line are identified by line position (MM puts comments and the
size header strictly at the top). Ids convert 1-based -> 0-based like the
reference's `onebased` flag.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F


def read_mm(
    spark: SparkSession,
    path: str,
    dedup: Callable[[Column], Column] = F.sum,
    default_weight: float = 1.0,
) -> DataFrame:
    """Read a Matrix Market coordinate file (or a directory of parts) into
    (src, dst, w).

    Honors the `%%MatrixMarket` banner: `symmetric`/`skew-symmetric` mirror
    off-diagonal entries; `pattern` uses ``default_weight``. Duplicate
    coordinates merge with ``dedup`` (the reference's BinOp).
    """
    raw = spark.read.text(path)
    import os

    if os.path.isdir(path):
        data_files = [
            f for f in os.listdir(path)
            if not f.startswith((".", "_")) and os.path.isfile(os.path.join(path, f))
        ]
        if len(data_files) > 1:
            # banner detection + global comment-skip below assume ONE file's
            # line order; a parts directory interleaves arbitrarily
            raise ValueError(
                f"read_mm expects a single Matrix Market file; {path} has "
                f"{len(data_files)} parts — read them individually and union"
            )
    banner = raw.limit(1).collect()[0][0].strip().lower()
    if not banner.startswith("%%matrixmarket"):
        raise ValueError(f"not a MatrixMarket file (banner: {banner[:60]!r})")
    symmetric = "symmetric" in banner and "skew" not in banner
    skew = "skew-symmetric" in banner
    pattern = "pattern" in banner

    # comments + the size line sit strictly at the top (MM spec); skip
    # (#comments + 1) leading lines by index — one extra pass, ingest-only.
    n_comments = raw.filter(F.col("value").startswith("%")).count()
    body = spark.createDataFrame(
        raw.rdd.zipWithIndex()
        .filter(lambda r: r[1] > n_comments)
        .map(lambda r: (r[0][0],)),
        "value string",
    ).filter(F.trim("value") != "")

    parts = F.split(F.trim(F.regexp_replace("value", r"\s+", " ")), " ")
    parsed = body.select(
        (parts.getItem(0).cast("long") - 1).alias("src"),
        (parts.getItem(1).cast("long") - 1).alias("dst"),
        (
            F.lit(float(default_weight))
            if pattern
            else F.coalesce(parts.getItem(2).cast("double"), F.lit(float(default_weight)))
        ).alias("w"),
    )
    if symmetric or skew:
        mirror = parsed.filter(F.col("src") != F.col("dst")).select(
            F.col("dst").alias("src"),
            F.col("src").alias("dst"),
            (-F.col("w") if skew else F.col("w")).alias("w"),
        )
        parsed = parsed.unionByName(mirror)
    return parsed.groupBy("src", "dst").agg(dedup(F.col("w")).alias("w"))


def write_mm(edges: DataFrame, path: str, comment: str = "written by combblas_spark") -> None:
    """Write (src, dst, w) as a Matrix Market `coordinate real general`
    file (1-based). Single-file output via coalesce(1) mirrors the
    reference's one-file MPI-IO write; drop the coalesce for a parts
    directory at scale (read_mm accepts both)."""
    stats = edges.agg(
        F.max(F.greatest("src", "dst")).alias("mx"), F.count(F.lit(1)).alias("nnz")
    ).collect()[0]
    dim, nnz = int(stats["mx"]) + 1, int(stats["nnz"])
    header = (
        f"%%MatrixMarket matrix coordinate real general\n%{comment}\n{dim} {dim} {nnz}"
    )
    body = edges.select(
        F.concat_ws(
            " ",
            (F.col("src") + 1).cast("string"),
            (F.col("dst") + 1).cast("string"),
            F.col("w").cast("string"),
        ).alias("value")
    )
    spark = edges.sparkSession
    head_df = spark.createDataFrame([(header,)], "value string")
    head_df.unionByName(body).coalesce(1).write.mode("overwrite").text(path)
