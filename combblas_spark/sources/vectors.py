"""Vector text I/O — FullyDistVec/FullyDistSpVec::ParallelRead/ParallelWrite.

Reference: /root/reference/include/CombBLAS/FullyDistVec.h:96 and
FullyDistSpVec.cpp ParallelWrite: one "index value" pair per line,
optionally 1-based with a header. Parquet is the engine's real vector
format (plans/superstep.py); this exists for interchange with reference
tooling and its test inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F


def read_vec(
    spark: SparkSession, path: str, one_based: bool = False, val_type: str = "double"
) -> DataFrame:
    """(id, val) from whitespace-separated "index value" lines; '#'/'%'
    comment lines skipped."""
    raw = spark.read.text(path).filter(
        (F.trim("value") != "")
        & ~F.col("value").startswith("#")
        & ~F.col("value").startswith("%")
    )
    parts = F.split(F.trim(F.regexp_replace("value", r"\s+", " ")), " ")
    off = 1 if one_based else 0
    return raw.select(
        (parts.getItem(0).cast("long") - F.lit(off)).alias("id"),
        parts.getItem(1).cast(val_type).alias("val"),
    )


def write_vec(vec: DataFrame, path: str, one_based: bool = False) -> None:
    """Write (id, val) as "index value" text, sorted by id. coalesce(1)
    mirrors the reference's single-file write; at scale drop the coalesce
    and read the parts directory back with read_vec."""
    off = 1 if one_based else 0
    (
        vec.orderBy("id")
        .select(
            F.concat_ws(
                " ", (F.col("id") + F.lit(off)).cast("string"), F.col("val").cast("string")
            ).alias("value")
        )
        .coalesce(1)
        .write.mode("overwrite")
        .text(path)
    )
