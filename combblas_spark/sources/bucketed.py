"""Bucketed parquet tables — the shuffle-free co-located join path.

At 100 TB the dominant cost of iterative graph work is re-shuffling the
edge table; Spark's answer is bucketing: write the table hash-bucketed by
the join key once, and every subsequent equi-join or aggregation on that
key runs WITHOUT an Exchange (the analog of the reference's static 2D
block distribution, /root/reference/include/CombBLAS/SpParMat.h — the
partitioning lives with the data, not the job).

These helpers wrap the write/read pair; tests/test_plans.py asserts the
join plan really is exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
) -> None:
    """Persist ``df`` as a bucketed+sorted parquet table at ``path``
    (metadata in the session catalog). Sorting by the bucket key makes the
    downstream sort-merge join skip its sort too."""
    (
        df.write.format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket spec (a plain
    spark.read.parquet(path) would lose it — the catalog carries the
    bucketing metadata)."""
    return spark.table(table)
