"""Mtx2Bin analog (/root/reference/Applications/Mtx2Bin.cpp): convert a
Matrix Market file to the engine's parquet edge layout.

Usage: python scripts/mtx2parquet.py in.mtx out_parquet_dir [--partitions N]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--partitions", type=int, default=None)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("mtx2parquet").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    from combblas_spark.sources.matrix_market import read_mm

    edges = read_mm(spark, args.src)
    if args.partitions:
        edges = edges.repartition(args.partitions, "dst")
    edges.write.mode("overwrite").parquet(args.dst)
    print(f"wrote {args.dst}: {spark.read.parquet(args.dst).count()} edges")
    spark.stop()


if __name__ == "__main__":
    main()
