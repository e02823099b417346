"""Matrix Market -> parquet converter (the Mtx2Bin tool analog).

Reference: /root/reference/Applications/Mtx2Bin.cpp — reads an .mtx file
with ParallelReadMM and dumps the triples in binary form for fast reload.
Here the binary form is parquet (src, dst, w), the engine's native edge
layout: every operator and algorithm in combblas_spark loads it directly
with spark.read.parquet.

Usage:
    python scripts/mtx2bin.py IN.mtx OUT_DIR [--cpus N] [--partitions P]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mtx", help="Matrix Market file (general or symmetric)")
    ap.add_argument("out", help="output parquet directory")
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--partitions", type=int, default=0,
                    help="repartition count for the output (0 = leave as read)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from combblas_spark.sources.matrix_market import read_mm

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("mtx2bin")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = read_mm(spark, args.mtx)
    if args.partitions:
        edges = edges.repartition(args.partitions)
    edges.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(f"wrote {n} triples to {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
