"""Prototype: 2D-grid (SUMMA-style) shuffle superstep — scaling experiment.

Per-superstep data movement is ALL shuffle (parallel): replicate the vector
C times along grid columns (the AllGatherVector analog done as a shuffle),
co-partitioned hash join against the cached grid-partitioned edges (edges
never move), partial agg by dst, final agg. No driver-side broadcast build.

Usage: python scripts/exp_2d.py --scale 22 --cores 8 --iters 6 [--kernel pr]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, DataFrame
import pyspark.sql.functions as F


def build_session(cores: int, shuffle_parts: int, mem: str = "24g") -> SparkSession:
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"exp2d-{cores}")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.driver.memory", mem)
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.local.dir", "/tmp/spark-scaling")
        .getOrCreate()
    )


def superstep_2d(e: DataFrame, x: DataFrame, R: int, C: int, add: str) -> DataFrame:
    xr = (
        x.withColumn("rb", F.pmod(F.xxhash64("id"), F.lit(R)))
        .withColumn("cb", F.explode(F.array(*[F.lit(i).cast("long") for i in range(C)])))
        .hint("shuffle_hash")
    )
    j = e.join(xr, on=[e["rb"] == xr["rb"], e["cb"] == xr["cb"], e["src"] == xr["id"]])
    agg = {"sum": F.sum, "min": F.min}[add]
    contrib = e["w"] * xr["val"] if add == "sum" else xr["val"]
    return j.groupBy(e["dst"].alias("id")).agg(agg(contrib).alias("val"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=22)
    ap.add_argument("--cores", type=int, default=32)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--kernel", default="pr")
    ap.add_argument("--R", type=int, default=8)
    ap.add_argument("--C", type=int, default=4)
    ap.add_argument("--np", type=int, dest="nparts", default=64)
    ap.add_argument("--shuffle-parts", type=int, default=64)
    ap.add_argument("--mem", default="24g")
    ap.add_argument("--explain", action="store_true")
    args = ap.parse_args()

    path = f"/tmp/rmat_edges/scale{args.scale}"
    spark = build_session(args.cores, args.shuffle_parts, args.mem)
    spark.sparkContext.setLogLevel("ERROR")
    R, C = args.R, args.C

    edges = spark.read.parquet(path)
    verts = edges.select(F.col("src").alias("id")).distinct().persist()
    n = verts.count()

    if args.kernel == "pr":
        outdeg = edges.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("deg"))
        table = (
            edges.join(outdeg, edges["src"] == outdeg["id"])
            .select(edges["src"], edges["dst"], (edges["w"] / outdeg["deg"]).alias("w"))
        )
        vec = verts.select("id", F.lit(1.0 / n).alias("val"))
        add = "sum"
    else:
        diag = verts.select(
            F.col("id").alias("src"), F.col("id").alias("dst"), F.lit(1.0).alias("w")
        )
        table = edges.unionByName(diag)
        vec = verts.select("id", F.col("id").cast("double").alias("val"))
        add = "min"

    e = (
        table.select(
            "src", "dst", "w",
            F.pmod(F.xxhash64("src"), F.lit(R)).alias("rb"),
            F.pmod(F.xxhash64("dst"), F.lit(C)).alias("cb"),
        )
        .repartition(args.nparts, "rb", "cb")
        .persist()
    )
    nnz = e.count()

    x = vec.localCheckpoint()
    if args.explain:
        superstep_2d(e, x, R, C, add).explain("formatted")

    times = []
    for _ in range(args.iters):
        t0 = time.time()
        x = superstep_2d(e, x, R, C, add).localCheckpoint()
        times.append(time.time() - t0)
    ts = sorted(times[1:] or times)
    sec = ts[len(ts) // 2]
    print(json.dumps({
        "cores": args.cores, "kernel": args.kernel, "nnz": nnz, "n": n,
        "sec": round(sec, 3), "gteps": round(nnz / sec / 1e9, 4),
        "iters": [round(t, 2) for t in times],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
