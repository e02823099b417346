"""Two-parallelism scaling benchmark (the north_rule evidence protocol).

Runs PageRank + CC supersteps over a seeded Graph500 R-MAT edge table at two
local parallelism levels (N=8, 4N=32 cores by default) on IDENTICAL input
(the generator is counter-based, partition-independent) and reports
per-iteration GTEPS = nnz(A) / iteration-seconds / 1e9 at both, plus
scaling efficiency eff = GTEPS(4N) / (4 * GTEPS(N)).

Writes/updates BENCH/BASELINE.md. Usage:
    python scripts/bench_scaling.py [--scale 20] [--iters 5] [--out BENCH/BASELINE.md]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
import pyspark.sql.functions as F


def build_session(cores: int, shuffle_parts: int, mem: str = "24g") -> SparkSession:
    # NB: heap sized to the workload, NOT the machine — an oversized heap
    # (60-90g) on this VM produces multi-second GC stalls that swamp the
    # per-superstep times (observed 1s -> 40s iteration noise).
    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"rmat-scaling-{cores}")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.default.parallelism", str(cores * 2))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", mem)
        .config("spark.sql.autoBroadcastJoinThreshold", str(256 * 1024 * 1024))
        .config("spark.local.dir", "/tmp/spark-scaling")
        .getOrCreate()
    )


def prepare_edges(spark: SparkSession, scale: int, path: str) -> None:
    """Kernel-1: generate, dedup, de-loop, symmetrize, write parquet once."""
    from combblas_spark.sources.rmat import rmat_prepared

    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    edges = rmat_prepared(spark, scale)
    edges.write.mode("overwrite").parquet(path)


def run_supersteps(spark: SparkSession, path: str, iters: int) -> dict:
    """Timed full-matrix supersteps: one PageRank-style plus-times SpMV and
    one CC-style min SpMV per iteration (each touches every edge once — the
    TEPS convention of TopDownBFS.cpp:465 adapted to full-matrix iterations).
    """
    from combblas_spark.core.semiring import PLUS_TIMES, SELECT2ND_MIN
    from combblas_spark.operators.multiply import spmv
    from combblas_spark.operators.reduce import reduce_dim
    from combblas_spark.operators.transform import dimapply

    edges = spark.read.parquet(path)
    edges = edges.repartition(spark.sparkContext.defaultParallelism, "dst").persist()
    nnz = edges.count()

    outdeg = reduce_dim(edges, "row", F.sum)
    e_norm = dimapply(edges, outdeg, dim="row", binop=lambda w, d: w / d).persist()
    e_norm.count()

    verts = edges.select(F.col("src").alias("id")).distinct().persist()
    n = verts.count()

    ranks = verts.select("id", F.lit(1.0 / n).alias("val")).localCheckpoint()
    labels = verts.select("id", F.col("id").alias("val")).localCheckpoint()

    pr_times, cc_times = [], []
    for _ in range(iters):
        t0 = time.time()
        # vector broadcast per superstep; the edge table never re-shuffles
        ranks = spmv(e_norm, ranks, PLUS_TIMES, broadcast_x=True).localCheckpoint()
        pr_times.append(time.time() - t0)
        t0 = time.time()
        nbr = spmv(edges, labels, SELECT2ND_MIN, broadcast_x=True)
        labels = (
            labels.alias("o")
            .join(F.broadcast(nbr.alias("nb")), on="id", how="left")
            .select("id", F.least(F.col("o.val"), F.coalesce(F.col("nb.val"), F.col("o.val"))).alias("val"))
            .localCheckpoint()
        )
        cc_times.append(time.time() - t0)

    # drop the first (JIT/cache warmup) iteration from the rate
    pr = pr_times[1:] or pr_times
    cc = cc_times[1:] or cc_times
    return {
        "nnz": nnz,
        "n_vertices": n,
        "pr_sec_per_iter": sum(pr) / len(pr),
        "cc_sec_per_iter": sum(cc) / len(cc),
        "pr_gteps": nnz / (sum(pr) / len(pr)) / 1e9,
        "cc_gteps": nnz / (sum(cc) / len(cc)) / 1e9,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=20)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cores", type=int, nargs=2, default=[8, 32])
    ap.add_argument("--edges-dir", default="/tmp/rmat_edges")
    ap.add_argument("--out", default="BENCH/BASELINE.md")
    ap.add_argument("--mem", default="24g")
    args = ap.parse_args()

    path = f"{args.edges_dir}/scale{args.scale}"
    results = {}
    for cores in args.cores:
        spark = build_session(cores, shuffle_parts=cores * 4, mem=args.mem)
        spark.sparkContext.setLogLevel("ERROR")
        prepare_edges(spark, args.scale, path)
        results[cores] = run_supersteps(spark, path, args.iters)
        print(f"cores={cores}: {json.dumps(results[cores])}", file=sys.stderr)
        spark.stop()

    lo, hi = args.cores
    ratio = hi / lo
    eff_pr = results[hi]["pr_gteps"] / (ratio * results[lo]["pr_gteps"])
    eff_cc = results[hi]["cc_gteps"] / (ratio * results[lo]["cc_gteps"])

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    r = {"scale": args.scale, "results": {str(k): v for k, v in results.items()},
         "eff_pr": eff_pr, "eff_cc": eff_cc}
    with open(args.out.replace(".md", ".json"), "w") as f:
        json.dump(r, f, indent=2)

    nnz = results[lo]["nnz"]
    md = f"""# BENCH/BASELINE — two-parallelism scaling evidence

Per the north_rule protocol: the same job (PageRank plus-times SpMV and CC
min-SpMV supersteps over a seeded Graph500 R-MAT scale-{args.scale} edge table,
nnz = {nnz:,}, identical partition-independent input) executed at two local
parallelism levels standing in for N and 4N executors.

GTEPS = nnz / seconds-per-superstep / 1e9 (TEPS convention of
`/root/reference/Applications/TopDownBFS.cpp:465`, adapted to full-matrix
iterations; first warmup iteration excluded).

| kernel | local[{lo}] GTEPS | local[{hi}] GTEPS | scaling efficiency (target >= 0.8) |
|---|---|---|---|
| PageRank superstep | {results[lo]["pr_gteps"]:.3f} | {results[hi]["pr_gteps"]:.3f} | {eff_pr:.3f} |
| CC min-label superstep | {results[lo]["cc_gteps"]:.3f} | {results[hi]["cc_gteps"]:.3f} | {eff_cc:.3f} |

Per-superstep wall seconds: PR {results[lo]["pr_sec_per_iter"]:.2f}s @{lo} /
{results[hi]["pr_sec_per_iter"]:.2f}s @{hi}; CC {results[lo]["cc_sec_per_iter"]:.2f}s @{lo} /
{results[hi]["cc_sec_per_iter"]:.2f}s @{hi}. Vertices: {results[lo]["n_vertices"]:,}.

Raw JSON: `BENCH/BASELINE.json`. Reproduce:
`python scripts/bench_scaling.py --scale {args.scale} --iters {args.iters}`.
"""
    with open(args.out, "w") as f:
        f.write(md)
    print(md)


if __name__ == "__main__":
    main()
