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


def run_kernel(spark: SparkSession, path: str, iters: int, kernel: str) -> dict:
    """Timed full-matrix supersteps for one kernel ('pr' or 'cc'): each
    superstep touches every edge once — the TEPS convention of
    TopDownBFS.cpp:465 adapted to full-matrix iterations. One kernel per
    session so exactly ONE cached edge table holds the executor memory.
    """
    from combblas_spark.core.semiring import PLUS_TIMES, SELECT2ND_MIN
    from combblas_spark.operators.multiply import spmv
    from combblas_spark.operators.reduce import reduce_dim
    from combblas_spark.operators.transform import dimapply

    p = spark.sparkContext.defaultParallelism
    edges = spark.read.parquet(path)
    verts = edges.select(F.col("src").alias("id")).distinct().persist()
    n = verts.count()

    if kernel == "pr":
        outdeg = reduce_dim(edges, "row", F.sum)
        table = dimapply(edges, outdeg, dim="row", binop=lambda w, d: w / d)
        vec = verts.select("id", F.lit(1.0 / n).alias("val"))
        sr = PLUS_TIMES
    else:
        # CC on A + I (AddLoops, SpParMat.cpp:3290): the diagonal carries
        # each vertex's own label through the min -> single-SpMV superstep
        diag = verts.select(
            F.col("id").alias("src"), F.col("id").alias("dst"), F.lit(1.0).alias("w")
        )
        table = edges.unionByName(diag)
        vec = verts.select("id", F.col("id").cast("double").alias("val"))
        sr = SELECT2ND_MIN

    table = table.repartition(p, "dst").persist()
    nnz = table.count()
    x = vec.localCheckpoint()

    times = []
    for _ in range(iters):
        t0 = time.time()
        x = spmv(table, x, sr, broadcast_x=True).localCheckpoint()
        times.append(time.time() - t0)

    ts = sorted(times[1:] or times)  # drop JIT/cache warmup iteration
    sec = ts[len(ts) // 2]  # median — superstep times are noisy in local mode
    return {
        "nnz": nnz,
        "n_vertices": n,
        "sec_per_iter": sec,
        "gteps": nnz / sec / 1e9,
        "iters_sec": [round(t, 2) for t in times],
    }


def run_supersteps(build, path: str, iters: int) -> dict:
    out = {}
    for kernel in ("pr", "cc"):
        spark = build()
        spark.sparkContext.setLogLevel("ERROR")
        r = run_kernel(spark, path, iters, kernel)
        spark.stop()
        out["nnz"] = r["nnz"]
        out["n_vertices"] = r["n_vertices"]
        out[f"{kernel}_sec_per_iter"] = r["sec_per_iter"]
        out[f"{kernel}_gteps"] = r["gteps"]
    return out


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
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # Kernel-1 (graph construction) is NOT part of the measured scaling
        # protocol — build it once with the full machine.
        gen = build_session(32, shuffle_parts=128, mem=args.mem)
        gen.sparkContext.setLogLevel("ERROR")
        prepare_edges(gen, args.scale, path)
        gen.stop()
    results = {}
    for cores in args.cores:
        results[cores] = run_supersteps(
            lambda c=cores: build_session(c, shuffle_parts=c * 4, mem=args.mem),
            path,
            args.iters,
        )
        print(f"cores={cores}: {json.dumps(results[cores])}", file=sys.stderr)

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
