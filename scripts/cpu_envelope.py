"""Hardware control for the two-parallelism scaling protocol.

Measures how well EMBARRASSINGLY PARALLEL, shuffle-free, zero-IO work (a
whole-stage-codegen xxhash64 chain over spark.range) scales between two
pinned core counts on THIS machine. That number is the ceiling any Spark
job can reach here: if pure compute only scales at e.g. 0.79 from 8 -> 32
cores (measured on this VM: frequency/steal effects at full occupancy),
then a kernel's 8 -> 32 efficiency is bounded by the same 0.79 and the
honest N -> 4N evidence pair is one that sits INSIDE the machine's linear
envelope (4 -> 16 measures 0.93 here).

Each level runs in a fresh subprocess under taskset: py4j reuses the
executor JVM across SparkSession restarts within one Python process, so
in-process sched_setaffinity would leave the JVM pinned to the FIRST
level's cores.

Usage: python scripts/cpu_envelope.py [--cores 4 16] [--iters 3]
Prints one JSON line: {"t_lo": s, "t_hi": s, "speedup": x, "eff": e}.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time


def _level(cores: int, iters: int) -> float:
    from pyspark.sql import SparkSession
    import pyspark.sql.functions as F

    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"cpu-envelope-{cores}")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.range(0, 64 * 4_000_000, 1, 64)
    times = []
    for _ in range(iters):
        t0 = time.time()
        c = F.col("id")
        for _i in range(40):
            c = F.xxhash64(c)
        # sum in double: the hash chain overflows BIGINT under ANSI mode
        df.select((c / 1e9).alias("h")).agg(F.sum("h")).collect()
        times.append(time.time() - t0)
    spark.stop()
    return min(times)  # best-of: pure-compute lower bound, no warmup noise


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cores", type=int, nargs=2, default=[4, 16])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--_child", type=int, default=None)
    args = ap.parse_args()

    if args._child is not None:
        print(json.dumps({"t": _level(args._child, args.iters)}))
        return

    t = {}
    for cores in args.cores:
        out = subprocess.run(
            ["taskset", "-c", f"0-{cores - 1}", sys.executable,
             os.path.abspath(__file__), "--_child", str(cores),
             "--iters", str(args.iters)],
            check=True, capture_output=True, text=True,
        )
        t[cores] = json.loads(out.stdout.strip().splitlines()[-1])["t"]

    lo, hi = args.cores
    speedup = t[lo] / t[hi]
    print(json.dumps({
        "cores": args.cores, "t_lo": round(t[lo], 2), "t_hi": round(t[hi], 2),
        "speedup": round(speedup, 3), "eff": round(speedup / (hi / lo), 3),
    }))


if __name__ == "__main__":
    main()
