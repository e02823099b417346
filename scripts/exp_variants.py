"""Variant matrix for the 2D superstep — one Spark session per variant."""
from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
import pyspark.sql.functions as F


def run_variant(name, cores, R, C, NP, compressed_cache=True, shuffle_compress=True,
                smj=False, iters=5, scale=22, kernel="pr",
                local_dir="/tmp/spark-scaling"):
    b = (SparkSession.builder.master(f"local[{cores}]")
        .appName(f"var-{name}")
        .config("spark.sql.shuffle.partitions", str(NP))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.adaptive.enabled", "false")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.join.preferSortMergeJoin", str(smj).lower())
        .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.inMemoryColumnarStorage.compressed", str(compressed_cache).lower())
        .config("spark.shuffle.compress", str(shuffle_compress).lower())
        .config("spark.local.dir", local_dir))
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try:
        rows = spark.range(0, 5000).select(
            F.col("id"), F.pmod(F.hash(F.col("id").cast("long")), F.lit(NP)).alias("b")).collect()
        tok = {}
        for r in rows:
            tok.setdefault(r["b"], r["id"])
        assert len(tok) == NP
        tokarr = F.array(*[F.lit(int(tok[i])).cast("long") for i in range(NP)])

        edges = spark.read.parquet(f"/tmp/rmat_edges/scale{scale}")
        verts = edges.select(F.col("src").alias("id")).distinct().persist()
        n = verts.count()
        if kernel == "pr":
            outdeg = edges.groupBy(F.col("src").alias("id")).agg(F.sum("w").alias("deg"))
            table = (edges.join(outdeg, edges["src"] == outdeg["id"])
                .select(edges["src"], edges["dst"], (edges["w"] / outdeg["deg"]).alias("w")))
            vec = verts.select("id", F.lit(1.0 / n).alias("val"))
            agg = lambda e, xr: F.sum(e["w"] * xr["val"])
        else:
            diag = verts.select(F.col("id").alias("src"), F.col("id").alias("dst"), F.lit(1.0).alias("w"))
            table = edges.unionByName(diag)
            vec = verts.select("id", F.col("id").cast("double").alias("val"))
            agg = lambda e, xr: F.min(xr["val"])

        pid_e = F.element_at(tokarr, (F.pmod(F.xxhash64("src"), F.lit(R)) * C
                                      + F.pmod(F.xxhash64("dst"), F.lit(C)) + 1).cast("int"))
        cols = ["src", "dst", "w"] if kernel == "pr" else ["src", "dst"]
        e = table.select(*cols, pid_e.alias("pid")).repartition(NP, "pid")
        if smj:
            e = e.sortWithinPartitions("pid", "src")
        e = e.persist()
        nnz = e.count()
        x = vec.localCheckpoint()

        def superstep(x):
            xr = (x.withColumn("cb", F.explode(F.array(*[F.lit(i).cast("long") for i in range(C)])))
                  .withColumn("pid", F.element_at(tokarr, (F.pmod(F.xxhash64("id"), F.lit(R)) * C
                                                           + F.col("cb") + 1).cast("int")))
                  .drop("cb"))
            if not smj:
                xr = xr.hint("shuffle_hash")
            j = e.join(xr, on=[e["pid"] == xr["pid"], e["src"] == xr["id"]])
            return j.groupBy(e["dst"].alias("id")).agg(agg(e, xr).alias("val"))

        times = []
        for _ in range(iters):
            t0 = time.time()
            x = superstep(x).localCheckpoint()
            times.append(time.time() - t0)
        ts = sorted(times[1:])
        sec = ts[len(ts) // 2]
        print(json.dumps({"variant": name, "cores": cores, "sec": round(sec, 2),
                          "gteps": round(nnz / sec / 1e9, 4),
                          "iters": [round(t, 2) for t in times]}), flush=True)
    finally:
        spark.stop()


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    variants = {
        "base":      dict(R=8, C=8, NP=64),
        "nocomp":    dict(R=8, C=8, NP=64, compressed_cache=False, shuffle_compress=False),
        "c4":        dict(R=8, C=4, NP=32, compressed_cache=False, shuffle_compress=False),
        "smj":       dict(R=8, C=8, NP=64, compressed_cache=False, shuffle_compress=False, smj=True),
        "c4np64":    dict(R=16, C=4, NP=64, compressed_cache=False, shuffle_compress=False),
    }
    for name, kw in variants.items():
        if which not in ("all", name):
            continue
        run_variant(name, cores=32, **kw)
