"""spark-submit entrypoint: corpus -> link graph -> PageRank + CC, resumable.

Packaging (north_rule: ships as spark-submit --py-files modules):

    cd /root/repo && zip -r /tmp/combblas_spark.zip combblas_spark
    spark-submit --py-files /tmp/combblas_spark.zip scripts/run_pipeline.py \
        --corpus <parquet-or-iceberg-table-of (repo,path,commit,lang,content)> \
        --out /path/out --checkpoint-dir /path/ckpt [--resume]

On a real cluster the corpus argument is an Iceberg table
(`spark.read.table(...)`); here any parquet path with the same schema works
(`--synth N` generates a deterministic one). Re-running with --resume picks
up PageRank/CC from the latest superstep manifest.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
import pyspark.sql.functions as F


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default=None, help="parquet path or iceberg table")
    ap.add_argument("--synth", type=int, default=0, help="generate N synthetic repos instead")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint-dir", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--pagerank-iters", type=int, default=None)
    ap.add_argument("--dense-ids", action="store_true",
                    help="row_number ids (small corpora); default xxhash64 ids")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("combblas-spark-pipeline").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from combblas_spark.sources.corpus import (
        synth_repo_files,
        build_vertices,
        build_edges_cooccurrence,
        assert_no_id_collisions,
    )
    from combblas_spark.algorithms.pagerank import pagerank
    from combblas_spark.algorithms.cc import cc_fastsv, canonical_labels
    from combblas_spark.plans.superstep import SuperstepRunner

    if args.synth:
        files = synth_repo_files(spark, n_repos=args.synth, files_per_repo=32)
    elif args.corpus and "/" in args.corpus:
        files = spark.read.parquet(args.corpus)
    elif args.corpus:
        files = spark.read.table(args.corpus)
    else:
        raise SystemExit("need --corpus or --synth")

    # vertex/edge build (sha256 per-row invariant preserved on the vertex table)
    verts = build_vertices(files, dense=args.dense_ids)
    if not args.dense_ids:
        assert_no_id_collisions(verts)
    verts.write.mode("overwrite").parquet(f"{args.out}/vertices")
    verts = spark.read.parquet(f"{args.out}/vertices")

    edges = build_edges_cooccurrence(files, verts)
    edges.write.mode("overwrite").parquet(f"{args.out}/edges")
    edges = spark.read.parquet(f"{args.out}/edges")

    ids = verts.select("id")
    if not args.resume:
        import shutil

        shutil.rmtree(args.checkpoint_dir, ignore_errors=True)
    pr_runner = SuperstepRunner(
        spark, checkpoint_dir=f"{args.checkpoint_dir}/pagerank", every=1
    )
    ranks = pagerank(
        spark, edges, num_iters=args.pagerank_iters, vertices=ids, runner=pr_runner
    )
    ranks.write.mode("overwrite").parquet(f"{args.out}/pagerank")

    cc_runner = SuperstepRunner(spark, checkpoint_dir=f"{args.checkpoint_dir}/cc", every=1)
    labels = canonical_labels(cc_fastsv(spark, edges, vertices=ids, runner=cc_runner))
    labels.write.mode("overwrite").parquet(f"{args.out}/components")

    summary = {
        "vertices": verts.count(),
        "edges": edges.count(),
        "components": labels.select("val").distinct().count(),
        "rank_sum": float(ranks.agg(F.sum("val")).collect()[0][0]),
    }
    with open(f"{args.out}/summary.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
