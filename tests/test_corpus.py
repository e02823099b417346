"""Corpus ingestion tests — the sha256 per-row invariant and the
vertex/edge build (ReadGeneralizedTuples analog)."""

import hashlib

import pyspark.sql.functions as F

from combblas_spark.algorithms.cc import cc_fastsv, canonical_labels
from combblas_spark.sources.corpus import (
    synth_repo_files,
    build_vertices,
    build_edges_cooccurrence,
    assert_no_id_collisions,
)
from tests.util import collect_vec


def test_sha256_per_row_invariant(spark):
    files = synth_repo_files(spark, n_repos=4, files_per_repo=8)
    rows = files.collect()
    verts = build_vertices(files, dense=True)
    got = {r["key"]: r["sha"] for r in verts.collect()}
    for r in rows:
        key = f"{r['repo']}/{r['path']}"
        assert got[key] == hashlib.sha256(r["content"].encode()).hexdigest()


def test_dense_ids_contiguous(spark):
    files = synth_repo_files(spark, n_repos=4, files_per_repo=8)
    verts = build_vertices(files, dense=True)
    ids = sorted(r["id"] for r in verts.collect())
    assert ids == list(range(32))


def test_hash_ids_no_collision(spark):
    files = synth_repo_files(spark, n_repos=8, files_per_repo=16)
    verts = build_vertices(files, dense=False)
    assert_no_id_collisions(verts)
    assert verts.count() == 128


def test_cooccurrence_components_equal_repos(spark):
    # small repos -> cliques; force the hub/star path with a low threshold
    files = synth_repo_files(spark, n_repos=4, files_per_repo=8)
    verts = build_vertices(files, dense=True)
    for all_pairs_max in (64, 3):  # clique path and hub-star path
        edges = build_edges_cooccurrence(files, verts, hub_split=2, all_pairs_max=all_pairs_max)
        labels = collect_vec(canonical_labels(cc_fastsv(spark, edges)))
        assert len(set(labels.values())) == 4  # one component per repo
    # hub-star path must not create all-pairs edges for big repos
    star_edges = build_edges_cooccurrence(files, verts, hub_split=2, all_pairs_max=3)
    assert star_edges.count() < edges.count() * 4
