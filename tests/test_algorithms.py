"""Algorithm end-to-end tests vs numpy / pure-python oracles
(the reference's application-level tests, SURVEY.md §5)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from combblas_spark.algorithms import (
    pagerank,
    cc_minlabel,
    cc_fastsv,
    canonical_labels,
    bfs,
    triangle_count,
    label_propagation,
    mcl,
)
from combblas_spark.operators.transform import symmetrize, remove_loops
from combblas_spark.sources.fixtures import (
    sevenvertex,
    chain_star_forest,
    weighted_digraph,
    SEVENVERTEX,
)
from tests.util import (
    edges_to_dense,
    collect_vec,
    union_find_components,
    pagerank_dense,
    bfs_depths,
    triangle_count_dense,
)


def test_pagerank_vs_numpy(spark):
    edges = weighted_digraph(spark, n=256, avg_deg=6, seed=7)
    rows = [(r["src"], r["dst"], r["w"]) for r in edges.collect()]
    n = 256
    a = edges_to_dense(rows, n)
    want = pagerank_dense(a, alpha=0.85, iters=120)
    verts = spark.range(n).select(F.col("id"))
    got = collect_vec(
        pagerank(spark, edges, alpha=0.85, tol=1e-9, max_iter=150, vertices=verts, check_every=5)
    )
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-6)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_cc_small(spark):
    sym = symmetrize(sevenvertex(spark))
    labels = collect_vec(cc_minlabel(spark, sym))
    assert set(labels.values()) == {0}  # sevenvertex is one component
    labels2 = collect_vec(canonical_labels(cc_fastsv(spark, sym)))
    assert labels == labels2


def test_cc_forest_fastsv(spark):
    edges, golden = chain_star_forest(spark)
    sym = symmetrize(edges)
    got = collect_vec(canonical_labels(cc_fastsv(spark, sym)))
    rows = [(r["src"], r["dst"], 1.0) for r in edges.select("src", "dst").collect()]
    verts = set(got.keys())
    want = union_find_components(rows, verts)
    assert got == want
    assert len(set(got.values())) == golden["n_components_with_edges"]


def test_cc_lacc_matches_fastsv(spark):
    from combblas_spark.algorithms import cc_lacc

    for make in (
        lambda: symmetrize(sevenvertex(spark)),
        lambda: symmetrize(chain_star_forest(spark)[0]),
        lambda: symmetrize(weighted_digraph(spark, n=300, avg_deg=2, seed=13)),
    ):
        sym = make()
        want = collect_vec(canonical_labels(cc_fastsv(spark, sym)))
        got = collect_vec(cc_lacc(spark, sym))
        assert got == want


def test_cc_lacc_superstep_count_logarithmic(spark, tmp_path):
    """On a diameter-200 path (min-label would need ~200 supersteps) LACC
    must converge in O(log n) hook/shortcut rounds, like FastSV."""
    from combblas_spark.algorithms import cc_lacc
    from combblas_spark.plans.superstep import SuperstepRunner
    import os

    n = 200
    path = symmetrize(spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(n - 1)], "src long, dst long, w double"
    ))
    runner = SuperstepRunner(spark, checkpoint_dir=str(tmp_path / "lacc"))
    labels = collect_vec(cc_lacc(spark, path, runner=runner))
    assert set(labels.values()) == {0}
    iters = len([d for d in os.listdir(tmp_path / "lacc") if d.startswith("iter=")])
    assert iters <= 14  # ~log2(200) + schedule slack; far below diameter


def test_bfs_sevenvertex(spark):
    res = bfs(spark, sevenvertex(spark), root=2)
    got = {r["id"]: r["depth"] for r in res.collect()}
    want = bfs_depths(SEVENVERTEX, 2)
    assert got == want
    # parents are valid: parent of each non-root is at depth-1 with an edge
    parents = {r["id"]: r["parent"] for r in res.collect()}
    edge_set = {(s, d) for s, d, _ in SEVENVERTEX}
    for v, p in parents.items():
        if v != 2:
            assert (p, v) in edge_set
            assert got[p] == got[v] - 1


def test_triangles(spark):
    edges, golden = chain_star_forest(spark)
    assert triangle_count(edges) == golden["triangles"]
    assert triangle_count(edges, degree_ordered=False) == golden["triangles"]
    rows = [(r["src"], r["dst"], 1.0) for r in edges.collect()]
    # cross-check the golden itself on a small slice: triangles only
    tri_rows = [(s - 40_000, d - 40_000, w) for s, d, w in rows if 40_000 <= s < 50_000]
    assert triangle_count_dense(tri_rows, 150) == 50


def test_label_propagation_cliques(spark):
    # two disjoint 5-cliques -> 2 labels (the clique minima)
    rows = []
    for base in (0, 100):
        for i in range(5):
            for j in range(i + 1, 5):
                rows.append((base + i, base + j, 1.0))
    edges = symmetrize(spark.createDataFrame(rows, "src long, dst long, w double"))
    labels = collect_vec(label_propagation(spark, edges, num_iters=4))
    assert set(labels.values()) == {0, 100}
    assert all(l == (0 if v < 100 else 100) for v, l in labels.items())


def test_mcl_two_cliques(spark):
    # two 4-cliques joined by one weak bridge — MCL must split them
    rows = []
    for base in (0, 10):
        for i in range(4):
            for j in range(i + 1, 4):
                rows.append((base + i, base + j, 1.0))
    rows.append((0, 10, 0.01))
    edges = spark.createDataFrame(rows, "src long, dst long, w double")
    labels = collect_vec(mcl(spark, edges, inflation=2.0, max_iter=30))
    groups = {}
    for v, l in labels.items():
        groups.setdefault(l, set()).add(v)
    assert {frozenset(g) for g in groups.values()} == {
        frozenset({0, 1, 2, 3}),
        frozenset({10, 11, 12, 13}),
    }
