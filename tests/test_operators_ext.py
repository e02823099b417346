"""Extended operator tests: masked reduce, prune variants, ewise_apply,
vector sort/randperm/relabel/concatenate/iota, SSSP, diagnostics."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from combblas_spark.operators import (
    masked_reduce,
    bandwidth,
    profile,
    ewise_apply,
    prune_rc,
    prune_column_by_index,
    vec_sort,
    randperm,
    relabel_edges,
    concatenate,
    iota,
    transpose,
)
from combblas_spark.algorithms.sssp import sssp
from combblas_spark.algorithms.cc import cc_minlabel, canonical_labels
from combblas_spark.operators.transform import symmetrize
from combblas_spark.sources.fixtures import sevenvertex, SEVENVERTEX
from tests.util import edges_to_dense, collect_edges, collect_vec

N = 7


@pytest.fixture()
def A(spark):
    return sevenvertex(spark)


@pytest.fixture()
def Adense():
    return edges_to_dense(SEVENVERTEX, N)


def ids(spark, vals):
    return spark.createDataFrame([(int(v),) for v in vals], "id long")


def test_masked_reduce(spark, A, Adense):
    mask = ids(spark, [0, 2, 4])
    got = collect_vec(masked_reduce(A, mask, dim="col", add=F.sum))
    want = Adense[[0, 2, 4], :].sum(axis=0)
    for d in range(N):
        if want[d]:
            assert got[d] == pytest.approx(want[d])
    got_ex = collect_vec(masked_reduce(A, mask, dim="col", add=F.sum, exclude=True))
    want_ex = Adense[[1, 3, 5, 6], :].sum(axis=0)
    for d in range(N):
        if want_ex[d]:
            assert got_ex[d] == pytest.approx(want_ex[d])


def test_bandwidth_profile(spark, A, Adense):
    assert bandwidth(A) == max(abs(s - d) for s, d, _ in SEVENVERTEX)
    spread = {}
    for s, d, _ in SEVENVERTEX:
        lo, hi = spread.get(s, (d, d))
        spread[s] = (min(lo, d), max(hi, d))
    assert profile(A) == sum(hi - lo for lo, hi in spread.values())


def test_prune_rc(spark, A, Adense):
    ri, ci = ids(spark, [2, 3]), ids(spark, [0, 1])
    both = edges_to_dense(collect_edges(prune_rc(A, ri, ci)), N)
    want = Adense.copy()
    want[np.ix_([2, 3], [0, 1])] = 0
    assert np.allclose(both, want)
    full = edges_to_dense(collect_edges(prune_rc(A, ri, ci, full=True)), N)
    want2 = Adense.copy()
    want2[[2, 3], :] = 0
    want2[:, [0, 1]] = 0
    assert np.allclose(full, want2)
    nocol = edges_to_dense(collect_edges(prune_column_by_index(A, ids(spark, [0, 6]))), N)
    want3 = Adense.copy()
    want3[:, [0, 6]] = 0
    assert np.allclose(nocol, want3)


def test_ewise_apply_union(spark, A, Adense):
    out = ewise_apply(
        A, transpose(A), lambda x, y: x + y,
        allow_a_nulls=True, allow_b_nulls=True,
        a_fill=F.lit(0.0), b_fill=F.lit(0.0),
    )
    got = edges_to_dense(collect_edges(out), N)
    assert np.allclose(got, Adense + Adense.T)
    inter = ewise_apply(A, transpose(A), lambda x, y: x * y)
    got2 = edges_to_dense(collect_edges(inter), N)
    assert np.allclose(got2, np.where((Adense != 0) & (Adense.T != 0), Adense * Adense.T, 0))


def test_vec_sort_randperm_concat_iota(spark):
    v = spark.createDataFrame(
        [(0, 3.0), (1, 1.0), (2, 2.0)], "id long, val double"
    )
    s = vec_sort(v).collect()
    assert [(r["rank"], r["orig_id"]) for r in sorted(s)] == [(0, 1), (1, 2), (2, 0)]

    base = iota(spark, 100)
    p1 = {r["id"]: r["val"] for r in randperm(base, seed=7).collect()}
    p2 = {r["id"]: r["val"] for r in randperm(base.repartition(13), seed=7).collect()}
    assert p1 == p2  # partitioning-independent
    assert sorted(p1.values()) == list(range(100))  # a true permutation
    p3 = {r["id"]: r["val"] for r in randperm(base, seed=8).collect()}
    assert p1 != p3

    c = concatenate([v, v]).collect()
    assert sorted(r["id"] for r in c) == [0, 1, 2, 3, 4, 5]


def test_relabel_preserves_components(spark, A):
    sym = symmetrize(A)
    verts = sym.select(F.col("src").alias("id")).distinct()
    perm = randperm(verts.select("id", F.col("id").alias("val")), seed=3)
    relabeled = relabel_edges(sym, perm)
    labels_orig = collect_vec(canonical_labels(cc_minlabel(spark, sym)))
    labels_new = collect_vec(canonical_labels(cc_minlabel(spark, relabeled)))
    # same number of components, membership consistent under the mapping
    assert len(set(labels_orig.values())) == len(set(labels_new.values())) == 1


def test_sssp_vs_dijkstra(spark, A):
    import heapq

    adj = {}
    for s, d, w in SEVENVERTEX:
        adj.setdefault(s, []).append((d, w))
    dist = {2: 0.0}
    pq = [(0.0, 2)]
    while pq:
        dv, v = heapq.heappop(pq)
        if dv > dist.get(v, float("inf")):
            continue
        for u, w in adj.get(v, []):
            nd = dv + w
            if nd < dist.get(u, float("inf")):
                dist[u] = nd
                heapq.heappush(pq, (nd, u))

    got = collect_vec(sssp(spark, A, source=2))
    assert set(got) == set(dist)
    for k in dist:
        assert got[k] == pytest.approx(dist[k])


def test_incremental_mcl_square_metamorphic(spark):
    """IncrementalMCLSquare (ParFriends.h:844): O^2 + AD + DA + D^2 must
    equal the plain spgemm square when no pruning is applied."""
    from combblas_spark.operators.multiply import incremental_mcl_square, spgemm
    from combblas_spark.core.semiring import PLUS_TIMES

    # sevenvertex + explicit diagonal entries (the incremental-MCL shape)
    diag = [(i, i, 0.5 + 0.1 * i) for i in range(7)]
    a = spark.createDataFrame(SEVENVERTEX + diag, "src long, dst long, w double")
    got = {(r["src"], r["dst"]): r["w"] for r in incremental_mcl_square(a).collect()}
    want = {(r["src"], r["dst"]): r["w"] for r in spgemm(a, a, PLUS_TIMES).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-12)
    # phased variant identical too
    got2 = {(r["src"], r["dst"]): r["w"]
            for r in incremental_mcl_square(a, phases=3).collect()}
    assert set(got2) == set(want)
