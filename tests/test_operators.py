"""Operator unit tests vs numpy oracles on the sevenvertex fixture
(the reference's hand-checkable graph, ReleaseTests/sevenvertex.mtx)."""

import numpy as np
import pyspark.sql.functions as F
import pytest

from combblas_spark.core.semiring import PLUS_TIMES, MIN_PLUS, SELECT2ND_MIN
from combblas_spark.operators import (
    spmv,
    spgemm,
    ewise_mult,
    set_difference,
    reduce_dim,
    transpose,
    symmetrize,
    remove_loops,
    dimapply,
    apply_values,
    prune,
    prune_column,
    kselect,
    subsref,
    invert,
    uniq,
    vec_gather,
    vec_assign,
    vec_set,
)
from combblas_spark.sources.fixtures import sevenvertex, SEVENVERTEX
from tests.util import edges_to_dense, collect_edges, collect_vec

N = 7


@pytest.fixture()
def A(spark):
    return sevenvertex(spark)


@pytest.fixture()
def Adense():
    return edges_to_dense(SEVENVERTEX, N)


def make_vec(spark, vals):
    return spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id long, val double"
    )


def test_spmv_plus_times(spark, A, Adense):
    x = np.arange(1, N + 1, dtype=float)
    y = spmv(A, make_vec(spark, x), PLUS_TIMES)
    got = collect_vec(y)
    want = Adense.T @ x  # y[dst] = sum_src A[src,dst] * x[src]
    for d in range(N):
        if want[d] != 0:
            assert got[d] == pytest.approx(want[d])


def test_spmv_reverse(spark, A, Adense):
    x = np.arange(1, N + 1, dtype=float)
    y = spmv(A, make_vec(spark, x), PLUS_TIMES, reverse=True)
    got = collect_vec(y)
    want = Adense @ x
    for s in range(N):
        if want[s] != 0:
            assert got[s] == pytest.approx(want[s])


def test_spmv_min_plus(spark, A, Adense):
    x = np.zeros(N)
    y = spmv(A, make_vec(spark, x), MIN_PLUS)
    got = collect_vec(y)
    for d in range(N):
        col = Adense[:, d][Adense[:, d] != 0]
        if len(col):
            assert got[d] == pytest.approx(col.min())


def test_spmv_sparse_frontier(spark, A, Adense):
    # frontier only contains vertex 2 — select2nd_min broadcasts its id
    frontier = spark.createDataFrame([(2, 2.0)], "id long, val double")
    y = spmv(A, frontier, SELECT2ND_MIN, broadcast_x=True)
    got = collect_vec(y)
    assert got == {0: 2.0, 1: 2.0, 4: 2.0}


def test_spgemm_vs_numpy(spark, A, Adense):
    c = spgemm(A, A, PLUS_TIMES)
    got = edges_to_dense(collect_edges(c), N)
    assert np.allclose(got, Adense @ Adense)


def test_spgemm_phases_metamorphic(spark, A):
    one = edges_to_dense(collect_edges(spgemm(A, A, PLUS_TIMES, phases=1)), N)
    four = edges_to_dense(collect_edges(spgemm(A, A, PLUS_TIMES, phases=4)), N)
    assert np.allclose(one, four)


def test_transpose_symmetrize_loops(spark, A, Adense):
    t = edges_to_dense(collect_edges(transpose(A)), N)
    assert np.allclose(t, Adense.T)
    s = edges_to_dense(collect_edges(symmetrize(A)), N)
    assert np.allclose(s, Adense + Adense.T)
    with_loop = A.unionByName(
        spark.createDataFrame([(1, 1, 9.0)], "src long, dst long, w double")
    )
    nl = edges_to_dense(collect_edges(remove_loops(with_loop)), N)
    assert np.allclose(nl, Adense)


def test_ewise_mask(spark, A, Adense):
    # intersection with transpose
    both = ewise_mult(A, transpose(A))
    got = edges_to_dense(collect_edges(both), N)
    assert np.allclose(got, Adense * Adense.T)
    # exclusion mask (A .* !B)
    only = set_difference(A, transpose(A))
    got2 = edges_to_dense(collect_edges(only), N)
    want = np.where(Adense.T != 0, 0.0, Adense)
    assert np.allclose(got2, want)


def test_reduce_dims(spark, A, Adense):
    rows = collect_vec(reduce_dim(A, "row", F.sum))
    cols = collect_vec(reduce_dim(A, "col", F.max))
    for i in range(N):
        if Adense[i].sum():
            assert rows[i] == pytest.approx(Adense[i].sum())
        col = Adense[:, i]
        if col.max():
            assert cols[i] == pytest.approx(col.max())


def test_dimapply_col_stochastic(spark, A):
    colsum = reduce_dim(A, "col", F.sum)
    st = dimapply(A, colsum, dim="col", binop=lambda w, s: w / s)
    sums = collect_vec(reduce_dim(st, "col", F.sum))
    assert all(abs(v - 1.0) < 1e-12 for v in sums.values())


def test_apply_prune(spark, A, Adense):
    sq = edges_to_dense(collect_edges(apply_values(A, lambda w: w * w)), N)
    assert np.allclose(sq, Adense * Adense)
    big = edges_to_dense(collect_edges(prune(A, F.col("w") < 1.0)), N)
    assert np.allclose(big, np.where(Adense >= 1.0, Adense, 0.0))


def test_prune_column(spark, A, Adense):
    thr = spark.createDataFrame(
        [(i, 1.0) for i in range(N)], "id long, val double"
    )
    kept = edges_to_dense(collect_edges(prune_column(A, thr)), N)
    assert np.allclose(kept, np.where(Adense >= 1.0, Adense, 0.0))


def test_kselect(spark, A, Adense):
    top1 = kselect(A, 1, by="dst")
    got = edges_to_dense(collect_edges(top1), N)
    for d in range(N):
        col = Adense[:, d]
        if col.max():
            assert got[:, d].max() == pytest.approx(col.max())
            assert (got[:, d] != 0).sum() == 1
    # two-phase == single-phase
    a = sorted(collect_edges(kselect(A, 2, two_phase=True)))
    b = sorted(collect_edges(kselect(A, 2, two_phase=False)))
    assert a == b


def test_subsref(spark, A, Adense):
    ri = spark.createDataFrame(
        [(0, 2), (1, 3), (2, 5)], "new_id long, old_id long"
    )
    out = subsref(A, ri, ri)
    got = edges_to_dense(collect_edges(out), 3)
    want = Adense[np.ix_([2, 3, 5], [2, 3, 5])]
    assert np.allclose(got, want)


def test_vector_ops(spark):
    v = spark.createDataFrame(
        [(0, 5.0), (1, 3.0), (2, 5.0), (3, 1.0)], "id long, val double"
    )
    inv = collect_vec(invert(v))
    assert inv == {5.0: 0, 3.0: 1, 1.0: 3}
    u = collect_vec(uniq(v), key="val", val="id")
    assert u == {5.0: 0, 3.0: 1, 1.0: 3}

    idx = spark.createDataFrame([(0, 3), (1, 1)], "id long, val long")
    g = collect_vec(vec_gather(v, idx))
    assert g == {0: 1.0, 1: 3.0}

    upd = spark.createDataFrame(
        [(1, 0.5), (1, 0.2), (9, 9.9)], "id long, val double"
    )
    asg = collect_vec(vec_assign(v, upd))
    assert asg == {0: 5.0, 1: 0.2, 2: 5.0, 3: 1.0}

    st = collect_vec(vec_set(v, spark.createDataFrame([(2, 7.0)], "id long, val double")))
    assert st == {0: 5.0, 1: 3.0, 2: 7.0, 3: 1.0}
