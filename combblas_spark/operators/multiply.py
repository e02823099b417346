"""The multiply family: SpMV and SpGEMM as join + groupBy-aggregate.

Reference semantics:
* SpMV driver  /root/reference/include/CombBLAS/ParFriends.h:2179-2336
  (TransposeVector -> AllGatherVector -> LocalSpMV -> Alltoallv -> Merge).
  The AllGather/Alltoallv pair IS Spark's shuffle; the multiway merge of
  contributions (MergeContributions, ParFriends.h:2011) IS Spark's
  partial+final hash aggregation.
* SpGEMM (Sparse SUMMA) /root/reference/include/CombBLAS/ParFriends.h:1447-1560.
  The sqrt(p)-stage broadcast schedule is replaced by a shuffle hash join;
  AQE picks broadcast vs shuffle exactly like the reference's adaptive
  gather (/root/reference/Applications/CC.h:367-375) but at runtime stats.

Conventions:
* edge table  E(src: long, dst: long, w: numeric) — one row per nonzero
  A[src, dst]; messages flow src -> dst.
* vector      x(id: long, val: numeric).

Scale notes (100 TB / 1000 executors):
* the vector side of SpMV is usually << edges; AQE auto-broadcasts it when
  under the threshold, otherwise both sides hash-partition on the join key.
* output partitioning: result of spmv is partitioned by the groupBy key
  (dst), which is exactly the key the *next* iteration joins on when the
  vector is re-joined to edges — no extra repartition needed between
  supersteps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from combblas_spark.core.semiring import Semiring, PLUS_TIMES


def spmv(
    edges: DataFrame,
    x: DataFrame,
    sr: Semiring = PLUS_TIMES,
    reverse: bool = False,
    broadcast_x: bool | None = None,
) -> DataFrame:
    """y = A^T x over semiring ``sr``: y[dst] = add_{(s,d) in E} mult(w, x[s]).

    With ``reverse=True`` messages flow dst -> src (i.e. y = A x).
    ``x`` may be sparse (frontier — only active ids present): absent ids
    contribute nothing, mirroring FullyDistSpVec SpMV
    (/root/reference/include/CombBLAS/ParFriends.h:2179).

    ``broadcast_x=True`` forces a broadcast join (frontier known small);
    anything else (None/False) leaves the choice to Catalyst/AQE — there is
    deliberately no force-shuffle mode, AQE's runtime sizes beat a static
    veto.
    """
    join_key, out_key = ("src", "dst") if not reverse else ("dst", "src")
    xr = x.select(F.col("id"), F.col("val"))
    if broadcast_x is True:
        xr = F.broadcast(xr)
    j = edges.join(xr, on=edges[join_key] == xr["id"], how="inner")
    # weightless layouts (select2nd-style semirings never read w) may drop
    # the column from the cached edge table — same contract as spmv_grid
    w = edges["w"] if "w" in edges.columns else F.lit(1.0)
    contrib = sr.mult(w, xr["val"])
    return (
        j.groupBy(edges[out_key].alias("id"))
        .agg(sr.add(contrib).alias("val"))
    )


def spmm(
    edges: DataFrame,
    x: DataFrame,
    sr: Semiring = PLUS_TIMES,
    reverse: bool = False,
    broadcast_x: bool | None = None,
) -> DataFrame:
    """Y = A^T X for a k-column dense block X(id, <k value columns>) —
    the multi-vector SpMV (SpMM). Every column of ``x`` other than ``id``
    is treated as one dense vector; the result carries the same columns.

    Reference semantics: batched fringe expansion in Brandes betweenness,
    /root/reference/Applications/BetwCent.cpp:185 (fringe =
    PSpGEMM(AT, fringe) with a |V| x batchsize fringe), and the SpMM
    driver /root/reference/Applications/SpMMError.cpp.

    Scale shape: ONE join + ONE shuffle amortized over all k vectors —
    the whole point of SpMM vs k SpMV passes; the k sums ride the same
    partial/final hash aggregation (map-side combine per column).
    """
    join_key, out_key = ("src", "dst") if not reverse else ("dst", "src")
    val_cols = [c for c in x.columns if c != "id"]
    if not val_cols:
        raise ValueError("spmm needs at least one value column besides id")
    xr = x
    if broadcast_x is True:
        xr = F.broadcast(xr)
    j = edges.join(xr, on=edges[join_key] == xr["id"], how="inner")
    return j.groupBy(edges[out_key].alias("id")).agg(
        *[sr.add(sr.mult(edges["w"], xr[c])).alias(c) for c in val_cols]
    )


def kron(
    a: DataFrame,
    b: DataFrame,
    b_rows: int,
    b_cols: int,
    sr: Semiring = PLUS_TIMES,
) -> DataFrame:
    """Kronecker product C = A (x) B over semiring ``sr``:
    C[sa*b_rows + sb, da*b_cols + db] = mult(w_a, w_b).

    Reference semantics: the Graph500 R-MAT generator IS an iterated
    Kronecker product of a 2x2 initiator
    (/root/reference/include/CombBLAS/RefGen21.h:80 cites the stochastic
    Kronecker-graph construction); this is the explicit one-step operator.

    Scale shape: a pure cross join of two nonzero lists — nnz(C) =
    nnz(A) * nnz(B), no aggregation, embarrassingly parallel. Keep one
    operand small (the generator pattern: a bounded initiator replicated
    across the big operand); Spark broadcasts the small side
    (BroadcastNestedLoopJoin) so the big side never moves.
    """
    aa = a.select(
        F.col("src").alias("a_src"), F.col("dst").alias("a_dst"),
        F.col("w").alias("a_w"),
    )
    bb = b.select(
        F.col("src").alias("b_src"), F.col("dst").alias("b_dst"),
        F.col("w").alias("b_w"),
    )
    return aa.crossJoin(bb).select(
        (F.col("a_src") * b_rows + F.col("b_src")).alias("src"),
        (F.col("a_dst") * b_cols + F.col("b_dst")).alias("dst"),
        sr.mult(F.col("a_w"), F.col("b_w")).alias("w"),
    )


def spgemm(
    a: DataFrame,
    b: DataFrame,
    sr: Semiring = PLUS_TIMES,
    phases: int = 1,
) -> DataFrame:
    """C = A *_sr B: join A.dst == B.src, group by (A.src, B.dst).

    ``phases > 1`` mirrors MemEfficientSpGEMM's column-phased execution
    (/root/reference/include/CombBLAS/ParFriends.h:452-777): B is sliced
    into ``phases`` dst-hash buckets, each multiplied separately and
    unioned. On Spark this bounds the peak shuffle footprint of a single
    stage; with AQE + spill it is rarely needed, but it is semantically
    identical (metamorphic test: 1-phase == k-phase).
    """
    aa = a.select(F.col("src").alias("a_src"), F.col("dst").alias("a_dst"), F.col("w").alias("a_w"))
    bb = b.select(F.col("src").alias("b_src"), F.col("dst").alias("b_dst"), F.col("w").alias("b_w"))

    def one(bpart: DataFrame) -> DataFrame:
        j = aa.join(bpart, on=aa["a_dst"] == bpart["b_src"], how="inner")
        return (
            j.groupBy(F.col("a_src").alias("src"), F.col("b_dst").alias("dst"))
            .agg(sr.add(sr.mult(F.col("a_w"), F.col("b_w"))).alias("w"))
        )

    if phases <= 1:
        return one(bb)
    parts = [
        one(bb.filter(F.pmod(F.xxhash64(F.col("b_dst")), F.lit(phases)) == F.lit(k)))
        for k in range(phases)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # phases partition B by dst hash => output (src,dst) groups are disjoint
    # across phases; no re-aggregation needed.
    return out


def galerkin(
    r: DataFrame, a: DataFrame, sr: Semiring = PLUS_TIMES, phases: int = 1
) -> DataFrame:
    """Galerkin triple product R * A * R^T — the multigrid restriction
    operator (/root/reference/ReleaseTests/GalerkinNew.cpp:105-106 computes
    AT = PSpGEMM(A, T) then SAT = PSpGEMM(S, AT) with T = transpose of the
    restriction; 3DSpGEMM/RestrictionOp.cpp builds R itself).

    ``r`` maps fine vertices to coarse ones: r(src=coarse id, dst=fine id,
    w=interpolation weight); the result is the coarse-grid operator
    (src=coarse, dst=coarse). Associates right-to-left like the reference —
    A*R^T first (|V_fine| x |V_coarse|, the thin side), then R*(A*R^T).
    """
    from combblas_spark.operators.transform import transpose

    art = spgemm(a, transpose(r), sr, phases=phases)
    return spgemm(r, art, sr, phases=phases)


def square(a: DataFrame, sr: Semiring = PLUS_TIMES, phases: int = 1) -> DataFrame:
    """A <- A^2 (reference SpParMat::Square, SpParMat.cpp:3469)."""
    return spgemm(a, a, sr, phases=phases)


def incremental_mcl_square(
    a: DataFrame, phases: int = 1, hard_threshold: float = 0.0
) -> DataFrame:
    """A^2 with the diagonal split out (IncrementalMCLSquare,
    /root/reference/include/CombBLAS/ParFriends.h:844-940): with A = O + D
    (off-diagonal + diagonal),

        A^2 = O^2 + O.DimApply(col, diag) + O.DimApply(row, diag) + D^2

    so only the off-diagonal block pays the SpGEMM; the three diagonal terms
    are linear-cost column/row scalings — the point of the incremental-MCL
    pipeline where D carries the previous clustering's self-affinity.
    ``hard_threshold`` prunes the scaled terms like the reference's 1e-8
    Prune; 0.0 keeps exact-equality with spgemm(a, a) (metamorphic test).
    """
    diag_e = a.filter(F.col("src") == F.col("dst"))
    off = a.filter(F.col("src") != F.col("dst"))
    diag = diag_e.select(F.col("dst").alias("id"), F.col("w").alias("val"))
    from combblas_spark.operators.transform import dimapply

    ad = dimapply(off, diag, dim="col")   # (O*D)[i,j] = O[i,j] * diag[j]
    da = dimapply(off, diag, dim="row")   # (D*O)[i,j] = diag[i] * O[i,j]
    if hard_threshold > 0.0:
        ad = ad.filter(F.col("w") > hard_threshold)
        da = da.filter(F.col("w") > hard_threshold)
    d2 = diag_e.select("src", "dst", (F.col("w") * F.col("w")).alias("w"))
    o2 = spgemm(off, off, PLUS_TIMES, phases=phases)
    return (
        o2.unionByName(ad).unionByName(da).unionByName(d2)
        .groupBy("src", "dst")
        .agg(F.sum("w").alias("w"))
    )
