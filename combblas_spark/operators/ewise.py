"""Elementwise / masking operators — inner, anti and outer joins.

Reference:
* EWiseMult(A, B, exclude)  /root/reference/include/CombBLAS/SpParMat.h:385,
  local kernels Friends.h:843-898 (exclude=true = A .* !B) and :1020-1044.
  exclude=True is the structural MASK used by triangle counting (L*L .* L).
* SetDifference  /root/reference/include/CombBLAS/ParFriends.h:2612-2627.
* EWiseApply on vectors  ParFriends.h:2699-3170.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def ewise_mult(
    a: DataFrame,
    b: DataFrame,
    mult: Callable[[Column, Column], Column] = lambda x, y: x * y,
    exclude: bool = False,
) -> DataFrame:
    """Hadamard product on intersecting support; ``exclude=True`` -> A .* !B
    (keep entries of A *not* present in B — a structural anti-mask)."""
    if exclude:
        return a.join(b.select("src", "dst"), on=["src", "dst"], how="left_anti")
    bb = b.select("src", "dst", F.col("w").alias("w_b"))
    return (
        a.join(bb, on=["src", "dst"], how="inner")
        .select("src", "dst", mult(F.col("w"), F.col("w_b")).alias("w"))
    )


def ewise_apply(
    a: DataFrame,
    b: DataFrame,
    binop: Callable[[Column, Column], Column],
    allow_a_nulls: bool = False,
    allow_b_nulls: bool = False,
    a_fill: Optional[Column] = None,
    b_fill: Optional[Column] = None,
) -> DataFrame:
    """Generalized elementwise matrix combine with union/intersection-of-
    supports semantics (ParFriends.h:2649-2697 EWiseApply): entries present
    in only one operand survive iff the other side allows nulls, filled
    with ``*_fill`` before ``binop``."""
    aa = a.select("src", "dst", F.col("w").alias("w_a"))
    bb = b.select("src", "dst", F.col("w").alias("w_b"))
    if allow_a_nulls and allow_b_nulls:
        how = "full"
    elif allow_a_nulls:
        how = "right"
    elif allow_b_nulls:
        how = "left"
    else:
        how = "inner"
    j = aa.join(bb, on=["src", "dst"], how=how)
    va = F.coalesce(F.col("w_a"), a_fill) if a_fill is not None else F.col("w_a")
    vb = F.coalesce(F.col("w_b"), b_fill) if b_fill is not None else F.col("w_b")
    return j.select("src", "dst", binop(va, vb).alias("w"))


def set_difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """A \\ B on support (ParFriends.h:2612)."""
    return a.join(b.select("src", "dst"), on=["src", "dst"], how="left_anti")


def ewise_apply_vec(
    x: DataFrame,
    y: DataFrame,
    binop: Callable[[Column, Column], Column],
    how: str = "inner",
    x_fill: Optional[Column] = None,
    y_fill: Optional[Column] = None,
    broadcast_y: bool = False,
) -> DataFrame:
    """Zip two vectors on id with union/intersection-of-support semantics
    (ParFriends.h:3035-3170). ``how`` in {inner, full, left}: null sides are
    filled with ``*_fill`` before ``binop``. ``broadcast_y`` hints the y
    side (use when y is a freshly-aggregated frontier whose stats Catalyst
    cannot see — avoids a sort-merge join that re-shuffles x)."""
    xx = x.select("id", F.col("val").alias("val_x"))
    yy = y.select("id", F.col("val").alias("val_y"))
    if broadcast_y:
        yy = F.broadcast(yy)
    j = xx.join(yy, on="id", how=how)
    vx = F.coalesce(F.col("val_x"), x_fill) if x_fill is not None else F.col("val_x")
    vy = F.coalesce(F.col("val_y"), y_fill) if y_fill is not None else F.col("val_y")
    return j.select("id", binop(vx, vy).alias("val"))
