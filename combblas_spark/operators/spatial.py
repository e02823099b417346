"""Spatial plane: grid-bucketed radius self-join over integer point
coordinates.

The range-join sibling of the time-grid interval joins
(operators/interval.py) in two dimensions: bucket the plane into
radius-sized cells, explode ONE side to its 3x3 cell neighborhood,
equi-join the other side at its home cell, then verify the exact
integer squared distance on candidates only. |dx| <= r implies the
cell indices differ by at most 1, so the 9-cell neighborhood is a
COMPLETE candidate set — hash equality against a brute-force oracle
proves no pair is lost — and each unordered pair is emitted exactly
once (the probe point's home cell is unique, and id_a < id_b picks one
orientation), so there is no distinct shuffle.

Scale shape: candidates are bounded by local density (never all-pairs
— the plan carries no CartesianProduct), the join is a plain hash join
on (cell_x, cell_y), and a declared per-cell occupancy guard raises at
execution time instead of letting one degenerate hot cell (all points
at one location) go quadratic silently — the same loud-cap stance as
the LSH ``max_bucket`` family. All-integer coordinates make the
distance test engine-portable with no epsilon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["grid_radius_join"]


def grid_radius_join(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
    max_cell: int = 10_000,
) -> DataFrame:
    """All unordered point pairs within ``radius`` (inclusive, d^2 <=
    r^2) as ``(id_a, id_b, d2)`` with id_a < id_b and the exact BIGINT
    squared distance.

    Coordinates must be non-negative integers (raise at execution
    otherwise — negative inputs would silently mis-bucket under DIV);
    a cell holding more than ``max_cell`` points raises rather than
    silently going quadratic.
    """
    r = int(radius)
    if r <= 0:
        raise ValueError(f"radius must be positive, got {radius}")
    checked_x = F.when(
        (F.col(x_col) >= 0) & (F.col(y_col) >= 0), F.col(x_col).cast("long")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("grid_radius_join: negative coordinate at "),
                F.col(id_col).cast("string"),
            )
        )
    )
    pts = points.select(
        F.col(id_col).alias("_id"),
        checked_x.alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
        F.expr(f"CAST({x_col} AS BIGINT) DIV {r}").alias("_cx"),
        F.expr(f"CAST({y_col} AS BIGINT) DIV {r}").alias("_cy"),
    )
    # occupancy guard: join the per-cell count back and raise on a
    # degenerate hot cell — the count aggregate is map-side combinable
    # and the join keys on the cell, so the guard costs one extra
    # shuffle over the (much smaller) cell table.
    occ = pts.groupBy("_cx", "_cy").agg(F.count(F.lit(1)).alias("_occ"))
    home = (
        pts.join(occ, on=["_cx", "_cy"])
        .select(
            F.when(F.col("_occ") <= int(max_cell), F.col("_id"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"grid_radius_join: cell exceeds max_cell="
                            f"{max_cell} at cell "
                        ),
                        F.col("_cx").cast("string"),
                        F.lit(","),
                        F.col("_cy").cast("string"),
                    )
                )
            )
            .alias("_id"),
            "_x",
            "_y",
            "_cx",
            "_cy",
        )
    )
    nbr = pts.select(
        F.col("_id").alias("_id_l"),
        F.col("_x").alias("_xl"),
        F.col("_y").alias("_yl"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("_cx") + F.lit(dx)).alias("_cx"),
                        (F.col("_cy") + F.lit(dy)).alias("_cy"),
                    )
                    for dx in (-1, 0, 1)
                    for dy in (-1, 0, 1)
                ]
            )
        ).alias("_cell"),
    ).select(
        "_id_l", "_xl", "_yl",
        F.col("_cell._cx").alias("_cx"),
        F.col("_cell._cy").alias("_cy"),
    )
    d2 = (F.col("_xl") - F.col("_x")) * (F.col("_xl") - F.col("_x")) + (
        F.col("_yl") - F.col("_y")
    ) * (F.col("_yl") - F.col("_y"))
    return (
        nbr.join(home, on=["_cx", "_cy"])
        .filter(F.col("_id_l") < F.col("_id"))
        .filter(d2 <= F.lit(r * r))
        .select(
            F.col("_id_l").alias("id_a"),
            F.col("_id").alias("id_b"),
            d2.cast("long").alias("d2"),
        )
    )
