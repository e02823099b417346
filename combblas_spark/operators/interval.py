"""Temporal joins — as-of (latest prior row) and point-in-interval.

The as-of join is the canonical temporal join of event pipelines (and of every tick-data
store): for each left row at time t, the right row with the greatest
timestamp <= t within the same key. The scalable idiom is NOT a join at
all — a join keyed only by user pairs every probe with the whole reference
history. Instead, UNION the two streams tagged by side and take a running
``last(right, ignorenulls=True)`` window per key ordered by (ts, side,
tiebreak): one shuffle on the key, each row visited once, work per task
bounded by the busiest key's row count exactly like sessionization
(functions/sessions.py — same skew note applies: a megakey pre-splits by
coarse time bucket with boundary carry-over).

Engine-portable: DuckDB evaluates the identical
LAST_VALUE(... IGNORE NULLS) running window, so results hash exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def asof_latest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    ts: str,
    tiebreak: str,
    carry: list[str],
) -> DataFrame:
    """For each ``left`` row, the most recent ``right`` row with
    right.ts <= left.ts on the same ``key`` (ties: the right row sorts
    before the probe at equal ts, so an exactly-simultaneous reference
    row IS matched; among simultaneous right rows the largest ``tiebreak``
    wins — all deterministic).

    Returns every left row with ``asof_<c>`` columns appended for each
    ``c`` in ``carry`` (NULL when no prior right row exists). ``left`` and
    ``right`` must both have (key, ts, tiebreak) plus their own columns;
    ``carry`` names right columns.
    """
    lcols = [c for c in left.columns]
    l_tag = left.select(
        *lcols, F.lit(1).alias("_side"), *[F.lit(None).alias(f"_r_{c}") for c in carry]
    )
    r_tag = right.select(
        *[
            F.col(c) if c in (key, ts, tiebreak) else F.lit(None).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in carry],
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts).asc(), F.col("_side").asc(), F.col(tiebreak).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *u.columns,
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in carry
        ],
    )
    return filled.filter(F.col("_side") == 1).select(
        *lcols, *[f"asof_{c}" for c in carry]
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    ts: str,
    start: str,
    end: str,
    bucket: int,
    max_buckets: int = 64,
) -> DataFrame:
    """Point-in-interval join — every (points row, intervals row) pair on
    the same ``key`` with start <= ts <= end (both ends inclusive), the
    other half of the temporal-join family next to :func:`asof_latest`.

    The scalable idiom is the bucketed range join (the same grid trick as
    algorithms/temporal.temporal_wedges, generalized to caller-supplied
    intervals): each interval replicates to the time-grid cells
    floor(start/bucket)..floor(end/bucket) it overlaps, each point lands in
    exactly ONE cell, and the join is a plain EQUI-join on (key, cell)
    followed by the exact range verify — never a per-key cross product
    against the whole interval history, and no pair can match twice
    because the point's single cell meets each interval's replica set at
    most once. Cost = |points| + sum of per-interval cell counts; pick
    ``bucket`` near the typical interval length so that sum stays O(2x
    |intervals|). An interval longer than ``max_buckets`` cells (or with
    end < start) raises AT EXECUTION via raise_error inside the cell
    expression — silent truncation would return wrong answers, and a
    driver-side validation would force an extra action over the table.

    ``points`` and ``intervals`` must share ONLY the ``key`` column name;
    all other columns of both sides are carried through unchanged.
    """
    if bucket <= 0:
        raise ValueError(f"bucket must be > 0, got {bucket}")
    overlap = (set(points.columns) & set(intervals.columns)) - {key}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    b = F.lit(int(bucket)).cast("long")
    c0 = F.floor(F.col(start) / b)
    c1 = F.floor(F.col(end) / b)
    cells = F.when(
        (F.col(end) >= F.col(start)) & (c1 - c0 < int(max_buckets)),
        F.sequence(c0, c1),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"interval_join: interval spans >= {max_buckets} buckets "
                    f"of {bucket} (or end < start) at {key}="
                ),
                F.col(key).cast("string"),
            )
        )
    )
    iv = intervals.withColumn("_cell", F.explode(cells))
    pt = points.withColumn("_cell", F.floor(F.col(ts) / b))
    return (
        pt.join(iv, on=[key, "_cell"])
        .filter((F.col(ts) >= F.col(start)) & (F.col(ts) <= F.col(end)))
        .drop("_cell")
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bucket: int,
    max_buckets: int = 64,
) -> DataFrame:
    """Interval-x-interval overlap join — every (left, right) pair on
    the same ``key`` whose [start, end] windows intersect (inclusive
    ends): the third member of the temporal-join family after
    :func:`asof_latest` and :func:`interval_join`, and the classic
    Spark pain point (a naive theta-join is a per-key cross product).

    Same bucketed grid as :func:`interval_join`, both sides replicated
    to their cell ranges and equi-joined on (key, cell) — but two
    overlapping intervals can share MANY cells, so the join keeps each
    verified pair ONLY at its canonical cell, the cell containing
    GREATEST(l_start, r_start) (the overlap's first instant). That
    makes the output exactly-once by construction — no distinct over
    the pair set, which at scale would be a second full shuffle.
    Over-long (or reversed) intervals raise AT EXECUTION, same
    contract as interval_join. The two inputs must share only ``key``.
    """
    if bucket <= 0:
        raise ValueError(f"bucket must be > 0, got {bucket}")
    overlap_cols = (set(left.columns) & set(right.columns)) - {key}
    if overlap_cols:
        raise ValueError(
            f"non-key column collision: {sorted(overlap_cols)}"
        )
    b = F.lit(int(bucket)).cast("long")

    def cells(start, end):
        c0, c1 = F.floor(F.col(start) / b), F.floor(F.col(end) / b)
        return F.when(
            (F.col(end) >= F.col(start)) & (c1 - c0 < int(max_buckets)),
            F.sequence(c0, c1),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"overlap_join: interval spans >= {max_buckets} "
                        f"buckets of {bucket} (or end < start) at {key}="
                    ),
                    F.col(key).cast("string"),
                )
            )
        )

    lv = left.withColumn("_cell", F.explode(cells(l_start, l_end)))
    rv = right.withColumn("_cell", F.explode(cells(r_start, r_end)))
    j = lv.join(rv, on=[key, "_cell"])
    overlaps = (F.col(l_start) <= F.col(r_end)) & (
        F.col(r_start) <= F.col(l_end)
    )
    canonical = F.col("_cell") == F.floor(
        F.greatest(F.col(l_start), F.col(r_start)) / b
    )
    return j.filter(overlaps & canonical).drop("_cell")
