"""As-of join — attach the latest prior reference row to each probe row.

The canonical temporal join of event pipelines (and of every tick-data
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
