"""Gap-based sessionization over an event stream.

The classic at-scale clickstream operator: order each user's events by
time, start a new session whenever the gap to the previous event exceeds
``gap_seconds``, then aggregate per session. Pure window + groupBy
Columns — no UDFs.

Scale design: ONE shuffle on user_id; the session-boundary window, the
running session index, and the per-session aggregation all reuse that
partitioning (Catalyst collapses them into a single exchange; the final
groupBy on (user_id, session_id) is a prefix-compatible re-agg). Work per
task is bounded by the busiest single user's event count — sessionization
is order-dependent per user, so user-level skew cannot be salted away
without a session-merge pass; a 10^8-event megauser should be pre-split
by a coarse time bucket upstream (each bucket sessionized independently,
boundary sessions merged) — noted, not needed at contract scale.

Timestamps are compared in integer microseconds (unix_micros /
epoch_us) so the Spark plan and the DuckDB oracle agree bit-for-bit —
no float epoch, no second-truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def sessionize(
    events: DataFrame,
    gap_seconds: int = 21600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Per-session rollup: (user_id, session_id, n_events, start_us,
    end_us, n_types, value_milli).

    session_id is the 1-based session index within the user (stable:
    events are ordered by (ts, event_id)). A session closes when the gap
    to the next event exceeds ``gap_seconds``. value_milli is
    sum(floor(value*1000)) — an EXACT integer total (a double SUM is
    addition-order-dependent across engines, so it can't be
    oracle-hashed even under ROUND).
    """
    # parquet timestamps arrive as TIMESTAMP_NTZ; unix_micros only takes
    # tz-aware TIMESTAMP. timestampdiff from the epoch is tz-free and
    # matches DuckDB's epoch_us(naive) exactly.
    if dict(events.dtypes).get(ts_col) == "timestamp_ntz":
        us = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `{ts_col}`)"
        )
    else:
        us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col), F.col(order_tiebreak))
    gap_us = us - F.lag(us).over(w)
    is_new = (
        F.when(gap_us.isNull() | (gap_us > gap_seconds * 1_000_000), 1)
        .otherwise(0)
        .cast("long")
    )
    tagged = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        us.alias("_us"),
        F.col("event_type"),
        F.col("value"),
        F.sum(is_new).over(w).alias("session_id"),
    )
    return (
        tagged.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("_us").alias("start_us"),
            F.max("_us").alias("end_us"),
            F.countDistinct("event_type").cast("long").alias("n_types"),
            F.sum(F.floor(F.col("value") * 1000).cast("long"))
            .cast("long")
            .alias("value_milli"),
        )
    )


def props_stats(events: DataFrame, path: str = "$.k") -> DataFrame:
    """Typed metadata extraction from a semi-structured JSON column — the
    ubiquitous event-pipeline first step: pull a typed field out of
    ``props`` with the JVM-side JSON path evaluator (get_json_object; no
    Python touches a row), then one map-side-combinable aggregate per
    event_type.

    -> (event_type, n, n_with_field BIGINT, sum_f, min_f, max_f BIGINT,
    nd_f BIGINT). Missing/non-numeric fields become NULL and are counted
    separately, never dropped silently. The 100-TB shape is a single
    partial+final hash aggregate keyed by the low-cardinality event_type —
    no shuffle of the raw payloads, the JSON parse happens inside the scan
    stage.
    """
    f = F.get_json_object(F.col("props"), path).cast("long")
    return (
        events.select(F.col("event_type"), f.alias("_f"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.count("_f").cast("long").alias("n_with_field"),
            F.sum("_f").cast("long").alias("sum_f"),
            F.min("_f").cast("long").alias("min_f"),
            F.max("_f").cast("long").alias("max_f"),
            F.countDistinct("_f").cast("long").alias("nd_f"),
        )
    )
