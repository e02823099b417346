"""Change-data-capture merge — apply an upsert/delete log to a
snapshot without a table format.

The lakehouse MERGE INTO is, physically, exactly this plan: union the
snapshot (as version-0 upserts) with the change log, keep the
highest-version row per key, drop keys whose winner is a delete. One
shuffle on the key, one bounded per-key window (rows per key = 1 +
that key's churn — the standard CDC compaction shape; a pathologically
hot key pre-splits by version range like any other mega-key). The
repo's bucketed tables (sources/bucketed.py) remove even that shuffle
when snapshot and log share the bucket layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def cdc_apply(
    snapshot: DataFrame,
    changes: DataFrame,
    key_col: str = "key",
    version_col: str = "version",
    op_col: str = "op",
) -> DataFrame:
    """Return the post-merge state: ``snapshot`` rows overridden by the
    highest-version change per key; a winning ``'d'`` removes the key,
    a later ``'u'`` resurrects it. ``changes`` carries (key, version
    >= 1, op in 'u'/'d', payload columns matching the snapshot's
    non-key columns — ignored for deletes). An op outside {'u','d'} or
    a version < 1 raises AT EXECUTION (a silently-dropped malformed
    change is a corrupted table). (key, version) pairs must be unique
    (the CDC source's own contract); ties would make the winner
    undefined, so the order adds op as a deterministic tiebreak and
    documents the assumption rather than hiding it.

    Output: snapshot schema + ``last_version`` (0 for untouched rows).
    """
    payload = [c for c in snapshot.columns if c != key_col]
    opchk = F.when(
        F.col(op_col).isin("u", "d") & (F.col(version_col) >= 1),
        F.col(op_col),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("cdc_apply: malformed change (op/version) at key "),
                F.col(key_col).cast("string"),
            )
        )
    )
    ch = changes.select(
        F.col(key_col).alias("key"),
        F.col(version_col).cast("long").alias("_v"),
        opchk.alias("_op"),
        *[F.col(c) for c in payload],
    )
    snap = snapshot.select(
        F.col(key_col).alias("key"),
        F.lit(0).cast("long").alias("_v"),
        F.lit("u").alias("_op"),
        *[F.col(c) for c in payload],
    )
    u = snap.unionByName(ch)
    w = Window.partitionBy("key").orderBy(
        F.col("_v").desc(), F.col("_op").asc()
    )
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("_op") == "u"))
        .select(
            F.col("key").alias(key_col),
            *payload,
            F.col("_v").alias("last_version"),
        )
    )


def scd2_compress(
    df: DataFrame, key_col: str, ts_col: str, value_col: str
) -> DataFrame:
    """Slowly-changing-dimension type-2 interval builder from a
    versioned change log — the history-table sibling of
    :func:`cdc_apply` (which answers "latest state"; this answers
    "state at any time").

    Consecutive versions with an UNCHANGED value are compressed away
    (a lag window keeps only change points), then each survivor's
    validity closes at the NEXT change (lead window):
    ``(key, value, valid_from, valid_to, is_current)`` with open
    intervals carrying NULL valid_to and is_current = 1. Two windows,
    both partitioned by key and bounded by that key's version count —
    no global ordering, no joins. Duplicate (key, ts) rows make the
    version order undefined and raise AT EXECUTION rather than
    producing an arbitrary history.

    NON-NULL VALUE CONTRACT: a transition TO a NULL value does not open
    an interval — ``_prev != _v`` evaluates to NULL when the new value
    is NULL and the change row is filtered, so an X -> NULL -> X log
    compresses to one X interval. This matches the oracle's semantics
    exactly (parity holds); callers whose NULLs are meaningful states
    should encode them as a sentinel value (or switch both engines to a
    null-safe inequality together — one side alone breaks parity).
    """
    wo = Window.partitionBy(key_col).orderBy(ts_col)
    wd = Window.partitionBy(key_col, ts_col)
    guarded = df.withColumn("_nv", F.count(F.lit(1)).over(wd)).withColumn(
        "_v",
        F.when(F.col("_nv") == 1, F.col(value_col)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("scd2_compress: duplicate (key, ts) at "),
                    F.col(key_col).cast("string"),
                )
            )
        ),
    )
    changes = guarded.withColumn("_prev", F.lag("_v").over(wo)).filter(
        F.col("_prev").isNull() | (F.col("_prev") != F.col("_v"))
    )
    out = changes.withColumn("_to", F.lead(F.col(ts_col)).over(wo))
    return out.select(
        F.col(key_col).alias("key"),
        F.col("_v").alias("value"),
        F.col(ts_col).alias("valid_from"),
        F.col("_to").alias("valid_to"),
        F.when(F.col("_to").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("is_current"),
    )
