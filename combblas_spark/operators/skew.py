"""Salted skew join — the hot-key mitigation every 100-TB join plan
eventually needs.

A shuffle hash/sort-merge join sends every row of a key to ONE reduce
task; a power-law fact table (web hosts, mega-suppliers, null-ish
defaults) therefore funnels its hottest key into a single straggler
task that dominates the stage. AQE's skew-join split handles many
cases at runtime; the explicit salt is the deterministic, plannable
variant (and works where AQE can't see the skew, e.g. under a single
post-shuffle aggregation): replicate the SMALL side n_salt times, salt
the fact side by a hash of a row-unique column, and equi-join on
(key, salt) — the hot key now spreads over n_salt tasks, at the cost
of an n_salt-times-replicated small side (still far below the fact).

The reference's 2D SpGEMM distribution solves the same problem for
matrix multiply by construction (every CombBLAS grid row shares a
matrix block); this is the relational-plane equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def skew_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_col: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``fact`` to ``dim`` on ``key`` with an ``n_salt``-way salt.

    ``salt_col`` names a fact column whose values spread rows (any
    row-unique or near-unique id); the salt is xxhash64-derived so the
    RESULT is identical to the plain join for any salt (the salt only
    routes rows), which is exactly what the contract oracle checks.
    ``dim`` is replicated n_salt times via one array explode — keep
    n_salt * |dim| far below |fact| (the usual regime: a few hundred
    MB dim, thousand-way fact skew). Only 'inner' and 'left' joins are
    meaningful here ('right'/'outer' would duplicate unmatched dim
    rows across salts) — anything else raises.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner/left, got {how!r}")
    if n_salt < 1:
        raise ValueError(f"n_salt must be >= 1, got {n_salt}")
    overlap = (set(fact.columns) & set(dim.columns)) - {key}
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    f_s = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(int(n_salt)))
    )
    d_s = dim.withColumn(
        "_salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(int(n_salt) - 1))),
    )
    return f_s.join(d_s, on=[key, "_salt"], how=how).drop("_salt")


def key_skew_audit(
    df: DataFrame,
    key_col: str,
    pcts: tuple[int, ...] = (50, 99),
    top_k: int = 5,
) -> DataFrame:
    """Join-key skew report — the pre-flight check before committing a
    partitioning or join strategy (the measurement companion of
    :func:`skew_join`, which is the mitigation).

    Rows ``(stat, key, value)``: per-key multiplicities feed
    ``top<i>`` rows (the heaviest keys, TakeOrderedAndProject),
    ``p<pct>`` exact multiplicity order statistics (sample-sort ranks,
    no single-task sort), and ``n_rows`` / ``n_keys`` / ``max_mult``
    summary counts. All BIGINT; ``key`` is NULL on non-top rows.

    Scale shape: one map-side-combinable count per key, then
    everything downstream operates on the KEY-cardinality table.
    """
    from combblas_spark.operators.kselect import exact_percentiles

    counts = (
        df.select(F.col(key_col).alias("_k"))
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    top = (
        counts.orderBy(F.col("_n").desc(), F.col("_k").asc())
        .limit(int(top_k))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.orderBy(F.col("_n").desc(), F.col("_k").asc())
            ),
        )
        .select(
            F.concat(F.lit("top"), F.col("_rk").cast("string")).alias("stat"),
            F.col("_k").cast("long").alias("key"),
            F.col("_n").cast("long").alias("value"),
        )
    )
    pct = exact_percentiles(
        counts, "_n", list(pcts), "_k"
    ).select(
        F.concat(F.lit("p"), F.col("pct").cast("string")).alias("stat"),
        F.lit(None).cast("long").alias("key"),
        F.col("val").cast("long").alias("value"),
    )
    summary = counts.agg(
        F.sum("_n").cast("long").alias("_rows"),
        F.count(F.lit(1)).cast("long").alias("_keys"),
        F.max("_n").cast("long").alias("_max"),
    )
    srows = summary.selectExpr(
        "stack(3, 'n_rows', CAST(NULL AS BIGINT), _rows, "
        "'n_keys', CAST(NULL AS BIGINT), _keys, "
        "'max_mult', CAST(NULL AS BIGINT), _max) AS (stat, key, value)"
    )
    return top.unionByName(pct).unionByName(srows)
