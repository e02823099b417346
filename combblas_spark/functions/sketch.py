"""KMV (k-minimum-values) distinct-count sketch, engine-portable.

Spark's approx_count_distinct (HLL++) is not replayable in another
engine, so correctness can't be oracle-checked. This KMV sketch is: hash
every value with the md5-60bit hash (functions/dedup.md5_60bit — the same
conv(substr(md5(x),1,15),16,10) expression DuckDB can evaluate), keep the
k smallest distinct hashes per group, and estimate
|distinct| ~= (k-1) * 2^60 / h_(k)   (exact count when fewer than k).
Deterministic by construction — identical on any engine with md5.

Scale design: distinct (group, hash) pairs first (map-side combinable
hash agg), then the kselect two-phase salted top-k pattern
(operators/kselect.py) so a group with 10^9 distinct values never sorts
through one task: a salted local k-min bounds any task's window to
~|group|/SALT rows, then a global k-min over <= SALT*k survivors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from combblas_spark.functions.dedup import md5_60bit

_SALT = 16
_TWO_POW_60 = float(1 << 60)


def kmv_distinct(
    df: DataFrame, group_col: str, value: Column, k: int = 32
) -> DataFrame:
    """(group, n_exact, kmv_est) per group.

    ``value`` is any string-able Column; n_exact is the exact distinct
    count of its md5-60bit hashes (== distinct values up to 60-bit
    collisions, which the oracle replays identically), kmv_est the KMV
    estimate from the k smallest hashes, rounded to 6 decimals.
    """
    d = df.select(
        F.col(group_col).alias(group_col), md5_60bit(value).alias("h")
    ).distinct()
    # two-phase k-min (kselect pattern): bound any single task's sort
    local_w = Window.partitionBy(
        group_col, F.pmod(F.col("h"), F.lit(_SALT))
    ).orderBy(F.col("h").asc())
    survivors = (
        d.withColumn("_rn", F.row_number().over(local_w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    glob_w = Window.partitionBy(group_col).orderBy(F.col("h").asc())
    kmin = (
        survivors.withColumn("_rn", F.row_number().over(glob_w))
        .filter(F.col("_rn") <= k)
    )
    kth = kmin.filter(F.col("_rn") == k).select(
        group_col, F.col("h").alias("h_k")
    )
    exact = d.groupBy(group_col).agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
    return exact.join(kth, group_col, "left").select(
        group_col,
        "n_exact",
        F.round(
            F.when(
                F.col("h_k").isNotNull(),
                (k - 1) * _TWO_POW_60 / F.col("h_k"),
            ).otherwise(F.col("n_exact").cast("double")),
            6,
        ).alias("kmv_est"),
    )


def cms_token_counts(
    docs: DataFrame,
    text_col: str = "text",
    depth: int = 3,
    width: int = 64,
    k: int = 20,
) -> DataFrame:
    """Count-Min-Sketch heavy hitters over the corpus token stream —
    (tok, est BIGINT, exact BIGINT), the k tokens with the largest CMS
    estimate (ties broken by token, deterministic).

    The CMS counter plane is depth x width cells; each occurrence of token
    t increments cell (r, md5_60bit(r||'|'||t) % width) for every row r,
    and est(t) = min over rows of its cell — the classic Cormode-
    Muthukrishnan bound est >= exact with overshoot <= 2m/width at 1-2^-depth
    probability. All counters are exact integers and the hash is the
    md5-60bit engine-portable expression, so the oracle replays the sketch
    bit-for-bit (Spark's own approx streaming aggs are not replayable).

    Scale shape: the token explode feeds ONE map-side-combinable groupBy of
    at most depth*width cells — the sketch table is O(1), broadcast to join
    the per-token estimates; the exact side is one token groupBy. At 100 TB
    the counter build is the same shape as a word count whose output fits
    in a single broadcast block.
    """
    from combblas_spark.functions.text import tokens_col

    toks = docs.select(
        F.explode(tokens_col(F.col(text_col))).alias("tok")
    )
    toks.persist()
    try:
        rows = F.explode(F.array(*[F.lit(r) for r in range(depth)])).alias("r")
        cells = toks.select("tok", rows).select(
            "r",
            F.pmod(
                md5_60bit(
                    F.concat(F.col("r").cast("string"), F.lit("|"), F.col("tok"))
                ),
                F.lit(width),
            ).alias("c"),
        )
        counters = cells.groupBy("r", "c").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        )
        exact = toks.groupBy("tok").agg(
            F.count(F.lit(1)).cast("long").alias("exact")
        )
        probes = exact.select("tok", "exact").withColumn(
            "r", F.explode(F.array(*[F.lit(r) for r in range(depth)]))
        ).withColumn(
            "c",
            F.pmod(
                md5_60bit(
                    F.concat(F.col("r").cast("string"), F.lit("|"), F.col("tok"))
                ),
                F.lit(width),
            ),
        )
        est = (
            probes.join(F.broadcast(counters), on=["r", "c"])
            .groupBy("tok", "exact")
            .agg(F.min("n").alias("est"))
        )
        # two-phase salted top-k (kselect pattern): a 10^9-token vocabulary
        # never sorts through one task — local k per salt bucket first,
        # global k over <= SALT*k survivors
        local_w = Window.partitionBy(
            F.pmod(md5_60bit(F.col("tok")), F.lit(_SALT))
        ).orderBy(F.col("est").desc(), F.col("tok").asc())
        survivors = (
            est.withColumn("_rn", F.row_number().over(local_w))
            .filter(F.col("_rn") <= k)
            .drop("_rn")
        )
        glob_w = Window.orderBy(F.col("est").desc(), F.col("tok").asc())
        return (
            survivors.withColumn("_rn", F.row_number().over(glob_w))
            .filter(F.col("_rn") <= k)
            .select("tok", "est", "exact")
        )
    finally:
        toks.unpersist()
