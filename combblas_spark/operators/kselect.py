"""Per-column top-k selection with recovery — the MCL select step.

Reference:
* Kselect / Kselect1 / Kselect2  /root/reference/include/CombBLAS/SpParMat.cpp:1118-1741
* MCLPruneRecoverySelect         /root/reference/include/CombBLAS/ParFriends.h:185-354

Scale design: a plain Window.partitionBy(dst) puts every nonzero of a hub
column through ONE task. ``kselect`` therefore runs two-phase: a salted
local top-k (bounds any task's group to ~|col|/SALT rows) followed by a
global top-k over at most SALT*k survivors per column. Deterministic
tie-break (w desc, src asc) keeps results reproducible across partitionings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

_SALT = 16


def kselect(edges: DataFrame, k: int, by: str = "dst", two_phase: bool = True) -> DataFrame:
    """Keep the top-k weights per ``by`` group (default: per column/dst)."""
    other = "src" if by == "dst" else "dst"
    order = [F.col("w").desc(), F.col(other).asc()]
    if two_phase:
        salted = edges.withColumn(
            "_salt", F.pmod(F.xxhash64(F.col(other)), F.lit(_SALT))
        )
        w_local = Window.partitionBy(F.col(by), F.col("_salt")).orderBy(*order)
        edges = (
            salted.withColumn("_rn", F.row_number().over(w_local))
            .filter(F.col("_rn") <= k)
            .drop("_salt", "_rn")
        )
    w_glob = Window.partitionBy(F.col(by)).orderBy(*order)
    return (
        edges.withColumn("_rn", F.row_number().over(w_glob))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def prune_recovery_select(
    edges: DataFrame,
    hard_threshold: float,
    select_k: int,
    recover_k: int,
    recover_frac: float = 0.9,
) -> DataFrame:
    """MCLPruneRecoverySelect (ParFriends.h:185-354), DataFrame translation:

    1. hard prune: drop w < hard_threshold,
    2. select: keep top ``select_k`` per column,
    3. recover: columns whose kept mass fell below ``recover_frac`` of their
       pre-prune mass are re-lifted to top ``recover_k`` from the ORIGINAL
       column,
    4. columns emptied entirely are restored to their top-1 entry.
    """
    pre_mass = edges.groupBy(F.col("dst").alias("id")).agg(
        F.sum("w").alias("val")
    )
    pruned = edges.filter(F.col("w") >= hard_threshold)
    selected = kselect(pruned, select_k, by="dst")

    kept_mass = selected.groupBy(F.col("dst").alias("id")).agg(
        F.sum("w").alias("val")
    )
    # columns needing recovery: kept mass below the fraction, or fully empty
    status = (
        pre_mass.withColumnRenamed("val", "pre")
        .join(kept_mass.withColumnRenamed("val", "kept"), on="id", how="left")
        .withColumn("kept", F.coalesce(F.col("kept"), F.lit(0.0)))
        .withColumn("_recover", F.col("kept") < recover_frac * F.col("pre"))
    )
    bad_cols = status.filter(F.col("_recover")).select("id")

    recovered = kselect(
        edges.join(bad_cols, on=edges["dst"] == bad_cols["id"], how="leftsemi"),
        recover_k,
        by="dst",
    )
    good = selected.join(
        bad_cols, on=selected["dst"] == bad_cols["id"], how="left_anti"
    )
    return good.unionByName(recovered)


def exact_percentiles(
    df: DataFrame,
    value_col: str,
    pcts: list[int],
    tiebreak_col: str,
) -> DataFrame:
    """Exact global order statistics — the percentile values of
    ``value_col`` with NO sketch and NO single-task sort.

    -> (pct BIGINT, val) one row per requested integer percentile, where
    val is the element of exact global rank ceil(pct*n/100) (1-based
    inverse-CDF / type-1 quantile; no interpolation, so the output is a
    VALUE THAT EXISTS in the data and hashes bit-for-bit cross-engine).

    Scale design: ranks come from the parallel sample sort
    (operators/indexing._global_ranks — range-partitioned, never one
    task); n joins in as a broadcast 1-row aggregate; the pct->rank map
    is PURE INTEGER math ((pct*n + 99) DIV 100 - 1, engine-exact, no
    float CEIL) and the final lookup is a broadcast semi-join of ~|pcts|
    target ranks against the ranked table. approxQuantile would be one
    pass cheaper but is sketch-dependent and not oracle-replayable.
    """
    from combblas_spark.operators.indexing import _global_ranks

    if not pcts or any(p < 1 or p > 100 for p in pcts):
        raise ValueError(f"pcts must be integers in [1, 100], got {pcts}")
    ranked = _global_ranks(
        df.select(F.col(value_col).alias("_v"), F.col(tiebreak_col).alias("_tb")),
        [F.col("_v").asc(), F.col("_tb").asc()],
    )
    spark = df.sparkSession
    total = ranked.agg(F.count(F.lit(1)).alias("_n"))
    targets = (
        spark.createDataFrame([(int(p),) for p in pcts], "pct long")
        .crossJoin(F.broadcast(total))
        .select(
            "pct",
            F.greatest(
                F.lit(0).cast("long"), F.expr("(pct * _n + 99) DIV 100") - 1
            ).alias("rank"),
        )
    )
    return ranked.join(F.broadcast(targets), "rank").select(
        "pct", F.col("_v").alias("val")
    )


def grouped_percentiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    pcts: list[int],
    tiebreak_col: str,
) -> DataFrame:
    """Exact per-group order statistics — ``exact_percentiles`` within
    every group, still with NO per-group window (a Window.partitionBy
    (group) funnels each group through ONE task; a 100-TB group would
    be a straggler).

    -> (group, pct BIGINT, val) one row per (group, requested pct).

    Scale design: ONE global sample sort ordered (group, value, tiebreak)
    assigns global ranks; each group's rank base and size come from a
    map-side-combinable (min, count) aggregate; per-group target ranks
    are base + (pct*n + 99) DIV 100 - 1 (pure integer math) and the
    lookup is a broadcast join of |groups|*|pcts| targets — group skew
    never concentrates work because ranking is range-partitioned on the
    (group, value) composite, splitting big groups across tasks.
    """
    from combblas_spark.operators.indexing import _global_ranks

    if not pcts or any(p < 1 or p > 100 for p in pcts):
        raise ValueError(f"pcts must be integers in [1, 100], got {pcts}")
    ranked = _global_ranks(
        df.select(
            F.col(group_col).alias("_g"),
            F.col(value_col).alias("_v"),
            F.col(tiebreak_col).alias("_tb"),
        ),
        [F.col("_g").asc(), F.col("_v").asc(), F.col("_tb").asc()],
    )
    spans = ranked.groupBy("_g").agg(
        F.min("rank").alias("_base"), F.count(F.lit(1)).alias("_n")
    )
    pdf = df.sparkSession.createDataFrame([(int(p),) for p in pcts], "pct long")
    targets = spans.crossJoin(F.broadcast(pdf)).select(
        "_g",
        "pct",
        (F.col("_base") + F.expr("(pct * _n + 99) DIV 100") - 1).alias("rank"),
    )
    return ranked.join(F.broadcast(targets), ["rank", "_g"]).select(
        F.col("_g").alias(group_col), "pct", F.col("_v").alias("val")
    )


def robust_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-group robust location/scale — median and MAD (median absolute
    deviation), the outlier-resistant alternative to mean/stddev that
    quality-filtering pipelines cut on (|x - med| > k·MAD).

    -> (group, med, mad) one row per group, both type-1 order statistics
    (values that EXIST in the data — integer inputs stay integers, no
    rounding discipline needed cross-engine).

    Scale design: two ``grouped_percentiles`` passes (each one sample
    sort, no per-group window) — the first finds per-group medians, the
    deviations join the (tiny, broadcast) median table back onto the
    scan, the second finds the per-group deviation medians.
    """
    med = grouped_percentiles(df, group_col, value_col, [50], tiebreak_col).select(
        F.col(group_col), F.col("val").alias("med")
    )
    dev = df.join(F.broadcast(med), group_col).select(
        F.col(group_col),
        F.abs(F.col(value_col) - F.col("med")).alias("_dev"),
        F.col(tiebreak_col),
    )
    mad = grouped_percentiles(dev, group_col, "_dev", [50], tiebreak_col).select(
        F.col(group_col), F.col("val").alias("mad")
    )
    return med.join(mad, group_col)


def robust_outlier_counts(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    z_x10000: int = 51891,
) -> DataFrame:
    """The decision the robust statistics exist FOR: per-group counts
    of MAD-outliers under the classic |x - med| > 3.5 * 1.4826 * MAD
    rule (Iglewicz-Hoaglin), cross-multiplied into exact integers —
    |x - med| * 10000 > z_x10000 * MAD with z_x10000 = 51891 =
    round(3.5 * 1.4826 * 10000) — so the flag needs no doubles and no
    rounding discipline. A zero-MAD group (constant-majority values)
    flags every non-median value, which is the rule's documented
    behavior, not a special case.

    -> (group, n, med, mad, n_outliers), one row per group; the
    robust-stats pass is :func:`robust_stats` (two sample sorts), the
    flagging one broadcast join + one map-side-combinable aggregate.
    """
    rs = robust_stats(df, group_col, value_col, tiebreak_col)
    j = df.join(F.broadcast(rs), group_col)
    flag = (
        F.abs(F.col(value_col) - F.col("med")) * 10000
        > F.lit(int(z_x10000)) * F.col("mad")
    ).cast("long")
    return j.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.max("med").cast("long").alias("med"),
        F.max("mad").cast("long").alias("mad"),
        F.sum(flag).cast("long").alias("n_outliers"),
    )


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-row quantile transform within each group — the feature-
    normalization pass (map every value to its within-group percentile
    rank) with NO per-group window: the same range-partitioned
    composite sample sort as :func:`grouped_percentiles`, so a 100-TB
    group splits across tasks instead of funneling through one.

    -> (group, tiebreak, val, rk, pct): rk is the exact 0-based rank
    within the group (ties broken by tiebreak — a total order, so the
    output is deterministic), pct = rk/(n-1) rounded to 6 (single-row
    groups read 0.0).
    """
    from combblas_spark.operators.indexing import _global_ranks

    ranked = _global_ranks(
        df.select(
            F.col(group_col).alias("_g"),
            F.col(value_col).alias("_v"),
            F.col(tiebreak_col).alias("_tb"),
        ),
        [F.col("_g").asc(), F.col("_v").asc(), F.col("_tb").asc()],
    )
    spans = ranked.groupBy("_g").agg(
        F.min("rank").alias("_base"), F.count(F.lit(1)).alias("_n")
    )
    j = ranked.join(F.broadcast(spans), on="_g")
    rk = (F.col("rank") - F.col("_base")).cast("long")
    return j.select(
        F.col("_g").alias(group_col),
        F.col("_tb").alias(tiebreak_col),
        F.col("_v").alias("val"),
        rk.alias("rk"),
        F.round(
            F.when(
                F.col("_n") > 1,
                rk.cast("double") / (F.col("_n") - 1).cast("double"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("pct"),
    )
