"""Data-quality / audit plane: referential-integrity audit, single-pass
column profiling, key / functional-dependency discovery, and Benford
first-digit forensics.

These are the lakehouse DQ passes a 100-TB ingest pipeline runs before
the graph build (the same extras plane as pii_scan / cdc_apply /
reshard_audit — the reference engine stops at the matrix surface;
cf. /root/reference/include/CombBLAS/SpParMat.h for the ingest
boundary these audits sit in front of). Scale shapes:

* ``fk_audit`` — child rows pre-aggregated onto their key (map-side
  combinable), ONE hash join against the distinct parent-key set, one
  final aggregate. Join cardinality is the KEY space, never the row
  space.
* ``column_profile`` — one scan, one aggregate row (exact distincts go
  through Spark's Expand, k replicas for k audited columns — the
  documented cost of exact profiling), unpivoted with ``stack``.
* ``fd_audit`` — one groupBy on the determinant, one final aggregate.
* ``benford_audit`` — one groupBy(digit) + a broadcast 1-row total;
  expected probabilities are 6-decimal literals so the chi-square
  terms are bit-identical across engines (multiply/subtract/x*x/
  divide only — no POWER, no engine-local log10).

Everything is pure Column expressions — no UDFs, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["fk_audit", "column_profile", "fd_audit", "benford_audit"]


def fk_audit(
    child: DataFrame,
    child_key: str,
    parent: DataFrame,
    parent_key: str,
    rel: str,
) -> DataFrame:
    """Referential-integrity audit of ``child.child_key`` against
    ``parent.parent_key``.

    Returns ONE row ``(rel, n_rows, n_keys, n_orphan_rows,
    n_orphan_keys)`` — exact BIGINT counts of child rows/keys and of
    those whose key has no parent. NULL child keys are counted as
    orphans (a NULL FK cannot reference anything); union rows from
    several calls for a whole-schema audit.
    """
    keys = (
        child.select(F.col(child_key).alias("_k"))
        .groupBy("_k")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    pk = (
        parent.select(F.col(parent_key).alias("_k"))
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    j = keys.join(pk, on="_k", how="left")
    orphan = F.col("_hit").isNull()
    return j.agg(
        F.lit(rel).alias("rel"),
        F.sum("_cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum(F.when(orphan, F.col("_cnt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_orphan_rows"),
        F.sum(F.when(orphan, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_orphan_keys"),
    )


def column_profile(df: DataFrame, cols: list[str]) -> DataFrame:
    """Single-pass exact column profiler.

    One row per audited column: ``(col_name, n, n_null, n_distinct,
    min_s, max_s)``. min/max are computed on the NATIVE type and cast
    to string afterwards (so numeric order, not lexicographic, wins);
    callers should pre-cast doubles to exact integers (cents,
    milli-units) and timestamps to date strings for cross-engine
    stability. n_distinct ignores NULLs (SQL COUNT DISTINCT
    semantics); n_null = n - count(col).
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"_{c}_n"),
            F.count(F.col(c)).cast("long").alias(f"_{c}_nn"),
            F.countDistinct(F.col(c)).cast("long").alias(f"_{c}_nd"),
            F.min(F.col(c)).cast("string").alias(f"_{c}_min"),
            F.max(F.col(c)).cast("string").alias(f"_{c}_max"),
        ]
    row = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', _{c}_n, _{c}_n - _{c}_nn, _{c}_nd, _{c}_min, _{c}_max"
        for c in cols
    )
    return row.selectExpr(
        f"stack({len(cols)}, {parts}) AS "
        "(col_name, n, n_null, n_distinct, min_s, max_s)"
    )


def fd_audit(
    df: DataFrame,
    determinant: list[str],
    dependent: list[str] | None,
    name: str,
) -> DataFrame:
    """Key / functional-dependency audit.

    With ``dependent=None``: is ``determinant`` a candidate KEY?
    Groups by the determinant; a group of size > 1 violates.
    With a dependent list: does ``determinant -> dependent`` hold?
    A group seeing > 1 distinct dependent combination violates.

    Returns ONE row ``(audit, n_groups, n_violations, max_mult,
    holds)`` — exact BIGINTs; ``max_mult`` is the worst group's
    multiplicity (row count for key audits, distinct dependent count
    for FDs), ``holds`` is 1 iff n_violations = 0.

    NON-NULL DEPENDENT CONTRACT: the FD mode counts dependent
    combinations via countDistinct(struct(deps)), which COUNTS
    NULL-containing combinations, while DuckDB's COUNT(DISTINCT col)
    ignores NULLs — the two agree only when every dependent column is
    non-null (true for all audited columns here). Audit nullable
    dependents only after coalescing NULLs to a sentinel on both sides.
    """
    det = [F.col(c) for c in determinant]
    if dependent is None:
        mult = F.count(F.lit(1)).alias("_m")
    else:
        mult = F.countDistinct(
            F.struct(*[F.col(c) for c in dependent])
        ).alias("_m")
    g = df.groupBy(*det).agg(mult)
    return g.agg(
        F.lit(name).alias("audit"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("_m") > 1, F.lit(1)).otherwise(F.lit(0)))
        .cast("long")
        .alias("n_violations"),
        F.max("_m").cast("long").alias("max_mult"),
        F.when(
            F.sum(F.when(F.col("_m") > 1, F.lit(1)).otherwise(F.lit(0))) == 0,
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("holds"),
    )


# log10(1 + 1/d) to 6 decimals, d = 1..9 — fixed literals so both
# engines compute chi-square from the SAME constants (engine log10
# implementations may differ in the last ulp; a 6-decimal literal
# cannot).
BENFORD_P = [
    0.301030,
    0.176091,
    0.124939,
    0.096910,
    0.079181,
    0.066947,
    0.057992,
    0.051153,
    0.045757,
]


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford first-significant-digit audit over a POSITIVE BIGINT
    column (pre-scale doubles to cents/milli-units first).

    Returns 9 rows ``(digit, n, p_expected, chi2_term)`` — the
    observed count per leading digit (zero-filled via a 1..9 spine),
    the 6-decimal Benford literal, and that digit's chi-square
    contribution ``(n_d - p*N)^2 / (p*N)`` rounded to 6 — squared via
    ``x*x`` (never POWER) so the IEEE op sequence is identical on both
    engines. Rows with a non-positive value raise at execution time
    rather than silently mis-bucketing.
    """
    digit = F.substring(F.col(value_col).cast("string"), 1, 1).cast("int")
    guarded = F.when(F.col(value_col) > 0, digit).otherwise(
        F.raise_error(
            F.concat(
                F.lit("benford_audit: non-positive value "),
                F.col(value_col).cast("string"),
            )
        )
    )
    counts = (
        df.select(guarded.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    total = df.agg(F.count(F.lit(1)).cast("long").alias("n_total"))
    spine = total.select(
        F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit"), "n_total"
    )
    p = F.element_at(F.array(*[F.lit(x) for x in BENFORD_P]), F.col("digit"))
    exp = p * F.col("n_total").cast("double")
    dev = F.col("n").cast("double") - exp
    return (
        spine.join(F.broadcast(counts), on="digit", how="left")
        .withColumn("n", F.coalesce(F.col("n"), F.lit(0)).cast("long"))
        .select(
            "digit",
            "n",
            p.alias("p_expected"),
            F.round(dev * dev / exp, 6).alias("chi2_term"),
        )
    )


def pearson_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlation matrix over EXACT-INTEGER columns
    (pre-scale doubles to dollars/percent units so the moment sums
    stay in int64 — the caller owns the overflow envelope:
    n * max|x*y| < 2^63).

    ONE scan, one aggregate row holding every pair's exact moment sums
    (n, s_x, s_y, s_xy, s_xx, s_yy — all BIGINT, in the output so the
    correlation is auditable to the integer), unpivoted with stack; r
    is assembled per pair in one double expression with
    sqrt(a)*sqrt(b) (both factors correctly rounded) so ROUND(.,6) is
    engine-portable — the same recipe as degree_assortativity, applied
    to the table-profiling plane.
    """
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    aggs = [F.count(F.lit(1)).cast("long").alias("_n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).cast("long").alias(f"_s_{c}"))
        aggs.append(
            F.sum(F.col(c) * F.col(c)).cast("long").alias(f"_ss_{c}")
        )
    for a, b in pairs:
        aggs.append(
            F.sum(F.col(a) * F.col(b)).cast("long").alias(f"_sp_{a}_{b}")
        )
    row = df.agg(*aggs)
    parts = ", ".join(
        f"'{a}', '{b}', _n, _s_{a}, _s_{b}, _sp_{a}_{b}, _ss_{a}, _ss_{b}"
        for a, b in pairs
    )
    stacked = row.selectExpr(
        f"stack({len(pairs)}, {parts}) AS "
        "(col_x, col_y, n, s_x, s_y, s_xy, s_xx, s_yy)"
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("s_xy").cast("double") - F.col("s_x").cast(
        "double"
    ) * F.col("s_y").cast("double")
    va = nd * F.col("s_xx").cast("double") - F.col("s_x").cast(
        "double"
    ) * F.col("s_x").cast("double")
    vb = nd * F.col("s_yy").cast("double") - F.col("s_y").cast(
        "double"
    ) * F.col("s_y").cast("double")
    return stacked.select(
        "col_x", "col_y", "n", "s_x", "s_y", "s_xy", "s_xx", "s_yy",
        F.round(num / (F.sqrt(va) * F.sqrt(vb)), 6).alias("r"),
    )


def chi2_independence(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Chi-square independence test between two categorical columns.

    One row per OBSERVED contingency cell: ``(r, c, n, row_tot,
    col_tot, n_total, chi2_term)`` — the four counts are exact BIGINTs
    (so the full contingency table is auditable), and the cell's
    chi-square contribution (n - E)^2 / E with E = row_tot*col_tot/N
    is a single double expression (x*x, no POWER) identical on both
    engines. Sum chi2_term downstream for the statistic; df =
    (R-1)(C-1).

    Scale shape: one groupBy for the cells, two marginal aggregates
    joined back (broadcast-sized: one row per category), one 1-row
    total crossJoin — map-side combinable throughout.
    """
    cells = (
        df.select(F.col(row_col).alias("r"), F.col(col_col).alias("c"))
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    rt = cells.groupBy("r").agg(F.sum("n").cast("long").alias("row_tot"))
    ct = cells.groupBy("c").agg(F.sum("n").cast("long").alias("col_tot"))
    tot = cells.agg(F.sum("n").cast("long").alias("n_total"))
    j = (
        cells.join(F.broadcast(rt), on="r")
        .join(F.broadcast(ct), on="c")
        .crossJoin(F.broadcast(tot))
    )
    e = (
        F.col("row_tot").cast("double")
        * F.col("col_tot").cast("double")
        / F.col("n_total").cast("double")
    )
    dev = F.col("n").cast("double") - e
    return j.select(
        "r", "c", "n", "row_tot", "col_tot", "n_total",
        F.round(dev * dev / e, 6).alias("chi2_term"),
    )
