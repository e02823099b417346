"""Redirect-chain resolution: pointer doubling over a functional graph.

The canonical-URL pass every web link graph runs before anything else:
HTTP redirects form a functional graph (each redirecting URL has exactly
one target), and every edge of the crawl must be rewritten onto the
CHAIN-FINAL destination. The reference's pointer-jumping machinery
(CC.h:1331-1341 Shortcut / ParentAB hooks) is exactly this operation on
the parent vector; here it is a first-class operator over an explicit
redirect table.

Algorithm: pointer doubling (Wyllie / shortcutting). Start from
f(u) = direct target, hops(u) = 1. Each round substitutes
f(u) <- f(f(u)) and hops(u) <- hops(u) + hops(f(u)) wherever f(u) is
itself a redirect source, so the pointer advances min(2^k, depth) hops
after k rounds; ceil(log2(max chain depth)) rounds resolve everything.
Web redirect chains are short (browsers cap them at ~20), so the default
8 doublings covers depth 256 with margin.

Scale shape: one self equi-join per round on the mapping's own key
(id-keyed hash join, both sides identically partitioned — AQE plans a
co-partitioned exchange once and reuses it), lineage truncated per round
via SuperstepRunner. No windows, no broadcast requirement, no driver
loop over rows: 10^9 redirect rows is 30 rounds of a 10^9 x 10^9
self-join at depth 10^9 (degenerate), 8 rounds for anything real.

Cycles (redirect loops) never reach a terminal: after the doubling
rounds their `final` still lands on a redirect source. They are detected
with ONE anti-join at the end and surfaced via `resolved = false`
(validate='mark', default) or an exception (validate='raise') — never
silently reported as resolved, per the repo's truncation-warning
discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.plans.superstep import SuperstepRunner


def resolve_redirects(
    spark: SparkSession,
    redirects: DataFrame,
    max_doublings: int = 8,
    validate: str = "mark",
) -> DataFrame:
    """Resolve every redirect source to its chain-final destination.

    Parameters
    ----------
    redirects : DataFrame(src, dst)
        Functional graph: one outgoing edge per src (duplicate (src, dst)
        rows collapse; two DIFFERENT targets for one src raise).
    max_doublings : int
        Pointer-doubling rounds; resolves chains up to depth
        2 ** max_doublings.
    validate : 'mark' | 'raise'
        Leftover unresolved rows (cycles, or chains deeper than the
        doubling budget) are marked resolved=false, or raise.

    Returns DataFrame(src, final, hops, resolved) — one row per redirect
    source; hops = number of redirect edges followed when resolved.
    """
    if max_doublings < 1:
        raise ValueError(f"max_doublings must be >= 1, got {max_doublings}")
    if validate not in ("mark", "raise"):
        raise ValueError(f"validate must be 'mark' or 'raise', got {validate!r}")

    f = redirects.select(
        F.col("src").cast("bigint").alias("id"),
        F.col("dst").cast("bigint").alias("nxt"),
    ).distinct()
    # functional-graph contract: exactly one target per source
    bad = (
        f.groupBy("id").count().filter(F.col("count") > 1).limit(1).count()
    )
    if bad:
        raise ValueError("redirects is not functional: a src has two targets")

    runner = SuperstepRunner(spark)
    cur = runner.truncate(f.withColumn("hops", F.lit(1).cast("bigint")))
    for _ in range(max_doublings):
        nxt_map = cur.select(
            F.col("id").alias("_j"),
            F.col("nxt").alias("_jn"),
            F.col("hops").alias("_jh"),
        )
        cur = runner.truncate(
            cur.join(nxt_map, cur["nxt"] == nxt_map["_j"], "left").select(
                "id",
                F.coalesce("_jn", "nxt").alias("nxt"),
                (F.col("hops") + F.coalesce("_jh", F.lit(0))).alias("hops"),
            )
        )

    # a row is resolved iff its pointer no longer lands on a redirect source
    srcs = f.select(F.col("id").alias("_s"))
    out = (
        cur.join(srcs, cur["nxt"] == srcs["_s"], "left")
        .select(
            F.col("id").alias("src"),
            F.col("nxt").alias("final"),
            "hops",
            F.col("_s").isNull().alias("resolved"),
        )
    )
    if validate == "raise":
        n_bad = out.filter(~F.col("resolved")).limit(1).count()
        if n_bad:
            raise ValueError(
                "unresolved redirect chains remain (cycle, or depth > "
                f"2**{max_doublings}); pass validate='mark' to inspect them"
            )
    return out


def rewrite_onto_finals(
    edges: DataFrame, resolved: DataFrame
) -> DataFrame:
    """Rewrite a link table onto chain-final destinations: any edge whose
    dst is a resolved redirect source is repointed at its final; edges to
    unresolved (cyclic) redirects are DROPPED, like a crawler discarding
    loop URLs. One dst-keyed hash join; re-aggregation of now-parallel
    edges is the caller's choice (weights are domain-specific)."""
    m = resolved.select(
        F.col("src").alias("_r"), "final", "resolved"
    )
    return (
        edges.join(m, edges["dst"] == m["_r"], "left")
        .filter(F.col("resolved").isNull() | F.col("resolved"))
        .select(
            "src",
            F.coalesce("final", "dst").alias("dst"),
            *[c for c in edges.columns if c not in ("src", "dst")],
        )
    )
