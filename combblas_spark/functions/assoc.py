"""Association-rule mining plane: market-basket pair statistics.

The co-occurrence plane's transactional member (the text plane has
Dunning LLR and PMI over token adjacency; this is the same 2x2
contingency idea over basket membership): support / confidence / lift
for item pairs sharing a basket, the retail/recommendation staple.

Scale shape: baskets dedupe map-side; pair generation is the
per-basket self-join whose fanout is bounded by basket size (and a
loud occupancy guard raises on degenerate mega-baskets instead of
going quadratic silently — the grid_radius_join / LSH max_bucket
stance); per-item counts are one map-side-combinable aggregate; the
1-row basket total broadcasts. No windows, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["basket_pairs"]


def basket_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_support: int = 2,
    max_basket: int = 1000,
) -> DataFrame:
    """Item-pair association over baskets.

    One row per unordered item pair co-occurring in at least
    ``min_pair_support`` baskets: ``(item_a, item_b, n_ab, n_a, n_b,
    n_baskets, conf_ab, conf_ba, lift)`` — exact BIGINT counts;
    confidence and lift are single ROUND(.,6) double expressions over
    those integers (lift = N*n_ab / (n_a*n_b)). A basket holding more
    than ``max_basket`` items raises at execution time.
    """
    b = (
        df.select(
            F.col(basket_col).alias("_b"), F.col(item_col).alias("_i")
        )
        .distinct()
    )
    occ = b.groupBy("_b").agg(F.count(F.lit(1)).alias("_bsz"))
    guarded = b.join(occ, on="_b").select(
        F.when(F.col("_bsz") <= int(max_basket), F.col("_b"))
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"basket_pairs: basket exceeds max_basket="
                          f"{max_basket} at "),
                    F.col("_b").cast("string"),
                )
            )
        )
        .alias("_b"),
        "_i",
    )
    item_n = b.groupBy("_i").agg(F.count(F.lit(1)).cast("long").alias("_n"))
    n_baskets = b.agg(
        F.countDistinct("_b").cast("long").alias("n_baskets")
    )
    pairs = (
        guarded.alias("l")
        .join(guarded.alias("r"), on="_b")
        .filter(F.col("l._i") < F.col("r._i"))
        .groupBy(
            F.col("l._i").alias("item_a"), F.col("r._i").alias("item_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .filter(F.col("n_ab") >= int(min_pair_support))
    )
    j = (
        pairs.join(
            item_n.select(
                F.col("_i").alias("item_a"), F.col("_n").alias("n_a")
            ),
            on="item_a",
        )
        .join(
            item_n.select(
                F.col("_i").alias("item_b"), F.col("_n").alias("n_b")
            ),
            on="item_b",
        )
        .crossJoin(F.broadcast(n_baskets))
    )
    return j.select(
        "item_a",
        "item_b",
        "n_ab",
        "n_a",
        "n_b",
        "n_baskets",
        F.round(
            F.col("n_ab").cast("double") / F.col("n_a").cast("double"), 6
        ).alias("conf_ab"),
        F.round(
            F.col("n_ab").cast("double") / F.col("n_b").cast("double"), 6
        ).alias("conf_ba"),
        F.round(
            F.col("n_baskets").cast("double") * F.col("n_ab").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double")),
            6,
        ).alias("lift"),
    )
