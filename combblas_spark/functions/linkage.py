"""Blocked record linkage — cross-table entity resolution.

The dedup family (functions/dedup.py) matches rows WITHIN one corpus;
entity resolution links records ACROSS two tables with no shared key —
the master-vs-vendor-feed / CRM-vs-crawl integration workload. The
production shape is always the same two stages (Fellegi-Sunter 1969,
and every modern ER system after it):

1. **Blocking** — generate candidate pairs from cheap agreement keys so
   the comparison space is near-linear, never the cross product. Here:
   the union of two complementary keys, (coarse_key, first-2 chars of
   name) and (coarse_key, last-2 chars) — a single-character edit
   anywhere in a name of length >= 4 preserves at least one of the two
   (an edit at position < 2 leaves the last-2 intact and vice versa),
   so recall for edit-distance-1 names is structural, not probabilistic
   (same pigeonhole style as fuzzy_pairs' deletion neighborhood).
2. **Scoring** — exact-integer agreement weights on the candidates
   only: name agreement (levenshtein <= 1) carries ``w_name``, exact
   phone agreement ``w_phone``; a pair links iff the summed score
   reaches ``threshold``. All integer, engine-portable, and the whole
   per-field evidence is returned so the decision is auditable.

Scale shape: two equi-joins on the block keys (block sizes bounded by
the coarse key's selectivity — cap upstream like every LSH sibling),
one distinct on candidate pairs, levenshtein on candidates only, no
window, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def blocked_link(
    master: DataFrame,
    dirty: DataFrame,
    coarse_col: str = "blk",
    name_col: str = "name",
    phone_col: str = "phone",
    id_col: str = "rid",
    w_name: int = 2,
    w_phone: int = 1,
    threshold: int = 2,
) -> DataFrame:
    """Link ``dirty`` records to ``master`` records.

    Both inputs carry (id_col, coarse_col, name_col, phone_col); ids
    must be disjoint across the two tables (caller offsets them).
    Returns (master_id, dirty_id, name_dist, phone_match, score) for
    every candidate pair with score >= threshold, score =
    w_name * [levenshtein(names) <= 1] + w_phone * [phones equal].
    """

    def keyed(df, side):
        base = df.select(
            F.col(id_col).alias(f"{side}_id"),
            F.col(coarse_col).alias("ck"),
            F.col(name_col).alias(f"{side}_name"),
            F.col(phone_col).alias(f"{side}_phone"),
        )
        first2 = F.concat(F.lit("f|"), F.substring(f"{side}_name", 1, 2))
        last2 = F.concat(
            F.lit("l|"),
            F.substring(
                F.col(f"{side}_name"),
                F.greatest(F.length(f"{side}_name") - 1, F.lit(1)),
                2,
            ),
        )
        return base.withColumn(
            "bk", F.explode(F.array(first2, last2))
        )

    cand = (
        keyed(master, "m")
        .join(keyed(dirty, "d"), on=["ck", "bk"])
        .select("m_id", "d_id", "m_name", "d_name", "m_phone", "d_phone")
        .distinct()
    )
    name_dist = F.levenshtein("m_name", "d_name")
    phone_match = (F.col("m_phone") == F.col("d_phone")).cast("long")
    score = (
        F.lit(int(w_name)) * (name_dist <= 1).cast("long")
        + F.lit(int(w_phone)) * phone_match
    )
    return (
        cand.select(
            F.col("m_id").alias("master_id"),
            F.col("d_id").alias("dirty_id"),
            name_dist.cast("long").alias("name_dist"),
            phone_match.alias("phone_match"),
            score.cast("long").alias("score"),
        )
        .filter(F.col("score") >= int(threshold))
    )


def survivorship(
    records: DataFrame,
    cluster_col: str,
    rules: dict[str, str],
) -> DataFrame:
    """Golden-record merge: collapse each entity cluster to one row by
    per-attribute survivorship rules — the step after
    :func:`blocked_link` in the master-data pipeline (block -> score
    -> cluster -> MERGE).

    ``rules`` maps column -> rule:

    * ``'longest'`` — longest value wins, ties by lexicographic min
      (the name rule: prefer the most complete spelling)
    * ``'mode'``    — most frequent value wins, ties by min (the
      phone/email rule: prefer the majority entry)
    * ``'max'`` / ``'min'`` — numeric extremes (the balance /
      first-seen rules)

    NULLs never survive unless a cluster's column is all-NULL. Every
    rule is deterministic (total tie order), so the golden table is
    replayable. Scale shape: per rule one or two map-side-combinable
    aggregates keyed by the cluster — the two-pass rules (longest,
    mode) compute the winning criterion first and join back on
    (cluster, criterion), never a per-cluster sort window.
    """
    out = records.select(F.col(cluster_col).alias("_cl")).distinct()
    for col, rule in rules.items():
        r = records.select(
            F.col(cluster_col).alias("_cl"), F.col(col).alias("_v")
        ).filter(F.col("_v").isNotNull())
        if rule == "longest":
            crit = r.groupBy("_cl").agg(
                F.max(F.length("_v")).alias("_len")
            )
            win = (
                r.join(crit, on="_cl")
                .filter(F.length("_v") == F.col("_len"))
                .groupBy("_cl")
                .agg(F.min("_v").alias(col))
            )
        elif rule == "mode":
            counts = r.groupBy("_cl", "_v").agg(
                F.count(F.lit(1)).alias("_n")
            )
            crit = counts.groupBy("_cl").agg(F.max("_n").alias("_mx"))
            win = (
                counts.join(crit, on="_cl")
                .filter(F.col("_n") == F.col("_mx"))
                .groupBy("_cl")
                .agg(F.min("_v").alias(col))
            )
        elif rule == "max":
            win = r.groupBy("_cl").agg(F.max("_v").alias(col))
        elif rule == "min":
            win = r.groupBy("_cl").agg(F.min("_v").alias(col))
        else:
            raise ValueError(f"survivorship: unknown rule {rule!r} for {col}")
        out = out.join(win, on="_cl", how="left")
    return out.withColumnRenamed("_cl", cluster_col)
