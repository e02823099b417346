"""Deterministic corpus sampling / splitting for training-data pipelines.

No reference counterpart (CombBLAS is a graph engine); these are the
standard web-corpus operations a 100-TB pretraining pipeline runs next to
dedup: hash-bucketed train/test splits and per-stratum downsampling.
Everything is a pure Column expression over the engine-portable md5-60bit
hash (functions/dedup.md5_60bit), so results are a pure function of the
row keys — reproducible across runs, partitionings, engines (DuckDB
oracle-checkable), and additions to the corpus (a new document never
moves an old one between splits, unlike fraction-based sample()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from combblas_spark.functions.dedup import md5_60bit


def _bucket(salt: str, *cols: Column) -> Column:
    """Stable 0..999 bucket of (salt, cols...) — md5-60bit based."""
    return F.pmod(
        md5_60bit(F.concat_ws("|", F.lit(salt), *cols)), F.lit(1000)
    )


def split_by_hash(
    df: DataFrame,
    key_col: str = "doc_id",
    test_permille: int = 100,
    salt: str = "split",
) -> DataFrame:
    """Adds a 'split' column: 'test' for rows whose hash bucket falls below
    ``test_permille`` (out of 1000), else 'train'. Keyed on ``key_col``
    only, so the assignment survives any reprocessing of the corpus."""
    b = _bucket(salt, F.col(key_col).cast("string"))
    return df.withColumn(
        "split",
        F.when(b < test_permille, F.lit("test")).otherwise(F.lit("train")),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    frac_permille: int,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Keep ~frac_permille/1000 of each stratum, deterministically: a row
    survives iff hash(salt, stratum, key) lands under the threshold. The
    stratum participates in the hash so per-stratum rates can later diverge
    without correlated selections across strata."""
    b = _bucket(
        salt, F.col(strata_col).cast("string"), F.col(key_col).cast("string")
    )
    return df.filter(b < frac_permille)
