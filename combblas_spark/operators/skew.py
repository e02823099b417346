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

from pyspark.sql import DataFrame
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
