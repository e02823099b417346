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


# -------------------------------------------------------------------- HLL

_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: 0.709}


def hll_distinct(
    df: DataFrame, group_col: str, value: Column, p: int = 6
) -> DataFrame:
    """HyperLogLog distinct-count registers per group, engine-portable.

    Flajolet et al. 2007 with the standard linear-counting small-range
    correction. The register build is the TRUE HLL scale shape — unlike
    kmv_distinct there is no global distinct and no window: one
    map-side-combinable MAX aggregation onto (group, bucket) produces a
    fixed m = 2**p registers per group, mergeable across any partitioning
    (MAX is the merge), so at 100 TB the whole pass is a word-count-shaped
    partial+final agg with an O(m) result per group.

    Portability: h = md5-60bit(value); bucket = h mod m (low p bits);
    rest = h >> p (60-p bits); rho = (60-p) - bitlength(rest) + 1 with
    rest == 0 -> (60-p)+1 (bitlength via the LENGTH(bin(x)) trick both
    engines share). The harmonic denominator is kept EXACT:
    s_harm = sum over registers of 2**(K - rho) via integer shifts
    (K = 61-p; empty registers contribute 2**K), max m * 2**K < 2**63 for
    p >= 4. Only the final estimate touches doubles:
    est = alpha_m * m^2 * 2**K / s_harm, replaced by m * ln(m / v_zero)
    when est <= 2.5 m and zero registers remain — ROUND(.,6) both sides.

    Returns (group, n_exact, v_zero, s_harm, hll_est); n_exact (the exact
    distinct-hash count) is an AUDIT column for the oracle/tests — it is
    the expensive global distinct HLL exists to avoid; drop it in
    production plans.
    """
    m = 1 << p
    if m not in _HLL_ALPHA:
        raise ValueError(
            f"p must be one of {sorted(len(bin(k)) - 3 for k in _HLL_ALPHA)}, got {p}"
        )
    w = 60 - p
    k_exp = w + 1
    alpha = _HLL_ALPHA[m]

    base = df.select(
        F.col(group_col).alias("g"), md5_60bit(value).alias("h")
    )
    regs = (
        base.select(
            "g",
            F.pmod(F.col("h"), F.lit(m)).alias("bucket"),
            F.expr(
                f"CASE WHEN (h >> {p}) = 0 THEN {k_exp} "
                f"ELSE {k_exp} - LENGTH(bin(h >> {p})) END"
            ).alias("rho"),
        )
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    per_group = regs.groupBy("g").agg(
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {k_exp} - CAST(rho AS INT))")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    exact = base.groupBy("g").agg(
        F.countDistinct("h").cast("long").alias("n_exact")
    )
    scored = exact.join(per_group, on="g").select(
        F.col("g").alias(group_col),
        "n_exact",
        (F.lit(m) - F.col("n_present")).cast("long").alias("v_zero"),
        (
            F.col("s_present")
            + (F.lit(m) - F.col("n_present"))
            * F.lit(1 << k_exp).cast("long")
        ).alias("s_harm"),
    )
    raw = F.lit(alpha * m * m * float(1 << k_exp)) / F.col("s_harm").cast(
        "double"
    )
    return scored.select(
        group_col,
        "n_exact",
        "v_zero",
        "s_harm",
        F.round(
            F.when(
                (F.col("v_zero") > 0) & (raw <= F.lit(2.5 * m)),
                F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("v_zero")),
            ).otherwise(raw),
            6,
        ).alias("hll_est"),
    )


# ------------------------------------------------------------------ Bloom

_WORD_BITS = 63  # bits per int64 register word; bit 63 (the sign) unused
# so every mask is positive and shifts/ORs agree across engines


def bloom_bits(key: Column, m_bits: int, k: int):
    """The k (word, mask) registers key sets/probes: bit_i =
    md5-60bit('bf<i>|' || key) mod m_bits, word = bit div 63,
    mask = 1 << (bit mod 63). One row per (key-row, i) via a literal-array
    explode — no UDF, and the same arithmetic is a two-line SQL replay."""
    i = F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("i")
    b = F.pmod(
        md5_60bit(
            F.concat(
                F.lit("bf"),
                F.col("i").cast("string"),
                F.lit("|"),
                key.cast("string"),
            )
        ),
        F.lit(m_bits),
    )
    return i, b


def bloom_build(
    members: DataFrame, key: Column, m_bits: int = 32768, k: int = 3
) -> DataFrame:
    """Bloom-filter register table (word BIGINT, bits BIGINT) over the
    member keys. The membership sibling of the HLL cardinality registers
    above: insertion is idempotent (bit OR), so NO distinct is needed —
    the whole build is one map-side-combinable bit_or aggregation onto at
    most ceil(m_bits/63) words, mergeable across any partitioning. At
    100 TB the filter build is word-count-shaped and the result is a
    broadcastable O(m_bits/63)-row table (the standard shuffle-free
    semi-join prefilter for joins against a huge build side)."""
    rows = members.select(key.cast("string").alias("_k"))
    i, b = bloom_bits(F.col("_k"), m_bits, k)
    bits = rows.select("_k", i).select(b.alias("b"))
    return (
        bits.select(
            F.expr(f"CAST(b DIV {_WORD_BITS} AS BIGINT) AS word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pmod(b, {_WORD_BITS}) AS INT)) AS mask"
            ),
        )
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_audit(
    members: DataFrame,
    probes: DataFrame,
    member_key: str,
    probe_key: str,
    group_col: str,
    m_bits: int = 32768,
    k: int = 3,
) -> DataFrame:
    """Build a Bloom filter over ``members[member_key]`` and audit it
    against the DISTINCT (group, probe_key) pairs: per group,
    (n_probes, n_true, n_bloom_hits, n_false_pos, n_false_neg) — all
    exact BIGINTs. n_false_neg is structurally zero (the Bloom guarantee)
    and is emitted so the value hash PROVES it, not just a pytest.

    Scale shape: the filter is a broadcast O(m_bits/63)-row table; each
    probe key costs k broadcast-join lookups and one bool_and per key —
    no shuffle touches the member table after its one aggregate. The
    exact-membership audit join is the expensive global step Bloom
    exists to avoid in production; it is the point of the audit here.
    """
    filt = bloom_build(members, F.col(member_key), m_bits=m_bits, k=k)
    mk = (
        members.select(F.col(member_key).cast("string").alias("key"))
        .distinct()
        .withColumn("is_member", F.lit(True))
    )
    pk = probes.select(
        F.col(group_col).alias("g"), F.col(probe_key).cast("string").alias("key")
    ).distinct()
    i, b = bloom_bits(F.col("key"), m_bits, k)
    lookups = pk.select("g", "key", i).select("g", "key", b.alias("b")).select(
        "g",
        "key",
        F.expr(f"CAST(b DIV {_WORD_BITS} AS BIGINT) AS word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pmod(b, {_WORD_BITS}) AS INT)) AS mask"
        ),
    )
    hits = (
        lookups.join(F.broadcast(filt), on="word", how="left")
        .select(
            "g",
            "key",
            F.coalesce(
                (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask")),
                F.lit(False),
            ).alias("hit_i"),
        )
        .groupBy("g", "key")
        .agg(F.bool_and("hit_i").alias("bloom_hit"))
    )
    audited = hits.join(mk, on="key", how="left").select(
        "g",
        "bloom_hit",
        F.coalesce("is_member", F.lit(False)).alias("is_member"),
    )
    return audited.groupBy(F.col("g").alias(group_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum(F.col("is_member").cast("long")).cast("long").alias("n_true"),
        F.sum(F.col("bloom_hit").cast("long")).cast("long").alias(
            "n_bloom_hits"
        ),
        F.sum(
            (F.col("bloom_hit") & ~F.col("is_member")).cast("long")
        ).cast("long").alias("n_false_pos"),
        F.sum(
            (~F.col("bloom_hit") & F.col("is_member")).cast("long")
        ).cast("long").alias("n_false_neg"),
    )


def hist_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 64,
) -> DataFrame:
    """Mergeable equi-width histogram sketch: ONE map-side-combinable
    count aggregate onto <= n_bins rows — like the HLL register plane,
    the result merges across any partitioning / stream batches by
    summing bins, so the monitoring shape is shuffle-light at any scale.
    ``lo``/``hi`` are caller-provided bounds (at scale: a prior min/max
    pass or domain knowledge); values at/above ``hi`` clamp into the
    last bin. Bin arithmetic is a fixed IEEE expression — identical
    structure on the oracle side, so bins replay bit-exactly.

    Returns (bin BIGINT, cnt BIGINT).
    """
    v = F.col(value_col)
    b = F.least(
        F.lit(n_bins - 1),
        F.floor((v - F.lit(lo)) * F.lit(float(n_bins)) / F.lit(hi - lo)),
    )
    return df.groupBy(b.cast("long").alias("bin")).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def hist_quantiles(
    hist: DataFrame,
    lo: float,
    hi: float,
    n_bins: int,
    n_total: DataFrame,
    pcts: list[int],
) -> DataFrame:
    """Interpolated quantile estimates from an equi-width histogram
    sketch: for each integer percentile p the 1-based target rank is
    (p*n + 99) DIV 100 (pure integer math, matching
    operators/kselect.exact_percentiles), located in the bin where the
    cumulative count first reaches it, linearly interpolated inside the
    bin. The cumulative window runs over <= n_bins rows — a deliberate
    single-task window on a sketch-sized input, never on data.

    ``n_total``: 1-row DataFrame with column n (broadcast). Returns
    (pct BIGINT, est ROUND 6). Estimate error is bounded by one bin
    width by construction (the rank-r element lives in the chosen bin).
    """
    from pyspark.sql import Window

    width = (hi - lo) / n_bins
    w = Window.orderBy("bin")
    cum = (
        hist.withColumn("cum", F.sum("cnt").over(w))
        .withColumn(
            "cumprev", F.coalesce(F.lag("cum").over(w), F.lit(0))
        )
    )
    targets = (
        hist.sparkSession.range(1)
        .select(
            F.explode(
                F.array(*[F.lit(int(p)) for p in pcts])
            ).alias("pct")
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            F.col("pct").cast("long").alias("pct"),
            F.expr("CAST((pct * n + 99) DIV 100 AS BIGINT)").alias("r"),
        )
    )
    est = (
        F.lit(lo)
        + F.col("bin") * F.lit(width)
        + (
            (F.col("r") - F.col("cumprev")).cast("double")
            / F.col("cnt")
        )
        * F.lit(width)
    )
    return (
        targets.join(
            cum,
            (F.col("cum") >= F.col("r")) & (F.col("cumprev") < F.col("r")),
        )
        .select("pct", F.round(est, 6).alias("est"))
    )


def kmv_jaccard(
    df: DataFrame,
    k: int = 256,
    group_col: str = "grp",
    member_col: str = "member",
    salt: str = "kj",
) -> DataFrame:
    """Pairwise Jaccard similarity between member sets via shared
    k-minimum-values sketches (Beyer et al. 2007) — the set-similarity
    member of the sketch plane (hll = cardinality, kmv = distinct,
    cms = heavy hitters, bloom = membership): J(A,B) is estimated as
    the both-sides fraction of the k smallest member hashes of the
    union, an unbiased bottom-k estimator that never materializes
    either set.

    Determinism: the sketch hash is the replayable md5-60bit draw, so
    the selected bottom-k — and therefore the estimate — is a pure
    function of (salt, members), partition-invariant and engine-
    portable; ties cannot occur (distinct members, 60-bit hashes, and
    the member-id tiebreak makes the order total anyway).

    Plan shape: distinct (group, member) once; each row fans out to
    the pairs containing its group via two joins against the tiny
    pair table (fan-out = n_groups - 1, the small-cardinality-groups
    regime — event types, sources, shards; NOT for billions of
    groups); per-(member, pair) flags collapse with one MAX agg; the
    bottom-k per pair reuses the salted two-phase kselect so a mega
    union never sorts in one task. Estimates are exact-integer
    n_shared / n_kmv with one final ROUND(.,6).

    Returns (grp_a, grp_b, n_kmv, n_shared, jacc_est) for every
    unordered group pair, grp_a < grp_b.
    """
    from combblas_spark.functions.dedup import md5_60bit
    from combblas_spark.operators.kselect import kselect

    gm = df.select(
        F.col(group_col).alias("g"), F.col(member_col).alias("m")
    ).distinct()
    groups = gm.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("grp_a"))
        .crossJoin(F.broadcast(groups.select(F.col("g").alias("grp_b"))))
        .filter(F.col("grp_a") < F.col("grp_b"))
    )
    via_a = gm.join(
        F.broadcast(pairs), on=F.col("g") == F.col("grp_a")
    ).select("m", "grp_a", "grp_b", F.lit(1).alias("ha"), F.lit(0).alias("hb"))
    via_b = gm.join(
        F.broadcast(pairs), on=F.col("g") == F.col("grp_b")
    ).select("m", "grp_a", "grp_b", F.lit(0).alias("ha"), F.lit(1).alias("hb"))
    flagged = (
        via_a.unionByName(via_b)
        .groupBy("m", "grp_a", "grp_b")
        .agg(F.max("ha").alias("ha"), F.max("hb").alias("hb"))
    )
    h = md5_60bit(F.concat(F.lit(salt + "|"), F.col("m").cast("string")))
    ranked = flagged.select(
        F.col("m").alias("src"),
        F.concat_ws("|", "grp_a", "grp_b").alias("dst"),
        (-h).alias("w"),
        "grp_a",
        "grp_b",
        "ha",
        "hb",
    )
    bottomk = kselect(ranked, k, by="dst")
    return (
        bottomk.groupBy("grp_a", "grp_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_kmv"),
            F.sum((F.col("ha") * F.col("hb")).cast("long"))
            .cast("long")
            .alias("n_shared"),
        )
        .withColumn(
            "jacc_est",
            F.round(F.col("n_shared").cast("double") / F.col("n_kmv"), 6)
            + F.lit(0.0),
        )
    )


def hll_rollup(
    df: DataFrame,
    group_col: str,
    fine_col: str,
    value: Column,
    p: int = 6,
) -> DataFrame:
    """Sketch MERGEABILITY made auditable: build HLL registers at the
    FINE grain (group, fine) — e.g. per (event_type, day) — then roll
    them up to the group with one more MAX aggregation, and score BOTH
    the merged registers and a directly-built per-group plane. Because
    MAX-merge is exactly HLL's union, the two estimates are equal BY
    THEOREM — and this operator puts that equality into the audited
    output (``merge_consistent``), which is the property that lets a
    100-TB pipeline keep per-partition/per-day sketches and combine
    them later without ever re-touching the raw data. Same register
    plane, rho trick and exact-integer harmonic sum as
    :func:`hll_distinct`.

    Returns (group_col, n_fine, v_zero, s_harm, hll_est,
    merge_consistent) — merge_consistent is int64 1 when the rolled-up
    estimate equals the direct one (always, or the sketch plane is
    broken).
    """
    m = 1 << p
    if m not in _HLL_ALPHA:
        raise ValueError(f"unsupported p={p}")
    w = 60 - p
    k_exp = w + 1
    alpha = _HLL_ALPHA[m]

    base = df.select(
        F.col(group_col).alias("g"),
        F.col(fine_col).alias("f"),
        md5_60bit(value).alias("h"),
    )
    rho = F.expr(
        f"CASE WHEN (h >> {p}) = 0 THEN {k_exp} "
        f"ELSE {k_exp} - LENGTH(bin(h >> {p})) END"
    )
    bucketed = base.select(
        "g", "f", F.pmod(F.col("h"), F.lit(m)).alias("bucket"),
        rho.alias("rho"),
    )
    fine_regs = bucketed.groupBy("g", "f", "bucket").agg(
        F.max("rho").alias("rho")
    )
    merged = fine_regs.groupBy("g", "bucket").agg(F.max("rho").alias("rho"))
    direct = bucketed.groupBy("g", "bucket").agg(F.max("rho").alias("rho"))

    def score(regs, est_name):
        per = regs.groupBy("g").agg(
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), "
                    f"{k_exp} - CAST(rho AS INT))"
                )
            ).alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
        vz = (F.lit(m) - F.col("n_present")).cast("long")
        sh = F.col("s_present") + vz * F.lit(1 << k_exp).cast("long")
        raw = F.lit(alpha * m * m * float(1 << k_exp)) / sh.cast("double")
        est = F.round(
            F.when(
                (vz > 0) & (raw <= F.lit(2.5 * m)),
                F.lit(float(m)) * F.log(F.lit(float(m)) / vz),
            ).otherwise(raw),
            6,
        )
        return per.select(
            "g", vz.alias(f"_vz_{est_name}"), sh.alias(f"_sh_{est_name}"),
            est.alias(est_name),
        )

    n_fine = base.select("g", "f").distinct().groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_fine")
    )
    out = (
        n_fine.join(score(merged, "hll_est"), "g")
        .join(score(direct, "est_direct"), "g")
        .select(
            F.col("g").alias(group_col),
            "n_fine",
            F.col("_vz_hll_est").alias("v_zero"),
            F.col("_sh_hll_est").alias("s_harm"),
            "hll_est",
            (F.col("hll_est") == F.col("est_direct"))
            .cast("long")
            .alias("merge_consistent"),
        )
    )
    return out


def hll_setops(
    df: DataFrame, group_col: str, value: Column, p: int = 6
) -> DataFrame:
    """HLL set algebra across every pair of groups: union by register
    MAX-merge, intersection by inclusion-exclusion — the reason
    pipelines keep sketches instead of raw keys: |A ∪ B| costs an O(m)
    register merge, never a re-scan.

    One row per unordered group pair (set_a < set_b):
    ``(set_a, set_b, n_a, n_b, n_union, n_inter, est_a, est_b,
    est_union, est_inter)`` — the n_* are EXACT audit counts (n_union
    derived as n_a + n_b - n_inter) the estimates are graded against;
    est_inter = est_a + est_b - est_union can be negative for near-
    disjoint sets (the documented inclusion-exclusion failure mode —
    it is emitted as-is, not clamped, so the error is visible).

    Scale shape: the register build is the same map-side-combinable
    MAX agg as hll_distinct; the pair expansion materializes the union
    registers for EVERY group pair — O(G^2 * m) register rows for G
    groups, quadratic in group count. That is by design for the
    intended regime (G = a handful of event types / segments, m = 2^p
    registers); for large G, compute set ops per requested pair
    instead of all-pairs. Everything downstream of the one base scan
    is sketch-sized.
    """
    m = 1 << p
    if m not in _HLL_ALPHA:
        raise ValueError(f"unsupported p={p}")
    k_exp = 60 - p + 1
    alpha = _HLL_ALPHA[m]
    const = alpha * m * m * float(1 << k_exp)

    base = df.select(
        F.col(group_col).alias("g"), md5_60bit(value).alias("h")
    )
    regs = (
        base.select(
            "g",
            F.pmod(F.col("h"), F.lit(m)).alias("bucket"),
            F.expr(
                f"CASE WHEN (h >> {p}) = 0 THEN {k_exp} "
                f"ELSE {k_exp} - LENGTH(bin(h >> {p})) END"
            ).alias("rho"),
        )
        .groupBy("g", "bucket")
        .agg(F.max("rho").alias("rho"))
    ).localCheckpoint()
    groups = regs.select("g").distinct()
    pairs = (
        groups.select(F.col("g").alias("ga"))
        .join(groups.select(F.col("g").alias("gb")))
        .filter(F.col("ga") < F.col("gb"))
    )

    def _score(regdf, keys):
        pg = regdf.groupBy(*keys).agg(
            F.sum(
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), {k_exp} - CAST(rho AS INT))"
                )
            ).alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
        return pg.select(
            *keys,
            (F.lit(m) - F.col("n_present")).cast("long").alias("v_zero"),
            (
                F.col("s_present")
                + (F.lit(m) - F.col("n_present"))
                * F.lit(1 << k_exp).cast("long")
            ).alias("s_harm"),
        )

    def _est(v_zero, s_harm):
        raw = F.lit(const) / s_harm.cast("double")
        return F.round(
            F.when(
                (v_zero > 0) & (raw <= F.lit(2.5 * m)),
                F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero),
            ).otherwise(raw),
            6,
        )

    g_score = _score(regs, ["g"]).select(
        "g", F.col("v_zero").alias("vz"), F.col("s_harm").alias("sh")
    )
    rpa = pairs.join(regs, on=pairs.ga == regs.g).select(
        "ga", "gb", "bucket", "rho"
    )
    rpb = pairs.join(regs, on=pairs.gb == regs.g).select(
        "ga", "gb", "bucket", "rho"
    )
    u_regs = (
        rpa.unionByName(rpb)
        .groupBy("ga", "gb", "bucket")
        .agg(F.max("rho").alias("rho"))
    )
    u_score = _score(u_regs, ["ga", "gb"])

    eh = base.distinct()
    ex_g = eh.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n"))
    inter = (
        eh.select(F.col("g").alias("ga"), "h")
        .join(eh.select(F.col("g").alias("gb"), "h"), on="h")
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).cast("long").alias("n_inter"))
    )

    out = (
        pairs.join(
            ex_g.select(F.col("g").alias("ga"), F.col("n").alias("n_a")),
            on="ga",
        )
        .join(
            ex_g.select(F.col("g").alias("gb"), F.col("n").alias("n_b")),
            on="gb",
        )
        .join(inter, on=["ga", "gb"], how="left")
        .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0)))
        .join(
            g_score.select(
                F.col("g").alias("ga"),
                F.col("vz").alias("vz_a"),
                F.col("sh").alias("sh_a"),
            ),
            on="ga",
        )
        .join(
            g_score.select(
                F.col("g").alias("gb"),
                F.col("vz").alias("vz_b"),
                F.col("sh").alias("sh_b"),
            ),
            on="gb",
        )
        .join(u_score, on=["ga", "gb"])
    )
    est_a = _est(F.col("vz_a"), F.col("sh_a"))
    est_b = _est(F.col("vz_b"), F.col("sh_b"))
    est_u = _est(F.col("v_zero"), F.col("s_harm"))
    return out.select(
        F.col("ga").alias("set_a"),
        F.col("gb").alias("set_b"),
        "n_a",
        "n_b",
        (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .cast("long")
        .alias("n_union"),
        F.col("n_inter").cast("long").alias("n_inter"),
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_u.alias("est_union"),
        F.round(est_a + est_b - est_u, 6).alias("est_inter"),
    )
