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


def importance_sample(
    df: DataFrame,
    frac: float,
    weight_col: str = "n_chars",
    key_col: str = "doc_id",
    salt: str = "imp",
) -> DataFrame:
    """Deterministic weighted (importance / temperature) downsampling —
    the resampling step that executes a mixture re-weighting plan: row i
    survives with probability p_i = min(1, frac * n * w_i / total_w), so
    the expected output is ~frac of the corpus with inclusion odds
    proportional to the integer weight column (Poisson sampling).

    The coin is the engine-portable md5-60bit hash of (salt, key): keep
    iff hash < floor(p_i * 2^60) — a pure function of the row key, so the
    selection is reproducible across runs/partitionings/engines and a new
    document never flips an old one's decision. All probability math is
    double-on-exact-integers (frac * n * w / total_w, evaluated left to
    right on both engines), so the DuckDB oracle reproduces the exact
    inclusion set, not an approximation.

    -> (key_col, weight_col, incl_p ROUND 6) for the surviving rows.
    Scale shape: one map-side-combinable one-row aggregate (n, total_w)
    broadcast back, then a pure Column filter — one pass, no shuffle of
    the data itself.
    """
    tot = df.agg(
        F.sum(weight_col).cast("long").alias("_tw"),
        F.count(F.lit(1)).cast("long").alias("_n"),
    )
    h = md5_60bit(F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string")))
    p = F.least(
        F.lit(1.0),
        F.lit(frac) * F.col("_n") * F.col(weight_col) / F.col("_tw"),
    )
    thr = F.floor(p * F.lit(float(1 << 60))).cast("long")
    return (
        df.crossJoin(F.broadcast(tot))
        .filter(h < thr)
        .select(key_col, weight_col, F.round(p, 6).alias("incl_p"))
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    key_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "pack",
) -> DataFrame:
    """The concat-then-chunk packing step that turns a shuffled corpus into
    fixed-length training sequences: documents are ordered by the
    engine-portable shuffle key md5(salt|id) (ties by id), token counts are
    prefix-summed GLOBALLY, and each document is assigned the sequence
    containing its first token. Returns (doc_id, n_tokens, prefix, seq_id,
    seq_offset) — prefix = total tokens before this doc, seq_id =
    prefix // seq_len, seq_offset = prefix % seq_len.

    Scale shape: the global prefix sum is two-phase — a range-partitioned
    sample sort pins the order, per-partition token totals are ONE tiny
    driver collect (#partitions rows, the operators/indexing._global_ranks
    idiom), and the within-partition running sum is a window PARTITIONED BY
    the physical partition id, so no single-task global window ever exists.
    """
    from pyspark.sql import Window
    from combblas_spark.functions.text import tokens_col

    h = md5_60bit(
        F.concat_ws("|", F.lit(salt), F.col(key_col).cast("string"))
    )
    base = docs.select(
        F.col(key_col),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
        h.alias("_h"),
    )
    s = base.orderBy(F.col("_h").asc(), F.col(key_col).asc()).localCheckpoint()
    counts = {
        r["p"]: r["tok"]
        for r in s.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.sum("n_tokens").alias("tok"))
        .collect()
    }
    n_parts = (max(counts) + 1) if counts else 1
    offsets, acc = [], 0
    for p in range(n_parts):
        offsets.append(acc)
        acc += counts.get(p, 0)
    off_arr = F.array(*[F.lit(int(o)).cast("long") for o in offsets])
    pid = F.spark_partition_id()
    w = (
        Window.partitionBy(pid)
        .orderBy(F.col("_h").asc(), F.col(key_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.element_at(off_arr, pid + 1) + F.coalesce(
        F.sum("n_tokens").over(w), F.lit(0)
    )
    return s.select(
        key_col,
        "n_tokens",
        prefix.alias("prefix"),
        F.floor(prefix / F.lit(seq_len)).cast("long").alias("seq_id"),
        F.pmod(prefix, F.lit(seq_len)).cast("long").alias("seq_offset"),
    )


def chunk_docs(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    key_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window context chunking — the step that turns long documents
    into model-context-sized training examples with overlap: chunk k of a
    doc with n tokens starts at token 1 + k*stride (1-based) for
    k = 0 .. ceil((n - window)/stride) (0 when n <= window), and holds
    min(window, n - start + 1) tokens. stride <= window guarantees every
    token is covered and the final chunk is never empty. Empty documents
    produce no chunks. Complements pack_sequences (which concatenates the
    corpus into fixed sequences): chunking preserves document boundaries,
    packing erases them.

    Returns (doc_id, chunk_id BIGINT, start_tok BIGINT, n_tok BIGINT,
    chunk_text) — chunk_text is the space-rejoined token slice, so the
    output is a self-contained training table.

    Scale shape (100 TB): per-row arithmetic + one explode of a
    sequence() column — embarrassingly parallel, no shuffle at all beyond
    the scan (narrow plan); chunk count per doc is n/stride, so output
    size is linear in corpus tokens regardless of document skew.
    """
    if not (1 <= stride <= window):
        raise ValueError(f"need 1 <= stride <= window, got {stride}/{window}")
    from combblas_spark.functions.text import tokens_col

    base = docs.select(
        F.col(key_col), tokens_col(F.col(text_col)).alias("t")
    ).withColumn("n", F.size("t")).filter(F.col("n") > 0)
    kmax = F.when(
        F.col("n") > window,
        F.floor((F.col("n") - window + stride - 1) / F.lit(stride)),
    ).otherwise(F.lit(0)).cast("long")
    starts = F.sequence(F.lit(1).cast("long"), kmax * stride + 1, F.lit(stride).cast("long"))
    chunks = base.select(
        key_col, "t", "n", F.posexplode(starts).alias("k", "s")
    )
    n_tok = F.least(F.lit(window).cast("long"), F.col("n") - F.col("s") + 1)
    return chunks.select(
        key_col,
        F.col("k").cast("long").alias("chunk_id"),
        F.col("s").alias("start_tok"),
        n_tok.alias("n_tok"),
        F.array_join(F.slice("t", F.col("s").cast("int"), n_tok.cast("int")), " ").alias(
            "chunk_text"
        ),
    )


def hamilton_quota(
    scores: DataFrame,
    total_budget: int,
    key_col: str = "key",
    score_col: str = "score",
) -> DataFrame:
    """Largest-remainder (Hamilton) apportionment of an integer budget
    across keys proportionally to integer scores — the crawl-budget /
    sampling-quota allocator: every key gets floor(B*score/S), and the
    B - sum(floors) leftover units go to the largest remainders
    (B*score mod S, ties by key). All arithmetic is exact int64
    (requires B * max_score < 2^63), so the allocation replays
    bit-exactly and sums to EXACTLY the budget — no float shares, no
    drift. One O(keys) aggregate for S; the remainder rank runs through
    the range-partitioned sample sort (``_global_ranks``, the same shape
    ``waterfill`` uses) — no single-task global window anywhere, so the
    allocation stays parallel at web-scale key counts (10^8 hosts).

    Returns (key, score, quota).
    """
    from combblas_spark.operators.indexing import _global_ranks

    s = scores.agg(F.sum(score_col).cast("long").alias("s_total"))
    j = scores.select(
        F.col(key_col).alias("key"),
        F.col(score_col).cast("long").alias("score"),
    ).crossJoin(F.broadcast(s))
    base = j.select(
        "key",
        "score",
        F.expr(f"CAST(({int(total_budget)} * score) DIV s_total AS BIGINT)")
        .alias("base"),
        F.expr(f"CAST(({int(total_budget)} * score) % s_total AS BIGINT)")
        .alias("rem"),
    )
    leftover = base.agg(
        (F.lit(int(total_budget)) - F.sum("base")).cast("long").alias("k")
    )
    ranked = _global_ranks(base, [F.col("rem").desc(), F.col("key").asc()])
    return (
        ranked.crossJoin(F.broadcast(leftover))
        .select(
            "key",
            "score",
            (F.col("base") + (F.col("rank") < F.col("k")).cast("long"))
            .cast("long")
            .alias("quota"),
        )
    )


def reservoir_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_col: str = "key",
    salt: str = "res",
) -> DataFrame:
    """Fixed-SIZE weighted sample without replacement (Efraimidis–
    Spirakis A-ES): every row draws u = (md5_60bit(salt|key)+1)/2^60 and
    the k rows with the largest u^(1/w) win. This is the exact-k
    companion to :func:`importance_sample` (Poisson inclusion, variable
    size): quota-bound jobs — eval-set carving, per-source caps, fixed
    annotation budgets — need EXACTLY k rows, not k in expectation.

    Determinism: the draw is the replayable md5-60bit coin, so the
    selected set is a pure function of (salt, keys, weights) —
    partition-count-invariant, growth-stable ranking (a new row never
    changes an old row's priority, only the cutoff), engine-portable.
    The selection key is ln(u)/w (monotone in u^(1/w), no pow
    under/overflow at w = 10^9); ranking uses ROUND(.,6) + key tiebreak
    so both engines sort identically (the rounded-score rule every
    ranked contract query follows), and +0.0 normalizes the IEEE -0.0
    that ROUND can emit for priorities in (-5e-7, 0].

    Scale shape: one pure Column expression then a global top-k —
    Spark plans orderBy(...).limit(k) as TakeOrderedAndProject (per-
    partition heap top-k, single k-row reduce), so nothing resembling a
    global sort ever materializes. Weights must be >= 1; a nonpositive
    weight raises at execution time (raise_error) rather than silently
    skewing the draw.

    Returns (key, w, prio, rank), rank 1..k by priority descending.
    """
    from pyspark.sql import Window

    two60 = F.lit(float(1 << 60))
    h = md5_60bit(
        F.concat(F.lit(salt + "|"), F.col(key_col).cast("string"))
    )
    w = F.col(weight_col).cast("long")
    wchk = F.when(w >= 1, w).otherwise(
        F.raise_error(
            F.concat(
                F.lit("reservoir_sample: nonpositive weight for key "),
                F.col(key_col).cast("string"),
            )
        )
    )
    u = (h + F.lit(1)).cast("double") / two60
    prio = F.round(F.log(u) / wchk, 6) + F.lit(0.0)
    ranked = (
        df.select(
            F.col(key_col).alias("key"),
            w.alias("w"),
            prio.alias("prio"),
        )
        .orderBy(F.col("prio").desc(), F.col("key").asc())
        .limit(k)
    )
    wr = Window.orderBy(F.col("prio").desc(), F.col("key").asc())
    return ranked.withColumn(
        "rank", F.row_number().over(wr).cast("long")
    )


def grouped_reservoir(
    df: DataFrame,
    k: int,
    weight_col: str,
    group_col: str = "grp",
    key_col: str = "key",
    salt: str = "gres",
) -> DataFrame:
    """Per-group exact-k weighted sample without replacement — the
    per-source cap every mixture pipeline applies before global
    resampling (keep at most k docs per crawl/source/shard, odds
    proportional to weight): the A-ES priority of
    :func:`reservoir_sample` (replayable ln(u)/w on the md5-60bit
    coin, same nonpositive-weight raise) selected per GROUP through
    the salted two-phase kselect, so a mega-group never sorts in one
    task — exactly the top-k discipline every ranked kernel here uses.

    The per-group rank window runs on the ALREADY-SELECTED <= k rows
    per group (bounded by construction). Returns
    (grp, key, w, prio, rank 1..k per group), deterministic and
    engine-portable like its global sibling.
    """
    from pyspark.sql import Window

    from combblas_spark.operators.kselect import kselect

    two60 = F.lit(float(1 << 60))
    h = md5_60bit(
        F.concat(F.lit(salt + "|"), F.col(key_col).cast("string"))
    )
    w = F.col(weight_col).cast("long")
    wchk = F.when(w >= 1, w).otherwise(
        F.raise_error(
            F.concat(
                F.lit("grouped_reservoir: nonpositive weight for key "),
                F.col(key_col).cast("string"),
            )
        )
    )
    u = (h + F.lit(1)).cast("double") / two60
    prio = F.round(F.log(u) / wchk, 6) + F.lit(0.0)
    ranked = df.select(
        F.col(group_col).alias("dst"),
        F.col(key_col).alias("src"),
        prio.alias("w"),
        w.alias("_w"),
    )
    sel = kselect(ranked, k, by="dst")
    wr = Window.partitionBy("dst").orderBy(
        F.col("w").desc(), F.col("src").asc()
    )
    return sel.withColumn(
        "rank", F.row_number().over(wr).cast("long")
    ).select(
        F.col("dst").alias("grp"),
        F.col("src").alias("key"),
        F.col("_w").alias("w"),
        F.col("w").alias("prio"),
        "rank",
    )


def waterfill_quota(
    demands: DataFrame,
    capacity: int,
    key_col: str = "key",
    demand_col: str = "demand",
    salt: str = "wf",
) -> DataFrame:
    """Max-min fair (water-filling) allocation of an integer capacity
    across competing integer demands — the fairness-first sibling of
    :func:`hamilton_quota` (which is proportional): every demand below
    the water level is fully satisfied, everyone else gets the level,
    and no key can gain without a smaller allocation losing (the
    max-min property). The bandwidth/crawl-capacity/annotation-budget
    allocator when starving small tenants is not acceptable.

    Exact-integer construction: rows sorted by (demand asc, key asc)
    through the range-partitioned global-rank sample sort; a row is
    SATURATED iff prefix(demand) + rows_at_or_after * its demand fits
    the capacity (the standard water-level test, all int64); the
    unsaturated rows share the residual as level = residual // m with
    the remainder's +1 going to the m' rows ranked first by the
    replayable md5 draw (hamilton's remainder discipline) — so the
    allocation sums to EXACTLY min(capacity, total demand), every
    alloc <= demand, and the whole thing is a pure function of
    (capacity, keys, demands).

    Returns (key, demand, alloc, saturated) — all int64.
    """
    from combblas_spark.functions.dedup import md5_60bit
    from combblas_spark.operators.indexing import _global_ranks

    base = demands.select(
        F.col(key_col).alias("key"),
        F.col(demand_col).cast("long").alias("demand"),
    )
    r = _global_ranks(
        base, [F.col("demand").asc(), F.col("key").asc()]
    )  # rank 0..n-1
    # two-phase global prefix sum of demand in rank order (the
    # pack_sequences idiom): ranks are already range-partitioned
    r = r.localCheckpoint()
    from pyspark.sql import Window

    counts = {
        row["p"]: row["s"]
        for row in r.groupBy(F.spark_partition_id().alias("p"))
        .agg(F.sum("demand").alias("s"))
        .collect()
    }
    n_parts = (max(counts) + 1) if counts else 1
    offsets, acc = [], 0
    for p in range(n_parts):
        offsets.append(acc)
        acc += counts.get(p, 0)
    off_arr = F.array(*[F.lit(int(o)).cast("long") for o in offsets])
    pid = F.spark_partition_id()
    w = (
        Window.partitionBy(pid)
        .orderBy(F.col("rank").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prefix = F.element_at(off_arr, pid + 1) + F.coalesce(
        F.sum("demand").over(w), F.lit(0)
    )
    n_total = r.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("demand").cast("long").alias("_td"),
    )
    staged = (
        r.withColumn("_prefix", prefix)
        .crossJoin(F.broadcast(n_total))
        .withColumn(
            "saturated",
            (
                F.col("_prefix")
                + (F.col("_n") - F.col("rank")) * F.col("demand")
                <= F.lit(int(capacity))
            ).cast("long"),
        )
    )
    staged = staged.localCheckpoint()
    pools = staged.agg(
        F.coalesce(
            F.sum(F.when(F.col("saturated") == 1, F.col("demand"))), F.lit(0)
        ).cast("long").alias("_s"),
        F.coalesce(
            F.sum(F.when(F.col("saturated") == 0, F.lit(1))), F.lit(0)
        ).cast("long").alias("_m"),
    )
    unsat = staged.filter(F.col("saturated") == 0).select("key", "demand")
    h = md5_60bit(
        F.concat(F.lit(salt + "|"), F.col("key").cast("string"))
    )
    topped = _global_ranks(
        unsat.withColumn("_h", h), [F.col("_h").asc(), F.col("key").asc()]
    ).select("key", F.col("rank").alias("_trank"))
    alloc = F.when(
        F.col("saturated") == 1, F.col("demand")
    ).otherwise(
        F.floor(
            (F.lit(int(capacity)) - F.col("_s")) / F.greatest("_m", F.lit(1))
        ).cast("long")
        + (
            F.col("_trank")
            < F.pmod(
                F.lit(int(capacity)) - F.col("_s"),
                F.greatest("_m", F.lit(1)),
            )
        ).cast("long")
    )
    return (
        staged.join(topped, "key", "left")
        .crossJoin(F.broadcast(pools))
        .select(
            "key",
            "demand",
            alloc.cast("long").alias("alloc"),
            "saturated",
        )
    )


def greedy_coverage(
    items: DataFrame,
    k: int = 5,
    id_col: str = "id",
    item_col: str = "item",
) -> DataFrame:
    """Greedy maximum-coverage seed selection — the submodular
    optimization shape behind corpus selection / data pruning /
    test-suite minimization: k rounds, each picking the document whose
    items cover the most NOT-YET-COVERED ground (ties by min id), with
    the classic (1 - 1/e) approximation guarantee (Nemhauser-Wolsey-
    Fisher 1978).

    Returns one row per round: ``(round, id, gain, covered_total)`` —
    exact BIGINTs. Rounds stop early when nothing remains uncovered.

    Scale shape: per round one anti-join of the (distinct) membership
    table against the covered-item set, one map-side-combinable gain
    count, and a TakeOrderedAndProject argmax; only two scalars cross
    the driver per round (the seed id and the covered total — the same
    bounded-action-per-round discipline as maximum_matching's phase
    schedule). The covered set is localCheckpointed per round so
    lineage never compounds.
    """
    spark = items.sparkSession
    sh = (
        items.select(
            F.col(id_col).alias("_id"), F.col(item_col).alias("_it")
        )
        .distinct()
        .persist()
    )
    try:
        covered = None
        rows = []
        for r in range(1, int(k) + 1):
            rem = (
                sh
                if covered is None
                else sh.join(covered, on="_it", how="left_anti")
            )
            top = (
                rem.groupBy("_id")
                .agg(F.count(F.lit(1)).alias("_g"))
                .orderBy(F.col("_g").desc(), F.col("_id").asc())
                .limit(1)
                .collect()
            )
            if not top:
                break
            seed, gain = top[0]["_id"], top[0]["_g"]
            newly = rem.filter(F.col("_id") == seed).select("_it")
            covered = (
                newly
                if covered is None
                else covered.unionByName(newly)
            ).distinct().localCheckpoint()
            rows.append((r, int(seed), int(gain), covered.count()))
        return spark.createDataFrame(
            rows, "round long, id long, gain long, covered_total long"
        )
    finally:
        sh.unpersist()
