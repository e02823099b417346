"""Deduplication: exact, MinHash+LSH, n-gram Jaccard, SimHash.

Scale shapes:
* exact          — one hash-groupBy on a 32-byte key (map-side combine).
* minhash + LSH  — shingle explode -> per-(doc, seed) min -> band buckets ->
                   bucket self-join. Never an all-pairs join; candidate set
                   is bounded by bucket sizes (hub buckets are real skew —
                   callers cap with ``max_bucket``).
* jaccard        — exact verification on the LSH candidates only.
* simhash        — 64 bit-majority aggregates, near-dups via Hamming bands.

MinHash uses md5 hex strings as the hash universe: lexicographic MIN over
md5(seed || '|' || shingle) is a valid uniform min-hash and is reproducible
in any SQL engine (DuckDB oracle) byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from combblas_spark.functions.text import tokens_col


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(fp, rep_id, n_dups): groups of byte-identical documents; rep = min id."""
    return (
        docs.select(F.col(id_col), F.md5(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("n_dups"))
    )


def shingles(docs: DataFrame, k: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingle): distinct k-word shingles per document (word n-grams).

    Built with transform over the token array + explode — no Python UDF.
    """
    t = tokens_col(F.col(text_col))
    n = F.size(t)
    sh = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(t, i + 1, k), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # documents shorter than k tokens emit NO shingles (a truncated <k-gram
    # would silently diverge from the SQL oracle, which requires k positions)
    # a single parquet file arrives as ONE partition; the ~100x explode +
    # md5 work downstream must be spread across cores BEFORE it happens
    docs = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    return (
        docs.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def minhash_signatures(
    sh: DataFrame, num_hashes: int = 8
) -> DataFrame:
    """(id, seed, minhash): per document and seed, the min md5 over shingles."""
    seeded = sh.select(
        "id",
        F.explode(F.array(*[F.lit(i) for i in range(num_hashes)])).alias("seed"),
        F.col("shingle"),
    )
    return (
        seeded.select(
            "id",
            "seed",
            F.md5(F.concat_ws("|", F.col("seed").cast("string"), F.col("shingle"))).alias("h"),
        )
        .groupBy("id", "seed")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_candidate_pairs(
    sig: DataFrame, bands: int = 4, rows_per_band: int = 2, max_bucket: int = 1000
) -> DataFrame:
    """(id_a, id_b) candidate near-dup pairs sharing >=1 LSH band bucket.

    Band key = md5 of the concatenated in-band minhashes. Buckets larger
    than ``max_bucket`` (degenerate hubs — e.g. boilerplate) are dropped,
    the standard web-dedup guard against quadratic bucket blowup.
    """
    banded = (
        sig.withColumn("band", (F.col("seed") / rows_per_band).cast("int"))
        .filter(F.col("band") < bands)
        .groupBy("id", "band")
        .agg(F.md5(F.concat_ws("|", F.sort_array(F.collect_list("minhash")))).alias("bucket"))
    )
    # banded feeds 4 plan branches (size agg + both join sides); without a
    # persist Spark recomputes the whole shingle->minhash pipeline each time
    banded = banded.persist()
    sized = banded.join(
        banded.groupBy("band", "bucket").agg(F.count(F.lit(1)).alias("bsz")),
        on=["band", "bucket"],
    ).filter(F.col("bsz") <= max_bucket)
    a = sized.select("band", "bucket", F.col("id").alias("id_a"))
    b = sized.select("band", "bucket", F.col("id").alias("id_b"))
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def jaccard_pairs(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs:
    (id_a, id_b, n_common, n_a, n_b) — all integers; jaccard =
    n_common / (n_a + n_b - n_common) left to the caller (keeps hashes exact).
    """
    sh = sh.persist()  # feeds sizes + both join sides
    pairs = pairs.persist()
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    sa = sh.select(F.col("id").alias("id_a"), "shingle")
    sb = sh.select(F.col("id").alias("id_b"), "shingle")
    common = (
        pairs.join(sa, on="id_a")
        .join(sb, on=["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        pairs.join(common, on=["id_a", "id_b"], how="left")
        .join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("n_a")), on="id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("n_b")), on="id_b")
        .select(
            "id_a",
            "id_b",
            F.coalesce(F.col("n_common"), F.lit(0)).alias("n_common"),
            "n_a",
            "n_b",
        )
    )


def md5_60bit(col) -> F.Column:
    """Engine-portable 60-bit token hash: int(md5(x)[0:15], 16).

    15 hex chars = 60 bits stays positive in a signed 64-bit integer, so
    Spark (conv+cast) and DuckDB (CAST('0x'||substr(md5(x),1,15) AS BIGINT))
    produce identical values — this is what makes simhash oracle-checkable.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 60) -> DataFrame:
    """(id, simhash): bit-majority of md5_60bit(token) over the document.

    ``bits`` per-bit sign aggregates, all Column expressions. The token hash
    is md5-derived (not xxhash64) so a DuckDB oracle replays the exact bits.
    """
    t = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens_col(F.col(text_col))).alias("tok")
    ).withColumn("h", md5_60bit(F.col("tok")))
    def bit(i):  # JVM-side 1<<i — a python literal overflows long at i=63
        return F.shiftleft(F.lit(1).cast("long"), i)

    aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(bit(i)) != 0, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    per_doc = t.groupBy("id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for i in range(bits):
        sig = sig.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, bit(i)).otherwise(F.lit(0).cast("long"))
        )
    return per_doc.select("id", sig.alias("simhash"))


def simhash_near_dups(
    sig: DataFrame,
    band_bits: int = 15,
    max_hamming: int = 3,
    bits: int = 60,
    max_bucket: int = 1000,
) -> DataFrame:
    """Candidate pairs whose simhashes agree on >=1 of the bits/band_bits
    bands, verified to Hamming distance <= max_hamming.

    Band buckets larger than ``max_bucket`` (degenerate boilerplate hubs)
    are dropped before the self-join — the same guard as
    ``lsh_candidate_pairs`` — so the (band, key) self-join is never
    |bucket|^2 on a pathological bucket at corpus scale.
    """
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    banded = sig.select(
        "id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", b * band_bits).bitwiseAND(F.lit(mask)).alias("key"),
                )
                for b in range(n_bands)
            ])
        ).alias("bk"),
    ).select("id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    # banded feeds 3 plan branches (size agg + both join sides)
    banded = banded.persist()
    sized = banded.join(
        banded.groupBy("band", "key").agg(F.count(F.lit(1)).alias("_bsz")),
        on=["band", "key"],
    ).filter(F.col("_bsz") <= max_bucket)
    a = sized.select("band", "key", F.col("id").alias("id_a"), F.col("simhash").alias("sh_a"))
    b = sized.select("band", "key", F.col("id").alias("id_b"), F.col("simhash").alias("sh_b"))
    pairs = (
        a.join(b, on=["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sh_a", "sh_b")
        .distinct()
    )
    return pairs.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def near_dup_clusters(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 4,
    bands: int = 2,
    rows_per_band: int = 2,
    max_bucket: int = 1000,
    tau_num: int = 1,
    tau_den: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """End-to-end near-dup clustering — the keep-one-per-cluster shape every
    web-scale dedup pipeline runs: MinHash-LSH candidates -> exact shingle-
    Jaccard verification (jaccard >= tau_num/tau_den, pure integer
    arithmetic: (tau_den+tau_num)*n_common >= tau_num*(n_a+n_b)) ->
    connected components over verified pairs -> canonical = min doc id per
    component. Returns (doc_id, canonical_id) for EVERY input document;
    singletons map to themselves. Keep rule downstream: doc_id ==
    canonical_id.

    Scale shape: every stage is a bounded bucket join or a hash groupBy
    (see lsh_candidate_pairs for the degenerate-bucket cap); the CC runs on
    the verified-pair edge set only — orders of magnitude smaller than the
    corpus — with cc_minlabel's superstep machinery (lineage truncation,
    size-gated broadcast).
    """
    from combblas_spark.algorithms.cc import cc_minlabel

    spark = docs.sparkSession
    sh = shingles(docs, k=k, id_col=id_col, text_col=text_col)
    sig = minhash_signatures(sh, num_hashes=num_hashes)
    cand = lsh_candidate_pairs(
        sig, bands=bands, rows_per_band=rows_per_band, max_bucket=max_bucket
    )
    jp = jaccard_pairs(sh, cand)
    ver = jp.filter(
        F.col("n_common") * (tau_den + tau_num)
        >= (F.col("n_a") + F.col("n_b")) * tau_num
    ).select("id_a", "id_b")
    edges = (
        ver.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .unionByName(ver.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .withColumn("w", F.lit(1.0))
    )
    labels = cc_minlabel(spark, edges)
    out = docs.select(F.col(id_col).cast("long").alias("doc_id")).join(
        labels.select(F.col("id").alias("doc_id"), "val"), on="doc_id", how="left"
    )
    return out.select(
        "doc_id",
        F.coalesce(F.col("val"), F.col("doc_id")).cast("long").alias("canonical_id"),
    )


def decontaminate(
    docs: DataFrame,
    k: int = 3,
    test_permille: int = 100,
    salt: str = "split",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Train/eval contamination audit — the pre-training hygiene pass that
    keeps benchmark (eval) text out of the training split: hash-split the
    corpus (functions/sampling.split_by_hash, same md5-60bit bucket as the
    split_docs contract), collect the eval side's distinct k-token shingle
    set, and count per TRAIN document how many of its distinct shingles
    also occur in eval. Returns (doc_id, n_shingles, n_overlap) for every
    train document; downstream drops (or scrubs) docs with n_overlap above
    a threshold.

    Scale shape: shingling is the same explode pipeline as MinHash; the
    audit itself is one hash semi-join on the shingle string (broadcastable
    when the eval split is small — AQE decides) plus two map-side-combinable
    counts. No all-pairs anything.
    """
    from combblas_spark.functions.sampling import split_by_hash

    s = split_by_hash(docs, key_col=id_col, test_permille=test_permille, salt=salt)
    sh = shingles(s, k=k, id_col=id_col, text_col=text_col)
    splits = s.select(F.col(id_col).alias("id"), "split")
    shs = sh.join(splits, on="id")
    eval_sh = (
        shs.filter(F.col("split") == "test").select("shingle").distinct()
    )
    train_sh = shs.filter(F.col("split") == "train").select("id", "shingle")
    totals = train_sh.groupBy("id").agg(F.count(F.lit(1)).alias("n_shingles"))
    overlaps = (
        train_sh.join(eval_sh, on="shingle", how="leftsemi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    train_ids = splits.filter(F.col("split") == "train").select("id")
    return (
        train_ids.join(totals, on="id", how="left")
        .join(overlaps, on="id", how="left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_shingles"), F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
        )
    )


def source_dup_matrix(
    docs: DataFrame,
    k: int = 3,
    num_hashes: int = 4,
    bands: int = 2,
    rows_per_band: int = 2,
    max_bucket: int = 1000,
    tau_num: int = 1,
    tau_den: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source duplication matrix — the data-governance rollup every
    multi-source corpus audit produces: for each unordered source pair,
    how many VERIFIED near-dup document pairs straddle it (diagonal rows =
    within-source duplication). Which crawls copy which is the first
    question a mixture owner asks before re-weighting; this is the
    near-dup analog of mixture_stats.

    Pipeline: the same capped MinHash-LSH candidates -> integer-exact
    shingle-Jaccard >= tau verification as near_dup_clusters, then two
    O(V)-keyed hash joins to the (doc -> source) table and one hash count
    per canonical (source_a <= source_b) pair. -> (source_a, source_b,
    n_pairs BIGINT), only pairs with n_pairs > 0.

    Scale shape: inherits lsh_candidate_pairs' degenerate-bucket cap (no
    quadratic buckets); the source rollup output is O(#sources^2) — tiny
    at any corpus scale.
    """
    sh = shingles(docs, k=k, id_col=id_col, text_col=text_col)
    sig = minhash_signatures(sh, num_hashes=num_hashes)
    cand = lsh_candidate_pairs(
        sig, bands=bands, rows_per_band=rows_per_band, max_bucket=max_bucket
    )
    jp = jaccard_pairs(sh, cand)
    ver = jp.filter(
        F.col("n_common") * (tau_den + tau_num)
        >= (F.col("n_a") + F.col("n_b")) * tau_num
    ).select("id_a", "id_b")
    meta = docs.select(
        F.col(id_col).cast("long").alias("id"), F.col(source_col).alias("src_name")
    )
    j = (
        ver.join(meta.select(F.col("id").alias("id_a"), F.col("src_name").alias("sx")), "id_a")
        .join(meta.select(F.col("id").alias("id_b"), F.col("src_name").alias("sy")), "id_b")
    )
    return (
        j.select(
            F.least("sx", "sy").alias("source_a"),
            F.greatest("sx", "sy").alias("source_b"),
        )
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    )


def prefix_jaccard_pairs(
    docs: DataFrame,
    tau_num: int = 1,
    tau_den: int = 2,
    k: int = 3,
    max_bucket: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Prefix-filtering similarity join (PPJoin-style, Chaudhuri/Xiao
    lineage): ALL pairs with exact shingle-set Jaccard >= tau_num/tau_den,
    found without an all-pairs join and — unlike the MinHash-LSH family —
    with NO false negatives (under the same max_bucket cap every sibling
    carries).

    The filter: order each document's shingles by global rarity (df ASC,
    shingle ASC — a total order); two sets with J >= t MUST share a
    shingle inside each other's first p = n - ceil(t*n) + 1 rarest
    shingles, so only prefix-shingle buckets are self-joined. The prefix
    length is INTEGER arithmetic (ceil(t*n) = (tau_num*n + tau_den - 1)
    DIV tau_den) — no float threshold can round differently per engine.
    Candidates are then verified with the exact integer Jaccard test
    (jaccard_pairs), the same n_common*(den+num) >= num*(n_a+n_b) form
    near_dup_clusters uses.

    Output: (id_a, id_b, n_common, n_a, n_b, jac) for verified pairs,
    jac = ROUND(common/union, 6).

    Scale shape: one df-count aggregate over the shingle table, one
    per-document window (partition = one document's shingles — bounded by
    document length, never corpus-sized), one bucket-capped self-join on
    the PREFIX table only (rare shingles by construction -> small
    buckets; the cap guards boilerplate), then verification on candidates
    only. The prefix join touches O(sum prefix_len) rows, a (1-t)
    fraction of the shingle table.
    """
    from pyspark.sql import Window

    sh = shingles(docs, k=k, id_col=id_col, text_col=text_col).persist()
    dfc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    nd = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("id").orderBy(F.col("df").asc(), F.col("shingle").asc())
    ranked = (
        sh.join(dfc, on="shingle")
        .withColumn("rn", F.row_number().over(w))
        .join(nd, on="id")
    )
    # p = n - ceil(t*n) + 1, all BIGINT ops
    ceil_tn = F.floor(
        (F.lit(tau_num) * F.col("n") + F.lit(tau_den - 1)) / F.lit(tau_den)
    )
    pref = ranked.filter(F.col("rn") <= F.col("n") - ceil_tn + 1).select(
        "id", "shingle"
    )
    pref = pref.persist()
    sized = pref.join(
        pref.groupBy("shingle").agg(F.count(F.lit(1)).alias("_bsz")), on="shingle"
    ).filter(F.col("_bsz") <= max_bucket)
    a = sized.select("shingle", F.col("id").alias("id_a"))
    b = sized.select("shingle", F.col("id").alias("id_b"))
    cand = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    jp = jaccard_pairs(sh, cand)
    return jp.filter(
        F.col("n_common") * (tau_den + tau_num)
        >= (F.col("n_a") + F.col("n_b")) * tau_num
    ).select(
        "id_a",
        "id_b",
        "n_common",
        "n_a",
        "n_b",
        F.round(
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
        ).alias("jac"),
    )


def span_contamination(
    docs: DataFrame,
    k: int = 3,
    min_span: int = 6,
    max_df: int = 20,
    test_permille: int = 100,
    salt: str = "split",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span-level train/eval contamination: for train/eval document pairs,
    the LONGEST contiguous token run they share — the exact-substring
    upgrade of decontaminate()'s shingle-count audit (a hit count can't
    distinguish 50 scattered 3-grams from one verbatim 52-token quote;
    eval-suite hygiene rules are phrased over span length).

    Same md5-60bit hash split as split_docs/decontaminate. POSITIONAL
    k-shingles (not deduped — positions matter) matched across the split;
    within a (train, eval, t_ord - e_ord) diagonal, consecutive t_ords
    form a run of length L = a shared span of L + k - 1 tokens. Output:
    (train_id, eval_id, longest_span BIGINT) for pairs with
    longest_span >= min_span.

    Scale shape: the shingle join is capped by DISTINCT-document shingle
    frequency (``max_df`` — ubiquitous boilerplate shingles are exactly
    the ones whose pair fan-out explodes and whose spans mean nothing);
    run detection is a window per (pair, diagonal) — bounded by one
    document's length, never corpus-sized.
    """
    from combblas_spark.functions.sampling import split_by_hash
    from combblas_spark.functions.text import tokens_col
    from pyspark.sql import Window

    t = tokens_col(F.col(text_col))
    n = F.size(t)
    arr = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.struct(
                i.alias("ord"), F.array_join(F.slice(t, i + 1, k), " ").alias("shingle")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<ord:int,shingle:string>>"))
    s = split_by_hash(docs, key_col=id_col, test_permille=test_permille, salt=salt)
    s = s.repartition(s.sparkSession.sparkContext.defaultParallelism)
    posed = (
        s.select(F.col(id_col).alias("id"), "split", F.explode(arr).alias("p"))
        .select("id", "split", F.col("p.ord").alias("ord"), F.col("p.shingle").alias("shingle"))
        .filter(F.col("shingle") != "")
    )
    posed = posed.persist()
    keep = (
        posed.select("id", "shingle")
        .distinct()
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("shingle")
    )
    capped = posed.join(keep, on="shingle")
    tr = capped.filter(F.col("split") == "train").select(
        F.col("id").alias("train_id"), F.col("ord").alias("t_ord"), "shingle"
    )
    ev = capped.filter(F.col("split") == "test").select(
        F.col("id").alias("eval_id"), F.col("ord").alias("e_ord"), "shingle"
    )
    m = tr.join(ev, on="shingle").select(
        "train_id", "eval_id", "t_ord", (F.col("t_ord") - F.col("e_ord")).alias("diag")
    )
    w = Window.partitionBy("train_id", "eval_id", "diag").orderBy("t_ord")
    runs = (
        m.withColumn("_rn", F.row_number().over(w))
        .select(
            "train_id", "eval_id", "diag", (F.col("t_ord") - F.col("_rn")).alias("grp")
        )
        .groupBy("train_id", "eval_id", "diag", "grp")
        .agg(F.count(F.lit(1)).alias("run"))
    )
    return (
        runs.groupBy("train_id", "eval_id")
        .agg((F.max("run") + F.lit(k - 1)).cast("long").alias("longest_span"))
        .filter(F.col("longest_span") >= min_span)
    )


def winnow_pairs(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    max_df: int = 20,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing clone-pair candidates (Schleimer, Wilkerson & Aiken 2003,
    the MOSS local fingerprinting): (doc_a, doc_b, n_shared) for document
    pairs sharing >= ``min_shared`` selected fingerprints — the EIGHTH
    candidate-generation mode of the dedup family, and the GUARANTEE-based
    one: any two documents sharing a verbatim token run of at least
    w + k - 1 tokens are certain to share a fingerprint (every length-w
    window of k-gram hashes inside the shared run selects the same minimal
    hash in both documents), unlike MinHash/SimHash's probabilistic recall.
    The code-clone detector for a source-file corpus.

    Selection is the window MIN of the string key
    ``substr(md5(gram),1,15) || '|' || lpad(ord, 8, '0')`` — lexicographic
    (hash, position), so ties inside a window break deterministically and
    identically in every engine (the positional suffix shifts uniformly
    per document and never reorders, so a 0- vs 1-based ord cannot change
    which HASH is selected); only full windows select (documents shorter
    than w + k - 1 tokens emit nothing). Only the 15-hex hash part joins.

    Scale shape: selection windows are per-document (bounded by one
    document's length, never corpus-sized) and keep ~2/(w+1) of grams;
    the pair join is over SELECTED fingerprints only, capped by
    distinct-document frequency (``max_df`` — ubiquitous boilerplate
    fingerprints are exactly the quadratic ones), so per-fingerprint
    fan-out is <= max_df^2 and no hub ever squares unbounded.
    """
    from pyspark.sql import Window
    from combblas_spark.functions.text import tokens_col

    t = tokens_col(F.col(text_col))
    n = F.size(t)
    arr = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.struct(
                i.alias("ord"),
                F.substring(
                    F.md5(F.array_join(F.slice(t, i + 1, k), " ")), 1, 15
                ).alias("h"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<ord:int,h:string>>"))
    d = docs.repartition(docs.sparkSession.sparkContext.defaultParallelism)
    keyed = (
        d.select(F.col(id_col).alias("id"), F.explode(arr).alias("p"))
        .select(
            "id",
            F.col("p.ord").alias("ord"),
            F.concat(
                F.col("p.h"), F.lit("|"), F.lpad(F.col("p.ord").cast("string"), 8, "0")
            ).alias("key"),
        )
    )
    pw = Window.partitionBy("id")
    sw = Window.partitionBy("id").orderBy("ord").rowsBetween(Window.currentRow, w - 1)
    sel = (
        keyed.select(
            "id", "ord", F.count(F.lit(1)).over(pw).alias("m"),
            F.min("key").over(sw).alias("selkey"),
        )
        .filter(F.col("ord") <= F.col("m") - w)  # full windows only (0-based)
        .select("id", F.substring("selkey", 1, 15).alias("fp"))
        .distinct()
    )
    sel = sel.persist()
    keep = (
        sel.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("fp")
    )
    selc = sel.join(keep, on="fp")
    a = selc.select(F.col("id").alias("doc_a"), "fp")
    b = selc.select(F.col("id").alias("doc_b"), "fp")
    return (
        a.join(b, on="fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def span_dedup_stats(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span: int = 5,
) -> DataFrame:
    """Exact duplicated-span removal audit — Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"),
    ExactSubstr: every occurrence of a >= ``span``-token run that appears
    more than once in the corpus is removed EXCEPT the canonical first
    occurrence (min (doc, pos)); this reports, per document, how many
    tokens that removes. The doc-level dedup family (exact/minhash/simhash)
    can't see partial overlap — boilerplate headers, quoted passages —
    which is exactly what this catches.

    Mechanics: every ``span``-gram occurrence (doc, pos) is keyed by the
    md5-60bit hash of its joined tokens (engine-replayable; 60-bit
    collisions merge grams with probability ~n²/2⁶¹ — the same accepted
    tradeoff as minhash_signatures). The canonical occurrence per gram is
    the min of the composite key doc·2²⁰ + pos (documents are capped at
    2²⁰ tokens — a CHUNKED corpus, functions/sampling.chunk_documents,
    always satisfies this). Non-canonical occurrences become [pos, pos+span)
    intervals; their per-doc union length (one running-max window ordered
    by pos, partition bounded by doc length) is the removed-token count.

    Scale shape: gram hashing is one slice-per-position HOF over the token
    array (JVM codegen, O(len·span) per doc, no joins); the canonical pass
    is ONE map-side-combinable MIN agg on the gram hash; dup detection is
    one gram-keyed hash join; coverage is a per-doc window. Nothing is
    quadratic in the corpus and nothing collects.

    Returns (doc_id, n_tokens, n_dup_spans, n_removed, n_kept) for EVERY
    input document (zero rows removed -> zeros).
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.col(id_col).cast("long").alias("id"),
        tokens_col(F.col(text_col)).alias("toks"),
    )
    base = toks.select("id", F.size("toks").cast("long").alias("n_tokens"))
    grams = (
        toks.filter(F.size("toks") >= span)
        .select(
            "id",
            F.posexplode(
                F.transform(
                    F.sequence(
                        F.lit(1), F.size("toks") - span + 1
                    ),
                    lambda i: F.array_join(F.slice(F.col("toks"), i, span), " "),
                )
            ).alias("p0", "gram"),
        )
        .select(
            "id",
            (F.col("p0") + 1).cast("long").alias("pos"),
            md5_60bit(F.col("gram")).alias("gh"),
        )
    )
    key = F.col("id") * F.lit(1 << 20) + F.col("pos")
    canon = grams.groupBy("gh").agg(F.min(key).alias("mk"))
    dups = (
        grams.join(canon, on="gh")
        .filter(key != F.col("mk"))
        .select("id", "pos", (F.col("pos") + span).alias("e"))
    )
    w = (
        Window.partitionBy("id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cov = dups.withColumn("run_end", F.max("e").over(w))
    per_doc = cov.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_dup_spans"),
        F.sum(
            F.greatest(
                F.lit(0).cast("long"),
                F.col("e")
                - F.greatest(F.coalesce("run_end", F.lit(0)), F.col("pos")),
            )
        )
        .cast("long")
        .alias("n_removed"),
    )
    return base.join(per_doc, on="id", how="left").select(
        F.col("id").alias("doc_id"),
        "n_tokens",
        F.coalesce("n_dup_spans", F.lit(0)).cast("long").alias("n_dup_spans"),
        F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        (F.col("n_tokens") - F.coalesce("n_removed", F.lit(0)))
        .cast("long")
        .alias("n_kept"),
    )


def containment_pairs(
    docs: DataFrame,
    tau_num: int = 9,
    tau_den: int = 10,
    k: int = 3,
    max_bucket: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Directional containment join (Broder's one-sided resemblance):
    all ORDERED pairs (id_a, id_b), a != b, with
    |shingles(A) ∩ shingles(B)| >= tau * |shingles(A)| — A is (near-)
    CONTAINED in B. This is the subset-duplication signal the symmetric
    Jaccard family structurally misses: a document swallowed whole by a
    2x-longer one has containment 1.0 but Jaccard ~0.5, below every
    near-dup threshold, and MinHash-LSH won't even surface the pair as a
    candidate (band collision probability tracks RESEMBLANCE).

    Candidate generation is the asymmetric prefix filter: if
    |A ∩ B| >= c = ceil(tau * n_a), then by pigeonhole A shares with B
    one of its first n_a - c + 1 rarest shingles (global df-ASC,
    shingle-ASC total order — prefix_jaccard_pairs' order), so only A's
    prefix joins the full shingle table; B needs NO prefix (containment
    ignores |B|), which is what makes the filter exact in this
    direction. The prefix length uses INTEGER arithmetic only.

    Scale shape: the join fanout is sum over A-prefix shingles of
    df(shingle) — prefix shingles are the globally RAREST by
    construction, and the full side is df-capped at ``max_bucket`` (the
    one documented false-negative source, shared with every sibling:
    a shingle in >max_bucket documents is stop-shingle boilerplate).
    Verification is the exact integer test n_common * tau_den >=
    tau_num * n_a on candidates only. Output: (id_a, id_b, n_common,
    n_a, n_b, cont, jac), cont/jac ROUND(.,6).
    """
    from pyspark.sql import Window

    sh = shingles(docs, k=k, id_col=id_col, text_col=text_col).persist()
    dfc = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    nd = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("id").orderBy(
        F.col("df").asc(), F.col("shingle").asc()
    )
    ranked = (
        sh.join(dfc, on="shingle")
        .withColumn("rn", F.row_number().over(w))
        .join(nd, on="id")
    )
    ceil_tn = F.floor(
        (F.lit(tau_num) * F.col("n") + F.lit(tau_den - 1)) / F.lit(tau_den)
    )
    pref = ranked.filter(F.col("rn") <= F.col("n") - ceil_tn + 1).select(
        F.col("id").alias("id_a"), "shingle"
    )
    full = (
        sh.join(dfc.filter(F.col("df") <= max_bucket), on="shingle")
        .select(F.col("id").alias("id_b"), "shingle")
    )
    cand = (
        pref.join(full, on="shingle")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    jp = jaccard_pairs(sh, cand)
    return jp.filter(
        F.col("n_common") * tau_den >= F.lit(tau_num) * F.col("n_a")
    ).select(
        "id_a",
        "id_b",
        "n_common",
        "n_a",
        "n_b",
        F.round(F.col("n_common") / F.col("n_a"), 6).alias("cont"),
        F.round(
            F.col("n_common")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
            6,
        ).alias("jac"),
    )


def set_resemblance_pairs(
    items: DataFrame,
    num_hashes: int = 8,
    bands: int = 8,
    rows_per_band: int = 1,
    max_bucket: int = 1000,
    tau_num: int = 1,
    tau_den: int = 2,
) -> DataFrame:
    """Generic set-similarity self-join over a membership table
    (id, shingle): minhash-LSH candidates verified by exact integer
    Jaccard, keeping pairs with J >= tau_num/tau_den. The same
    machinery :func:`lsh_candidate_pairs` runs on document shingles,
    lifted to ARBITRARY key->item sets — the Bharat–Broder mirror-site
    shape (id = host, item = content fingerprint of a hosted page), user
    overlap, repo file-set resemblance, etc.

    Scale shape: candidates come only from band-bucket collisions
    (bucket-capped, never all-pairs); the exact verify joins items on
    the candidate set alone. Default 8 single-row bands: detection
    probability 1-(1-J)^8 (0.996 at J = 0.5) — single-row bands suit the
    mirror regime where target similarity is moderate (0.5-0.9) and the
    verify filters the extra low-J candidates cheaply.

    Returns (id_a, id_b, n_common, n_a, n_b), exact integers, id_a <
    id_b, J-thresholded by cross-multiplication (no float compare).
    """
    sig = minhash_signatures(items, num_hashes=num_hashes)
    cand = lsh_candidate_pairs(
        sig, bands=bands, rows_per_band=rows_per_band, max_bucket=max_bucket
    )
    j = jaccard_pairs(items, cand)
    return j.filter(
        F.lit(tau_den) * F.col("n_common")
        >= F.lit(tau_num) * (F.col("n_a") + F.col("n_b") - F.col("n_common"))
    )


def fuzzy_pairs(
    strings: DataFrame,
    max_bucket: int = 256,
    key_col: str = "key",
    str_col: str = "s",
) -> DataFrame:
    """SymSpell deletion-neighborhood fuzzy self-join: every unordered
    pair (key_a < key_b) of strings within Levenshtein distance <= 1 —
    the TYPO-level near-dup regime the shingle/MinHash family
    structurally misses (a one-character edit moves k adjacent k-grams,
    so short strings — queries, titles, entity names, SKUs — land far
    below every Jaccard threshold while being obvious duplicates).

    Blocking is the exact deletion-neighborhood pigeonhole: each string
    emits L+1 signatures (itself plus every single-character deletion).
    Two strings with ed(a,b) <= 1 ALWAYS share one — equal strings share
    the string itself; a substitution at position i makes both del-i
    variants equal; for an indel the longer side's deletion IS the
    shorter string. So the candidate join on signature is complete for
    d = 1, and the built-in ``levenshtein`` (exact integer, identical in
    Spark and DuckDB) verifies candidates only — never all pairs.

    Scale shape: fan-out is exactly L+1 rows per string (bounded by the
    string length — this is a short-string operator; for documents use
    the shingle family), the self-join is an equi-join on the signature
    hash, and signatures shared by > ``max_bucket`` strings are dropped
    before the join (the one documented false-negative source, shared
    with every LSH sibling: a deletion variant hit by >max_bucket
    distinct strings is stop-fragment mass, e.g. the empty string from
    a corpus of single characters). Empty strings are filtered (they
    have no deletion neighborhood and pair only with 1-char strings,
    which their own signatures already cover).

    Reference parity: the reference has no edit-distance kernel; this is
    an engine-original in the dedup family (SURVEY.md §2 training-data
    ops). Output: (key_a, key_b, s_a, s_b, dist), dist in {0, 1}.
    """
    s = str_col
    base = strings.select(
        F.col(key_col).alias("key"), F.col(s).alias("s")
    ).filter(F.length("s") >= 1)
    sigs = base.select(
        "key",
        "s",
        F.explode(
            F.expr(
                "array_distinct(concat(array(s), "
                "transform(sequence(1, length(s)), "
                "i -> concat(left(s, i-1), substring(s, i+1, length(s)-i)))))"
            )
        ).alias("sig"),
    )
    ok = (
        sigs.groupBy("sig")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_bucket)
        .select("sig")
    )
    capped = sigs.join(ok, on="sig")
    a = capped.select(
        "sig", F.col("key").alias("key_a"), F.col("s").alias("s_a")
    )
    b = capped.select(
        "sig", F.col("key").alias("key_b"), F.col("s").alias("s_b")
    )
    cand = (
        a.join(b, on="sig")
        .filter(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "s_a", "s_b")
        .distinct()
    )
    return cand.withColumn(
        "dist", F.levenshtein("s_a", "s_b").cast("long")
    ).filter(F.col("dist") <= 1)


def pair_agreement(a_pairs: DataFrame, b_pairs: DataFrame) -> DataFrame:
    """2x2 agreement audit between two (id_a, id_b) pair sets (both
    canonically ordered id_a < id_b): ONE row (n_a, n_b, n_both,
    n_a_only, n_b_only) — the governance check run before trusting a
    single dedup modality (text-shingle vs embedding-cosine, or any
    two of the engine's eight modes). One full-outer hash join + one
    aggregate."""
    fj = (
        a_pairs.select("id_a", "id_b").withColumn("_a", F.lit(1))
        .join(
            b_pairs.select("id_a", "id_b").withColumn("_b", F.lit(1)),
            on=["id_a", "id_b"],
            how="outer",
        )
    )
    return fj.agg(
        F.sum(F.coalesce(F.col("_a"), F.lit(0))).cast("long").alias("n_a"),
        F.sum(F.coalesce(F.col("_b"), F.lit(0))).cast("long").alias("n_b"),
        F.sum(
            F.when(F.col("_a").isNotNull() & F.col("_b").isNotNull(), 1)
            .otherwise(0)
        ).cast("long").alias("n_both"),
        F.sum(F.when(F.col("_b").isNull(), 1).otherwise(0))
        .cast("long").alias("n_a_only"),
        F.sum(F.when(F.col("_a").isNull(), 1).otherwise(0))
        .cast("long").alias("n_b_only"),
    )
