"""Similarity search over an embedding column (array<float>).

* ``cosine_topk``  — brute-force exact top-k: the correctness baseline.
  Dot products are sequential folds over the array (F.aggregate over
  zip_with), deterministic order -> bitwise-reproducible in a SQL oracle.
* ``lsh_ann_topk`` — random-hyperplane LSH bucketing: the scale path.
  Planes are a deterministic seeded literal (few KB, shipped in the plan);
  search is bucket-local, so the join is |bucket| x |bucket| instead of n^2.
* ``ivf_topk`` — IVF-Flat: Lloyd-trained coarse quantizer (n_cells
  centroids), vectors indexed by nearest cell, queries probe their
  n_probe nearest cells and brute-force only inside them. The centroid
  table is a few KB — collected to the driver each Lloyd round and
  re-broadcast as plan literals (the sample-sort pattern: tiny global
  state on the driver, all heavy work distributed). Every distance is
  ROUND(·, 6)-stabilized so a SQL oracle replays training + search
  byte-for-byte (same trick as the md5 minhash universe).

At 100 TB the brute-force path is only for reranking candidates; LSH or
IVF bounds the candidate set per query.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return emb.withColumn("nrm", norm(F.col(vec_col)))


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector.

    (query_id, neighbor_id, cos) — ties broken by neighbor_id asc; the
    query itself is excluded. ``queries`` has (query_id, qvec)."""
    e = with_norm(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("vec"), F.col("nrm")
    )
    q = queries.select(
        F.col("query_id"), F.col("qvec"), norm(F.col("qvec")).alias("qnrm")
    )
    scored = (
        q.crossJoin(e)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("_rn").alias("rank"))
    )


def _cell_dist(vec: Column, cvec: list[float]) -> Column:
    """round(c.c - 2 x.c, 6) — the argmin-equivalent of L2 distance with
    the x.x term dropped (constant per row); rounded so cross-engine
    double-sum ulp noise can never flip an argmin."""
    c = F.array(*[F.lit(float(v)) for v in cvec])
    cc = sum(v * v for v in cvec)
    return F.round(F.lit(cc) - 2.0 * dot(vec, c), 6)


def _nearest_cell(vec: Column, cents: dict[int, list[float]]) -> Column:
    """argmin cell id under _cell_dist; ties break toward the smaller id
    (struct array_min orders by (dist, cell))."""
    # explicit cast: struct field aliases are not preserved inside F.array
    return F.array_min(
        F.array(*[
            F.struct(_cell_dist(vec, cv).alias("d"), F.lit(i).alias("c"))
            .cast("struct<d:double,c:int>")
            for i, cv in sorted(cents.items())
        ])
    )["c"]


def ivf_train(
    emb: DataFrame,
    n_cells: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict[int, list[float]]:
    """Lloyd-trained coarse quantizer: returns {cell id: centroid}.

    Seeds are the ``n_cells`` vectors with the smallest ids (deterministic,
    no RNG); each round assigns every vector to its nearest centroid
    (distributed argmin over plan literals) and recomputes position-wise
    means (posexplode + avg). Centroid components are rounded to 6 dp at
    every step BY THE ENGINE (F.round, HALF_UP = away from zero on halves,
    same rule as DuckDB ROUND) — seeds included, so one rounding mode covers
    the whole training run and a SQL oracle replays it byte-for-byte. Cells
    that lose all members are dropped (ids of the survivors are stable).
    """
    seeds = (
        emb.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(
            F.transform(
                F.col(vec_col), lambda v: F.round(v.cast("double"), 6)
            ).alias("v")
        )
        .collect()
    )
    cents = {i: [float(v) for v in r["v"]] for i, r in enumerate(seeds)}
    for _ in range(iters):
        cell = _nearest_cell(F.col(vec_col), cents)
        means = (
            emb.select(cell.alias("cell"), F.posexplode(vec_col).alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("m"))
            .collect()
        )
        new: dict[int, dict[int, float]] = {}
        for r in means:
            new.setdefault(r["cell"], {})[r["pos"]] = r["m"]
        cents = {
            c: [comps[p] for p in sorted(comps)] for c, comps in sorted(new.items())
        }
    return cents


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-Flat approximate top-k cosine neighbors.

    Index side: every vector lands in exactly ONE cell (its nearest
    centroid), so probing never produces duplicate candidate pairs. Query
    side: each query expands to its ``n_probe`` nearest cells and
    brute-forces only those cells' members — the candidate set per query is
    ~n_probe/n_cells of the corpus instead of all of it. Output schema
    matches cosine_topk: (query_id, neighbor_id, cos, rank).
    """
    cents = ivf_train(emb, n_cells=n_cells, iters=iters,
                      id_col=id_col, vec_col=vec_col)
    e = with_norm(emb, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vec"),
        F.col("nrm"),
        _nearest_cell(F.col(vec_col), cents).alias("cell"),
    )
    probes = F.slice(
        F.array_sort(F.array(*[
            F.struct(_cell_dist(F.col("qvec"), cv).alias("d"), F.lit(i).alias("c"))
            .cast("struct<d:double,c:int>")
            for i, cv in sorted(cents.items())
        ])),
        1, n_probe,
    )
    q = (
        queries.select("query_id", "qvec", norm(F.col("qvec")).alias("qnrm"))
        .withColumn("_p", F.explode(probes))
        .select("query_id", "qvec", "qnrm", F.col("_p.c").alias("cell"))
    )
    scored = (
        q.join(e, on="cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("_rn").alias("rank"))
    )


def _planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_buckets(
    emb: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, bucket): sign pattern of the vector against n_planes seeded
    random hyperplanes, packed into a long."""
    planes = _planes(dim, n_planes, seed)
    bucket = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in p]))
        bucket = bucket.bitwiseOR(
            F.when(d > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec"), bucket.alias("bucket"))


def lsh_ann_topk(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 10_000,
) -> DataFrame:
    """Approximate all-pairs top-k: candidates limited to same-bucket pairs.

    Buckets larger than ``max_bucket`` are dropped before the self-join —
    without the cap one degenerate hyperplane bucket (all-near-zero vectors,
    boilerplate embeddings) costs |bucket|^2 at corpus scale; same guard as
    dedup.lsh_candidate_pairs.
    """
    b = lsh_buckets(emb, n_planes, seed, dim, id_col, vec_col)
    b = b.withColumn("nrm", norm(F.col("vec")))
    b = b.join(
        b.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bsz")), on="bucket"
    ).filter(F.col("_bsz") <= max_bucket)
    lhs = b.select("bucket", F.col("id").alias("query_id"), F.col("vec").alias("qvec"), F.col("nrm").alias("qnrm"))
    rhs = b.select("bucket", F.col("id").alias("neighbor_id"), F.col("vec").alias("vec"), F.col("nrm"))
    scored = (
        lhs.join(rhs, on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("query_id", "neighbor_id", "cos", F.col("_rn").alias("rank"))
    )


def mutual_nn(
    emb: DataFrame,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 10_000,
) -> DataFrame:
    """Reciprocal nearest neighbors: pairs (a, b) where b is a's rank-1
    ANN neighbor AND a is b's — the standard high-precision pair filter
    for embedding dedup / bitext alignment / cluster seeding (mutual-NN
    survives the asymmetric-hub failure of one-way NN: a boilerplate
    centroid vector is everyone's neighbor but reciprocates only once).

    Candidates are same-LSH-bucket pairs under the ``max_bucket`` cap
    (identical scale shape to lsh_ann_topk — never all-pairs); the rank-1
    select orders by the ROUNDED cosine (6 dp) with id tiebreak, the
    repo's engine-portable ordering rule, so the oracle replays the
    argmax exactly. Reciprocity is a self-join of the |V|-row rank-1
    table with itself — O(V), not O(candidates).

    -> (id_a, id_b, cos) with id_a < id_b, cos ROUND(.,6).
    """
    b = lsh_buckets(emb, n_planes, seed, dim, id_col, vec_col)
    b = b.withColumn("nrm", norm(F.col("vec")))
    b = b.join(
        b.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bsz")), on="bucket"
    ).filter(F.col("_bsz") <= max_bucket)
    lhs = b.select(
        "bucket", F.col("id").alias("qid"),
        F.col("vec").alias("qvec"), F.col("nrm").alias("qnrm"),
    )
    rhs = b.select("bucket", F.col("id").alias("nid"), "vec", "nrm")
    scored = (
        lhs.join(rhs, on="bucket")
        .filter(F.col("nid") != F.col("qid"))
        .select(
            "qid",
            "nid",
            F.round(
                dot(F.col("qvec"), F.col("vec")) / (F.col("qnrm") * F.col("nrm")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid").asc())
    nn1 = (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    fwd = nn1.filter(F.col("qid") < F.col("nid"))
    rev = nn1.filter(F.col("qid") > F.col("nid")).select(
        F.col("nid").alias("qid"), F.col("qid").alias("nid")
    )
    return fwd.join(rev, ["qid", "nid"]).select(
        F.col("qid").alias("id_a"), F.col("nid").alias("id_b"), "cos"
    )


def sq8_quantized(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """int8 scalar quantization (SQ8) of an embedding column: per-vector
    scale ``amax = max|v_i|``, codes ``q_i = floor(v_i/amax*127 + 0.5)``
    (round-half-up spelled as floor(x+0.5) — bit-identical in Spark and
    DuckDB, unlike the engines' ROUND-to-integer tie rules; |q_i| <= 127
    by construction, so the codes fit int8 even though Spark's floor
    yields BIGINT columns). Zero vectors (amax = 0) are dropped — they
    have no direction to quantize.

    -> (id, qvec array<bigint>, qq bigint) with qq = sum q_i^2 > 0.

    Cosine is scale-invariant, so the quantized cosine
    ``sum(qa_i*qb_i) / (sqrt(qqa)*sqrt(qqb))`` needs no dequantization:
    the numerator is EXACT int64 arithmetic (<= 64*127^2 per pair, no
    float summation order to stabilize) and only the final division is
    floating point. At 100 TB this is the memory-bandwidth scale path:
    a dim-64 float32 vector is 256 B, its SQ8 codes 64 B, so the
    candidate-scoring pass moves 4x less data per executor — the
    standard faiss SQ8 trade (~1-2% cosine error, see the accuracy
    pytest bound)."""
    amax = F.array_max(F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))))
    q = emb.select(
        F.col(id_col).alias("id"), *keep, F.col(vec_col).alias("vec")
    ).withColumn("_amax", amax)
    # Referencing _amax INSIDE the transform lambda lets CollapseProject
    # inline the array_max fold per element (64x64 interpreted ops/row,
    # measured 10x the whole query); zip_with against array_repeat(_amax)
    # evaluates the fold once per row instead.
    q = q.filter(F.col("_amax") > 0).withColumn(
        "qvec",
        F.zip_with(
            F.col("vec"),
            F.array_repeat(F.col("_amax"), F.size(F.col("vec"))),
            lambda x, m: F.floor(x.cast("double") / m * 127.0 + 0.5),
        ),
    )
    q = q.withColumn(
        "qq",
        F.aggregate(F.col("qvec"), F.lit(0).cast("long"), lambda a, v: a + v * v),
    ).filter(F.col("qq") > 0)
    return q.select("id", *keep, "qvec", "qq")


def sq8_topk(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 10_000,
) -> DataFrame:
    """SQ8-rescored bucketed ANN: candidates are the same capped LSH
    buckets as lsh_ann_topk, but the scoring pass reads only the int8
    codes (sq8_quantized) — integer dot products, exact numerators, one
    final rounded division. The cap is applied to the RAW bucket (before
    zero-vector drop), matching the oracle's shared capped-CTE prefix.

    -> (query_id, neighbor_id, qcos ROUND(.,6), rank) — top-k per query
    by quantized cosine, id tiebreak on the rounded score."""
    b = lsh_buckets(emb, n_planes, seed, dim, id_col, vec_col)
    b = b.join(
        b.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bsz")), on="bucket"
    ).filter(F.col("_bsz") <= max_bucket)
    sq = sq8_quantized(b, id_col="id", vec_col="vec", keep=("bucket",))
    lhs = sq.select(
        "bucket", F.col("id").alias("query_id"),
        F.col("qvec").alias("qa"), F.col("qq").alias("qqa"),
    )
    rhs = sq.select(
        "bucket", F.col("id").alias("neighbor_id"),
        F.col("qvec").alias("qb"), F.col("qq").alias("qqb"),
    )
    scored = (
        lhs.join(rhs, on="bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                F.aggregate(
                    F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
                    F.lit(0).cast("long"),
                    lambda a, v: a + v,
                ).cast("double")
                / (F.sqrt(F.col("qqa").cast("double")) * F.sqrt(F.col("qqb").cast("double"))),
                6,
            ).alias("qcos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("qcos").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            "query_id", "neighbor_id", "qcos",
            F.col("_rn").cast("long").alias("rank"),
        )
    )


def rp_project(
    emb: DataFrame,
    out_dim: int = 16,
    seed: int = 7,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: r = (1/sqrt(out_dim)) R v
    with a seeded Gaussian R (the same deterministic plane machinery as
    the LSH buckets — R ships as plan literals, a few KB broadcast with
    the plan, never a shuffle). Each output component is one sequential
    fold, so Spark and a SQL oracle produce bit-identical doubles.

    The 100 TB story: dim 64 -> 16 cuts every downstream pairwise pass
    (near-dup scoring, clustering, ANN rerank) to 1/4 the bytes and
    FLOPs with the JL distortion guarantee; rp_distortion below is the
    audit that the guarantee actually holds on this corpus.

    -> (id, rvec array<double>[out_dim])."""
    planes = _planes(dim, out_dim, seed)
    inv = 1.0 / float(np.sqrt(out_dim))
    comps = [
        dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in p])) * F.lit(inv)
        for p in planes
    ]
    return emb.select(F.col(id_col).alias("id"), F.array(*comps).alias("rvec"))


def rp_distortion(
    emb: DataFrame,
    out_dim: int = 16,
    rp_seed: int = 7,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 10_000,
) -> DataFrame:
    """JL distortion audit: over the capped-LSH candidate pairs (the same
    bounded pair set every other similarity op uses — never all-pairs),
    compare cosine in the original space vs the rp_project-reduced space
    and histogram the absolute error in 0.01-wide bins.

    -> (err_bin, n_pairs, sum_abs_err_e6): err_bin = round(|Δcos|*100),
    sum_abs_err_e6 sums round(|Δcos|*1e6) as exact int64 so the oracle's
    totals match without float-sum order games."""
    b = lsh_buckets(emb, n_planes, seed, dim, id_col, vec_col)
    b = b.join(
        b.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bsz")), on="bucket"
    ).filter(F.col("_bsz") <= max_bucket)
    planes = _planes(dim, out_dim, rp_seed)
    inv = 1.0 / float(np.sqrt(out_dim))
    rcomps = [
        dot(F.col("vec"), F.array(*[F.lit(float(x)) for x in p])) * F.lit(inv)
        for p in planes
    ]
    b = (
        b.withColumn("nrm", norm(F.col("vec")))
        .withColumn("rvec", F.array(*rcomps))
        .withColumn("rnrm", norm(F.col("rvec")))
        .filter((F.col("nrm") > 0) & (F.col("rnrm") > 0))
    )
    lhs = b.select(
        "bucket", F.col("id").alias("id_a"), F.col("vec").alias("va"),
        F.col("nrm").alias("na"), F.col("rvec").alias("ra"), F.col("rnrm").alias("rna"),
    )
    rhs = b.select(
        "bucket", F.col("id").alias("id_b"), F.col("vec").alias("vb"),
        F.col("nrm").alias("nb"), F.col("rvec").alias("rb"), F.col("rnrm").alias("rnb"),
    )
    pairs = (
        lhs.join(rhs, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6).alias("cos_o"),
            F.round(dot(F.col("ra"), F.col("rb")) / (F.col("rna") * F.col("rnb")), 6).alias("cos_r"),
        )
    )
    err = F.abs(F.col("cos_o") - F.col("cos_r"))
    return (
        pairs.select(
            F.round(err * 100.0, 0).cast("long").alias("err_bin"),
            F.round(err * 1_000_000.0, 0).cast("long").alias("_e6"),
        )
        .groupBy("err_bin")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum("_e6").cast("long").alias("sum_abs_err_e6"),
        )
    )


def embedding_near_dups(
    emb: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS — the dedup entry point over an
    embedding column: (id_a, id_b, cos) for same-LSH-bucket pairs with
    cosine >= ``threshold``, id_a < id_b.

    100-TB shape: candidates are bucket-local (two near-identical vectors
    agree on every hyperplane sign with high probability, so true near-dups
    co-locate), buckets above ``max_bucket`` are dropped before the
    self-join — never all-pairs, same guard as dedup.lsh_candidate_pairs.
    Recall can be raised with more plane sets (union over seeds);
    cosine_topk stays the exact rerank baseline.
    """
    b = lsh_buckets(emb, n_planes, seed, dim, id_col, vec_col)
    b = b.withColumn("nrm", norm(F.col("vec")))
    b = b.join(
        b.groupBy("bucket").agg(F.count(F.lit(1)).alias("_bsz")), on="bucket"
    ).filter(F.col("_bsz") <= max_bucket)
    lhs = b.select(
        "bucket", F.col("id").alias("id_a"),
        F.col("vec").alias("va"), F.col("nrm").alias("na"),
    )
    rhs = b.select(
        "bucket", F.col("id").alias("id_b"),
        F.col("vec").alias("vb"), F.col("nrm").alias("nb"),
    )
    return (
        lhs.join(rhs, on="bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cos"),
        )
        .filter(F.col("cos") >= F.lit(threshold))
    )


def knn_label_purity(
    emb: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    max_bucket: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-label kNN purity of an embedding space — the standard intrinsic
    embedding-quality / representation-collapse check a training pipeline
    runs after every encoder refresh: for each label, the share of
    (query, neighbor) pairs in the LSH-ANN top-k whose neighbor carries the
    SAME label. Healthy embeddings score near 1; a collapsing or shuffled
    space decays toward the label marginals.

    Returns (label BIGINT, n_queries, n_pairs, n_same BIGINT, purity
    ROUND(.,6)) — purity is n_same/n_pairs, a ratio of exact integers, so
    both engines derive the identical double.

    Scale shape (100 TB): rides lsh_ann_topk unchanged (bucketed
    candidates under ``max_bucket`` — never all-pairs), then two
    vec_id-keyed hash joins to attach labels and ONE label-keyed
    aggregation over the top-k pair table (|pairs| = k·|vectors|, linear).
    """
    nn = lsh_ann_topk(
        emb,
        k=k,
        n_planes=n_planes,
        seed=seed,
        dim=dim,
        max_bucket=max_bucket,
        id_col=id_col,
        vec_col=vec_col,
    )
    lab = emb.select(
        F.col(id_col), F.col(label_col).cast("long").alias("_lab")
    )
    ql = lab.select(
        F.col(id_col).alias("query_id"), F.col("_lab").alias("q_lab")
    )
    nl = lab.select(
        F.col(id_col).alias("neighbor_id"), F.col("_lab").alias("n_lab")
    )
    j = nn.join(ql, "query_id").join(nl, "neighbor_id")
    same = F.when(F.col("q_lab") == F.col("n_lab"), 1).otherwise(0)
    return (
        j.groupBy(F.col("q_lab").alias("label"))
        .agg(
            F.countDistinct("query_id").cast("long").alias("n_queries"),
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(same).cast("long").alias("n_same"),
        )
        .select(
            "label",
            "n_queries",
            "n_pairs",
            "n_same",
            F.round(
                F.col("n_same").cast("double") / F.col("n_pairs"), 6
            ).alias("purity"),
        )
    )


def ann_recall(
    emb: DataFrame,
    k: int = 5,
    query_max: int = 20,
    n_planes: int = 8,
    seed: int = 42,
    dim: int = 64,
    max_bucket: int = 10_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k of the bucketed LSH-ANN against exact cosine top-k — THE
    acceptance gate every approximate index ships with: per query, the
    share of the true top-k the ANN recovered. Run on a small fixed query
    panel (ids < ``query_max``); the exact side is the deliberate
    brute-force rerank baseline (cosine_topk), priced for a panel, never
    the corpus.

    Returns (query_id, n_exact, n_hit BIGINT, recall ROUND(.,6)) — recall
    is a ratio of exact integers, so both engines derive the identical
    double.

    Scale shape (100 TB): the ANN side is the capped bucket join
    (lsh_ann_topk unchanged); the exact side crossJoins only the
    |panel| x |corpus| slice; the compare is one (query, neighbor) hash
    join + one query-keyed aggregation over k·|panel| rows.
    """
    q = emb.filter(F.col(id_col) < query_max).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    exact = cosine_topk(emb, q, k=k, id_col=id_col, vec_col=vec_col).select(
        "query_id", "neighbor_id"
    )
    approx = (
        lsh_ann_topk(
            emb,
            k=k,
            n_planes=n_planes,
            seed=seed,
            dim=dim,
            max_bucket=max_bucket,
            id_col=id_col,
            vec_col=vec_col,
        )
        .filter(F.col("query_id") < query_max)
        .select("query_id", "neighbor_id", F.lit(1).alias("_hit"))
    )
    j = exact.join(approx, ["query_id", "neighbor_id"], "left")
    return (
        j.groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hit"),
        )
        .select(
            "query_id",
            "n_exact",
            "n_hit",
            F.round(
                F.col("n_hit").cast("double") / F.col("n_exact"), 6
            ).alias("recall"),
        )
    )
