"""Round-2 function tests: short-doc shingle gating, md5-60bit portability,
simhash oracle-hash parity, ANN bucket cap."""

import hashlib

import pyspark.sql.functions as F
import pytest

from combblas_spark.functions.dedup import shingles, simhash, md5_60bit
from combblas_spark.functions.similarity import lsh_ann_topk, lsh_buckets


def test_shingles_short_docs_empty(spark):
    docs = spark.createDataFrame(
        [(0, "one"), (1, "two words"), (2, "three words here"), (3, "")],
        "doc_id long, text string",
    )
    got = shingles(docs, k=3).collect()
    # only doc 2 has >= 3 tokens; docs 0/1/3 emit NOTHING (no truncated
    # <k-grams — the SQL oracle requires k positions, ADVICE.md item 1)
    assert {r["id"] for r in got} == {2}
    assert [r["shingle"] for r in got] == ["three words here"]


def test_md5_60bit_matches_python(spark):
    df = spark.createDataFrame([("hello",), ("spark",), ("",)], "t string")
    got = {r["t"]: r["h"] for r in df.select("t", md5_60bit(F.col("t")).alias("h")).collect()}
    for t in ("hello", "spark", ""):
        want = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        assert got[t] == want
        assert 0 <= got[t] < (1 << 60)  # always positive in signed 64-bit


def test_simhash_python_oracle(spark):
    docs = spark.createDataFrame(
        [(0, "a b a c"), (1, "x y z")], "doc_id long, text string"
    )
    got = {r["id"]: r["simhash"] for r in simhash(docs).collect()}

    def py_simhash(text):
        toks = [t for t in text.split(" ") if t]
        hs = [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks]
        sig = 0
        for i in range(60):
            vote = sum(1 if (h >> i) & 1 else -1 for h in hs)
            if vote > 0:
                sig |= 1 << i
        return sig

    assert got[0] == py_simhash("a b a c")
    assert got[1] == py_simhash("x y z")


def test_ann_bucket_cap(spark):
    import numpy as np

    rng = np.random.default_rng(2)
    # 30 vectors clustered so most share one bucket
    base = rng.standard_normal(8)
    rows = [(i, (base + 0.01 * rng.standard_normal(8)).tolist()) for i in range(30)]
    rows += [(100 + i, rng.standard_normal(8).tolist()) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    b = lsh_buckets(emb, n_planes=4, seed=1, dim=8)
    big = b.groupBy("bucket").count().agg(F.max("count")).collect()[0][0]
    assert big >= 30  # the cluster is one bucket
    capped = lsh_ann_topk(emb, k=3, n_planes=4, seed=1, dim=8, max_bucket=10)
    # every member of the oversized bucket is excluded from candidates
    ids = {r["query_id"] for r in capped.collect()}
    assert all(i >= 100 or i not in ids for i in range(30)) or len(ids) < 30
    uncapped = lsh_ann_topk(emb, k=3, n_planes=4, seed=1, dim=8, max_bucket=10_000)
    assert uncapped.count() > capped.count()


def test_ivf_topk_recall_vs_exact(spark):
    """IVF with n_probe probing must recover most exact top-k neighbors on
    clustered data (the regime IVF exists for), and every indexed vector
    lands in exactly one cell."""
    import numpy as np
    from combblas_spark.functions.similarity import cosine_topk, ivf_topk, ivf_train, _nearest_cell
    import pyspark.sql.functions as F

    rng = np.random.default_rng(7)
    rows = []
    for c in range(4):  # 4 well-separated clusters of 25
        center = rng.standard_normal(16) * 5
        for i in range(25):
            rows.append((c * 100 + i, (center + 0.3 * rng.standard_normal(16)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter(F.col("vec_id") % 100 < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )

    exact = cosine_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_cells=8, n_probe=3, iters=2).collect()
    exact_pairs = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_pairs = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.9, f"recall {recall}"

    cents = ivf_train(emb, n_cells=8, iters=2)
    cells = emb.select(_nearest_cell(F.col("embedding"), cents).alias("cell"))
    per_vec = emb.select("vec_id", _nearest_cell(F.col("embedding"), cents).alias("cell"))
    assert per_vec.count() == per_vec.select("vec_id").distinct().count()
    assert cells.filter(F.col("cell").isNull()).count() == 0


def test_embedding_near_dups_finds_planted_pair(spark):
    """Two near-identical vectors agree on every hyperplane sign, land in
    the same bucket, and clear a high cosine threshold; the orthogonal
    filler vectors do not."""
    import random

    from combblas_spark.functions.similarity import embedding_near_dups

    rng = random.Random(5)
    dim = 64
    base = [rng.uniform(-1, 1) for _ in range(dim)]
    near = [v + 1e-4 for v in base]
    rows = [(0, base), (1, near)]
    for i in range(2, 30):
        rows.append((i, [rng.uniform(-1, 1) for _ in range(dim)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = [
        (r["id_a"], r["id_b"], r["cos"])
        for r in embedding_near_dups(emb, threshold=0.99, dim=dim).collect()
    ]
    assert [(a, b) for a, b, _ in got] == [(0, 1)]
    assert got[0][2] > 0.999


def test_bpe_token_stats_hand_computed(spark):
    from combblas_spark.functions.text import bpe_token_stats

    docs = spark.createDataFrame(
        [(1, "Hello, world! 42"), (2, "aa aa aa"), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_bpe_pieces"], r["n_distinct_pieces"], r["n_ws_tokens"])
        for r in bpe_token_stats(docs).collect()
    }
    # 1: ['Hello', ',', ' world', '!', ' 42'] -> 5 pieces, all distinct, 3 ws
    # 2: ['aa', ' aa', ' aa']                 -> 3 pieces, 2 distinct, 3 ws
    assert got == {1: (5, 5, 3), 2: (3, 2, 3), 3: (0, 0, 0)}


def test_split_by_hash_deterministic_and_stable(spark):
    from combblas_spark.functions.sampling import split_by_hash

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(500)], "doc_id long, text string"
    )
    a = {r["doc_id"]: r["split"] for r in split_by_hash(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in split_by_hash(docs).collect()}
    assert a == b
    n_test = sum(1 for v in a.values() if v == "test")
    assert 25 <= n_test <= 175  # ~10% of 500; +-5 sd of binomial noise
    # stability: adding rows never moves an existing row between splits
    more = spark.createDataFrame(
        [(i, f"text {i}") for i in range(800)], "doc_id long, text string"
    )
    c = {r["doc_id"]: r["split"] for r in split_by_hash(more).collect()}
    assert all(c[k] == v for k, v in a.items())


def test_stratified_sample_rates_and_determinism(spark):
    import pyspark.sql.functions as F
    from combblas_spark.functions.sampling import stratified_sample

    docs = spark.createDataFrame(
        [(i, i % 3) for i in range(3000)], "doc_id long, stratum long"
    )
    kept = stratified_sample(docs, "stratum", frac_permille=200)
    rows = kept.collect()
    again = stratified_sample(docs, "stratum", frac_permille=200).collect()
    assert {r["doc_id"] for r in rows} == {r["doc_id"] for r in again}
    by = {}
    for r in rows:
        by[r["stratum"]] = by.get(r["stratum"], 0) + 1
    for s in (0, 1, 2):
        assert 140 <= by[s] <= 260  # ~20% of 1000 per stratum
    # monotone: a higher threshold keeps a superset
    bigger = {r["doc_id"] for r in stratified_sample(docs, "stratum", frac_permille=400).collect()}
    assert {r["doc_id"] for r in rows} <= bigger


def test_unigram_xent_hand_computed(spark):
    """Tiny corpus with a hand-derived unigram LM: corpus = {a:4, b:2, z:1},
    C=7. Doc xent = mean of -ln(c(w)/7) over its tokens; the all-common doc
    scores lower (more corpus-like) than the rare-token doc."""
    import math
    from combblas_spark.functions.text import unigram_xent

    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "a b z"), (2, "a"), (3, "")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["xent"])
        for r in unigram_xent(docs).collect()
    }
    def x(*cs):
        return round(sum(-math.log(c / 7.0) for c in cs) / len(cs), 6)
    assert got[0] == (3, x(4, 4, 2))
    assert got[1] == (3, x(4, 2, 1))
    assert got[2] == (1, x(4))
    assert got[3] == (0, 0.0)
    assert got[0][1] < got[1][1]  # common-token doc is more corpus-like


def test_source_dup_matrix_planted_pairs(spark):
    """Two identical docs across sources A/B, two identical within C, and
    one unique doc: the matrix reports exactly {(A,B): 1, (C,C): 1}."""
    from combblas_spark.functions.dedup import source_dup_matrix

    dup = "the quick brown fox jumps over the lazy dog again and again"
    dup2 = "pack my box with five dozen liquor jugs every single day"
    docs = spark.createDataFrame(
        [
            (0, dup, "A"),
            (1, dup, "B"),
            (2, dup2, "C"),
            (3, dup2, "C"),
            (4, "completely different text with no overlap at all here", "A"),
        ],
        "doc_id long, text string, source string",
    )
    got = {
        (r["source_a"], r["source_b"]): r["n_pairs"]
        for r in source_dup_matrix(docs).collect()
    }
    assert got == {("A", "B"): 1, ("C", "C"): 1}


def test_zipf_stats_exact_fit(spark):
    """Vocabulary engineered so counts are exactly c(rank) = 8/rank for
    ranks 1,2,4,8 — ln-ln points are perfectly collinear with slope -1
    (ties impossible, every count distinct)."""
    import math
    from combblas_spark.functions.text import zipf_stats

    words = ["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"]
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    row = zipf_stats(docs).collect()[0]
    assert row["n_types"] == 4 and row["n_tokens"] == 15
    # ranks 1,2,3,4 with counts 8,4,2,1: y = ln 8 - ln2 * log2(rank); the
    # x-axis is ln(rank) (not log2), so the exact LS slope is computable:
    xs = [math.log(r) for r in (1, 2, 3, 4)]
    ys = [math.log(c) for c in (8, 4, 2, 1)]
    n = 4.0
    varx = sum(x * x for x in xs) / n - (sum(xs) / n) ** 2
    cov = sum(x * y for x, y in zip(xs, ys)) / n - (sum(xs) / n) * (sum(ys) / n)
    assert abs(row["zipf_slope"] - cov / varx) < 1e-5


# -------------------------------------------------------------------- PII

def test_pii_scan_and_redact_hand_cases(spark):
    """Hand-built rows: multi-hit counting, decoys that must NOT match
    (no-TLD email, double-@, 3-dot-short ip, short phone), and exact
    redacted strings."""
    from combblas_spark.functions.text import pii_scan, pii_redact

    rows = [
        (0, "mail a@b.com and c.d+x@e-f.org, ip 192.168.0.1 tel 12-345-678-9012"),
        (1, "no pii here, just 1.2.3 and 12-345-678 and user@@host and a@b"),
        (2, "edge <z@q.io> 10.0.0.255 10.0.0.256 is still two ips"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_email"], r["n_ipv4"], r["n_phone"], r["redacted"])
        for r in pii_redact(pii_scan(df)).collect()
    }
    assert got[0] == (2, 1, 1, "mail [EMAIL] and [EMAIL], ip [IP] tel [PHONE]")
    assert got[1][:3] == (0, 0, 0)
    assert got[1][3] == rows[1][1]  # untouched
    # 10.0.0.256 still MATCHES the syntactic pattern (256 is 3 digits) —
    # the scrubber is deliberately over-broad, never under-broad
    assert got[2] == (1, 2, 0, "edge <[EMAIL]> [IP] [IP] is still two ips")
    assert got[3] == (0, 0, 0, "")


# ------------------------------------------------------------ vocab growth

def test_vocab_growth_hand_case(spark):
    """4 docs, 2 checkpoints: exact cumulative docs/tokens/types, and
    new_types counts a type only at its FIRST slice."""
    from combblas_spark.functions.text import vocab_growth

    rows = [
        (0, "a b a"),        # slice 0: types {a,b}, 3 tokens
        (1, "b c"),          # slice 0: adds {c}, 2 tokens
        (2, "c d d"),        # slice 1: adds {d}, 3 tokens
        (3, "a"),            # slice 1: nothing new, 1 token
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["ckpt"]: (r["n_docs"], r["n_tokens"], r["vocab"], r["new_types"])
        for r in vocab_growth(df, n_checkpoints=2).collect()
    }
    assert got == {1: (2, 5, 3, 3), 2: (4, 9, 4, 1)}


def test_vocab_growth_python_replay_sparse_ids(spark):
    """Non-dense ids (empty slices included): curve matches a pure-python
    replay of the slice arithmetic, and every column is monotone."""
    from combblas_spark.functions.text import vocab_growth

    words = ["w%d" % (i % 7) for i in range(30)]
    rows = [
        (did, " ".join(words[(3 * j) % 11: (3 * j) % 11 + 4 + j % 3]))
        for j, did in enumerate([0, 1, 2, 50, 51, 99])
    ]
    K, mx = 4, 99
    # python replay
    cum = {}
    seen, nd, nt = set(), 0, 0
    by_bk = {}
    for did, txt in rows:
        by_bk.setdefault(did * K // (mx + 1), []).append(txt.split())
    for bk in range(K):
        newt = 0
        for toks in by_bk.get(bk, []):
            nd += 1
            nt += len(toks)
            for t in toks:
                if t not in seen:
                    seen.add(t)
                    newt += 1
        cum[bk + 1] = (nd, nt, len(seen), newt)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["ckpt"]: (r["n_docs"], r["n_tokens"], r["vocab"], r["new_types"])
        for r in vocab_growth(df, n_checkpoints=K).collect()
    }
    assert got == cum
    ck = [got[k] for k in sorted(got)]
    assert all(a[:3] <= b[:3] for a, b in zip(ck, ck[1:]))  # monotone


# ----------------------------------------------------------- mutual NN

def _mutual_nn_replay(vecs, n_planes, seed, dim):
    """Pure numpy mirror of similarity.mutual_nn: same planes, same packed
    sign bucket, rank-1 by (rounded cos desc, id asc), reciprocity."""
    import numpy as np
    from combblas_spark.functions.similarity import _planes

    planes = np.array(_planes(dim, n_planes, seed))
    ids = sorted(vecs)
    bk = {}
    for i in ids:
        v = np.array(vecs[i], dtype=np.float64)
        b = 0
        for j, p in enumerate(planes):
            if float(v @ p) > 0:
                b |= 1 << j
        bk[i] = b
    nn1 = {}
    for i in ids:
        cands = []
        vi = np.array(vecs[i], dtype=np.float64)
        for j in ids:
            if j == i or bk[j] != bk[i]:
                continue
            vj = np.array(vecs[j], dtype=np.float64)
            c = round(float(vi @ vj) / (float(np.sqrt(vi @ vi)) * float(np.sqrt(vj @ vj))), 6)
            cands.append((-c, j))
        if cands:
            negc, j = min(cands)
            nn1[i] = (j, -negc)
    return sorted(
        (a, b, c)
        for a, (b, c) in nn1.items()
        if a < b and nn1.get(b, (None,))[0] == a
    )


def test_mutual_nn_matches_replay_and_filters_hubs(spark):
    from combblas_spark.functions.similarity import mutual_nn, lsh_ann_topk

    # deterministic LCG vectors, dim 8 / 2 planes so buckets are populated
    x, vecs = 7, {}
    for i in range(40):
        row = []
        for _ in range(8):
            x = (x * 1103515245 + 12345) % (1 << 31)
            row.append(((x >> 8) % 2001 - 1000) / 1000.0)
        vecs[i] = row
    want = _mutual_nn_replay(vecs, n_planes=2, seed=11, dim=8)
    assert want  # fixture must produce mutual pairs
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["cos"])
        for r in mutual_nn(df, n_planes=2, seed=11, dim=8).collect()
    )
    assert got == want
    # mutual pairs are a SUBSET of one-way rank-1 edges, and strictly
    # smaller here (asymmetric hubs reciprocate at most once)
    one_way = lsh_ann_topk(df, k=1, n_planes=2, seed=11, dim=8).count()
    assert len(got) * 2 <= one_way
    assert len(got) * 2 < one_way


def test_mutual_nn_plan_no_cartesian(spark):
    from combblas_spark.functions.similarity import mutual_nn

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    plan = (
        mutual_nn(df, n_planes=2, seed=3, dim=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ----------------------------------------------------------- SQ8 ANN

def _sq8_replay(vecs, n_planes, seed, dim, k):
    """Pure python mirror of similarity.sq8_topk: same planes/buckets,
    floor(x/amax*127+0.5) codes, exact int numerators, (rounded qcos
    desc, id asc) top-k."""
    import math

    import numpy as np
    from combblas_spark.functions.similarity import _planes

    planes = np.array(_planes(dim, n_planes, seed))
    ids = sorted(vecs)
    bk, qv, qq = {}, {}, {}
    for i in ids:
        v = np.array(vecs[i], dtype=np.float64)
        b = 0
        for j, p in enumerate(planes):
            if float(v @ p) > 0:
                b |= 1 << j
        bk[i] = b
        amax = max(abs(float(x)) for x in vecs[i])
        if amax == 0:
            continue
        q = [math.floor(float(x) / amax * 127.0 + 0.5) for x in vecs[i]]
        if any(abs(c) > 127 for c in q):
            raise AssertionError("SQ8 code out of int8 range")
        s = sum(c * c for c in q)
        if s > 0:
            qv[i], qq[i] = q, s
    out = []
    for i in sorted(qv):
        cands = []
        for j in sorted(qv):
            if j == i or bk[j] != bk[i]:
                continue
            idot = sum(a * b for a, b in zip(qv[i], qv[j]))
            qcos = round(float(idot) / (math.sqrt(float(qq[i])) * math.sqrt(float(qq[j]))), 6)
            cands.append((-qcos, j))
        for rank, (negc, j) in enumerate(sorted(cands)[:k], start=1):
            out.append((i, j, -negc, rank))
    return sorted(out)


def test_sq8_topk_matches_replay_and_tracks_exact_cosine(spark):
    import numpy as np
    from combblas_spark.functions.similarity import sq8_topk

    x, vecs = 99, {}
    for i in range(40):
        row = []
        for _ in range(8):
            x = (x * 1103515245 + 12345) % (1 << 31)
            row.append(((x >> 8) % 2001 - 1000) / 1000.0)
        vecs[i] = row
    want = _sq8_replay(vecs, n_planes=2, seed=11, dim=8, k=3)
    assert want
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    got = sorted(
        (r["query_id"], r["neighbor_id"], r["qcos"], r["rank"])
        for r in sq8_topk(df, k=3, n_planes=2, seed=11, dim=8).collect()
    )
    assert got == want
    # quantized cosine stays within the SQ8 error envelope of exact cosine
    for qid, nid, qcos, _rank in got:
        a = np.array(vecs[qid]); b = np.array(vecs[nid])
        exact = float(a @ b) / (float(np.sqrt(a @ a)) * float(np.sqrt(b @ b)))
        assert abs(qcos - exact) < 0.02, (qid, nid, qcos, exact)


def test_sq8_drops_zero_vectors_and_plan_no_cartesian(spark):
    from combblas_spark.functions.similarity import sq8_topk

    rows = [(i, [float(i % 3 - 1), 1.0]) for i in range(6)] + [(99, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sq8_topk(df, k=2, n_planes=2, seed=3, dim=2)
    ids = {r["query_id"] for r in out.collect()} | {r["neighbor_id"] for r in out.collect()}
    assert 99 not in ids  # zero vector has no direction: quantization drops it
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ----------------------------------------------------------- JL projection

def _rp_replay(vecs, out_dim, rp_seed, n_planes, seed, dim):
    """Pure numpy mirror of similarity.rp_distortion (uncapped buckets)."""
    import math

    import numpy as np
    from combblas_spark.functions.similarity import _planes

    bplanes = np.array(_planes(dim, n_planes, seed))
    rplanes = _planes(dim, out_dim, rp_seed)
    inv = 1.0 / float(np.sqrt(out_dim))
    ids = sorted(vecs)
    bk, rv = {}, {}
    for i in ids:
        v = np.array(vecs[i], dtype=np.float64)
        b = 0
        for j, p in enumerate(bplanes):
            if float(v @ p) > 0:
                b |= 1 << j
        bk[i] = b
        rv[i] = [float(np.array(p) @ v) * inv for p in rplanes]
    bins = {}
    for a in ids:
        for b_ in ids:
            if a >= b_ or bk[a] != bk[b_]:
                continue
            va, vb = np.array(vecs[a]), np.array(vecs[b_])
            na, nb = math.sqrt(float(va @ va)), math.sqrt(float(vb @ vb))
            ra, rb = np.array(rv[a]), np.array(rv[b_])
            rna, rnb = math.sqrt(float(ra @ ra)), math.sqrt(float(rb @ rb))
            if not (na > 0 and nb > 0 and rna > 0 and rnb > 0):
                continue
            cos_o = round(float(va @ vb) / (na * nb), 6)
            cos_r = round(float(ra @ rb) / (rna * rnb), 6)
            err = abs(cos_o - cos_r)
            eb = math.floor(err * 100.0 + 0.5)
            e6 = math.floor(err * 1_000_000.0 + 0.5)
            n, s = bins.get(eb, (0, 0))
            bins[eb] = (n + 1, s + e6)
    return sorted((k, n, s) for k, (n, s) in bins.items())


def test_rp_distortion_matches_replay_and_shrinks_with_dim(spark):
    from combblas_spark.functions.similarity import rp_distortion

    x, vecs = 5, {}
    for i in range(48):
        row = []
        for _ in range(8):
            x = (x * 1103515245 + 12345) % (1 << 31)
            row.append(((x >> 8) % 2001 - 1000) / 1000.0)
        vecs[i] = row
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<double>"
    )
    want = _rp_replay(vecs, out_dim=4, rp_seed=7, n_planes=2, seed=11, dim=8)
    assert want
    got = sorted(
        (r["err_bin"], r["n_pairs"], r["sum_abs_err_e6"])
        for r in rp_distortion(
            df, out_dim=4, rp_seed=7, n_planes=2, seed=11, dim=8
        ).collect()
    )
    assert got == want

    def mean_err(out_dim):
        rows = rp_distortion(
            df, out_dim=out_dim, rp_seed=7, n_planes=2, seed=11, dim=8
        ).collect()
        n = sum(r["n_pairs"] for r in rows)
        return sum(r["sum_abs_err_e6"] for r in rows) / max(n, 1)

    # JL: more projection dims -> lower mean distortion (deterministic fixture)
    assert mean_err(8) < mean_err(2)


def test_rp_project_shape_and_plan(spark):
    from combblas_spark.functions.similarity import rp_project, rp_distortion

    df = spark.createDataFrame(
        [(i, [float(i % 5 - 2), 1.0, 0.5, -0.25]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    out = rp_project(df, out_dim=3, seed=9, dim=4).collect()
    assert len(out) == 10 and all(len(r["rvec"]) == 3 for r in out)
    plan = (
        rp_distortion(df, out_dim=3, rp_seed=9, n_planes=2, seed=3, dim=4)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
