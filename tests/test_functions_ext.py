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
