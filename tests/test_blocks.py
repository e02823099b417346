"""Block split / induced subgraph / permute / min-element tests."""

import pyspark.sql.functions as F

from combblas_spark.operators import (
    block_split,
    induced_subgraphs,
    permute_edges,
    vec_min_element,
)
from combblas_spark.sources.fixtures import sevenvertex, SEVENVERTEX
from tests.util import collect_edges


def test_block_split_partitions_everything(spark):
    a = sevenvertex(spark)
    blocks = block_split(a, 2, 2, 7)
    got = []
    for row in blocks:
        for b in row:
            got += collect_edges(b)
    assert sorted(got) == sorted(SEVENVERTEX)
    # block (0,0) holds only entries with src<4 and dst<4
    for s, d, _ in collect_edges(blocks[0][0]):
        assert s < 4 and d < 4


def test_permute_edges_preserves_content(spark):
    a = sevenvertex(spark)
    p = permute_edges(a, seed=5)
    assert sorted(collect_edges(p)) == sorted(SEVENVERTEX)


def test_induced_subgraphs(spark):
    a = sevenvertex(spark)
    # clusters: {0,1,2,3} and {4,5,6}
    assign = spark.createDataFrame(
        [(i, 0 if i < 4 else 1) for i in range(7)], "id long, val long"
    )
    sub = induced_subgraphs(a, assign)
    rows = [(r["src"], r["dst"], r["cluster"]) for r in sub.collect()]
    want = {
        (s, d): (0 if s < 4 else 1)
        for s, d, _ in SEVENVERTEX
        if (s < 4) == (d < 4)
    }
    assert {(s, d): c for s, d, c in rows} == want


def test_vec_min_element(spark):
    v = spark.createDataFrame(
        [(0, 3.0), (1, 1.0), (2, 1.0)], "id long, val double"
    )
    assert vec_min_element(v) == (1, 1.0)
