"""Deterministic test fixtures (FIXTURES.md F2/F4/F5).

sevenvertex mirrors /root/reference/ReleaseTests/sevenvertex.mtx:2-14
(1-based there; 0-based here) — the reference's hand-checkable graph.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

SEVENVERTEX = [
    (3, 5, 0.34),
    (3, 1, 1.50),
    (5, 4, 0.67),
    (5, 2, 1.41),
    (0, 6, 2.15),
    (1, 3, 0.55),
    (1, 0, 0.87),
    (4, 6, 1.75),
    (6, 0, 1.40),
    (2, 0, 0.75),
    (2, 1, 0.25),
    (2, 4, 1.00),
]

EDGE_SCHEMA = "src long, dst long, w double"


def sevenvertex(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(SEVENVERTEX, EDGE_SCHEMA)


def chain_star_forest(spark: SparkSession) -> tuple[DataFrame, dict]:
    """FIXTURES.md F4: path(1000) + star(10k leaves) + 100 isolated +
    50 triangles + two 4-cliques. Returns (edges, golden metadata).
    Vertex layout: path 0..1000, star hub 10_000 leaves 10_001..20_000,
    isolated 30_000..30_099 (appear as self-loop-free singleton vertices via
    the vertex table, not edges), triangles at 40_000+3i, cliques at 50_000+.
    """
    rows = []
    for i in range(1000):
        rows.append((i, i + 1, 1.0))
    hub = 10_000
    for i in range(10_000):
        rows.append((hub, 10_001 + i, 1.0))
    tri_base = 40_000
    for t in range(50):
        a, b, c = tri_base + 3 * t, tri_base + 3 * t + 1, tri_base + 3 * t + 2
        rows += [(a, b, 1.0), (b, c, 1.0), (a, c, 1.0)]
    cl_base = 50_000
    for q in range(2):
        vs = [cl_base + 4 * q + i for i in range(4)]
        for i in range(4):
            for j in range(i + 1, 4):
                rows.append((vs[i], vs[j], 1.0))
    golden = {
        "n_components_with_edges": 1 + 1 + 50 + 2,
        "triangles": 50 + 2 * 4,
        "path_len": 1000,
        "star_leaves": 10_000,
    }
    return spark.createDataFrame(rows, EDGE_SCHEMA), golden


def weighted_digraph(
    spark: SparkSession, n: int = 1024, avg_deg: int = 8, seed: int = 42
) -> DataFrame:
    """FIXTURES.md F5: seeded random digraph with dangling vertices kept —
    the PageRank oracle fixture. numpy-generated, deterministic."""
    rng = np.random.default_rng(seed)
    m = n * avg_deg
    src = rng.integers(0, n, size=m)
    dst = rng.integers(0, n, size=m)
    keep = src != dst
    # make ~5% of vertices dangling by removing their out-edges
    dangling = rng.choice(n, size=max(1, n // 20), replace=False)
    keep &= ~np.isin(src, dangling)
    import pandas as pd

    pdf = (
        pd.DataFrame({"src": src[keep], "dst": dst[keep]})
        .drop_duplicates()
        .assign(w=1.0)
    )
    return spark.createDataFrame(pdf.astype({"src": "int64", "dst": "int64"}), EDGE_SCHEMA)
