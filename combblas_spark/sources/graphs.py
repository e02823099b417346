"""Deterministic graph builders over the driver testdata tables.

These derive edge tables (src, dst, w) from the TPC-H-ish parquet tables so
that correctness queries and the DuckDB oracle see the exact same graph.
Vertex-id spaces are made disjoint with fixed offsets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.operators.transform import symmetrize, remove_loops

SUPPLIER_OFFSET = 1_000_000
NATION_OFFSET = 2_000_000


def build_graph(pairs: DataFrame, sym: bool = True) -> DataFrame:
    """ParallelReadMM analog (/root/reference/include/CombBLAS/SpParMat.cpp:3993):
    dedup duplicate (src,dst) with a sum binop, drop loops, symmetrize.
    ``pairs`` has columns (src, dst); w = multiplicity (exact integer in a
    double), so downstream integer-weight queries hash exactly vs the oracle.
    """
    dedup = (
        pairs.groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )
    dedup = remove_loops(dedup)
    return symmetrize(dedup, add=F.sum) if sym else dedup


def part_supplier_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite part—supplier graph from lineitem: src=l_partkey,
    dst=SUPPLIER_OFFSET+l_suppkey, w = #lineitems with that pair,
    symmetrized. The workhorse mid-size graph (~2.1k vertices at sf0.01)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    pairs = li.select(
        F.col("l_partkey").cast("long").alias("src"),
        (F.col("l_suppkey").cast("long") + F.lit(SUPPLIER_OFFSET)).alias("dst"),
    )
    return build_graph(pairs)


def nation_clique_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nations connected iff they share a region: 5 disjoint 5-cliques —
    the triangle / SpGEMM hand-checkable graph (5 * C(5,3) = 50 triangles)."""
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    a = n.select(F.col("n_nationkey").cast("long").alias("src"), F.col("n_regionkey").alias("r1"))
    b = n.select(F.col("n_nationkey").cast("long").alias("dst"), F.col("n_regionkey").alias("r2"))
    pairs = a.join(b, on=(F.col("r1") == F.col("r2")) & (F.col("src") != F.col("dst"))).select(
        "src", "dst"
    )
    return build_graph(pairs, sym=False)  # construction is already symmetric


def events_digraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small deterministic DIRECTED user graph from events:
    src = user_id, dst = (user_id + 1 + event_id % 97) % 100 — exercises
    transpose / elementwise-mask / set-difference semantics (a symmetric
    graph would make A .* A^T trivial)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pairs = ev.select(
        F.col("user_id").cast("long").alias("src"),
        ((F.col("user_id") + 1 + (F.col("event_id") % 97)) % 100)
        .cast("long")
        .alias("dst"),
    )
    return build_graph(pairs, sym=False)


def events_temporal_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal DIRECTED edge table (src, dst, ts_us) from events — the same
    vertex construction as events_digraph but KEEPING every event as its own
    timestamped edge (no dedup): duplicate (src, dst) pairs at different
    times are distinct temporal edges. ts_us = exact epoch microseconds, so
    earliest-arrival values hash bit-identically vs the oracle."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # parquet timestamps arrive as TIMESTAMP_NTZ; unix_micros only takes
    # tz-aware TIMESTAMP. timestampdiff from the epoch is tz-free and
    # matches DuckDB's epoch_us(naive) exactly (same idiom as sessionize).
    if dict(ev.dtypes).get("ts") == "timestamp_ntz":
        us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', `ts`)"
        )
    else:
        us = F.unix_micros(F.col("ts"))
    return ev.select(
        F.col("user_id").cast("long").alias("src"),
        ((F.col("user_id") + 1 + (F.col("event_id") % 97)) % 100)
        .cast("long")
        .alias("dst"),
        us.alias("ts_us"),
    ).filter(F.col("src") != F.col("dst"))


def events_thinned_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-thinned undirected canonical edge list (a, b), a < b, from the
    events graph: keep a canonical pair iff md5-60bit('a|b') % 5 == 0. The
    events core is near-complete (every user hits ~97 of 100 hub ids), so
    clique-family censuses need a deterministic, engine-portable sparsifier
    to stay polynomial — the md5-60bit trick is the same replayable-priority
    device RandPerm uses (operators/indexing.py)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    pairs = ev.select(
        F.col("user_id").cast("long").alias("src"),
        ((F.col("user_id") + 1 + (F.col("event_id") % 97)) % 100)
        .cast("long")
        .alias("dst"),
    ).filter(F.col("src") != F.col("dst"))
    can = pairs.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    key = F.concat(
        F.col("a").cast("string"), F.lit("|"), F.col("b").cast("string")
    )
    h = F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")
    return can.filter(h % 5 == 0)


PREF_N = 1000


def preferential_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-analog of a random recursive tree over PREF_N
    vertices: each lineitem row contributes an edge (u, v) with
    u = h('pa|key') % N uniform and v = h('pb|key') % (u+1) uniform on
    [0, u] — so low-id vertices accumulate degree ~ (m/N)(1 + ln(N/id)),
    a SMOOTH log-spread tail. The PS / events / star graphs all have
    bimodal hub-vs-leaf degrees, which density-adaptive peels
    (algorithms/densest.py) collapse in one round; this is the fixture
    with a gradual degree gradient. md5-60bit keeps it engine-portable
    (the RandPerm trick, operators/indexing.py). Returned as a SIMPLE
    SYMMETRIC edge list (src, dst), one row per direction."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    key = F.concat(
        F.col("l_orderkey").cast("string"),
        F.lit("|"),
        F.col("l_linenumber").cast("string"),
    )

    def h60(salt: str):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + "|"), key)), 1, 15), 16, 10
        ).cast("long")

    raw = li.select(
        (h60("pa") % PREF_N).alias("u"), h60("pb").alias("h2")
    ).select("u", (F.col("h2") % (F.col("u") + 1)).alias("v"))
    can = (
        raw.filter(F.col("u") != F.col("v"))
        .select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
        .distinct()
    )
    return can.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        can.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )


def redirect_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic acyclic redirect set over the orders keyspace — the
    fixture for redirect-chain resolution (algorithms/redirects.py). ~2/3
    of orderkeys u redirect (md5-60bit 'rd' draw % 3 < 2) to target
    md5-60bit('rt') % u, which is STRICTLY smaller, so the functional
    graph is a DAG whose chains terminate at non-redirect ids; target
    uniform on [0, u) makes expected chain depth O(log n) with a thin
    geometric tail (each hop continues with prob 2/3), comfortably inside
    the default 2^8 doubling budget. md5-60bit keeps it engine-portable
    (the RandPerm trick, operators/indexing.py). Returns (src, dst), one
    row per redirecting orderkey."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        # +1: orderkeys are 0-based in the synthetic data and the target
        # draw is modulo u, which must be >= 1
        (F.col("o_orderkey").cast("long") + 1).alias("u")
    )

    def h60(salt: str):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + "|"), F.col("u").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")

    return o.filter(h60("rd") % 3 < 2).select(
        F.col("u").alias("src"), (h60("rt") % F.col("u")).alias("dst")
    )


def crawl_snapshots(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Two deterministic crawl snapshots of the same 997-vertex link graph
    for edge_delta (operators/delta.py): candidate edges come from the
    orders keyspace (src = u % 997, dst = md5-60bit('cd'|u) % 997,
    dedup'd), and each snapshot keeps a candidate independently with
    probability 3/4 via its own md5-60bit draw on the EDGE key — so
    ~56%% of candidates persist, ~19%% are added, ~19%% removed, and both
    membership draws are replayable in any engine (the RandPerm trick,
    operators/indexing.py). Returns (e_old, e_new), simple directed edge
    lists (src, dst)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("long").alias("u")
    )

    def h60(salt: str, key):
        return F.conv(
            F.substring(F.md5(F.concat(F.lit(salt + "|"), key)), 1, 15), 16, 10
        ).cast("long")

    cand = (
        o.select(
            (F.col("u") % 997).alias("src"),
            (h60("cd", F.col("u").cast("string")) % 997).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    ekey = F.concat(
        F.col("src").cast("string"), F.lit("|"), F.col("dst").cast("string")
    )
    e_old = cand.filter(h60("s1", ekey) % 4 != 0)
    e_new = cand.filter(h60("s2", ekey) % 4 != 0)
    return e_old, e_new


def nation_star_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hub-skew star forest: every customer and supplier linked to its
    nation (ids offset). Exactly 25 star components; the nation vertices are
    deliberate hubs (skew fixture)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        F.col("c_custkey").cast("long").alias("src"),
        (F.col("c_nationkey").cast("long") + F.lit(NATION_OFFSET)).alias("dst"),
    )
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        (F.col("s_suppkey").cast("long") + F.lit(SUPPLIER_OFFSET)).alias("src"),
        (F.col("s_nationkey").cast("long") + F.lit(NATION_OFFSET)).alias("dst"),
    )
    return build_graph(c.unionByName(s))
