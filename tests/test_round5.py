"""Round-5 operators: clustering coefficient, sessionization, KMV sketch,
corpus-wide duplicated-n-gram fraction. Pure-python oracles, no scipy."""

from __future__ import annotations

import datetime
import hashlib
from itertools import combinations

import pyspark.sql.functions as F
import pytest

from combblas_spark.algorithms.clustering import (
    clustering_coefficient,
    per_vertex_triangles,
)
from combblas_spark.functions.sessions import sessionize
from combblas_spark.functions.sketch import kmv_distinct
from combblas_spark.functions.text import dup_ngram_fraction


# ---------------------------------------------------------------- clustering


def _py_lcc(pairs):
    """Pure-python local clustering coefficient oracle."""
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v, nb in adj.items():
        deg = len(nb)
        tri = sum(1 for x, y in combinations(sorted(nb), 2) if y in adj.get(x, ()))
        lcc = round(2.0 * tri / (deg * (deg - 1)), 6) if deg >= 2 else 0.0
        out[v] = (deg, tri, lcc)
    return out


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, w double"
    )


def test_clustering_coefficient_known_graph(spark):
    # triangle 1-2-3 plus a pendant 4 off vertex 1 and an isolated edge 5-6
    pairs = [(1, 2), (2, 3), (1, 3), (1, 4), (5, 6)]
    got = {
        r["id"]: (r["deg"], r["tri"], r["lcc"])
        for r in clustering_coefficient(_edges_df(spark, pairs)).collect()
    }
    assert got == _py_lcc(pairs)
    # vertex 1: deg 3, 1 triangle, lcc = 2/(3*2) = 0.333333
    assert got[1] == (3, 1, round(1 / 3, 6))
    assert got[4] == (1, 0, 0.0)


def test_clustering_direction_and_dup_invariant(spark):
    # duplicate edges, reversed directions and loops must not change anything
    base = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)]
    noisy = base + [(b, a) for a, b in base] + [(1, 2), (2, 2)]
    a = sorted(clustering_coefficient(_edges_df(spark, base)).collect())
    b = sorted(clustering_coefficient(_edges_df(spark, noisy)).collect())
    assert a == b


def test_per_vertex_triangles_k4(spark):
    # K4: every vertex is in C(3,2) = 3 triangles
    pairs = [(a, b) for a, b in combinations(range(4), 2)]
    got = {r["v"]: r["tri"] for r in per_vertex_triangles(_edges_df(spark, pairs)).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


# --------------------------------------------------------------- sessionize


def _ev(eid, uid, minute, etype="c", value=1.5):
    return (
        eid,
        datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=minute),
        uid,
        etype,
        value,
    )


def _events_df(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    )


def test_sessionize_gap_boundaries(spark):
    # user 7: events at t=0, 10, 200 min -> gap 190min > 1h splits session
    # user 8: single event
    rows = [
        _ev(1, 7, 0, "a", 1.0),
        _ev(2, 7, 10, "b", 2.25),
        _ev(3, 7, 200, "a", 4.0),
        _ev(4, 8, 5, "c", 0.5),
    ]
    got = {
        (r["user_id"], r["session_id"]): r
        for r in sessionize(_events_df(spark, rows), gap_seconds=3600).collect()
    }
    assert set(got) == {(7, 1), (7, 2), (8, 1)}
    s1 = got[(7, 1)]
    assert s1["n_events"] == 2 and s1["n_types"] == 2
    assert s1["end_us"] - s1["start_us"] == 10 * 60 * 1_000_000
    assert s1["value_milli"] == 1000 + 2250
    assert got[(7, 2)]["n_events"] == 1
    assert got[(8, 1)]["value_milli"] == 500


def test_sessionize_exact_gap_stays_open(spark):
    # gap exactly == threshold does NOT split (strict >)
    rows = [_ev(1, 1, 0), _ev(2, 1, 60)]
    out = sessionize(_events_df(spark, rows), gap_seconds=3600).collect()
    assert len(out) == 1 and out[0]["n_events"] == 2


def test_sessionize_partition_invariance(spark):
    rows = [_ev(i, i % 5, (i * 37) % 500, "t%d" % (i % 3), float(i)) for i in range(200)]
    df1 = _events_df(spark, rows).repartition(1)
    df8 = _events_df(spark, rows).repartition(8)
    r1 = sorted(map(tuple, sessionize(df1, gap_seconds=1800).collect()))
    r8 = sorted(map(tuple, sessionize(df8, gap_seconds=1800).collect()))
    assert r1 == r8


# --------------------------------------------------------------------- kmv


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_kmv_exact_when_under_k(spark):
    df = spark.createDataFrame(
        [("g", f"v{i}") for i in range(10)], "grp string, val string"
    )
    row = kmv_distinct(df, "grp", F.col("val"), k=32).collect()[0]
    assert row["n_exact"] == 10 and row["kmv_est"] == 10.0


def test_kmv_estimate_matches_python_oracle(spark):
    vals = [f"tok{i}" for i in range(500)]
    df = spark.createDataFrame([("g", v) for v in vals * 3], "grp string, val string")
    k = 32
    row = kmv_distinct(df, "grp", F.col("val"), k=k).collect()[0]
    hs = sorted({_md5_60(v) for v in vals})
    expect = round((k - 1) * float(1 << 60) / hs[k - 1], 6)
    assert row["n_exact"] == 500
    assert row["kmv_est"] == expect
    # the estimate should be in the right ballpark (KMV stderr ~ 1/sqrt(k))
    assert 250 <= row["kmv_est"] <= 1000


# -------------------------------------------------------------- dup_ngrams


def test_dup_ngram_fraction(spark):
    boiler = "one two three four five"
    docs = spark.createDataFrame(
        [
            (1, boiler + " alpha beta"),
            (2, boiler + " gamma delta"),
            (3, "zeta eta theta iota kappa"),
            (4, "xy"),  # < 3 tokens: no row
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in dup_ngram_fraction(docs, k=3).collect()}
    assert set(got) == {1, 2, 3}
    # docs 1/2 share the 3 shingles fully inside "one two three four five"
    # (doc 1 has 5 distinct 3-grams; 3 of them appear in doc 2 as well)
    assert got[1]["n_grams"] == 5 and got[1]["n_dup_grams"] == 3
    assert got[1]["dup_frac"] == round(3 / 5, 6)
    assert got[3]["n_dup_grams"] == 0 and got[3]["dup_frac"] == 0.0


# ---------------------------------------------------- spmm / kron (round 5b)


def test_spmm_equals_columnwise_spmv(spark):
    """Metamorphic: SpMM == k independent SpMV passes, column by column."""
    from combblas_spark.core.semiring import PLUS_TIMES
    from combblas_spark.operators.multiply import spmm, spmv

    pairs = [(1, 2), (2, 3), (1, 3), (3, 1), (4, 2)]
    e = _edges_df(spark, pairs)
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    x = verts.select(
        "id",
        (F.col("id") % 7).cast("double").alias("x0"),
        (F.col("id") * 2 % 5).cast("double").alias("x1"),
    )
    got = {r["id"]: (r["x0"], r["x1"]) for r in spmm(e, x, PLUS_TIMES).collect()}
    for i, c in enumerate(["x0", "x1"]):
        xi = x.select("id", F.col(c).alias("val"))
        want = {r["id"]: r["val"] for r in spmv(e, xi, PLUS_TIMES).collect()}
        assert {k: v[i] for k, v in got.items()} == want


def test_kron_known_product(spark):
    """Kron of two explicit small matrices vs a pure-python oracle."""
    from combblas_spark.operators.multiply import kron

    a_nnz = [(0, 1, 2.0), (1, 0, 3.0)]          # 2x2
    b_nnz = [(0, 0, 5.0), (1, 2, 7.0)]          # 2x3
    a = spark.createDataFrame(a_nnz, "src long, dst long, w double")
    b = spark.createDataFrame(b_nnz, "src long, dst long, w double")
    got = {(r["src"], r["dst"]): r["w"] for r in kron(a, b, 2, 3).collect()}
    want = {
        (sa * 2 + sb, da * 3 + db): wa * wb
        for sa, da, wa in a_nnz
        for sb, db, wb in b_nnz
    }
    assert got == want
    # identity (x) B == block-diagonal B replicas
    eye = spark.createDataFrame(
        [(0, 0, 1.0), (1, 1, 1.0)], "src long, dst long, w double"
    )
    got2 = {(r["src"], r["dst"]): r["w"] for r in kron(eye, b, 2, 3).collect()}
    assert got2 == {
        (i * 2 + sb, i * 3 + db): wb for i in (0, 1) for sb, db, wb in b_nnz
    }


# ------------------------------------------------- graph stats / adamic-adar


def _py_graph_stats(dir_pairs):
    e = {(s, d) for s, d in dir_pairs if s != d}
    recip = sum(1 for s, d in e if (d, s) in e) / len(e)
    und = {(min(s, d), max(s, d)) for s, d in e}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    xs, ys = [], []
    for a, b in und:
        for u, v in ((a, b), (b, a)):
            xs.append(len(adj[u]))
            ys.append(len(adj[v]))
    m = len(xs)
    mx, my = sum(xs) / m, sum(ys) / m
    cov = sum(x * y for x, y in zip(xs, ys)) / m - mx * my
    vx = sum(x * x for x in xs) / m - mx * mx
    vy = sum(y * y for y in ys) / m - my * my
    r = cov / (vx * vy) ** 0.5 if vx * vy > 0 else 0.0
    return len(adj), len(e), round(recip, 6), round(r, 6)


def test_graph_stats_known_graphs(spark):
    from combblas_spark.algorithms.stats import graph_stats

    # star digraph 0->{1,2,3} plus one reciprocal arc 1->0: hub-leaf
    # structure = strongly disassortative; reciprocity = 2/4
    pairs = [(0, 1), (0, 2), (0, 3), (1, 0)]
    row = graph_stats(_edges_df(spark, pairs)).collect()[0]
    nv, ne, rec, assort = _py_graph_stats(pairs)
    assert (row["n_vertices"], row["n_edges"]) == (nv, ne)
    assert row["reciprocity"] == rec == 0.5
    assert row["assortativity"] == assort
    assert row["assortativity"] < 0  # hub-leaf graphs are disassortative
    # 4-cycle: degree-regular => zero variance => defined as 0.0
    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    row = graph_stats(_edges_df(spark, cyc)).collect()[0]
    assert row["reciprocity"] == 0.0
    assert row["assortativity"] == 0.0


def _py_adamic_adar(dir_pairs, k):
    und = {(min(s, d), max(s, d)) for s, d in dir_pairs if s != d}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    import math

    scores = {}
    for z, nb in adj.items():
        if len(nb) < 2:
            continue
        wz = 1.0 / math.log(len(nb))
        for a, b in combinations(sorted(nb), 2):
            if (a, b) in und:
                continue
            n, s = scores.get((a, b), (0, 0.0))
            scores[(a, b)] = (n + 1, s + wz)
    rows = [
        (a, b, n, round(s, 6)) for (a, b), (n, s) in scores.items()
    ]
    rows.sort(key=lambda r: (-r[3], r[0], r[1]))
    return rows[:k]


def test_adamic_adar_known_graph(spark):
    from combblas_spark.algorithms.linkpred import adamic_adar

    # path 1-2-3-4-5 plus chord 2-4: candidate pairs via common neighbors
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (2, 4)]
    got = [
        (r["a"], r["b"], r["n_common"], r["aa_score"])
        for r in adamic_adar(_edges_df(spark, pairs), k=10).collect()
    ]
    assert got == _py_adamic_adar(pairs, 10)
    # 1 and 5 share no neighbor -> never a candidate pair
    assert (1, 5) not in {(a, b) for a, b, *_ in got}


def test_adamic_adar_max_degree_cap(spark):
    from combblas_spark.algorithms.linkpred import adamic_adar

    # hub 0 connected to 1..5; capping max_degree=4 removes ALL wedges
    pairs = [(0, i) for i in range(1, 6)]
    assert adamic_adar(_edges_df(spark, pairs), k=10, max_degree=4).count() == 0
    full = adamic_adar(_edges_df(spark, pairs), k=100).collect()
    assert len(full) == 10  # C(5,2) leaf pairs through the hub


# --------------------------------------------------------- degree histogram


def test_degree_histogram_power_of_two_edges(spark):
    """Bucket boundaries at exact powers of two must be integer-exact —
    the float-log2 failure mode this implementation avoids by bin()."""
    from combblas_spark.operators.reduce import degree_histogram

    # vertex 1: deg 8 (bucket 3), vertex 2: deg 7 (bucket 2),
    # vertex 3: deg 1 (bucket 0), vertex 4: deg 2 (bucket 1)
    pairs = (
        [(1, 100 + i) for i in range(8)]
        + [(2, 200 + i) for i in range(7)]
        + [(3, 300)]
        + [(4, 400), (4, 401)]
    )
    got = {
        r["bucket"]: (r["n_vertices"], r["min_deg"], r["max_deg"])
        for r in degree_histogram(_edges_df(spark, pairs), dim="row").collect()
    }
    assert got == {3: (1, 8, 8), 2: (1, 7, 7), 0: (1, 1, 1), 1: (1, 2, 2)}


# ------------------------------------------------------------------- tf-idf


def test_tfidf_topk_known_corpus(spark):
    import math

    from combblas_spark.functions.text import tfidf_topk

    docs = spark.createDataFrame(
        [
            (1, "apple banana apple"),
            (2, "banana cherry"),
            (3, "cherry cherry durian"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["tfidf"])
        for r in tfidf_topk(docs, k=2).collect()
    }
    ln = math.log
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert got[(1, 1)] == ("apple", 2, round(2 * ln(3), 6))
    assert got[(1, 2)] == ("banana", 1, round(ln(3 / 2), 6))
    # doc 3: cherry tf=2 df=2 -> 2*ln(1.5); durian tf=1 df=1 -> ln(3)
    assert got[(3, 1)] == ("durian", 1, round(ln(3), 6))
    assert got[(3, 2)] == ("cherry", 2, round(2 * ln(3 / 2), 6))


def test_tfidf_equal_scores_rank_by_term(spark):
    """Rounded-score ties order by term — the engine-portable tiebreak."""
    from combblas_spark.functions.text import tfidf_topk

    docs = spark.createDataFrame(
        [(1, "zzz aaa"), (2, "other words")],
        "doc_id long, text string",
    )
    # both terms in doc 1: tf=1, df=1 -> identical tfidf; rank by term asc
    got = [
        r["term"]
        for r in tfidf_topk(docs, k=2).filter(F.col("doc_id") == 1)
        .orderBy("rank").collect()
    ]
    assert got == ["aaa", "zzz"]


# ------------------------------------------------------- multi-source BFS


def test_msbfs_equals_per_source_bfs(spark):
    """Metamorphic: batched msbfs == k independent bfs depth tables."""
    from combblas_spark.algorithms.bfs import bfs, msbfs

    # two components: a 5-path and a triangle
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (12, 10)]
    sym = pairs + [(b, a) for a, b in pairs]
    e = _edges_df(spark, sym)
    roots = [1, 3, 10]
    got = {
        (r["s"], r["id"]): r["depth"]
        for r in msbfs(spark, e, roots=roots).collect()
    }
    want = {}
    for r in roots:
        for row in bfs(spark, e, root=r).collect():
            want[(r, row["id"])] = row["depth"]
    assert got == want
    # cross-component isolation: source 1 never reaches the triangle
    assert (1, 10) not in got and (10, 1) not in got


def test_msbfs_depth_cap(spark):
    from combblas_spark.algorithms.bfs import msbfs

    pairs = [(i, i + 1) for i in range(6)]  # directed 7-chain
    got = msbfs(spark, _edges_df(spark, pairs), roots=[0], max_iter=3)
    assert {r["depth"] for r in got.collect()} == {0, 1, 2, 3}


# ------------------------------------------------- coloring / transitivity


def test_jp_coloring_proper_on_clique_and_path(spark):
    from combblas_spark.algorithms.coloring import jp_coloring

    # K5: one vertex per round -> exactly colors 1..5, all distinct
    k5 = [(a, b) for a, b in combinations(range(5), 2)]
    got = {r["id"]: r["color"] for r in jp_coloring(spark, _edges_df(spark, k5), max_colors=6).collect()}
    assert sorted(got.values()) == [1, 2, 3, 4, 5]
    # path P6: proper coloring, few colors, nothing left uncolored
    p6 = [(i, i + 1) for i in range(5)]
    cols = {r["id"]: r["color"] for r in jp_coloring(spark, _edges_df(spark, p6), max_colors=6).collect()}
    assert all(c >= 1 for c in cols.values())
    for a, b in p6:
        assert cols[a] != cols[b]


def test_jp_coloring_round_budget_warns(spark):
    import pytest as _pytest

    from combblas_spark.algorithms.coloring import jp_coloring

    k5 = [(a, b) for a, b in combinations(range(5), 2)]
    with _pytest.warns(UserWarning, match="max_colors exhausted"):
        got = {
            r["id"]: r["color"]
            for r in jp_coloring(spark, _edges_df(spark, k5), max_colors=2).collect()
        }
    assert sorted(got.values()) == [0, 0, 0, 1, 2]


def test_transitivity_known_graphs(spark):
    from combblas_spark.algorithms.clustering import transitivity

    # K4: 4 triangles, 12 wedges -> 1.0
    k4 = [(a, b) for a, b in combinations(range(4), 2)]
    row = transitivity(_edges_df(spark, k4)).collect()[0]
    assert (row["n_triangles"], row["n_wedges"], row["transitivity"]) == (4, 12, 1.0)
    # path 1-2-3: no triangle, one wedge
    row = transitivity(_edges_df(spark, [(1, 2), (2, 3)])).collect()[0]
    assert (row["n_triangles"], row["n_wedges"], row["transitivity"]) == (0, 1, 0.0)


def test_edge_jaccard_triangle_with_pendant(spark):
    from combblas_spark.algorithms.clustering import edge_jaccard

    # triangle 1-2-3, pendant 4 on 1
    pairs = [(1, 2), (2, 3), (1, 3), (1, 4)]
    got = {(r["a"], r["b"]): (r["n_common"], r["jac"]) for r in edge_jaccard(_edges_df(spark, pairs)).collect()}
    # edge (2,3): N(2)\{3}={1}, N(3)\{2}={1} -> jac 1/1
    assert got[(2, 3)] == (1, 1.0)
    # edge (1,2): common {3}; union (3-1)+(2-1)-1 = 2 -> 0.5
    assert got[(1, 2)] == (1, 0.5)
    # pendant edge (1,4): no common, union = (3-1)+(1-1)-0 = 2 -> 0.0
    assert got[(1, 4)] == (0, 0.0)
    # isolated edge: union empty -> 0.0
    got2 = {(r["a"], r["b"]): r["jac"] for r in edge_jaccard(_edges_df(spark, [(8, 9)])).collect()}
    assert got2 == {(8, 9): 0.0}


def test_harmonic_centrality_known_path(spark):
    from combblas_spark.algorithms.stats import harmonic_centrality

    # undirected path 1-2-3-4, sources {1, 3}
    pairs = [(1, 2), (2, 3), (3, 4)]
    sym = pairs + [(b, a) for a, b in pairs]
    got = {
        r["id"]: (r["n_sources"], r["harmonic"])
        for r in harmonic_centrality(
            spark, _edges_df(spark, sym), roots=[1, 3]
        ).collect()
    }
    # d(1,.)=0,1,2,3; d(3,.)=2,1,0,1
    assert got[2] == (2, 2.0)                       # 1/1 + 1/1
    assert got[4] == (2, round(1 / 3 + 1, 6))       # 1/3 + 1/1
    assert got[1] == (1, 0.5)                       # only from 3 (d=2)
    assert got[3] == (1, 0.5)                       # only from 1 (d=2)


def test_distance_histogram_known_path(spark):
    from combblas_spark.algorithms.stats import distance_histogram

    # undirected path 1-2-3-4-5, sources {1, 3}:
    # depth 1: (1,2) (3,2) (3,4); depth 2: (1,3) (3,1) (3,5);
    # depth 3: (1,4); depth 4: (1,5) -> total 8 pairs
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5)]
    sym = pairs + [(b, a) for a, b in pairs]
    got = {
        r["depth"]: (r["n_pairs"], r["cum_frac"], r["eff_diameter"])
        for r in distance_histogram(
            spark, _edges_df(spark, sym), roots=[1, 3]
        ).collect()
    }
    assert got == {
        1: (3, 0.375, 4),
        2: (3, 0.75, 4),
        3: (1, 0.875, 4),   # cum 7: 70 < 72 = 9*total, not yet p90
        4: (1, 1.0, 4),
    }


def test_distance_histogram_p90_boundary(spark):
    from combblas_spark.algorithms.stats import distance_histogram

    # hub 0 with 9 leaves + one depth-2 vertex: from source {0} the
    # depth-1 cum is exactly 90% of 10 pairs (10*9 == 9*10) -> eff = 1
    star = [(0, i) for i in range(1, 10)] + [(1, 10)]
    sym = star + [(b, a) for a, b in star]
    rows = distance_histogram(spark, _edges_df(spark, sym), roots=[0]).collect()
    assert all(r["eff_diameter"] == 1 for r in rows)
    got = {r["depth"]: r["n_pairs"] for r in rows}
    assert got == {1: 9, 2: 1}


def test_butterfly_count_known_graphs(spark):
    from combblas_spark.algorithms.butterflies import butterfly_count

    # K2,3: parts {1,2} x {10,11,12} -> C(2,2)-side contributes one pair
    # with c=3, C(3,2)-side three pairs with c=2; butterflies = 3
    k23 = [(a, b) for a in (1, 2) for b in (10, 11, 12)]
    row = butterfly_count(_edges_df(spark, k23)).collect()[0]
    assert row["n_butterflies"] == 3
    assert row["n_pairs"] == 4 and row["n_wedges"] == 3 + 3 * 2
    # 6-cycle: wedges exist but no 4-cycle
    c6 = [(i, (i + 1) % 6) for i in range(6)]
    row = butterfly_count(_edges_df(spark, c6)).collect()[0]
    assert row["n_butterflies"] == 0
    # 4-cycle: exactly one butterfly
    c4 = [(0, 1), (1, 2), (2, 3), (3, 0)]
    row = butterfly_count(_edges_df(spark, c4)).collect()[0]
    assert row["n_butterflies"] == 1


def test_butterfly_max_degree_cap(spark):
    from combblas_spark.algorithms.butterflies import butterfly_count

    # star hub 0 with 5 leaves: capping centers below 5 removes all wedges
    star = [(0, i) for i in range(1, 6)]
    row = butterfly_count(_edges_df(spark, star), max_degree=4).collect()[0]
    assert (row["n_wedges"], row["n_pairs"], row["n_butterflies"]) == (0, 0, 0)
    full = butterfly_count(_edges_df(spark, star)).collect()[0]
    assert full["n_wedges"] == 10 and full["n_butterflies"] == 0


def test_modularity_known_partitions(spark):
    from combblas_spark.algorithms.stats import modularity

    # two disjoint triangles, symmetric unit weights
    tri1 = [(1, 2), (2, 3), (1, 3)]
    tri2 = [(4, 5), (5, 6), (4, 6)]
    pairs = tri1 + tri2
    sym = pairs + [(b, a) for a, b in pairs]
    e = _edges_df(spark, sym)
    # perfect partition: each triangle its own community ->
    # Q = 2 * (6/12 - (6/12)^2) = 0.5
    good = spark.createDataFrame(
        [(i, 1) for i in (1, 2, 3)] + [(i, 2) for i in (4, 5, 6)],
        "id long, val long",
    )
    row = modularity(e, good).collect()[0]
    assert (row["n_communities"], row["modularity"]) == (2, 0.5)
    # everything in one community -> Q = 1 - 1 = 0
    allone = spark.createDataFrame([(i, 1) for i in range(1, 7)], "id long, val long")
    row = modularity(e, allone).collect()[0]
    assert (row["n_communities"], row["modularity"]) == (1, 0.0)
    # singletons -> Q = sum(0 - (2/12)^2) = -6/36
    singles = spark.createDataFrame([(i, i) for i in range(1, 7)], "id long, val long")
    row = modularity(e, singles).collect()[0]
    assert (row["n_communities"], row["modularity"]) == (6, round(-6 / 36, 6))


def test_pseudo_diameter_known_path(spark):
    from combblas_spark.algorithms.stats import pseudo_diameter

    # path 3-1-2-5-4 (ids chosen so min-id start is interior): start=1,
    # sweep 1 farthest = 4 at depth 3; sweep 2 from 4 reaches 3 at depth 4
    pairs = [(3, 1), (1, 2), (2, 5), (5, 4)]
    sym = pairs + [(b, a) for a, b in pairs]
    e = _edges_df(spark, sym)
    row = pseudo_diameter(spark, e).collect()[0]
    assert (row["start"], row["peripheral"]) == (1, 4)
    assert (row["antipode"], row["pseudo_diameter"]) == (3, 4)
    # cycle of 6: every eccentricity is 3, argmax tie -> min id
    c6 = [(i, (i + 1) % 6) for i in range(6)]
    c6 = c6 + [(b, a) for a, b in c6]
    row = pseudo_diameter(spark, _edges_df(spark, c6)).collect()[0]
    assert (row["start"], row["peripheral"], row["pseudo_diameter"]) == (0, 3, 3)


def test_cocitation_known_digraph(spark):
    from combblas_spark.algorithms.linkpred import cocitation

    # 1->10, 1->11, 2->10, 2->11, 3->10: (10,11) co-cited by {1,2}
    e = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10)], "src long, dst long"
    )
    got = {(r["a"], r["b"]): r["n_common"] for r in cocitation(e).collect()}
    assert got == {(10, 11): 2}
    # bibliographic coupling: citers {1,2} share target 10 AND 11; {1,3},
    # {2,3} share only 10
    got = {
        (r["a"], r["b"]): r["n_common"]
        for r in cocitation(e, coupling=True).collect()
    }
    assert got == {(1, 2): 2, (1, 3): 1, (2, 3): 1}


def test_cocitation_hub_cap(spark):
    from combblas_spark.algorithms.linkpred import cocitation

    # directory page 0 links to 5 targets; cap 4 removes all its wedges
    e = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    assert cocitation(e, max_degree=4).count() == 0
    assert cocitation(e).count() == 10  # C(5,2) uncapped


def test_coreness_profile_known_graphs(spark):
    from combblas_spark.algorithms.kcore import coreness_profile

    # K9 (coreness 8 -> bucket 8) + path of 3 (coreness 1 -> bucket 0)
    # + K17 (coreness 16 -> bucket 16), disjoint, symmetric
    k9 = [(a, b) for a in range(9) for b in range(9) if a != b]
    path = [(100, 101), (101, 100), (101, 102), (102, 101)]
    k17 = [(200 + a, 200 + b) for a in range(17) for b in range(17) if a != b]
    e = spark.createDataFrame(k9 + path + k17, "src long, dst long")
    got = {
        r["id"]: r["coreness_bucket"]
        for r in coreness_profile(spark, e, ks=(8, 16, 32)).collect()
    }
    assert all(got[i] == 8 for i in range(9))
    assert all(got[i] == 0 for i in (100, 101, 102))
    assert all(got[200 + i] == 16 for i in range(17))


def test_importance_sample_python_replay(spark):
    from combblas_spark.functions.sampling import importance_sample

    rows = [(i, (i * 37) % 100 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {
        r["doc_id"]: (r["n_chars"], r["incl_p"])
        for r in importance_sample(df, frac=0.3).collect()
    }
    tw = sum(w for _, w in rows)
    n = len(rows)
    expect = {}
    for i, w in rows:
        p = min(1.0, 0.3 * n * w / tw)
        h = int(hashlib.md5(f"imp|{i}".encode()).hexdigest()[:15], 16)
        if h < int(p * float(1 << 60)):
            expect[i] = (w, round(p, 6))
    assert got == expect
    assert 0 < len(got) < n  # nondegenerate: some in, some out


def test_importance_sample_weight_monotone(spark):
    from combblas_spark.functions.sampling import importance_sample

    # frac high enough that heavy rows saturate at p = 1.0 (0.6 * 50 *
    # 1000 / 25025 > 1): every max-weight row must survive regardless of
    # its hash coin, since h < 2^60 = floor(1.0 * 2^60) always
    rows = [(i, 1 if i % 2 else 1000) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {r["doc_id"]: r["incl_p"] for r in importance_sample(df, frac=0.6).collect()}
    heavy = [i for i, w in rows if w == 1000]
    assert all(i in got and got[i] == 1.0 for i in heavy)


def test_conductance_known_partitions(spark):
    from combblas_spark.algorithms.stats import conductance

    # two unit-weight triangles joined by one bridge edge 3-4, symmetric:
    # 2m = 14; per triangle vol = 6 within + 1 bridge = 7, cut = 1
    # -> phi = 1 / min(7, 7) = 1/7 for both communities
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    sym = pairs + [(b, a) for a, b in pairs]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in sym], "src long, dst long, w double"
    )
    part = spark.createDataFrame(
        [(i, 1) for i in (1, 2, 3)] + [(i, 2) for i in (4, 5, 6)],
        "id long, val long",
    )
    got = {
        r["c"]: (r["n_members"], r["vol"], r["cut"], r["conductance"])
        for r in conductance(e, part).collect()
    }
    phi = round(1 / 7, 6)
    assert got == {1: (3, 7, 1, phi), 2: (3, 7, 1, phi)}
    # whole-graph community: no cut exists -> guard emits 0.0
    allone = spark.createDataFrame([(i, 9) for i in range(1, 7)], "id long, val long")
    row = conductance(e, allone).collect()[0]
    assert (row["c"], row["n_members"], row["vol"], row["cut"]) == (9, 6, 14, 0)
    assert row["conductance"] == 0.0


def test_component_histogram_known_components(spark):
    from combblas_spark.algorithms.stats import component_histogram

    # components of sizes 1(x2 labels? no: labels per vertex): sizes 3, 2, 8
    rows = (
        [(i, 100) for i in range(3)]
        + [(10 + i, 200) for i in range(2)]
        + [(20 + i, 300) for i in range(8)]
    )
    labels = spark.createDataFrame(rows, "id long, val long")
    got = {
        r["bucket"]: (r["n_components"], r["min_size"], r["max_size"], r["n_vertices"])
        for r in component_histogram(labels).collect()
    }
    # size 3 -> bucket 1, size 2 -> bucket 1, size 8 -> bucket 3 (exact pow2)
    assert got == {1: (2, 2, 3, 5), 3: (1, 8, 8, 8)}


def test_triangle_centrality_hand_computed(spark):
    """Burkhardt TC on hand-solved graphs. (1) lone triangle: every vertex
    scores exactly 1. (2) triangle {0,1,2} + pendant 3-0: the pendant's
    whole neighborhood triangle mass sits on its non-triangle edge, so it
    also scores ((0+0)/3 + t(0)=1)/T=1 — the paper's point that TC rewards
    triangle-DENSE NEIGHBORHOODS, not membership. (3) path: all 0.0."""
    from combblas_spark.algorithms.clustering import triangle_centrality

    tri = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2)], "src long, dst long"
    )
    got = {r["id"]: (r["n_tri"], r["tc"]) for r in triangle_centrality(tri).collect()}
    assert got == {0: (1, 1.0), 1: (1, 1.0), 2: (1, 1.0)}

    pend = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (3, 0)], "src long, dst long"
    )
    got = {r["id"]: (r["n_tri"], r["tc"]) for r in triangle_centrality(pend).collect()}
    # v=0: ((1 + t(1)+t(2)) / 3 + t(3)=0) / 1 = 1; v=1,2: ((1 + 1+1)/3 + 0)/1 = 1
    # v=3: ((0 + 0)/3 + t(0)=1) / 1 = 1
    assert got == {0: (1, 1.0), 1: (1, 1.0), 2: (1, 1.0), 3: (0, 1.0)}

    path = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r["id"]: (r["n_tri"], r["tc"]) for r in triangle_centrality(path).collect()}
    assert got == {0: (0, 0.0), 1: (0, 0.0), 2: (0, 0.0)}


def test_rich_club_hand_computed(spark):
    """K4 on {0..3} plus pendant 4-0: degrees {0:4, 1:3, 2:3, 3:3, 4:1}.
    k=1: all of K4 rich (N=4, E=6 -> phi=1.0); k=2: same set; k=3: only
    vertex 0 (N=1 -> phi=0.0); k=4+: empty."""
    from combblas_spark.algorithms.stats import rich_club

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(4, 0)]
    edges = spark.createDataFrame(k4, "src long, dst long")
    got = {
        r["k"]: (r["n_rich"], r["e_rich"], r["phi"])
        for r in rich_club(edges, ks=[1, 2, 3, 4]).collect()
    }
    assert got[1] == (4, 6, 1.0)
    assert got[2] == (4, 6, 1.0)
    assert got[3] == (1, 0, 0.0)
    assert got[4] == (0, 0, 0.0)


def test_heavy_edge_coarsen_hand_computed(spark):
    """Weighted path 0-1(5), 1-2(3), 2-3(5): mutual heavy pairs (0,1) and
    (2,3) contract; coarse matrix has diagonals 10 (internal edge counted
    in both symmetric directions) and one crossing edge of weight 3.
    Equal-weight triangle: ties break to the smallest neighbor id, so only
    (0,1) is mutual and vertex 2 stays a singleton."""
    from combblas_spark.algorithms.coarsen import coarsen, heavy_edge_matching

    path = spark.createDataFrame(
        [(0, 1, 5.0), (1, 2, 3.0), (2, 3, 5.0)], "src long, dst long, w double"
    )
    cmap = {r["id"]: r["coarse_id"] for r in heavy_edge_matching(path).collect()}
    assert cmap == {0: 0, 1: 0, 2: 2, 3: 2}
    got = {(r["src"], r["dst"]): r["w"] for r in coarsen(path).collect()}
    assert got == {(0, 0): 10, (0, 2): 3, (2, 2): 10}

    tri = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0)], "src long, dst long, w double"
    )
    cmap = {r["id"]: r["coarse_id"] for r in heavy_edge_matching(tri).collect()}
    assert cmap == {0: 0, 1: 0, 2: 2}
    got = {(r["src"], r["dst"]): r["w"] for r in coarsen(tri).collect()}
    # internal (0,1) -> diag 2; the two crossing edges 1-2 and 0-2 merge
    assert got == {(0, 0): 2, (0, 2): 2}


def test_salsa_python_replay(spark):
    """SALSA vs an exact pure-python replay of the two-step stochastic
    walk on a small weighted digraph; also checks the structural contract
    (no-out-edge vertex has hub 0, no-in-edge vertex has auth 0, auth mass
    stays L1 = 1)."""
    from combblas_spark.algorithms.salsa import salsa

    E = [(0, 2, 1.0), (1, 2, 2.0), (2, 3, 1.0), (3, 0, 1.0), (1, 3, 1.0)]
    iters = 5
    ind, outd = {}, {}
    for s, d, w in E:
        ind[d] = ind.get(d, 0.0) + w
        outd[s] = outd.get(s, 0.0) + w
    auth = {j: 1.0 / len(ind) for j in ind}
    hub = {}
    for _ in range(iters):
        hub = {}
        for s, d, w in E:
            hub[s] = hub.get(s, 0.0) + (w / ind[d]) * auth.get(d, 0.0)
        auth = {}
        for s, d, w in E:
            auth[d] = auth.get(d, 0.0) + (w / outd[s]) * hub.get(s, 0.0)
    edges = spark.createDataFrame(E, "src long, dst long, w double")
    got = {
        r["id"]: (r["hub"], r["auth"])
        for r in salsa(spark, edges, num_iters=iters).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    for v in got:
        assert got[v] == (round(hub.get(v, 0.0), 6), round(auth.get(v, 0.0), 6))
    assert got[1][1] == 0.0           # vertex 1 has no in-edges
    assert abs(sum(a for _, a in got.values()) - 1.0) < 1e-6


def test_disparity_backbone_hand_computed(spark):
    """Weighted star 0-{1,2,3,4} with one dominant edge (w=10 vs 1,1,1):
    at the hub (k=4, s=13) the dominant edge's alpha = (3/13)^3 ~ 0.0123
    clears alpha_max=0.05, the uniform edges ((12/13)^3 ~ 0.787) do not;
    the leaves are degree-1 (alpha 1.0)."""
    from combblas_spark.algorithms.backbone import disparity_backbone

    edges = spark.createDataFrame(
        [(0, 1, 10.0), (0, 2, 1.0), (0, 3, 1.0), (0, 4, 1.0)],
        "src long, dst long, w double",
    )
    got = {
        (r["a"], r["b"]): (r["w"], r["alpha"], r["keep"])
        for r in disparity_backbone(edges, alpha_max=0.05).collect()
    }
    assert got[(0, 1)] == (10, round((3 / 13) ** 3, 6), 1)
    for b in (2, 3, 4):
        assert got[(0, b)] == (1, round((12 / 13) ** 3, 6), 0)


def test_wl_refinement_known_partitions(spark):
    """1-WL invariants: (a) a path's endpoints share a color class distinct
    from the middle; (b) the classic non-distinguishability — two disjoint
    triangles and a 6-cycle are both 2-regular and get ONE identical color
    everywhere at every round (the known 1-WL blind spot)."""
    from combblas_spark.algorithms.wl import wl_refine

    path = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {r["id"]: r["wl_color"] for r in wl_refine(spark, path, rounds=3).collect()}
    assert got[0] == got[2] and got[0] != got[1]

    two_tri = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)]
    six_cycle = [(10, 11), (11, 12), (12, 13), (13, 14), (14, 15), (10, 15)]
    g = spark.createDataFrame(two_tri + six_cycle, "src long, dst long")
    colors = {r["id"]: r["wl_color"] for r in wl_refine(spark, g, rounds=4).collect()}
    assert len(set(colors.values())) == 1


def test_knn_curve_hand_computed(spark):
    """Star 0-{1,2,3}: the hub (deg 3, bucket 1) sees mean neighbor degree
    1; each leaf (deg 1, bucket 0) sees 3 — the textbook disassortative
    profile."""
    from combblas_spark.algorithms.stats import knn_curve

    star = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "src long, dst long")
    got = {
        r["bucket"]: (r["n_vertices"], r["avg_deg"], r["avg_nbr_deg"])
        for r in knn_curve(star).collect()
    }
    assert got == {0: (3, 1.0, 3.0), 1: (1, 3.0, 1.0)}


def test_sweep_cut_finds_seed_triangle(spark):
    """Two triangles {0,1,2} and {3,4,5} joined by bridge 2-3, seeded at
    vertex 0: degree-normalized PPR ranks the seed triangle first, and the
    conductance sweep bottoms out exactly at prefix size 3 with
    phi = cut/vol = 1/7 (one bridge edge over volume 7)."""
    from combblas_spark.algorithms.localcluster import sweep_cut

    E = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    edges = spark.createDataFrame(
        [(s, d, 1.0) for s, d in E] + [(d, s, 1.0) for s, d in E],
        "src long, dst long, w double",
    )
    rows = sweep_cut(
        spark, edges, seeds=[0], alpha=0.85, num_iters=10, top_m=6
    ).collect()
    by_rank = {r["rank"]: r for r in rows}
    assert {by_rank[k]["id"] for k in (1, 2, 3)} == {0, 1, 2}
    phis = {r["rank"]: r["phi"] for r in rows}
    assert phis[3] == round(1 / 7, 6)
    assert min(phis, key=phis.get) == 3
    # the full-graph prefix has vol == total volume: the denominator
    # min(vol, tv - vol) is 0 and the guard reports the 1.0 sentinel
    assert phis[6] == 1.0


# --------------------------------------------------------------------- katz


def _py_katz(triples, alpha, beta, iters):
    """Pure-python Katz replay: a_eff = alpha / max in-weight, then the
    fixed-iteration x = beta + a_eff * A^T x recurrence."""
    in_w = {}
    for _, v, w in triples:
        in_w[v] = in_w.get(v, 0.0) + w
    a = alpha / max(in_w.values())
    verts = sorted({u for u, _, _ in triples} | {v for _, v, _ in triples})
    x = {v: beta for v in verts}
    for _ in range(iters):
        c = {v: 0.0 for v in verts}
        for u, v, w in triples:
            c[v] += w * x[u]
        x = {v: beta + a * c[v] for v in verts}
    return {v: round(x[v], 6) for v in verts}


def test_katz_python_replay(spark):
    from combblas_spark.algorithms.katz import katz

    # weighted digraph with a cycle, a heavy parallel path and a pure
    # source (vertex 4: no in-edges -> score stays exactly beta)
    triples = [
        (1, 2, 2.0),
        (2, 3, 1.0),
        (3, 1, 1.0),
        (1, 3, 3.0),
        (4, 1, 1.0),
    ]
    edges = spark.createDataFrame(triples, "src long, dst long, w double")
    got = {
        r["id"]: round(r["val"], 6)
        for r in katz(spark, edges, alpha=0.5, num_iters=8).collect()
    }
    assert got == _py_katz(triples, 0.5, 1.0, 8)
    assert got[4] == 1.0  # source vertex: beta only
    # vertex 3 has the heaviest attenuated in-walks of the cycle
    assert got[3] > got[2]


def test_katz_validation(spark):
    from combblas_spark.algorithms.katz import katz

    edges = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, w double")
    for bad_iters in (0, -1):
        try:
            katz(spark, edges, num_iters=bad_iters)
            assert False, "expected ValueError"
        except ValueError:
            pass
    for bad_alpha in (0.0, 1.0, 1.5):
        try:
            katz(spark, edges, alpha=bad_alpha)
            assert False, "expected ValueError"
        except ValueError:
            pass


# ---------------------------------------------------------- prefix join


def _py_shingles(text, k=3):
    toks = [t for t in text.split(" ") if t]
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def test_prefix_jaccard_exact_complete(spark):
    """Prefix filtering must return EXACTLY the brute-force J >= 1/2 pair
    set (no false negatives — the property LSH trades away)."""
    from combblas_spark.functions.dedup import prefix_jaccard_pairs

    corpus = [
        (1, "a b c d e"),
        (2, "a b c d x"),   # J(1,2) = 2/4 = 0.5 -> kept
        (3, "z y w v u"),   # disjoint
        (4, "a b c q r"),   # J(1,4) = 1/5 -> dropped
        (5, "a b c d e"),   # identical to 1
        (6, "m n"),         # < k tokens: no shingles, never paired
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["n_a"], r["n_b"], r["jac"])
        for r in prefix_jaccard_pairs(docs, tau_num=1, tau_den=2).collect()
    }
    sh = {d: _py_shingles(t) for d, t in corpus if len(t.split()) >= 3}
    want = {}
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = len(sh[a] & sh[b])
            u = len(sh[a] | sh[b])
            if u and 2 * c >= u:  # J >= 1/2
                want[(a, b)] = (c, len(sh[a]), len(sh[b]), round(c / u, 6))
    assert got == want
    assert (1, 5) in got and got[(1, 5)][3] == 1.0
    assert (1, 4) not in got


def test_prefix_jaccard_bucket_cap(spark):
    """Degenerate prefix buckets above max_bucket are dropped — 5
    identical docs under cap 2 emit no pairs (the boilerplate guard)."""
    from combblas_spark.functions.dedup import prefix_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, "p q r s t") for i in range(5)], "doc_id long, text string"
    )
    assert prefix_jaccard_pairs(docs, max_bucket=2).count() == 0
    assert prefix_jaccard_pairs(docs, max_bucket=100).count() == 10


# ------------------------------------------------------------ boruvka msf


def _py_msf(triples):
    """Kruskal union-find oracle under the (w, a, b) total order — the MSF
    is unique under that order, so Borůvka must match it exactly."""
    canon = {}
    for s, d, w in triples:
        if s == d:
            continue
        a, b = (s, d) if s < d else (d, s)
        canon[(a, b)] = min(canon.get((a, b), w), w)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for w, a, b in sorted((w, a, b) for (a, b), w in canon.items()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def _msf_got(spark, triples, **kw):
    from combblas_spark.algorithms.msf import boruvka_msf

    edges = spark.createDataFrame(triples, "src long, dst long, w double")
    return {
        (r["a"], r["b"], r["w"]) for r in boruvka_msf(spark, edges, **kw).collect()
    }


def test_msf_known_cycle(spark):
    # 4-cycle with one heavy edge: the MSF drops exactly the heavy edge
    triples = [(0, 1, 1.0), (1, 2, 2.0), (2, 3, 3.0), (3, 0, 9.0)]
    got = _msf_got(spark, triples)
    assert got == {(0, 1, 1.0), (1, 2, 2.0), (2, 3, 3.0)}


def test_msf_chain_hooks_and_ties(spark):
    """Equal weights force the (a, b) tiebreak; the increasing-weight path
    is Borůvka's pathological all-in-one-chain hooking case (deep pointer
    jumping); a second component + parallel edges + loops exercise the
    canonicalization."""
    path = [(i, i + 1, 1.0) for i in range(12)]           # all ties
    extra = [
        (20, 21, 5.0), (21, 22, 4.0), (20, 22, 4.0),      # triangle, tie 4.0
        (21, 20, 3.0),                                    # parallel reversed
        (7, 7, 0.5),                                      # loop ignored
    ]
    triples = path + extra
    assert _msf_got(spark, triples) == _py_msf(triples)


def test_msf_matches_kruskal_random(spark):
    import random

    rng = random.Random(7)
    triples = []
    for _ in range(120):
        a, b = rng.randrange(40), rng.randrange(40)
        triples.append((a, b, float(rng.randrange(1, 8))))
    assert _msf_got(spark, triples) == _py_msf(triples)
    # forest size identity: |V_with_edges| - n_components
    verts = {a for a, b, w in triples if a != b} | {
        b for a, b, w in triples if a != b
    }
    comps = {}

    def find(x):
        while comps.setdefault(x, x) != x:
            x = comps[x]
        return x

    for a, b, _ in triples:
        if a != b:
            comps[find(a)] = find(b)
    n_comp = len({find(v) for v in verts})
    assert len(_py_msf(triples)) == len(verts) - n_comp


# --------------------------------------------------------------------- anf


def _py_anf(pairs, hops, k, salt="anf"):
    """True-ball replay: ball(v, h) = {v} + in-neighbors' balls(h-1)
    (sketches flow src -> dst); est per (v, h) from the k smallest
    md5-60bit hashes — exact below k by the KMV merge property."""
    verts = sorted({a for a, _ in pairs} | {b for _, b in pairs})
    hv = {
        v: int(hashlib.md5(f"{salt}|{v}".encode()).hexdigest()[:15], 16)
        for v in verts
    }
    balls = {v: {v} for v in verts}
    out = {}

    def est(ball):
        hs = sorted({hv[u] for u in ball})
        if len(hs) < k:
            return float(len(hs))
        return round((k - 1) * float(1 << 60) / hs[k - 1], 6)

    for v in verts:
        out[(v, 0)] = est(balls[v])
    for h in range(1, hops + 1):
        nxt = {v: set(balls[v]) for v in verts}
        for a, b in pairs:
            nxt[b] |= balls[a]
        balls = nxt
        for v in verts:
            out[(v, h)] = est(balls[v])
    return out


def test_anf_exact_small_balls(spark):
    from combblas_spark.algorithms.anf import anf

    # symmetric path 0-1-2-3-4: k=16 > any ball -> est is the EXACT size
    path = [(i, i + 1) for i in range(4)]
    pairs = path + [(b, a) for a, b in path]
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, w double"
    )
    got = {
        (r["id"], r["h"]): r["est"]
        for r in anf(spark, edges, hops=2, k=16).collect()
    }
    assert got == _py_anf(pairs, 2, 16)
    assert got[(2, 1)] == 3.0 and got[(2, 2)] == 5.0
    assert got[(0, 2)] == 3.0


def test_anf_kmv_estimator_replay(spark):
    from combblas_spark.algorithms.anf import anf

    # star: center 0 with 30 leaves (symmetric) -> ball(0, 1) = 31 > k=8,
    # the estimator path; leaves stay exact at h=1 (ball = 2)
    pairs = [(0, i) for i in range(1, 31)] + [(i, 0) for i in range(1, 31)]
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, w double"
    )
    got = {
        (r["id"], r["h"]): r["est"]
        for r in anf(spark, edges, hops=2, k=8).collect()
    }
    want = _py_anf(pairs, 2, 8)
    assert got == want
    assert got[(5, 1)] == 2.0
    assert got[(0, 1)] != 31.0  # estimator engaged (true 31, est from h_8)
    # at h=2 every vertex sees the whole star through the center
    assert len({got[(v, 2)] for v in range(31)}) == 1


# ------------------------------------------------------ span contamination


def test_span_contamination_hand_built(spark):
    """Longest shared token run across a forced train/eval split: one
    verbatim 5-token quote -> span 5; scattered single-shingle overlap
    stays below min_span and is dropped."""
    from combblas_spark.functions.dedup import span_contamination

    # find ids landing on each side of the md5 split (salt='split', 10%)
    def bucket(i):
        return int(hashlib.md5(f"split|{i}".encode()).hexdigest()[:15], 16) % 1000

    eval_id = next(i for i in range(1000) if bucket(i) < 100)
    train_a = next(i for i in range(1000) if bucket(i) >= 100)
    train_b = next(i for i in range(train_a + 1, 1000) if bucket(i) >= 100)
    docs = spark.createDataFrame(
        [
            # shares the 5-token run "q w e r t" with the eval doc
            (train_a, "x x x q w e r t y y"),
            # shares only ONE 3-shingle ("q w e") — span 3 < min_span 4
            (train_b, "q w e z z z z z z"),
            (eval_id, "a b q w e r t c d"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["train_id"], r["eval_id"]): r["longest_span"]
        for r in span_contamination(docs, k=3, min_span=4).collect()
    }
    assert got == {(train_a, eval_id): 5}
    # with min_span 3 the single-shingle pair appears too
    got3 = {
        (r["train_id"], r["eval_id"]): r["longest_span"]
        for r in span_contamination(docs, k=3, min_span=3).collect()
    }
    assert got3 == {(train_a, eval_id): 5, (train_b, eval_id): 3}


def test_span_contamination_df_cap(spark):
    """Shingles in more than max_df documents are excluded from matching —
    the boilerplate fan-out guard; a run through a capped shingle splits."""
    from combblas_spark.functions.dedup import span_contamination

    def bucket(i):
        return int(hashlib.md5(f"split|{i}".encode()).hexdigest()[:15], 16) % 1000

    eval_id = next(i for i in range(1000) if bucket(i) < 100)
    trains = [i for i in range(1000) if bucket(i) >= 100][:4]
    rows = [(t, "c o m m o n b o i l e r") for t in trains[:3]]
    rows.append((trains[3], "c o m m o n b o i l e r"))
    rows.append((eval_id, "c o m m o n b o i l e r"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # every shingle occurs in all 5 docs > max_df=4 -> nothing matches
    assert span_contamination(docs, k=3, min_span=3, max_df=4).count() == 0
    # raising the cap restores the full-document span (12 tokens)
    got = {
        (r["train_id"], r["eval_id"]): r["longest_span"]
        for r in span_contamination(docs, k=3, min_span=3, max_df=10).collect()
    }
    assert set(got.values()) == {12}
    assert len(got) == 4


# ------------------------------------------------------- winnowing (MOSS)

def _py_winnow(text, k, w):
    """Pure-python replay of the window-min fingerprint selection."""
    import hashlib

    toks = [t for t in text.split(" ") if t]
    hs = [
        hashlib.md5(" ".join(toks[i : i + k]).encode()).hexdigest()[:15]
        for i in range(len(toks) - k + 1)
    ]
    keys = [f"{h}|{i:08d}" for i, h in enumerate(hs)]
    return {min(keys[s : s + w])[:15] for s in range(len(keys) - w + 1)}


def test_winnow_pairs_matches_python_replay(spark):
    """Pair counts equal the pure-python window-min selection replay."""
    from combblas_spark.functions.dedup import winnow_pairs

    corpus = [
        (1, "a b c d e f g h i j"),
        (2, "x y a b c d e f g z"),    # shares the 7-token run a..g with 1
        (3, "p q r s t u v w"),        # disjoint
        (4, "a b c d e f g h i j"),    # identical to 1
        (5, "m n"),                    # shorter than w+k-1: no fingerprints
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnow_pairs(docs, k=3, w=3, min_shared=1).collect()
    }
    fp = {d: _py_winnow(t, 3, 3) for d, t in corpus}
    want = {}
    ids = sorted(fp)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            c = len(fp[a] & fp[b])
            if c >= 1:
                want[(a, b)] = c
    assert got == want
    assert (1, 4) in got  # identical docs share everything


def test_winnow_guarantee_shared_run(spark):
    """The winnowing guarantee: a verbatim token run of w + k - 1 tokens
    embedded in two otherwise-disjoint documents MUST produce >= 1 shared
    fingerprint (MinHash/SimHash only make this probable)."""
    from combblas_spark.functions.dedup import winnow_pairs

    k, w = 4, 4
    run = "r1 r2 r3 r4 r5 r6 r7"  # exactly w + k - 1 = 7 tokens
    docs = spark.createDataFrame(
        [(1, f"u1 u2 u3 {run} u4 u5 u6"), (2, f"v1 v2 {run} v3 v4 v5 v6 v7")],
        "doc_id long, text string",
    )
    pairs = winnow_pairs(docs, k=k, w=w, min_shared=1).collect()
    assert len(pairs) == 1 and pairs[0]["n_shared"] >= 1


def test_winnow_boilerplate_df_cap(spark):
    """Fingerprints in more than max_df documents are dropped: 10
    identical docs under cap 5 emit no pairs; under cap 10, all 45."""
    from combblas_spark.functions.dedup import winnow_pairs

    docs = spark.createDataFrame(
        [(i, "b1 b2 b3 b4 b5 b6 b7 b8 b9") for i in range(10)],
        "doc_id long, text string",
    )
    assert winnow_pairs(docs, min_shared=1, max_df=5).count() == 0
    assert winnow_pairs(docs, min_shared=1, max_df=10).count() == 45


# --------------------------------------------------------- temporal / cliques


def _py_earliest_arrival(tedges, source, iters=50):
    """Pure-python earliest-arrival fixpoint oracle."""
    arr = {source: 0}
    for _ in range(iters):
        nxt = dict(arr)
        for s, d, t in tedges:
            if s in arr and t >= arr[s]:
                if d not in nxt or t < nxt[d]:
                    nxt[d] = t
        if nxt == arr:
            break
        arr = nxt
    return arr


def test_temporal_reach_hand_case(spark):
    from combblas_spark.algorithms.temporal import temporal_reach

    # 1->2 too early once arrival(1)=5; the later copy at t=9 works;
    # 3->4 at t=1 predates arrival(3)=2 so 4 stays unreachable
    te = [(0, 1, 5), (1, 2, 3), (1, 2, 9), (0, 3, 2), (3, 4, 1)]
    df = spark.createDataFrame(te, "src long, dst long, ts_us long")
    got = {r["id"]: r["arrival_us"]
           for r in temporal_reach(spark, df, source=0, num_iters=6).collect()}
    assert got == {0: 0, 1: 5, 2: 9, 3: 2}


def test_temporal_reach_matches_python_replay(spark):
    from combblas_spark.algorithms.temporal import temporal_reach

    # deterministic pseudo-random temporal graph
    te = []
    for i in range(300):
        s = (i * i) % 40
        d = (i * 7 + 3) % 40
        if s != d:
            te.append((s, d, (i * 37) % 100))
    df = spark.createDataFrame(te, "src long, dst long, ts_us long")
    got = {r["id"]: r["arrival_us"]
           for r in temporal_reach(spark, df, source=0).collect()}
    assert got == _py_earliest_arrival(te, 0)


def test_temporal_reach_fixpoint_not_bfs(spark):
    """Earliest arrival differs from plain reachability: a time-decreasing
    chain is NOT traversable even though the static graph is connected."""
    from combblas_spark.algorithms.temporal import temporal_reach

    df = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 5)], "src long, dst long, ts_us long"
    )
    got = {r["id"]: r["arrival_us"]
           for r in temporal_reach(spark, df, source=0).collect()}
    assert got == {0: 0, 1: 10}  # 2 unreachable: 5 < 10


def _py_four_cliques(pairs):
    adj = {}
    vs = set()
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        vs.update((a, b))
    out = {}
    from itertools import combinations

    for quad in combinations(sorted(vs), 4):
        if all(y in adj[x] for x, y in combinations(quad, 2)):
            for v in quad:
                out[v] = out.get(v, 0) + 1
    return out


def test_four_cliques_k5_and_noise(spark):
    from combblas_spark.algorithms.cliques import four_cliques

    pairs = [(i, j) for i in range(5) for j in range(5) if i < j]
    pairs += [(5, 0), (10, 11), (11, 12), (10, 12)]  # pendant + triangle
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["id"]: r["n_quads"] for r in four_cliques(df).collect()}
    assert got == {v: 4 for v in range(5)}  # C(4,3) per K5 vertex


def test_four_cliques_matches_python_replay(spark):
    from combblas_spark.algorithms.cliques import four_cliques

    pairs = [((i * i) % 25, (i * 11 + 2) % 25) for i in range(160)]
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {r["id"]: r["n_quads"] for r in four_cliques(df).collect()}
    assert got == _py_four_cliques(pairs)


def test_four_cliques_direction_and_dup_invariant(spark):
    from combblas_spark.algorithms.cliques import four_cliques

    pairs = [(i, j) for i in range(6) for j in range(6) if i < j]  # K6
    both = pairs + [(b, a) for a, b in pairs] + pairs  # dups + reversals
    df = spark.createDataFrame(both, "src long, dst long")
    got = {r["id"]: r["n_quads"] for r in four_cliques(df).collect()}
    # K6: C(5,3) = 10 quads per vertex
    assert got == {v: 10 for v in range(6)}


# --------------------------------------------------------- props / quotient


def test_props_stats_hand_case(spark):
    from combblas_spark.functions.sessions import props_stats

    rows = [
        ("click", '{"k": 3}'),
        ("click", '{"k": 5}'),
        ("click", '{"other": 1}'),      # missing field -> NULL, still counted
        ("view", '{"k": 3}'),
        ("view", "not json at all"),    # malformed -> NULL
    ]
    df = spark.createDataFrame(rows, "event_type string, props string")
    got = {r["event_type"]: r.asDict() for r in props_stats(df).collect()}
    assert got["click"]["n"] == 3 and got["click"]["n_with_field"] == 2
    assert got["click"]["sum_f"] == 8 and got["click"]["nd_f"] == 2
    assert got["view"]["n"] == 2 and got["view"]["n_with_field"] == 1
    assert got["view"]["min_f"] == 3 and got["view"]["max_f"] == 3


def test_quotient_hand_case(spark):
    from combblas_spark.operators.transform import quotient

    # two groups: {0,1} -> "a", {2} -> "b"; vertex 9 unmapped (dropped)
    e = spark.createDataFrame(
        [(0, 1, 2.0), (1, 0, 2.0), (0, 2, 1.0), (2, 1, 3.0), (9, 0, 5.0)],
        "src long, dst long, w double",
    )
    m = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "b")], "id long, g string"
    )
    got = {(r["gsrc"], r["gdst"]): (r["w"], r["n_edges"])
           for r in quotient(e, m).collect()}
    assert got == {
        ("a", "a"): (4.0, 2),   # 0->1 and 1->0 collapse onto the diagonal
        ("a", "b"): (1.0, 1),
        ("b", "a"): (3.0, 1),
    }


def test_quotient_is_galerkin_indicator_product(spark):
    """quotient(A, g) == R A R^T with the group indicator R, computed via
    the repo's own spgemm — the metamorphic cross-check."""
    from combblas_spark.operators.transform import quotient
    from combblas_spark.operators.multiply import spgemm
    from combblas_spark.core.semiring import PLUS_TIMES
    import pyspark.sql.functions as F

    edges = [(i % 7, (i * 3 + 1) % 7, float(1 + i % 4)) for i in range(25)]
    edges = [(a, b, w) for a, b, w in edges if a != b]
    e = spark.createDataFrame(edges, "src long, dst long, w double")
    m = spark.createDataFrame(
        [(v, f"g{v % 3}") for v in range(7)], "id long, g string"
    )
    q = {(r["gsrc"], r["gdst"]): r["w"] for r in quotient(e, m).collect()}

    # R: group x vertex indicator with integer group ids g0/g1/g2 -> 0/1/2
    r_df = spark.createDataFrame(
        [(v % 3, v, 1.0) for v in range(7)], "src long, dst long, w double"
    )
    ra = spgemm(r_df, e, PLUS_TIMES)          # R * A
    rt = r_df.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
    )
    rar = spgemm(ra, rt, PLUS_TIMES)          # (R A) * R^T
    want = {(f"g{r['src']}", f"g{r['dst']}"): r["w"] for r in rar.collect()}
    assert q == want


# ------------------------------------------------------------------ CMS


def test_cms_estimate_dominates_exact(spark):
    """The Count-Min guarantee: est >= exact for EVERY token, and for a
    vocabulary smaller than the width with no collisions, est == exact."""
    from combblas_spark.functions.sketch import cms_token_counts

    docs = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b d d d d")], "doc_id long, text string"
    )
    rows = cms_token_counts(docs, depth=3, width=64, k=10).collect()
    got = {r["tok"]: (r["est"], r["exact"]) for r in rows}
    assert all(est >= exact for est, exact in got.values())
    assert got["a"][1] == 4 and got["d"][1] == 4 and got["b"][1] == 3


def test_cms_matches_python_replay(spark):
    """Exact sketch replay: counters and min-probe reproduced in python
    with the same md5-60bit hash — collisions included (width=4 forces
    them)."""
    import hashlib
    from collections import Counter
    from combblas_spark.functions.sketch import cms_token_counts

    texts = [(i, " ".join(f"w{(i * j) % 7}" for j in range(1, 9)))
             for i in range(12)]
    docs = spark.createDataFrame(texts, "doc_id long, text string")
    depth, width = 3, 4

    def h(r, tok):
        return int(hashlib.md5(f"{r}|{tok}".encode()).hexdigest()[:15], 16) % width

    stream = [t for _, s in texts for t in s.split(" ") if t]
    exact = Counter(stream)
    counters = Counter()
    for tok, n in exact.items():
        for r in range(depth):
            counters[(r, h(r, tok))] += n
    want = {
        tok: (min(counters[(r, h(r, tok))] for r in range(depth)), n)
        for tok, n in exact.items()
    }
    rows = cms_token_counts(docs, depth=depth, width=width, k=100).collect()
    got = {r["tok"]: (r["est"], r["exact"]) for r in rows}
    assert got == want
    # with width=4 and 7 tokens, at least one collision must inflate est
    assert any(est > exact for est, exact in got.values())


# --------------------------------------------------- interval join / as-of


def test_temporal_wedges_hand_case(spark):
    from combblas_spark.algorithms.temporal import temporal_wedges

    # wedges through v=1: (0->1@10, 1->2@15) ok; (0->1@10, 1->2@10) ok
    # (equal); (0->1@10, 1->3@21) outside delta=10; (5->1@30, 1->2@15)
    # violates time order
    te = [(0, 1, 10), (1, 2, 15), (1, 2, 10), (1, 3, 21), (5, 1, 30)]
    df = spark.createDataFrame(te, "src long, dst long, ts_us long")
    got = {r["id"]: r["n_wedges"]
           for r in temporal_wedges(df, delta_us=10).collect()}
    assert got == {1: 2}


def test_temporal_wedges_matches_python_replay(spark):
    from combblas_spark.algorithms.temporal import temporal_wedges

    te = []
    for i in range(400):
        s, d = (i * 13) % 23, (i * 7 + 5) % 23
        if s != d:
            te.append((s, d, (i * 997) % 5000))
    delta = 700
    want = {}
    for (_, v, t1) in te:
        for (s2, _, t2) in te:
            if s2 == v and t1 <= t2 <= t1 + delta:
                want[v] = want.get(v, 0) + 1
    df = spark.createDataFrame(te, "src long, dst long, ts_us long")
    # bucket_us > delta exercises the two-probe correctness independently
    for bk in (delta, 1000):
        got = {r["id"]: r["n_wedges"]
               for r in temporal_wedges(df, delta_us=delta, bucket_us=bk).collect()}
        assert got == want


def test_temporal_wedges_rejects_small_bucket(spark):
    from combblas_spark.algorithms.temporal import temporal_wedges
    import pytest

    df = spark.createDataFrame([(0, 1, 5)], "src long, dst long, ts_us long")
    with pytest.raises(ValueError):
        temporal_wedges(df, delta_us=100, bucket_us=50)


def test_asof_latest_hand_case(spark):
    from combblas_spark.operators.interval import asof_latest

    # user 7: clicks at 5 (id 1, v 10) and 20 (id 2, v 30); purchases at
    # 4 (before any click), 5 (simultaneous -> matched), 25 (latest=20)
    left = spark.createDataFrame(
        [(7, 4, 100), (7, 5, 101), (7, 25, 102), (8, 9, 103)],
        "user_id long, us long, event_id long",
    )
    right = spark.createDataFrame(
        [(7, 5, 1, 10), (7, 20, 2, 30)],
        "user_id long, us long, event_id long, vm long",
    )
    rows = asof_latest(left, right, key="user_id", ts="us",
                       tiebreak="event_id", carry=["us", "vm"]).collect()
    got = {r["event_id"]: (r["asof_us"], r["asof_vm"]) for r in rows}
    assert got == {
        100: (None, None),
        101: (5, 10),      # simultaneous click IS matched
        102: (20, 30),
        103: (None, None),  # user 8 has no clicks
    }


def test_asof_latest_simultaneous_tiebreak(spark):
    from combblas_spark.operators.interval import asof_latest

    # two clicks at the same instant: the larger event_id wins
    left = spark.createDataFrame(
        [(1, 10, 50)], "user_id long, us long, event_id long"
    )
    right = spark.createDataFrame(
        [(1, 10, 3, 111), (1, 10, 4, 222)],
        "user_id long, us long, event_id long, vm long",
    )
    r = asof_latest(left, right, key="user_id", ts="us",
                    tiebreak="event_id", carry=["vm"]).collect()[0]
    assert r["asof_vm"] == 222


def test_interval_join_hand_case(spark):
    from combblas_spark.operators.interval import interval_join

    # bucket=10. interval A [5, 24] spans cells 0,1,2; B [20, 20] is a
    # point interval; C belongs to another key. Points probe one cell
    # each; ends are inclusive on both sides.
    pts = spark.createDataFrame(
        [(1, 5, 100), (1, 24, 101), (1, 25, 102), (1, 20, 103), (2, 7, 104)],
        "k long, t long, pid long",
    )
    iv = spark.createDataFrame(
        [(1, 5, 24, 10), (1, 20, 20, 11), (2, 0, 3, 12)],
        "k long, s long, e long, iid long",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in interval_join(pts, iv, key="k", ts="t", start="s", end="e",
                               bucket=10).collect()
    )
    assert got == [(100, 10), (101, 10), (103, 10), (103, 11)]


def test_interval_join_brute_force_and_bucket_invariance(spark):
    """interval_join == the O(n^2) range predicate, for EVERY bucket size
    (the grid is an execution detail, never a semantics knob)."""
    from combblas_spark.operators.interval import interval_join

    # deterministic pseudo-random fixture via a toy LCG
    x, pts, ivs = 1, [], []
    for i in range(120):
        x = (x * 1103515245 + 12345) % (1 << 31)
        pts.append((x % 4, (x >> 8) % 200, i))
    for i in range(40):
        x = (x * 1103515245 + 12345) % (1 << 31)
        s = (x >> 8) % 200
        ivs.append((x % 4, s, s + (x >> 20) % 45, 1000 + i))
    want = sorted(
        (pid, iid)
        for (pk, t, pid) in pts
        for (ik, s, e, iid) in ivs
        if pk == ik and s <= t <= e
    )
    assert want  # fixture must actually exercise matches
    p = spark.createDataFrame(pts, "k long, t long, pid long")
    v = spark.createDataFrame(ivs, "k long, s long, e long, iid long")
    for bucket in (7, 45, 1000):
        got = sorted(
            (r["pid"], r["iid"])
            for r in interval_join(p, v, key="k", ts="t", start="s", end="e",
                                   bucket=bucket).collect()
        )
        assert got == want, f"bucket={bucket}"


def test_interval_join_rejects_bad_intervals(spark):
    from combblas_spark.operators.interval import interval_join

    p = spark.createDataFrame([(1, 5, 0)], "k long, t long, pid long")
    # end < start raises at execution (never a silent empty result)
    v_rev = spark.createDataFrame([(1, 9, 3, 0)], "k long, s long, e long, iid long")
    with pytest.raises(Exception, match="interval_join"):
        interval_join(p, v_rev, key="k", ts="t", start="s", end="e",
                      bucket=10).collect()
    # an interval spanning >= max_buckets cells raises (no silent truncation)
    v_long = spark.createDataFrame([(1, 0, 1000, 0)], "k long, s long, e long, iid long")
    with pytest.raises(Exception, match="interval_join"):
        interval_join(p, v_long, key="k", ts="t", start="s", end="e",
                      bucket=10, max_buckets=4).collect()
    # non-key column collision is a driver-side ValueError
    v_clash = spark.createDataFrame([(1, 0, 9, 7)], "k long, s long, e long, pid long")
    with pytest.raises(ValueError, match="collision"):
        interval_join(p, v_clash, key="k", ts="t", start="s", end="e", bucket=10)


def test_interval_join_plan_no_cartesian(spark):
    from combblas_spark.operators.interval import interval_join

    p = spark.createDataFrame([(1, 5, 0)], "k long, t long, pid long")
    v = spark.createDataFrame([(1, 0, 9, 0)], "k long, s long, e long, iid long")
    plan = (
        interval_join(p, v, key="k", ts="t", start="s", end="e", bucket=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_temporal_wedges_plan_no_cartesian(spark):
    """The interval join must plan as an equi-join on (v, bucket) — no
    CartesianProduct / BroadcastNestedLoopJoin anywhere."""
    from combblas_spark.algorithms.temporal import temporal_wedges

    df = spark.createDataFrame(
        [(i % 5, (i + 1) % 5, i * 100) for i in range(20)],
        "src long, dst long, ts_us long",
    )
    plan = temporal_wedges(df, delta_us=500)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# SimRank (algorithms/simrank.py)
# --------------------------------------------------------------------------


def _py_simrank(dir_pairs, c, num_iters):
    """Pure-python mirror of algorithms.simrank's 1e9 fixed-point
    iteration: exact-integer sums, the SAME double op order
    floor(c*sv/(ind_a*ind_b)). Returns {(a,b): val_e9} incl. diagonal."""
    import math

    de = sorted(set((a, b) for a, b in dir_pairs if a != b))
    verts = sorted({v for e in de for v in e})
    ind = {}
    for _, b in de:
        ind[b] = ind.get(b, 0) + 1
    s = {(v, v): 1_000_000_000 for v in verts}
    for _ in range(num_iters):
        raw = {}
        for (u, na) in de:
            for (v, nb) in de:
                if na == nb:
                    continue
                sv = s.get((u, v), 0)
                if sv:
                    raw[(na, nb)] = raw.get((na, nb), 0) + sv
        nxt = {(v, v): 1_000_000_000 for v in verts}
        for (na, nb), sv in raw.items():
            nxt[(na, nb)] = math.floor(
                c * sv / (float(ind[na]) * float(ind[nb]))
            )
        s = nxt
    return s


def test_simrank_shared_parent_hand_case(spark):
    """0->1, 0->2: I(1)=I(2)={0}, so S(1,2)=C after one iteration and it
    stays C (S(0,0)=1 is the only contributing pair)."""
    from combblas_spark.algorithms.simrank import simrank

    e = _edges_df(spark, [(0, 1), (0, 2)])
    for iters in (1, 2):
        got = {
            (r["a"], r["b"]): r["val_e9"]
            for r in simrank(spark, e, c=0.8, num_iters=iters).collect()
        }
        assert got[(0, 0)] == got[(1, 1)] == got[(2, 2)] == 1_000_000_000
        assert got[(1, 2)] == got[(2, 1)] == 800_000_000
        # 0 has no in-neighbors: no off-diagonal rows involving 0
        assert (0, 1) not in got and (1, 0) not in got


def test_simrank_matches_python_oracle(spark):
    from combblas_spark.algorithms.simrank import simrank

    # deterministic pseudo-random digraph with shared in-neighbors,
    # a dangling-in vertex and a duplicate edge (must be deduped)
    pairs = [
        (0, 3), (1, 3), (0, 4), (1, 4), (2, 4), (3, 5), (4, 5),
        (3, 6), (4, 6), (5, 0), (6, 1), (2, 3), (0, 3),  # dup (0,3)
        (5, 5),  # self-loop (must be dropped)
    ]
    e = _edges_df(spark, pairs)
    want = _py_simrank(pairs, 0.8, 3)
    got = {
        (r["a"], r["b"]): r["val_e9"]
        for r in simrank(spark, e, c=0.8, num_iters=3).collect()
    }
    assert got == want


def test_simrank_validates_args(spark):
    import pytest
    from combblas_spark.algorithms.simrank import simrank

    e = _edges_df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        simrank(spark, e, num_iters=0)
    with pytest.raises(ValueError):
        simrank(spark, e, c=1.0)


# --------------------------------------------------------------------------
# TrustRank / spam mass (algorithms/pagerank.spam_mass)
# --------------------------------------------------------------------------


def test_spam_mass_farm_vs_trusted(spark):
    """Trusted core {0,1} in a cycle; a spam farm 10..14 -> 9 pumps rank
    into 9 with NO path from the trusted set: tr(9)=0 -> spam_mass 1.0.
    Seeds keep most of their own trust -> spam_mass well below the farm's.
    Vertex 9 is also dangling, exercising the redistribution path."""
    from combblas_spark.algorithms.pagerank import spam_mass

    pairs = [(0, 1), (1, 0)] + [(f, 9) for f in range(10, 15)]
    # farm pages link each other in a ring so they aren't all dangling
    pairs += [(f, 10 + (f - 9) % 5) for f in range(10, 15)]
    e = _edges_df(spark, pairs)
    rows = spam_mass(spark, e, trusted=[0, 1], num_iters=8).collect()
    by_id = {r["id"]: r for r in rows}
    assert by_id[9]["tr"] == 0.0 and by_id[9]["spam_mass"] == 1.0
    assert by_id[9]["pr"] > by_id[0]["pr"] * 0  # pr positive
    for s in (0, 1):
        assert by_id[s]["spam_mass"] < 0.0  # trust concentrates on seeds
    # probability masses: global PR sums to 1
    assert abs(sum(r["pr"] for r in rows) - 1.0) < 1e-6


def test_spam_mass_matches_python_oracle(spark):
    """Replicate both chains in pure python with the exact scalar op
    order (reset computed driver-side in pagerank, so floats match to
    the shuffle-sum reorder, well inside round-6)."""
    from combblas_spark.algorithms.pagerank import spam_mass

    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (1, 5)]
    # 5 is dangling
    alpha, iters, seeds = 0.85, 6, [0, 2]
    verts = sorted({v for e in pairs for v in e})
    n = len(verts)
    out = {}
    for a, _ in pairs:
        out[a] = out.get(a, 0.0) + 1.0
    enorm = [(a, b, 1.0 / out[a]) for a, b in pairs]
    dang = [v for v in verts if v not in out]

    def chain(p0):
        x = dict(p0)
        for _ in range(iters):
            dm = sum(x[d] for d in dang)
            contrib = {}
            for a, b, w in enorm:
                contrib[b] = contrib.get(b, 0.0) + w * x[a]
            nx = {}
            for v in verts:
                if p0_is_global:
                    reset = (1.0 - alpha) / n + alpha * dm / n
                else:
                    reset = (
                        (1.0 - alpha + alpha * dm) * (1.0 / len(seeds))
                        if v in seeds else 0.0
                    )
                nx[v] = reset + alpha * contrib.get(v, 0.0)
            x = nx
        return x

    p0_is_global = True
    gp = chain({v: 1.0 / n for v in verts})
    p0_is_global = False
    tp = chain({v: (1.0 / len(seeds) if v in seeds else 0.0) for v in verts})

    rows = spam_mass(
        spark, _edges_df(spark, pairs), trusted=seeds,
        alpha=alpha, num_iters=iters,
    ).collect()
    for r in rows:
        assert r["pr"] == round(gp[r["id"]], 6)
        assert r["tr"] == round(tp[r["id"]], 6)
        assert r["spam_mass"] == round(
            (gp[r["id"]] - tp[r["id"]]) / gp[r["id"]], 6
        )


# --------------------------------------------------------------------------
# BM25 (functions/text.bm25_topk)
# --------------------------------------------------------------------------


def test_bm25_matches_python_oracle(spark):
    import math

    from combblas_spark.functions.text import bm25_topk

    corpus = {
        0: "spark join join join scan",
        1: "spark scan filter",
        2: "window window agg filter scan spark spark spark",
        3: "join",
    }
    docs = spark.createDataFrame(
        [(i, t) for i, t in corpus.items()], "doc_id long, text string"
    )
    toks = {i: t.split() for i, t in corpus.items()}
    n = float(len(toks))
    avgdl = sum(len(v) for v in toks.values()) / n
    df = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    want = {}
    for i, ts in toks.items():
        dl = float(len(ts))
        for t in set(ts):
            tf = ts.count(t)
            idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
            score = idf * tf * 2.2 / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))
            want[(i, t)] = (tf, round(score, 6))
    rows = bm25_topk(docs, k=10).collect()
    for r in rows:
        tf, score = want[(r["doc_id"], r["term"])]
        assert r["tf"] == tf and r["bm25"] == score
    # per-doc ranks are 1..n_terms by (score desc, term asc)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, rs in by_doc.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        keys = [(-r["bm25"], r["term"]) for r in rs]
        assert keys == sorted(keys)


def test_bm25_tf_saturation_and_length_norm(spark):
    """tf saturates: going 1->4 occurrences must gain less than 4x; a term
    in a LONGER doc scores lower at equal tf (length normalization) —
    the two properties that distinguish BM25 from raw tf-idf."""
    from combblas_spark.functions.text import bm25_topk

    docs = spark.createDataFrame(
        [
            (0, "x a b c"),
            (1, "x x x x a b c d e f g h"),  # tf 4 but longer
            (2, "y a b c"),
            (3, "y p q r s t u v w z a b"),  # same tf=1, longer doc
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["term"]): r["bm25"]
        for r in bm25_topk(docs, k=20).collect()
    }
    assert got[(1, "x")] < 4 * got[(0, "x")]   # saturation
    assert got[(3, "y")] < got[(2, "y")]       # length normalization


# --------------------------------------------------------------------------
# negative sampling (algorithms/walks.negative_sample)
# --------------------------------------------------------------------------


def _md5_60(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_negative_sample(dir_pairs, k, proposals, seed=42, salt="neg"):
    import hashlib

    verts = sorted({v for e in dir_pairs for v in e})
    perm = sorted(verts, key=lambda v: (_md5_60(f"{seed}|{v}"), v))
    es = set(dir_pairs)
    out = {}
    for u in verts:
        cands = set()
        for j in range(1, proposals + 1):
            v = perm[_md5_60(f"{salt}|{u}|{j}") % len(verts)]
            if v != u and (u, v) not in es:
                cands.add(v)
        ranked = sorted(
            cands,
            key=lambda v: (hashlib.md5(f"{salt}|pick|{u}|{v}".encode()).hexdigest(), v),
        )[:k]
        for r, v in enumerate(ranked, 1):
            out[(u, v)] = r
    return out


def test_negative_sample_matches_python_replay(spark):
    from combblas_spark.algorithms.walks import negative_sample

    pairs = [(a, (a * 3 + b) % 11) for a in range(11) for b in (1, 2, 4)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges_df(spark, pairs)
    got = {
        (r["src"], r["dst"]): r["rank"]
        for r in negative_sample(spark, e, k=3, proposals=8).collect()
    }
    assert got == _py_negative_sample(pairs, 3, 8)
    # invariants: never a real edge, never a self-pair, <= k per src
    es = set(pairs)
    per_src = {}
    for (u, v) in got:
        assert (u, v) not in es and u != v
        per_src[u] = per_src.get(u, 0) + 1
    assert all(c <= 3 for c in per_src.values())


def test_negative_sample_partition_invariant(spark):
    from combblas_spark.algorithms.walks import negative_sample

    pairs = [(a, (a + d) % 17) for a in range(17) for d in (1, 3)]
    e1 = _edges_df(spark, pairs)
    e2 = e1.repartition(13, "dst")
    r1 = sorted(map(tuple, negative_sample(spark, e1, k=2, proposals=6).collect()))
    r2 = sorted(map(tuple, negative_sample(spark, e2, k=2, proposals=6).collect()))
    assert r1 == r2


# --------------------------------------------------------------------------
# node2vec walks (algorithms/walks.node2vec_walks)
# --------------------------------------------------------------------------


def _py_node2vec(dir_pairs, seeds, length, p, q, salt="n2v"):
    import math

    adj = {}
    es = set()
    for a, b in dir_pairs:
        adj.setdefault(a, set()).add(b)
        es.add((a, b))
    out = {(w, 0): w for w in seeds}
    state = {w: (w, w) for w in seeds}  # walk -> (prev, cur)
    for s in range(1, length + 1):
        nstate = {}
        for w, (prev, cur) in state.items():
            cands = sorted(adj.get(cur, ()))
            if not cands:
                continue
            best = None
            for d in cands:
                h = _md5_60(f"{salt}|{w}|{s}|{d}")
                u = (h + 1.0) / 1152921504606846976.0
                if s == 1:
                    key = -math.log(u)
                else:
                    m = p if d == prev else (1.0 if (prev, d) in es else q)
                    key = -math.log(u) * m
                if best is None or (key, d) < best:
                    best = (key, d)
            nstate[w] = (cur, best[1])
            out[(w, s)] = best[1]
        state = nstate
    return out


def test_node2vec_matches_python_replay(spark):
    from combblas_spark.algorithms.walks import node2vec_walks

    pairs = [(a, (a * 5 + b) % 13) for a in range(13) for b in (1, 2, 3)]
    pairs = [(a, b) for a, b in pairs if a != b]
    e = _edges_df(spark, pairs)
    seeds = spark.createDataFrame([(i,) for i in range(5)], "id long")
    got = {
        (r["walk_id"], r["step"]): r["vertex"]
        for r in node2vec_walks(spark, e, seeds, length=3, p=4.0, q=0.25).collect()
    }
    assert got == _py_node2vec(pairs, range(5), 3, 4.0, 0.25)


def test_node2vec_bias_extremes(spark):
    """With a huge p and tiny q the walk must never return to its
    predecessor when any non-return candidate exists; dead ends terminate
    the walk (no rows past the last step)."""
    from combblas_spark.algorithms.walks import node2vec_walks

    # 0 <-> 1, 1 -> 2 (dead end): from 1 the walk prefers 2 over returning
    e = _edges_df(spark, [(0, 1), (1, 0), (1, 2)])
    seeds = spark.createDataFrame([(0,)], "id long")
    rows = {
        r["step"]: r["vertex"]
        for r in node2vec_walks(
            spark, e, seeds, length=4, p=1e6, q=1e-6
        ).collect()
    }
    assert rows[0] == 0 and rows[1] == 1 and rows[2] == 2
    assert 3 not in rows  # 2 is a dead end -> walk terminated


# --------------------------------------------------------------------------
# BPE merge training (functions/text.bpe_merge_training)
# --------------------------------------------------------------------------


def _py_bpe_merges(texts, num_merges):
    import re

    rx = re.compile(r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+")
    seqs = [rx.findall(t) for t in texts]
    merges = []
    for r in range(1, num_merges + 1):
        counts = {}
        for s in seqs:
            for x, y in zip(s, s[1:]):
                counts[(x, y)] = counts.get((x, y), 0) + 1
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((r, a, b, c))
        ns = []
        for s in seqs:
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + " " + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            ns.append(out)
        seqs = ns
    return merges


def test_bpe_merge_training_matches_python(spark):
    """Engineered corpus: round 1 must pick the SELF-pair (x, x) — the
    greedy-run case ("x x x x x" pairs non-overlapping left-to-right) —
    and later rounds merge merged symbols; the whole table must equal the
    sequential python replay."""
    from combblas_spark.functions.text import bpe_merge_training

    texts = [
        "x x x x x",
        "x x x b",
        "a b a b a b",
        "q a b x x",
        "a b",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = [
        (r["rank"], r["piece_a"], r["piece_b"], r["n_pair"])
        for r in bpe_merge_training(spark, docs, num_merges=4)
        .orderBy("rank")
        .collect()
    ]
    want = _py_bpe_merges(texts, 4)
    assert got == want
    # sanity on the engineered shape: round 1 is the x-run self-pair
    assert got[0][1:] == ("x", " x", 6) or got[0][0] == 1


def test_sampling_kernels_validate_args(spark):
    import pytest
    from combblas_spark.algorithms.walks import negative_sample, node2vec_walks
    from combblas_spark.algorithms.pagerank import spam_mass

    e = _edges_df(spark, [(0, 1)])
    seeds = spark.createDataFrame([(0,)], "id long")
    with pytest.raises(ValueError):
        negative_sample(spark, e, k=0)
    with pytest.raises(ValueError):
        negative_sample(spark, e, k=5, proposals=3)
    with pytest.raises(ValueError):
        node2vec_walks(spark, e, seeds, length=2, p=0.0)
    with pytest.raises(ValueError):
        node2vec_walks(spark, e, seeds, length=2, q=-1.0)
    with pytest.raises(ValueError):
        spam_mass(spark, e, trusted=[])


# --------------------------------------------------- bigram_xent / chunk_docs


def _py_bigram_xent(corpus):
    """Pure-python corpus-bigram cross-entropy oracle."""
    import math

    toks = {d: [t for t in txt.split(" ") if t] for d, txt in corpus}
    bg, left = {}, {}
    for ts in toks.values():
        for a, b in zip(ts, ts[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
            left[a] = left.get(a, 0) + 1
    out = {}
    for d, ts in toks.items():
        n = max(len(ts) - 1, 0)
        nll = sum(-math.log(bg[(a, b)] / left[a]) for a, b in zip(ts, ts[1:]))
        out[d] = (n, round(nll / n, 6) if n > 0 else 0.0)
    return out


def test_bigram_xent_matches_python(spark):
    from combblas_spark.functions.text import bigram_xent

    corpus = [
        (1, "the cat sat on the mat"),
        (2, "the cat ran"),
        (3, "mat the on sat cat the"),  # same tokens as 1, scrambled order
        (4, "solo"),
        (5, ""),
        (6, "q r q r q r"),  # q is ALWAYS followed by r, r always by q
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["xent2"])
        for r in bigram_xent(docs).collect()
    }
    assert got == _py_bigram_xent(corpus)
    # deterministic successors => every conditional is 1 => zero nats
    assert got[6] == (5, 0.0)
    # natural and scrambled orders of the same tokens score differently
    assert got[3][1] != got[1][1]
    # < 2 tokens => zero bigrams, zero score
    assert got[4] == (0, 0.0) and got[5] == (0, 0.0)


def _py_chunks(corpus, w, s):
    out = []
    for d, txt in corpus:
        ts = [t for t in txt.split(" ") if t]
        n = len(ts)
        if n == 0:
            continue
        kmax = (n - w + s - 1) // s if n > w else 0
        for k in range(kmax + 1):
            st = 1 + k * s
            ln = min(w, n - st + 1)
            out.append((d, k, st, ln, " ".join(ts[st - 1 : st - 1 + ln])))
    return sorted(out)


def test_chunk_docs_matches_python(spark):
    from combblas_spark.functions.sampling import chunk_docs

    corpus = [
        (1, " ".join(f"t{i}" for i in range(100))),  # multi-chunk
        (2, "a b c"),  # single short chunk
        (3, " ".join(f"u{i}" for i in range(8))),  # exactly window
        (4, ""),  # no chunks
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = sorted(
        tuple(r) for r in chunk_docs(docs, window=8, stride=5).collect()
    )
    want = _py_chunks(corpus, 8, 5)
    assert got == want
    # coverage invariant: with stride <= window every token index is inside
    # at least one chunk, and the last chunk reaches token n
    by_doc = {}
    for d, k, st, ln, _ in got:
        by_doc.setdefault(d, []).append((st, st + ln - 1))
    for d, txt in corpus:
        n = len([t for t in txt.split(" ") if t])
        if n == 0:
            assert d not in by_doc
            continue
        iv = sorted(by_doc[d])
        assert iv[0][0] == 1 and iv[-1][1] == n
        for (a1, b1), (a2, b2) in zip(iv, iv[1:]):
            assert a2 <= b1 + 1  # no gap


def test_chunk_docs_validates_args(spark):
    import pytest
    from combblas_spark.functions.sampling import chunk_docs

    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_docs(docs, window=4, stride=5)  # stride > window
    with pytest.raises(ValueError):
        chunk_docs(docs, window=4, stride=0)


# ---------------------------------------------------- pmi_pairs / knn_purity


def test_pmi_pairs_matches_python(spark):
    import math
    from combblas_spark.functions.text import pmi_pairs

    corpus = [
        (1, "new york is big and new york is old"),
        (2, "new york and san francisco"),
        (3, "san francisco is new and big and new york grows"),
        (4, "is and is and is and"),
    ]
    docs = spark.createDataFrame(corpus, "doc_id long, text string")
    got = [tuple(r) for r in pmi_pairs(docs, k=5, min_count=2).collect()]

    bg, lf, rt, tot = {}, {}, {}, 0
    for _, txt in corpus:
        ts = [t for t in txt.split(" ") if t]
        for a, b in zip(ts, ts[1:]):
            bg[(a, b)] = bg.get((a, b), 0) + 1
    for (a, b), c in bg.items():
        lf[a] = lf.get(a, 0) + c
        rt[b] = rt.get(b, 0) + c
        tot += c
    scored = [
        (a, b, c, round(math.log(c * tot / (lf[a] * rt[b])), 6))
        for (a, b), c in bg.items()
        if c >= 2
    ]
    want = sorted(scored, key=lambda x: (-x[3], x[0], x[1]))[:5]
    assert got == want
    # the collocation signal: the bound pair ("new","york") must out-rank
    # the frequent-but-promiscuous pair ("is","and")
    rank = {(a, b): i for i, (a, b, _, _) in enumerate(got)}
    assert rank[("new", "york")] < rank.get(("is", "and"), 99)


def test_knn_purity_matches_python(spark):
    """Clustered embeddings: two well-separated label groups must both
    score purity 1.0; the python oracle replays the purity aggregation
    from the engine's own ANN pairs (the ANN itself is oracle-checked by
    ann_topk's contract query)."""
    from combblas_spark.functions.similarity import knn_label_purity, lsh_ann_topk

    dim = 8
    rows = []
    for i in range(12):
        v = [0.0] * dim
        v[i % 4] = 1.0 + 0.01 * i  # labels 0: axis 0-3 cluster
        rows.append((i, v, 0))
    for i in range(12, 24):
        v = [0.0] * dim
        v[4 + (i % 4)] = -1.0 - 0.01 * i  # labels 1: opposite orthant
        rows.append((i, v, 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    kw = dict(k=3, n_planes=6, seed=7, dim=dim, max_bucket=100)
    got = {
        r["label"]: (r["n_queries"], r["n_pairs"], r["n_same"], r["purity"])
        for r in knn_label_purity(emb, **kw).collect()
    }
    ann = lsh_ann_topk(emb, **kw).collect()
    lab = {i: (0 if i < 12 else 1) for i in range(24)}
    agg = {}
    for r in ann:
        L = lab[r["query_id"]]
        q, p, s = agg.get(L, (set(), 0, 0))
        q.add(r["query_id"])
        agg[L] = (q, p + 1, s + (1 if lab[r["neighbor_id"]] == L else 0))
    want = {
        L: (len(q), p, s, round(s / p, 6)) for L, (q, p, s) in agg.items()
    }
    assert got == want
    # orthant-separated clusters never cross under sign-pattern LSH
    assert got[0][3] == 1.0 and got[1][3] == 1.0


# ------------------------------------------ ann_recall / gini / bipartite


def test_ann_recall_replays_engine_sides(spark):
    """recall@k recomputed in python from the engine's own exact and ANN
    top-k outputs (each independently oracle-checked by its contract
    query); also: ANN hits are by construction a subset of the panel."""
    from combblas_spark.functions.similarity import (
        ann_recall,
        cosine_topk,
        lsh_ann_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(k=5, n_planes=8, seed=42, dim=64, max_bucket=10_000)
    got = {
        r["query_id"]: (r["n_exact"], r["n_hit"], r["recall"])
        for r in ann_recall(emb, query_max=20, **kw).collect()
    }
    q = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    exact = {}
    for r in cosine_topk(emb, q, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx = {}
    for r in lsh_ann_topk(emb, **kw).filter(F.col("query_id") < 20).collect():
        approx.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    want = {
        qid: (
            len(ex),
            len(ex & approx.get(qid, set())),
            round(len(ex & approx.get(qid, set())) / len(ex), 6),
        )
        for qid, ex in exact.items()
    }
    assert got == want
    assert all(0.0 <= v[2] <= 1.0 for v in got.values())


def test_degree_gini_known_values(spark):
    from combblas_spark.algorithms.stats import degree_gini

    # star K_{1,4}: degrees sorted [1,1,1,1,4], n=5, sum=8
    # gini = (2*(1+2+3+4+20) - 6*8) / (5*8) = (60-48)/40 = 0.3
    star = spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    )
    r = degree_gini(star).collect()[0]
    assert (r["n_vertices"], r["sum_deg"], r["gini"]) == (5, 8, 0.3)
    # regular graph (4-cycle): perfect equality => gini 0
    cyc = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    assert degree_gini(cyc).collect()[0]["gini"] == 0.0


def test_bipartite_check_known_graphs(spark):
    from combblas_spark.algorithms.bipartite import bipartite_check

    # even cycle (bipartite) + triangle (odd) + single edge, one run
    edges = [(0, 1), (1, 2), (2, 3), (3, 0),
             (10, 11), (11, 12), (12, 10), (20, 21)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["comp"]: tuple(r)[1:] for r in bipartite_check(spark, df).collect()}
    assert got[0] == (4, 4, 0, 1)    # C4: bipartite
    assert got[10] == (3, 3, 1, 0)   # triangle: one conflict edge
    assert got[20] == (2, 1, 0, 1)   # K2: bipartite
    # direction / duplicate invariance: reversed + doubled edges, same census
    rev = spark.createDataFrame(
        [(b, a) for a, b in edges] + edges, "src long, dst long"
    )
    got2 = {r["comp"]: tuple(r)[1:] for r in bipartite_check(spark, rev).collect()}
    assert got2 == got


def test_bipartite_check_odd_even_cycle_parity(spark):
    """Every odd cycle has EXACTLY one conflict edge under BFS 2-coloring
    from a single root; even cycles have zero — check a sweep of sizes."""
    from combblas_spark.algorithms.bipartite import bipartite_check

    edges = []
    base = 0
    sizes = [3, 4, 5, 6, 9]
    for n in sizes:
        edges += [(base + i, base + (i + 1) % n) for i in range(n)]
        base += 100
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["comp"]: (r["n_conflicts"], r["is_bipartite"])
           for r in bipartite_check(spark, df).collect()}
    for j, n in enumerate(sizes):
        assert got[100 * j] == ((1, 0) if n % 2 else (0, 1))


# ------------------------------------------------------------------- funnel


def _py_funnel(rows, steps, window_seconds=None):
    """Pure-python earliest-completion funnel oracle over _ev-shaped rows
    (event_id, ts, user_id, event_type, value)."""
    per_user = {}
    for eid, ts, uid, etype, _v in rows:
        per_user.setdefault(uid, []).append(
            (int(ts.timestamp() * 1_000_000), etype)
        )
    counts = [0] * len(steps)
    for uid, evs in per_user.items():
        t_prev = None
        for i, s in enumerate(steps):
            cand = [
                us
                for us, et in evs
                if et == s
                and (t_prev is None or us > t_prev)
                and (
                    window_seconds is None
                    or t_prev is None
                    or us <= t_prev + window_seconds * 1_000_000
                )
            ]
            if not cand:
                break
            t_prev = min(cand)
            counts[i] += 1
    return {(i + 1, s): counts[i] for i, s in enumerate(steps)}


def test_funnel_known_fixture(spark):
    from combblas_spark.functions.sessions import funnel

    rows = [
        # user 1 completes view(0) -> click(5) -> buy(10)
        _ev(1, 1, 0, "view"), _ev(2, 1, 5, "click"), _ev(3, 1, 10, "buy"),
        # user 2: click BEFORE view — never reaches step 2
        _ev(4, 2, 0, "click"), _ev(5, 2, 5, "view"),
        # user 3: view only
        _ev(6, 3, 0, "view"),
        # user 4: view -> click, no buy
        _ev(7, 4, 0, "view"), _ev(8, 4, 3, "click"),
    ]
    got = {
        (r["step_idx"], r["step"]): r["n_users"]
        for r in funnel(_events_df(spark, rows), ["view", "click", "buy"]).collect()
    }
    assert got == {(1, "view"): 4, (2, "click"): 2, (3, "buy"): 1}
    assert got == _py_funnel(rows, ["view", "click", "buy"])


def test_funnel_strictly_after_and_window(spark):
    from combblas_spark.functions.sessions import funnel

    rows = [
        # user 1: click at the SAME microsecond as view — strict > excludes it
        _ev(1, 1, 0, "view"), _ev(2, 1, 0, "click"),
        # user 2: click 90 min after view — inside a 2h window, outside 1h
        _ev(3, 2, 0, "view"), _ev(4, 2, 90, "click"),
    ]
    df = _events_df(spark, rows)
    unbounded = {
        (r["step_idx"], r["step"]): r["n_users"]
        for r in funnel(df, ["view", "click"]).collect()
    }
    assert unbounded == {(1, "view"): 2, (2, "click"): 1}
    w1h = {
        (r["step_idx"], r["step"]): r["n_users"]
        for r in funnel(df, ["view", "click"], window_seconds=3600).collect()
    }
    assert w1h == {(1, "view"): 2, (2, "click"): 0}
    # boundary: exactly window_seconds after counts (<=)
    w90 = {
        (r["step_idx"], r["step"]): r["n_users"]
        for r in funnel(df, ["view", "click"], window_seconds=5400).collect()
    }
    assert w90[(2, "click")] == 1


def test_funnel_earliest_completion_semantics(spark):
    """The completion time of step i is the MIN qualifying time — a user
    whose EARLIEST view is followed by an out-of-window click does not
    convert even if a later view would have started an in-window pair
    (standard greedy product-analytics semantics)."""
    from combblas_spark.functions.sessions import funnel

    rows = [
        _ev(1, 1, 0, "view"),      # earliest view at t=0
        _ev(2, 1, 500, "view"),    # later view at t=500min
        _ev(3, 1, 505, "click"),   # click 5min after the LATER view
    ]
    got = {
        r["step_idx"]: r["n_users"]
        for r in funnel(
            _events_df(spark, rows), ["view", "click"], window_seconds=3600
        ).collect()
    }
    assert got == {1: 1, 2: 0}
    assert got[2] == _py_funnel(rows, ["view", "click"], 3600)[(2, "click")]


def test_funnel_random_vs_python_oracle(spark):
    from combblas_spark.functions.sessions import funnel

    rows = [
        _ev(
            i,
            i % 13,
            (i * 37) % 900,
            ["view", "click", "buy", "other"][(i * 7) % 4],
            1.0,
        )
        for i in range(300)
    ]
    df = _events_df(spark, rows).repartition(8)
    for w in (None, 3600, 7200):
        got = {
            (r["step_idx"], r["step"]): r["n_users"]
            for r in funnel(df, ["view", "click", "buy"], window_seconds=w).collect()
        }
        assert got == _py_funnel(rows, ["view", "click", "buy"], w)


def test_funnel_empty_steps_raises(spark):
    import pytest as _pytest

    from combblas_spark.functions.sessions import funnel

    with _pytest.raises(ValueError):
        funnel(_events_df(spark, [_ev(1, 1, 0)]), [])


# ---------------------------------------------------------------- retention


def _py_retention(rows, bucket_seconds=86400):
    per_user = {}
    for eid, ts, uid, etype, _v in rows:
        b = int(ts.timestamp() * 1_000_000) // (bucket_seconds * 1_000_000)
        per_user.setdefault(uid, []).append(b)
    out = {}
    for uid, buckets in per_user.items():
        c0 = min(buckets)
        for b in set(buckets):
            key = (c0, b - c0)
            out[key] = out.get(key, 0) + 1
    return out


def test_retention_known_fixture(spark):
    from combblas_spark.functions.sessions import retention

    day = 24 * 60
    rows = [
        # user 1 first seen day 0, active days 0, 1, 3
        _ev(1, 1, 0), _ev(2, 1, day + 5), _ev(3, 1, 3 * day + 5),
        # user 2 first seen day 0, active day 0 only (twice — distinct!)
        _ev(4, 2, 10), _ev(5, 2, 20),
        # user 3 first seen day 1, active days 1 and 3
        _ev(6, 3, day + 1), _ev(7, 3, 3 * day + 1),
    ]
    got = {
        (r["cohort_bucket"], r["bucket_offset"]): r["n_active"]
        for r in retention(_events_df(spark, rows)).collect()
    }
    d0 = int(datetime.datetime(2024, 1, 1).timestamp()) // 86400
    assert got == {
        (d0, 0): 2, (d0, 1): 1, (d0, 3): 1,
        (d0 + 1, 0): 1, (d0 + 1, 2): 1,
    }
    assert got == _py_retention(rows)


def test_retention_random_vs_python_oracle(spark):
    from combblas_spark.functions.sessions import retention

    rows = [
        _ev(i, i % 11, (i * 173) % (14 * 24 * 60), "t", 1.0) for i in range(400)
    ]
    for bs in (86400, 3600 * 6):
        got = {
            (r["cohort_bucket"], r["bucket_offset"]): r["n_active"]
            for r in retention(
                _events_df(spark, rows).repartition(8), bucket_seconds=bs
            ).collect()
        }
        assert got == _py_retention(rows, bs)
    with __import__("pytest").raises(ValueError):
        retention(_events_df(spark, rows), bucket_seconds=0)


# -------------------------------------------------------- event transitions


def _py_transitions(rows):
    per_user = {}
    for eid, ts, uid, etype, _v in rows:
        per_user.setdefault(uid, []).append((ts, eid, etype))
    counts = {}
    for uid, evs in per_user.items():
        evs.sort()
        for (_, _, a), (_, _, b) in zip(evs, evs[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    totals = {}
    for (a, _b), n in counts.items():
        totals[a] = totals.get(a, 0) + n
    return {k: (n, round(n / totals[k[0]], 6)) for k, n in counts.items()}


def test_event_transitions_known_fixture(spark):
    from combblas_spark.functions.sessions import event_transitions

    rows = [
        # user 1: a -> b -> a ; user 2: a -> b ; user 3: single event (no pair)
        _ev(1, 1, 0, "a"), _ev(2, 1, 1, "b"), _ev(3, 1, 2, "a"),
        _ev(4, 2, 0, "a"), _ev(5, 2, 1, "b"),
        _ev(6, 3, 0, "c"),
    ]
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["p"])
        for r in event_transitions(_events_df(spark, rows)).collect()
    }
    assert got == {("a", "b"): (2, 1.0), ("b", "a"): (1, 1.0)}
    assert got == _py_transitions(rows)


def test_event_transitions_tiebreak_and_oracle(spark):
    from combblas_spark.functions.sessions import event_transitions

    # two events at the SAME timestamp: event_id breaks the tie (1 then 2)
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, t0, 9, "x", 1.0), (2, t0, 9, "y", 1.0)]
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in event_transitions(_events_df(spark, rows)).collect()
    }
    assert got == {("x", "y"): 1}
    # random stream vs the pure-python oracle, partition-invariant
    rows = [
        _ev(i, i % 9, (i * 41) % 777, "t%d" % ((i * 5) % 4), 1.0)
        for i in range(400)
    ]
    for parts in (1, 8):
        got = {
            (r["from_type"], r["to_type"]): (r["n"], r["p"])
            for r in event_transitions(
                _events_df(spark, rows).repartition(parts)
            ).collect()
        }
        assert got == _py_transitions(rows)


# ---------------------------------------------------------- exact percentiles


def test_exact_percentiles_known_values(spark):
    from combblas_spark.operators.kselect import exact_percentiles

    # values 1..100 with unique tiebreaks: pct p selects exactly p
    df = spark.createDataFrame(
        [(float(i), i) for i in range(1, 101)], "v double, tb long"
    ).repartition(8)
    got = {
        r["pct"]: r["val"]
        for r in exact_percentiles(df, "v", [1, 25, 50, 75, 90, 99, 100], "tb").collect()
    }
    assert got == {1: 1.0, 25: 25.0, 50: 50.0, 75: 75.0, 90: 90.0, 99: 99.0, 100: 100.0}


def test_exact_percentiles_rank_math_and_dups(spark):
    from combblas_spark.operators.kselect import exact_percentiles

    # n=7 of value 5.0 then 3 of 9.0: rank(p50) = ceil(0.5*10)-1 = 4 -> 5.0
    # rank(p75) = ceil(7.5)-1 = 7 -> 9.0 (the first of the 9.0 run)
    rows = [(5.0, i) for i in range(7)] + [(9.0, 10 + i) for i in range(3)]
    df = spark.createDataFrame(rows, "v double, tb long").repartition(4)
    got = {r["pct"]: r["val"] for r in exact_percentiles(df, "v", [50, 70, 75], "tb").collect()}
    assert got == {50: 5.0, 70: 5.0, 75: 9.0}


def test_exact_percentiles_partition_invariance_and_validation(spark):
    import pytest as _pytest

    from combblas_spark.operators.kselect import exact_percentiles

    rows = [((i * 37 % 101) / 7.0, i) for i in range(500)]
    outs = []
    for parts in (1, 16):
        df = spark.createDataFrame(rows, "v double, tb long").repartition(parts)
        outs.append(
            sorted(map(tuple, exact_percentiles(df, "v", [10, 50, 95], "tb").collect()))
        )
    assert outs[0] == outs[1]
    # python oracle: type-1 quantile on the sorted values
    vals = sorted(v for v, _ in rows)
    exp = {p: vals[max(0, -(-p * len(vals) // 100) - 1)] for p in (10, 50, 95)}
    assert dict(outs[0]) == exp
    df = spark.createDataFrame(rows, "v double, tb long")
    with _pytest.raises(ValueError):
        exact_percentiles(df, "v", [0, 50], "tb")
    with _pytest.raises(ValueError):
        exact_percentiles(df, "v", [], "tb")


def test_grouped_percentiles_known_and_invariance(spark):
    from combblas_spark.operators.kselect import grouped_percentiles

    # group A: 1..10 (p50 -> 5); group B: 100..102 (p50 -> ceil(1.5)=2nd -> 101)
    rows = [("A", float(i), i) for i in range(1, 11)] + [
        ("B", float(100 + i), 100 + i) for i in range(3)
    ]
    for parts in (1, 8):
        df = spark.createDataFrame(rows, "g string, v double, tb long").repartition(parts)
        got = {
            (r["g"], r["pct"]): r["val"]
            for r in grouped_percentiles(df, "g", "v", [50, 100], "tb").collect()
        }
        assert got == {
            ("A", 50): 5.0, ("A", 100): 10.0,
            ("B", 50): 101.0, ("B", 100): 102.0,
        }
    # per-group result == exact_percentiles run on each group alone
    from combblas_spark.operators.kselect import exact_percentiles

    for g in ("A", "B"):
        solo = {
            r["pct"]: r["val"]
            for r in exact_percentiles(
                spark.createDataFrame(
                    [r for r in rows if r[0] == g], "g string, v double, tb long"
                ),
                "v", [50, 100], "tb",
            ).collect()
        }
        assert solo == {p: got[(g, p)] for p in (50, 100)}


def test_robust_stats_known_and_python_oracle(spark):
    from combblas_spark.operators.kselect import robust_stats

    # group A: 1..9 -> med 5, deviations {0,1,1,2,2,3,3,4,4} -> mad 2
    # group B: {10, 10, 1000} -> med 10, deviations {0, 0, 990} -> mad 0
    rows = [("A", float(i), i) for i in range(1, 10)] + [
        ("B", 10.0, 20), ("B", 10.0, 21), ("B", 1000.0, 22)
    ]
    df = spark.createDataFrame(rows, "g string, v double, tb long").repartition(8)
    got = {r["g"]: (r["med"], r["mad"]) for r in robust_stats(df, "g", "v", "tb").collect()}
    assert got == {"A": (5.0, 2.0), "B": (10.0, 0.0)}

    def py_robust(vals):
        s = sorted(vals)
        med = s[-(-50 * len(s) // 100) - 1]
        d = sorted(abs(x - med) for x in vals)
        return med, d[-(-50 * len(d) // 100) - 1]

    import random as _r
    rng = _r.Random(7)
    rows = [("g%d" % (i % 3), float(rng.randrange(1000)), i) for i in range(300)]
    df = spark.createDataFrame(rows, "g string, v double, tb long").repartition(16)
    got = {r["g"]: (r["med"], r["mad"]) for r in robust_stats(df, "g", "v", "tb").collect()}
    for g in ("g0", "g1", "g2"):
        assert got[g] == py_robust([v for gg, v, _ in rows if gg == g])


def test_uniform_edges_deterministic_and_bounded(spark):
    from combblas_spark.sources.rmat import uniform_edges

    a = sorted(map(tuple, uniform_edges(spark, 50, 300, seed=7).repartition(1).collect()))
    b = sorted(map(tuple, uniform_edges(spark, 50, 300, seed=7).repartition(16).collect()))
    assert a == b and len(a) == 300
    assert all(0 <= s < 50 and 0 <= d < 50 for s, d, _ in a)
    # different seed -> different graph
    c = sorted(map(tuple, uniform_edges(spark, 50, 300, seed=8).collect()))
    assert c != a
    # roughly uniform: every vertex appears as an endpoint (600 draws on 50
    # bins; P(miss) ~ 50 * (49/50)^600 ~ 3e-4)
    seen = {s for s, _, _ in a} | {d for _, d, _ in a}
    assert seen == set(range(50))
    import pytest as _pytest
    with _pytest.raises(ValueError):
        uniform_edges(spark, 0, 10)


# ----------------------------------------------------------- event rollup

def test_event_rollup_levels_add_up(spark):
    import datetime as dt

    from combblas_spark.functions.sessions import event_rollup

    rows = [
        (1, dt.datetime(2024, 1, 1, 10), 1, "click", 1.25, "{}"),
        (2, dt.datetime(2024, 1, 1, 11), 2, "click", 2.5, "{}"),
        (3, dt.datetime(2024, 1, 2, 9), 1, "click", 0.001, "{}"),
        (4, dt.datetime(2024, 1, 1, 8), 3, "buy", 10.0, "{}"),
        (5, dt.datetime(2024, 1, 3, 8), 3, "buy", -4.2, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["event_type"], r["day"]): (r["n_events"], r["value_e3"], r["lvl"])
        for r in event_rollup(ev).collect()
    }
    import math
    e3 = lambda v: math.floor(v * 1000)
    assert got[("click", "2024-01-01")] == (2, e3(1.25) + e3(2.5), 0)
    assert got[("click", "2024-01-02")] == (1, e3(0.001), 0)
    assert got[("buy", "2024-01-01")] == (1, e3(10.0), 0)
    assert got[("buy", "2024-01-03")] == (1, e3(-4.2), 0)
    # per-type level sums its leaves exactly (int64 arithmetic)
    assert got[("click", None)] == (3, e3(1.25) + e3(2.5) + e3(0.001), 1)
    assert got[("buy", None)] == (2, e3(10.0) + e3(-4.2), 1)
    # grand total
    total_n, total_v, lvl = got[(None, None)]
    assert (total_n, lvl) == (5, 3)
    assert total_v == sum(e3(r[4]) for r in rows)
    assert len(got) == 4 + 2 + 1  # leaves + per-type + grand total


# ------------------------------------------------------------- redirects


def _rd(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_redirect_chain_hand_case(spark):
    from combblas_spark.algorithms.redirects import resolve_redirects

    res = resolve_redirects(spark, _rd(spark, [(3, 2), (2, 1), (9, 1)]))
    got = {r["src"]: (r["final"], r["hops"], r["resolved"]) for r in res.collect()}
    assert got == {3: (1, 2, True), 2: (1, 1, True), 9: (1, 1, True)}


def test_redirect_depth_budget_and_cycles(spark):
    import pytest as _pt

    from combblas_spark.algorithms.redirects import resolve_redirects

    # depth-5 chain, 2 doublings only advance 2**2 = 4 hops
    chain = [(k, k - 1) for k in range(5, 0, -1)]  # 5->4->...->0
    res = resolve_redirects(spark, _rd(spark, chain), max_doublings=2)
    got = {r["src"]: (r["final"], r["hops"], r["resolved"]) for r in res.collect()}
    assert got[5] == (1, 4, False)  # stuck one hop short, marked unresolved
    assert got[4] == (0, 4, True)
    with _pt.raises(ValueError, match="unresolved"):
        resolve_redirects(spark, _rd(spark, chain), max_doublings=2,
                          validate="raise")
    # 3 doublings cover depth 8 — now everything lands on terminal 0
    res = resolve_redirects(spark, _rd(spark, chain), max_doublings=3)
    assert {(r["src"], r["final"], r["hops"]) for r in res.collect()} == {
        (k, 0, k) for k in range(1, 6)
    }
    # a 2-cycle never resolves
    with _pt.raises(ValueError, match="unresolved"):
        resolve_redirects(spark, _rd(spark, [(1, 2), (2, 1)]),
                          validate="raise")


def test_redirect_not_functional_raises(spark):
    import pytest as _pt

    from combblas_spark.algorithms.redirects import resolve_redirects

    with _pt.raises(ValueError, match="functional"):
        resolve_redirects(spark, _rd(spark, [(1, 2), (1, 3)]))


def test_redirect_fixture_python_replay(spark):
    """Full replay of the orders-derived fixture at sf0.001: walk every
    chain in python off the same md5-60bit draws."""
    import hashlib

    from combblas_spark.algorithms.redirects import resolve_redirects
    from combblas_spark.sources.graphs import redirect_table

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rd = redirect_table(spark, "/root/testdata/sf0.001")
    got = {
        r["src"]: (r["final"], r["hops"])
        for r in resolve_redirects(spark, rd, validate="raise").collect()
    }
    tgt = {r["src"]: r["dst"] for r in rd.collect()}
    # fixture definition replays exactly
    for u in range(1, 1501):
        if h60(f"rd|{u}") % 3 < 2:
            assert tgt[u] == h60(f"rt|{u}") % u
        else:
            assert u not in tgt
    assert len(got) == len(tgt)
    for u in tgt:
        cur, hops = u, 0
        while cur in tgt:
            cur, hops = tgt[cur], hops + 1
        assert got[u] == (cur, hops)


def test_rewrite_onto_finals(spark):
    from combblas_spark.algorithms.redirects import (
        resolve_redirects,
        rewrite_onto_finals,
    )

    # 20 -> 10 -> 0 resolves; 30 <-> 31 is a redirect loop
    res = resolve_redirects(
        spark, _rd(spark, [(20, 10), (10, 0), (30, 31), (31, 30)])
    )
    edges = spark.createDataFrame(
        [(1, 20, 2.0), (1, 10, 1.0), (2, 5, 1.0), (3, 30, 9.0)],
        "src long, dst long, w double",
    )
    got = {(r["src"], r["dst"], r["w"]) for r in
           rewrite_onto_finals(edges, res).collect()}
    # both redirecting dsts land on 0; untouched dst passes through;
    # the loop edge is dropped
    assert got == {(1, 0, 2.0), (1, 0, 1.0), (2, 5, 1.0)}


def test_redirect_partition_invariance(spark):
    from combblas_spark.algorithms.redirects import resolve_redirects
    from combblas_spark.sources.graphs import redirect_table

    rd = redirect_table(spark, "/root/testdata/sf0.001")
    a = {(r["src"], r["final"], r["hops"])
         for r in resolve_redirects(spark, rd).collect()}
    b = {(r["src"], r["final"], r["hops"])
         for r in resolve_redirects(spark, rd.repartition(13)).collect()}
    assert a == b


# ---------------------------------------------------------------------- hll


def _py_hll(vals, p=6):
    """Pure-python replay of hll_distinct's register math."""
    m, w = 1 << p, 60 - p
    k_exp = w + 1
    regs = {}
    for v in vals:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        bucket, rest = h % m, h >> p
        rho = k_exp if rest == 0 else k_exp - rest.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    v_zero = m - len(regs)
    s_harm = sum(1 << (k_exp - r) for r in regs.values()) + v_zero * (1 << k_exp)
    raw = 0.709 * m * m * float(1 << k_exp) / s_harm
    if v_zero > 0 and raw <= 2.5 * m:
        import math
        est = m * math.log(m / v_zero)
    else:
        est = raw
    return v_zero, s_harm, round(est, 6)


def test_hll_python_replay_and_accuracy(spark):
    from combblas_spark.functions.sketch import hll_distinct

    vals = [f"item-{i}" for i in range(5000)] * 2  # duplicates change nothing
    df = spark.createDataFrame([("g", v) for v in vals], "grp string, v string")
    row = hll_distinct(df, "grp", F.col("v")).collect()[0]
    v_zero, s_harm, est = _py_hll([f"item-{i}" for i in range(5000)])
    assert (row["v_zero"], row["s_harm"]) == (v_zero, s_harm)
    assert row["hll_est"] == est
    assert row["n_exact"] == 5000
    # raw-branch accuracy: 1.04/sqrt(64) ~ 13% std error, allow 3 sigma
    assert abs(row["hll_est"] - 5000) / 5000 < 0.39


def test_hll_linear_counting_branch(spark):
    from combblas_spark.functions.sketch import hll_distinct

    df = spark.createDataFrame(
        [("g", f"u{i}") for i in range(20)], "grp string, v string"
    )
    row = hll_distinct(df, "grp", F.col("v")).collect()[0]
    v_zero, s_harm, est = _py_hll([f"u{i}" for i in range(20)])
    assert (row["v_zero"], row["s_harm"], row["hll_est"]) == (
        v_zero, s_harm, est)
    assert row["v_zero"] > 0
    # linear counting is tight at this load factor
    assert abs(row["hll_est"] - 20) / 20 < 0.25


def test_hll_merge_and_partition_invariance(spark):
    from combblas_spark.functions.sketch import hll_distinct

    rows = [("a", f"x{i}") for i in range(300)] + [
        ("b", f"y{i}") for i in range(7)
    ]
    df = spark.createDataFrame(rows, "grp string, v string")
    a = {r["grp"]: (r["v_zero"], r["s_harm"], r["hll_est"])
         for r in hll_distinct(df, "grp", F.col("v")).collect()}
    b = {r["grp"]: (r["v_zero"], r["s_harm"], r["hll_est"])
         for r in hll_distinct(df.repartition(11), "grp", F.col("v")).collect()}
    assert a == b
    import pytest as _pt
    with _pt.raises(ValueError, match="p must be"):
        hll_distinct(df, "grp", F.col("v"), p=3).collect()


# ----------------------------------------------------------- gap encoding


def test_gap_audit_hand_case(spark):
    from combblas_spark.algorithms.stats import gap_encoding_audit

    e = spark.createDataFrame(
        [(1, 2, 1.0), (1, 5, 1.0), (1, 13, 1.0), (7, 1, 1.0)],
        "src long, dst long, w double",
    )
    got = {r["deg_bucket"]: (r["n_srcs"], r["n_edges"], r["gap_bits"],
                             r["raw_bits"])
           for r in gap_encoding_audit(e).collect()}
    # src 1: sorted dsts [2,5,13] -> first bitlen(3)=2, gaps 3 (2 bits),
    # 8 (4 bits); raw = bitlen(3)+bitlen(6)+bitlen(14) = 2+3+4
    assert got[1] == (1, 3, 2 + 2 + 4, 2 + 3 + 4)
    # src 7: single dst 1 -> bitlen(2) = 2 both ways; deg 1 -> bucket 0
    assert got[0] == (1, 1, 2, 2)


def test_gap_audit_locality_signal(spark):
    """Clustered ids must gap-encode smaller than scattered ids — the
    property the audit exists to measure."""
    from combblas_spark.algorithms.stats import gap_encoding_audit

    near = spark.createDataFrame(
        [(0, 1000 + i, 1.0) for i in range(32)], "src long, dst long, w double"
    )
    far = spark.createDataFrame(
        [(0, 1000 * (i + 1), 1.0) for i in range(32)],
        "src long, dst long, w double",
    )
    g_near = gap_encoding_audit(near).collect()[0]["gap_bits"]
    g_far = gap_encoding_audit(far).collect()[0]["gap_bits"]
    assert g_near < g_far


def test_gap_audit_python_replay(spark):
    from collections import defaultdict

    from combblas_spark.algorithms.stats import gap_encoding_audit
    from combblas_spark.sources.graphs import part_supplier_graph

    e = part_supplier_graph(spark, "/root/testdata/sf0.001")
    adj = defaultdict(set)
    for r in e.select("src", "dst").collect():
        adj[r["src"]].add(r["dst"])
    buckets = defaultdict(lambda: [0, 0, 0, 0])
    for s, ds in adj.items():
        ds = sorted(ds)
        gap = ds[0] + 1 if ds else 0
        gbits = (ds[0] + 1).bit_length() + sum(
            (b - a).bit_length() for a, b in zip(ds, ds[1:])
        )
        rbits = sum((d + 1).bit_length() for d in ds)
        bk = len(ds).bit_length() - 1
        agg = buckets[bk]
        agg[0] += 1
        agg[1] += len(ds)
        agg[2] += gbits
        agg[3] += rbits
    got = {r["deg_bucket"]: (r["n_srcs"], r["n_edges"], r["gap_bits"],
                             r["raw_bits"])
           for r in gap_encoding_audit(e).collect()}
    assert got == {k: tuple(v) for k, v in buckets.items()}


# ------------------------------------------------------------ anchor text


def test_anchor_index_hand_case(spark):
    from combblas_spark.functions.text import anchor_text_index

    links = spark.createDataFrame(
        [
            (1, 9, "best search engine"),
            (2, 9, "search engine here"),
            (3, 9, "click here"),
            (4, 8, "lonely page"),
        ],
        "src long, dst long, anchor string",
    )
    got = {(r["dst"], r["rank"]): (r["term"], r["cnt"])
           for r in anchor_text_index(links, k=2).collect()}
    # dst 9 term counts: engine 2, search 2, best/click/here... here 2
    # -> top-2 by (cnt desc, term asc): engine(2), here(2)
    assert got[(9, 1)] == ("engine", 2)
    assert got[(9, 2)] == ("here", 2)
    assert got[(8, 1)] == ("lonely", 1)
    assert got[(8, 2)] == ("page", 1)


def test_anchor_index_matches_bruteforce(spark):
    """Salted two-phase top-k == plain per-target sort on the fixture."""
    from collections import Counter

    from combblas_spark.functions.text import (
        anchor_text_index,
        anchored_links,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    links = anchored_links(docs)
    counts = Counter()
    for r in links.collect():
        for t in r["anchor"].split():
            if t:
                counts[(r["dst"], t)] += 1
    by_dst = {}
    for (d, t), c in counts.items():
        by_dst.setdefault(d, []).append((-c, t))
    want = set()
    for d, lst in by_dst.items():
        for rank, (negc, t) in enumerate(sorted(lst)[:3], start=1):
            want.add((d, t, -negc, rank))
    got = {(r["dst"], r["term"], r["cnt"], r["rank"])
           for r in anchor_text_index(links, k=3).collect()}
    assert got == want


def test_anchored_links_deterministic(spark):
    from combblas_spark.functions.text import anchored_links

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {tuple(r) for r in anchored_links(docs).collect()}
    b = {tuple(r) for r in anchored_links(docs.repartition(7)).collect()}
    assert a == b and len(a) > 0


# ------------------------------------------------------------------- urls


def test_url_canonical_hand_cases(spark):
    from combblas_spark.functions.urls import canonical_url, url_host

    cases = {
        "HTTP://WWW.Example.COM:80/a/b?utm_source=x&b=2&a=1#frag":
            ("http://example.com/a/b?a=1&b=2", "example.com"),
        "https://shop1.example.com:443":
            ("https://shop1.example.com/", "shop1.example.com"),
        "https://shop1.example.com:8080?b=2&a=1":
            ("https://shop1.example.com:8080/?a=1&b=2", "shop1.example.com"),
        "http://Host.com/path?utm_campaign=x":
            ("http://host.com/path", "host.com"),
        "http://www.h.com?id=3&utm_source=n": ("http://h.com/?id=3", "h.com"),
        "http://h.com/a?fbclid=123&gclid=9&z=1":
            ("http://h.com/a?z=1", "h.com"),
    }
    df = spark.createDataFrame([(k,) for k in cases], "url string")
    got = {
        r["url"]: (r["c"], r["h"])
        for r in df.select(
            "url",
            canonical_url(F.col("url")).alias("c"),
            url_host(F.col("url")).alias("h"),
        ).collect()
    }
    assert got == cases


def test_url_canonical_idempotent(spark):
    """canonical(canonical(x)) == canonical(x) over the whole fixture."""
    from combblas_spark.functions.urls import canonical_url, dirty_urls

    d = dirty_urls(spark, "/root/testdata/sf0.001")
    # materialize between applications: composing canonical_url over the
    # inline fixture expression lets CollapseProject duplicate the whole
    # input tree per column reference (the sq8 HOF-inlining trap)
    once = spark.createDataFrame(
        [(r["c1"],) for r in
         d.select(canonical_url(F.col("url")).alias("c1")).collect()],
        "c1 string",
    )
    twice = once.select("c1", canonical_url(F.col("c1")).alias("c2"))
    assert twice.filter(F.col("c1") != F.col("c2")).count() == 0
    assert once.count() == 1500


def test_dirty_urls_exercise_every_rule(spark):
    from combblas_spark.functions.urls import dirty_urls

    urls = [r["url"] for r in dirty_urls(spark, "/root/testdata/sf0.001").collect()]
    assert any("HTTP://" in u for u in urls)          # scheme folding
    assert any("www." in u for u in urls)             # www strip
    assert any(":80/" in u or u.rstrip("#frag").endswith(":80") or ":80?" in u
               for u in urls)                         # default port
    assert any(":8080" in u for u in urls)            # kept port
    assert any("utm_" in u for u in urls)             # tracking params
    assert any("#frag" in u for u in urls)            # fragment
    assert any("?b=2&a=1" in u for u in urls)         # unsorted params


# ------------------------------------------------------------ span dedup


def _py_span_dedup(texts, span=5):
    """Pure-python replay: texts = {doc_id: text}."""
    occ = {}
    toks = {d: [t for t in txt.split() if t] for d, txt in texts.items()}
    for d, ts in toks.items():
        for i in range(len(ts) - span + 1):
            gram = " ".join(ts[i:i + span])
            h = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
            occ.setdefault(h, []).append((d, i + 1))
    dups = {}
    for h, lst in occ.items():
        mk = min(d * (1 << 20) + p for d, p in lst)
        for d, p in lst:
            if d * (1 << 20) + p != mk:
                dups.setdefault(d, []).append(p)
    out = {}
    for d, ts in toks.items():
        spans = sorted(dups.get(d, []))
        removed, run_end = 0, 0
        for p in spans:
            e = p + span
            removed += max(0, e - max(run_end, p))
            run_end = max(run_end, e)
        out[d] = (len(ts), len(spans), removed, len(ts) - removed)
    return out


def test_span_dedup_hand_case(spark):
    from combblas_spark.functions.dedup import span_dedup_stats

    texts = {
        0: "a b c d e f g",        # canonical source of 'a b c d e'
        1: "x y a b c d e z",      # one dup span -> 5 tokens removed
        2: "a b c d e a b c d e",  # self-repeat, overlapping coverage
        3: "too short",            # < span tokens -> zeros
    }
    docs = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: (r["n_tokens"], r["n_dup_spans"], r["n_removed"],
                         r["n_kept"])
           for r in span_dedup_stats(docs, span=5).collect()}
    assert got == _py_span_dedup(texts)
    # sanity on the interesting rows
    assert got[1] == (8, 1, 5, 3)
    assert got[3] == (2, 0, 0, 2)
    # doc 2: occurrences of 'a b c d e' at pos 1 (dup of doc 0) and pos 6,
    # plus the bridging grams; entire doc ends up covered
    assert got[2][3] == 0


def test_span_dedup_python_replay(spark):
    from combblas_spark.functions.dedup import span_dedup_stats

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    want = _py_span_dedup(texts)
    got = {r["doc_id"]: (r["n_tokens"], r["n_dup_spans"], r["n_removed"],
                         r["n_kept"])
           for r in span_dedup_stats(docs, span=5).collect()}
    assert got == want
    # the fixture actually removes something
    assert sum(v[2] for v in got.values()) > 0


def test_host_links_hand_case(spark):
    from combblas_spark.functions.urls import host_links

    links = spark.createDataFrame(
        [
            ("HTTP://WWW.A.com:80/x#f", "https://B.org/y?utm_source=z"),
            ("http://a.COM/other", "https://www.b.ORG:443"),
            ("http://a.com", "http://c.net"),
        ],
        "src_url string, dst_url string",
    )
    got = {(r["src_host"], r["dst_host"]): r["n_links"]
           for r in host_links(links).collect()}
    assert got == {("a.com", "b.org"): 2, ("a.com", "c.net"): 1}


# -------------------------------------------------------------- ppr batch


def test_ppr_batch_single_seed_matches_dense(spark):
    """One-seed batch == the dense PPR loop on the positive support, to
    within accumulation-order ulps (the per-dst SUM shuffles differently
    under the (seed, dst) key, so last-ulp drift is expected; the
    cross-engine contract rounds to 6 decimals for the same reason)."""
    from combblas_spark.algorithms.pagerank import pagerank, ppr_batch
    from combblas_spark.sources.graphs import part_supplier_graph

    e = part_supplier_graph(spark, "/root/testdata/sf0.001")
    dense = {
        r["id"]: r["val"]
        for r in pagerank(
            spark, e, alpha=0.85, num_iters=4, seeds=[1]
        ).collect()
    }
    batch = {
        r["id"]: r["val"]
        for r in ppr_batch(spark, e, seeds=[1], num_iters=4).collect()
    }
    for v, val in batch.items():
        assert abs(dense[v] - val) <= 1e-12 * max(abs(val), 1e-30)
    # everything the sparse state never touched is exactly zero densely
    for v, val in dense.items():
        if v not in batch:
            assert val == 0.0


def test_ppr_batch_mass_conservation_with_dangling(spark):
    from combblas_spark.algorithms.pagerank import ppr_batch

    # 1 -> 2 -> 3 (3 dangling), 4 isolated from the seeds' reach
    e = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (4, 5, 1.0)],
        "src long, dst long, w double",
    )
    x = ppr_batch(spark, e, seeds=[1, 2], num_iters=8)
    rows = x.collect()
    per_seed = {}
    for r in rows:
        per_seed[r["seed"]] = per_seed.get(r["seed"], 0.0) + r["val"]
        assert r["id"] in (1, 2, 3)  # seeds' reach only — sparse state
    assert set(per_seed) == {1, 2}
    for s, tot in per_seed.items():
        assert abs(tot - 1.0) < 1e-9  # dangling mass returned to the seed


def test_ppr_batch_validates_seeds(spark):
    import pytest as _pt

    from combblas_spark.algorithms.pagerank import ppr_batch

    e = spark.createDataFrame([(1, 2, 1.0)], "src long, dst long, w double")
    with _pt.raises(ValueError, match="seeds"):
        ppr_batch(spark, e, seeds=[])


# ---------------------------------------------------------------- crawl delta


def test_edge_delta_hand_case(spark):
    from combblas_spark.operators.delta import (
        STATUS_ADDED,
        STATUS_PERSISTED,
        STATUS_REMOVED,
        delta_stats,
        edge_delta,
    )

    e_old = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    e_new = spark.createDataFrame(
        [(1, 3), (2, 3), (2, 4)], "src long, dst long"
    )
    d = {(r["src"], r["dst"]): r["status"] for r in edge_delta(e_old, e_new).collect()}
    assert d == {
        (1, 2): STATUS_REMOVED,
        (1, 3): STATUS_PERSISTED,
        (2, 3): STATUS_PERSISTED,
        (2, 4): STATUS_ADDED,
    }
    s = {
        r["src"]: (r["n_added"], r["n_removed"], r["n_persisted"])
        for r in delta_stats(e_old, e_new).collect()
    }
    assert s == {1: (0, 1, 1), 2: (1, 0, 1)}


def test_edge_delta_partition_invariance(spark):
    from combblas_spark.operators.delta import delta_stats
    from combblas_spark.sources.graphs import crawl_snapshots

    e_old, e_new = crawl_snapshots(spark, "/root/testdata/sf0.001")
    base = sorted(
        tuple(r) for r in delta_stats(e_old, e_new).collect()
    )
    skewed = sorted(
        tuple(r)
        for r in delta_stats(
            e_old.repartition(17), e_new.repartition(3)
        ).collect()
    )
    assert base == skewed and len(base) > 0


def test_crawl_snapshots_overlap_regime(spark):
    """The fixture's independent 3/4 membership draws must produce all
    three statuses in the expected proportions (binomial tolerance)."""
    from combblas_spark.operators.delta import edge_delta
    from combblas_spark.sources.graphs import crawl_snapshots

    e_old, e_new = crawl_snapshots(spark, "/root/testdata/sf0.001")
    counts = {
        r["status"]: r["n"]
        for r in edge_delta(e_old, e_new)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(counts.values())
    # candidates kept by neither draw never appear; of those that appear,
    # P(persisted) = 9/16 / (15/16) = 0.6, added = removed = 0.2
    assert abs(counts[3] / total - 0.6) < 0.05
    assert abs(counts[2] / total - 0.2) < 0.05
    assert abs(counts[1] / total - 0.2) < 0.05


# ---------------------------------------------------------------- bloom


def _py_bloom_bits(key: str, m_bits: int, k: int):
    out = []
    for i in range(k):
        h = int(hashlib.md5(f"bf{i}|{key}".encode()).hexdigest()[:15], 16)
        out.append(h % m_bits)
    return out


def test_bloom_audit_full_python_replay(spark):
    """Exact replay: the register table AND every per-key verdict must
    match a pure-python bloom filter bit for bit."""
    from combblas_spark.functions.sketch import bloom_audit, bloom_build

    m_bits, k = 1024, 3
    members = spark.createDataFrame(
        [(f"m{i}",) for i in range(200)], "key string"
    )
    probes = spark.createDataFrame(
        [(("mem" if i < 100 else "non"), f"m{i}",) for i in range(400)],
        "g string, key string",
    )
    # python filter
    words = {}
    for i in range(200):
        for b in _py_bloom_bits(f"m{i}", m_bits, k):
            w, off = b // 63, b % 63
            words[w] = words.get(w, 0) | (1 << off)
    got_words = {
        r["word"]: r["bits"]
        for r in bloom_build(members, F.col("key"), m_bits, k).collect()
    }
    assert got_words == words
    # python verdicts
    exp = {"mem": [0, 0, 0], "non": [0, 0, 0]}  # true, hits, fp
    for i in range(400):
        g = "mem" if i < 100 else "non"
        is_m = i < 200
        hit = all(
            words.get(b // 63, 0) >> (b % 63) & 1
            for b in _py_bloom_bits(f"m{i}", m_bits, k)
        )
        exp[g][0] += is_m
        exp[g][1] += hit
        exp[g][2] += hit and not is_m
    out = {
        r["g"]: (
            r["n_probes"],
            r["n_true"],
            r["n_bloom_hits"],
            r["n_false_pos"],
            r["n_false_neg"],
        )
        for r in bloom_audit(
            members, probes, "key", "key", "g", m_bits=m_bits, k=k
        ).collect()
    }
    assert out == {
        "mem": (100, exp["mem"][0], exp["mem"][1], exp["mem"][2], 0),
        "non": (300, exp["non"][0], exp["non"][1], exp["non"][2], 0),
    }
    # the loaded 1024-bit / 200-key regime must actually exercise FPs
    assert exp["non"][2] > 0


def test_bloom_no_false_negatives_and_partition_invariance(spark):
    from combblas_spark.functions.sketch import bloom_audit, bloom_build

    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    members = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey"
    )
    out = bloom_audit(
        members, o, "o_orderkey", "o_orderkey", "o_orderpriority"
    ).collect()
    assert sum(r["n_false_neg"] for r in out) == 0
    assert sum(r["n_true"] for r in out) > 0
    # bit_or is the merge: any partitioning builds the same register table
    a = sorted(
        tuple(r)
        for r in bloom_build(members, F.col("o_orderkey")).collect()
    )
    b = sorted(
        tuple(r)
        for r in bloom_build(
            members.repartition(13), F.col("o_orderkey")
        ).collect()
    )
    assert a == b and len(a) > 0


# ---------------------------------------------------------------- hostrank


def test_pagerank_weighted_string_ids_python_replay(spark):
    """Weighted PageRank over string vertex ids (the HostRank unit):
    exact replay of the fixed-iteration power iteration in pure python."""
    from combblas_spark.algorithms.pagerank import pagerank

    edges = [
        ("a.com", "b.com", 2.0),
        ("b.com", "a.com", 1.0),
        ("a.com", "c.com", 1.0),
        ("c.com", "a.com", 1.0),
    ]
    e = spark.createDataFrame(edges, "src string, dst string, w double")
    got = {r["id"]: r["val"] for r in pagerank(spark, e, num_iters=5).collect()}

    verts = sorted({s for s, _, _ in edges} | {d for _, d, _ in edges})
    outw = {}
    for s, _, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    x = {v: 1.0 / len(verts) for v in verts}
    for _ in range(5):
        nxt = {v: 0.15 / len(verts) for v in verts}
        for s, d, w in edges:
            nxt[d] += 0.85 * (w / outw[s]) * x[s]
        x = nxt
    for v in verts:
        assert abs(got[v] - x[v]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9


# ---------------------------------------------------------------- containment


def test_containment_hand_case_directional(spark):
    from combblas_spark.functions.dedup import containment_pairs

    inner = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [
            (1, inner),
            (2, inner + " and then it ran far away into the dark woods"),
            (3, "completely unrelated text about graph engines at scale"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): (r["cont"], r["jac"])
        for r in containment_pairs(docs, tau_num=9, tau_den=10).collect()
    }
    assert (1, 2) in out
    cont, jac = out[(1, 2)]
    assert cont == 1.0  # every shingle of 1 is in 2
    assert jac < 0.9  # ...but the pair is NOT a symmetric near-dup
    assert (2, 1) not in out  # directional: 2 is not contained in 1
    assert all(3 not in p for p in out)


def test_containment_brute_force_completeness(spark):
    """Exactness law: with a high bucket cap, the prefix-filtered join
    must find EXACTLY the ordered pairs brute force finds."""
    from combblas_spark.functions.dedup import containment_pairs

    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select("doc_id", "text")
        .collect()
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def shset(text):
        toks = [t for t in text.split(" ") if t]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sets = {r["doc_id"]: shset(r["text"]) for r in rows}
    expected = set()
    for a, sa in sets.items():
        if not sa:
            continue
        for b, sb in sets.items():
            if a == b:
                continue
            if len(sa & sb) * 10 >= 9 * len(sa):
                expected.add((a, b))
    got = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(
            docs, tau_num=9, tau_den=10, max_bucket=10**6
        ).collect()
    }
    assert got == expected


# --------------------------------------------------------------------------
# robots.txt longest-match admission (functions/robots.py)
# --------------------------------------------------------------------------


def test_robots_hand_case(spark):
    """RFC 9309 resolution on a hand-solved rule set: longest prefix
    wins, Allow wins a length tie, no-match defaults to allowed."""
    from combblas_spark.functions.robots import robots_decision

    rules = spark.createDataFrame(
        [
            ("h", "/", 0),
            ("h", "/a", 1),
            ("h", "/a/b", 0),
            ("h", "/t", 0),
            ("h", "/t", 1),
        ],
        "host string, rule_path string, allow int",
    )
    urls = spark.createDataFrame(
        [
            (1, "h", "/a/x"),
            (2, "h", "/a/b/c"),
            (3, "h", "/zzz"),
            (4, "h", "/t9"),
            (5, "other", "/a"),
        ],
        "url_id long, host string, path string",
    )
    got = {
        r["url_id"]: (r["allowed"], r["matched_len"])
        for r in robots_decision(urls, rules).collect()
    }
    assert got[1] == (True, 2)  # /a beats /
    assert got[2] == (False, 4)  # /a/b (disallow) beats /a (allow)
    assert got[3] == (False, 1)  # only the root disallow matches
    assert got[4] == (True, 2)  # equal-length tie -> Allow wins
    assert got[5] == (True, 0)  # no rules for the host -> default allow


def test_robots_wildcard_rule_raises(spark):
    """Wildcard rules are a declared non-goal: they must fail loudly at
    execution time, never silently match the '*' as a literal byte."""
    import pytest as _pytest

    from combblas_spark.functions.robots import robots_decision

    rules = spark.createDataFrame(
        [("h", "/a*", 0)], "host string, rule_path string, allow int"
    )
    urls = spark.createDataFrame(
        [(1, "h", "/a/x")], "url_id long, host string, path string"
    )
    with _pytest.raises(Exception, match="wildcard"):
        robots_decision(urls, rules).collect()


def test_robots_fixture_python_replay(spark):
    """Full replay: an independent python implementation of RFC 9309
    longest-match over the replayed fixture must reproduce every per-host
    tally of the contract query at sf0.001."""
    import hashlib

    import __spark_entry__ as entrymod

    def h60(salt, key):
        return int(
            hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:15], 16
        )

    # replay the rule sets
    rules = {}
    for k in range(50):
        host = f"shop{k}.example.com"
        rs = [(f"/cat{k % 12}", 1)]
        if h60("rb1", k) % 2 == 0:
            rs.append(("/private", 0))
        if h60("rb4", k) % 7 == 0:
            rs.append(("/private", 1))
        if h60("rb2", k) % 5 == 0:
            rs.append(("/", 0))
        if h60("rb3", k) % 3 == 0:
            rs.append(("/cat", 0))
        if h60("rb5", k) % 4 == 0:
            rs.append(("/static", 0))
        rules[host] = rs

    uids = [
        r["o_orderkey"]
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/orders.parquet"
        )
        .select("o_orderkey")
        .collect()
    ]
    agg = {}
    for u in uids:
        host = f"shop{u % 50}.example.com"
        cat, item = h60("rbc", u) % 12, h60("rbi", u) % 997
        sec = h60("rbsec", u) % 5
        path = [
            f"/cat{cat}/item{item}",
            f"/private/doc{item}",
            "/",
            f"/cat{cat}",
            f"/static/img{item}.png",
        ][sec]
        best = max(
            (
                2 * len(rp) + al
                for rp, al in rules[host]
                if path.startswith(rp)
            ),
            default=None,
        )
        a = agg.setdefault(host, [0, 0, 0, 0, 0])
        a[0] += 1
        if best is None:
            a[3] += 1
        elif best % 2 == 1:
            a[1] += 1
        else:
            a[2] += 1
        a[4] = max(a[4], best // 2 if best is not None else 0)

    got = {
        r["host"]: (
            r["n_urls"],
            r["n_allowed"],
            r["n_blocked"],
            r["n_default"],
            r["max_matched_len"],
        )
        for r in entrymod.q_robots_audit(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert got == {h: tuple(v) for h, v in agg.items()}


# --------------------------------------------------------------------------
# link-farm detection (functions/urls.link_farm_pairs)
# --------------------------------------------------------------------------


def test_link_farm_hand_case(spark):
    """Hand-solved configuration-model lift: a 2-host farm exchanging
    10x its expected interlinks flags in both directions; the uniform
    background pairs (lift ~1x) never do."""
    from combblas_spark.functions.urls import link_farm_pairs

    # a<->b farm (90 each way) over a graph whose mass sits elsewhere
    # (d<->e heavy legit exchange, c background): L = 820.
    rows = [
        ("a", "b", 90),
        ("b", "a", 90),
        ("a", "c", 10),
        ("b", "c", 10),
        ("c", "a", 10),
        ("c", "b", 10),
        ("d", "e", 300),
        ("e", "d", 300),
    ]
    hl = spark.createDataFrame(
        rows, "src_host string, dst_host string, n_links long"
    )
    got = {
        (r["src_host"], r["dst_host"]): r["lift_x1000"]
        for r in link_farm_pairs(
            hl, min_links=20, lift_x1000_min=5000
        ).collect()
    }
    # out(a)=in(a)=out(b)=in(b)=100 -> lift(a<->b) = 1000*90*820/10000
    # = 7380 exactly; the d<->e exchange is big but proportionate
    # (lift = 1000*300*820/90000 = 2733 < 5000) and c's pairs lack
    # support — only the farm flags, in both directions.
    assert got == {("a", "b"): 7380, ("b", "a"): 7380}


def test_link_farm_planted_fixture_exact(spark):
    """At sf0.001 the contract query must flag EXACTLY the six ordered
    pairs of the planted 3-host farm — lift is scale-free, uniform
    background stays ~1000x."""
    import __spark_entry__ as entrymod

    rows = entrymod.q_linkfarm(spark, "/root/testdata/sf0.001").collect()
    farm = {"shop3.example.com", "shop17.example.com", "shop41.example.com"}
    pairs = {(r["src_host"], r["dst_host"]) for r in rows}
    assert pairs == {(a, b) for a in farm for b in farm if a != b}
    for r in rows:
        assert r["lift_x1000"] >= 3000
        assert r["n_links"] >= 10


# --------------------------------------------------------------------------
# mirror-host detection (functions/dedup.set_resemblance_pairs)
# --------------------------------------------------------------------------


def test_set_resemblance_hand_case(spark):
    """Exact integer Jaccard on hand sets: hosts sharing 3 of 5 distinct
    items (J = 0.6) pair up at tau = 1/2; a disjoint host never does."""
    from combblas_spark.functions.dedup import set_resemblance_pairs

    rows = (
        [("a", f"i{k}") for k in range(4)]
        + [("b", f"i{k}") for k in range(1, 4)]
        + [("b", "j0")]
        + [("c", f"z{k}") for k in range(4)]
    )
    items = spark.createDataFrame(rows, "id string, shingle string")
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["n_a"], r["n_b"])
        for r in set_resemblance_pairs(items).collect()
    }
    assert got == {("a", "b"): (3, 4, 4)}


def test_mirror_hosts_planted_exact(spark):
    """The contract query must surface EXACTLY the ten planted mirrors,
    each a strict subset of its origin (n_common == n_a) holding at
    least half the origin's pages."""
    import __spark_entry__ as entrymod

    rows = entrymod.q_mirror_hosts(spark, "/root/testdata/sf0.001").collect()
    assert {(r["host_a"], r["host_b"]) for r in rows} == {
        (f"mirror{m}.example.com", f"origin{m}.example.com")
        for m in range(10)
    }
    for r in rows:
        assert r["n_common"] == r["n_a"]  # mirror carries a subset
        assert 2 * r["n_common"] >= r["n_b"]  # >= half the origin


# --------------------------------------------------------------------------
# recrawl scheduling (functions/urls.change_rate)
# --------------------------------------------------------------------------


def test_change_rate_hand_case(spark):
    """Lag-window change detection + Cho-Garcia-Molina estimator on a
    hand history: hashes a,a,b,b,c = 2 changes in 4 intervals; a
    never-changing URL estimates exactly 0.0 (not IEEE -0.0)."""
    import math

    from combblas_spark.functions.urls import change_rate

    rows = [(1, s, h) for s, h in enumerate("aabbc")] + [
        (2, s, "z") for s in range(5)
    ]
    hist = spark.createDataFrame(
        rows, "url_id long, snapshot long, content_hash string"
    )
    got = {
        r["url_id"]: (r["n_obs"], r["n_changes"], r["lambda_hat"])
        for r in change_rate(hist).collect()
    }
    assert got[1][:2] == (4, 2)
    assert got[1][2] == round(-math.log(2.5 / 4.5), 6)
    assert got[2] == (4, 0, 0.0)
    assert math.copysign(1.0, got[2][2]) == 1.0  # +0.0, not -0.0


def test_recrawl_classes_separate(spark):
    """The three planted volatility classes must order by mean observed
    changes (1/8 < 4/8 < 7/8 per interval over 6 intervals)."""
    import __spark_entry__ as entrymod

    rows = entrymod.q_recrawl(spark, "/root/testdata/sf0.001").collect()
    tot = {0: [0, 0], 1: [0, 0], 2: [0, 0]}
    for r in rows:
        tot[r["cls"]][0] += r["n_changes"] * r["n_urls"]
        tot[r["cls"]][1] += r["n_urls"]
    means = {c: x / n for c, (x, n) in tot.items()}
    assert means[0] < means[1] < means[2]
    assert means[0] < 1.5 and means[2] > 4.5  # near 6/8 and 42/8
    # lambda_hat is monotone in n_changes within a class
    lam = sorted((r["n_changes"], r["lambda_hat"]) for r in rows if r["cls"] == 1)
    assert all(a[1] < b[1] for a, b in zip(lam, lam[1:]))


# --------------------------------------------------------------------------
# landmark distance estimation (algorithms/bfs.landmark_estimates)
# --------------------------------------------------------------------------


def test_landmark_estimate_hand_case(spark):
    """Path 1-2-3-4-5 with the single landmark 1: est(2,4) must be
    d(2,1)+d(1,4) = 4 (the triangle upper bound), est(1,5) exact = 4
    (one endpoint IS the landmark)."""
    from combblas_spark.algorithms.bfs import landmark_estimates

    e = spark.createDataFrame(
        [(a, b) for a, b in [(1, 2), (2, 3), (3, 4), (4, 5)]]
        + [(b, a) for a, b in [(1, 2), (2, 3), (3, 4), (4, 5)]],
        "src long, dst long",
    )
    pairs = spark.createDataFrame([(2, 4), (1, 5)], "a long, b long")
    got = {
        (r["a"], r["b"]): r["est"]
        for r in landmark_estimates(spark, e, [1], pairs).collect()
    }
    assert got == {(2, 4): 4, (1, 5): 4}


def test_landmark_triangle_bound_and_exact_at_landmark(spark):
    """Law over the contract output at sf0.001: every estimate is an
    upper bound (d_est >= d_exact), and whenever a query endpoint is
    itself a landmark the estimate is EXACT."""
    import __spark_entry__ as entrymod
    from combblas_spark.algorithms.bfs import top_degree_landmarks
    from combblas_spark.sources.graphs import part_supplier_graph

    sf = "/root/testdata/sf0.001"
    rows = entrymod.q_landmark_dist(spark, sf).collect()
    assert rows
    lms = set(
        top_degree_landmarks(part_supplier_graph(spark, sf), entrymod.LM_K)
    )
    for r in rows:
        assert r["d_est"] >= r["d_exact"]
        if r["a"] in lms or r["b"] in lms:
            assert r["d_est"] == r["d_exact"]


# --------------------------------------------------------------------------
# boilerplate-line removal (functions/text.boilerplate_scrub)
# --------------------------------------------------------------------------


def test_boilerplate_hand_case(spark):
    """Host-df thresholding on a hand corpus: the nav line in 2/3 of a
    site's docs is removed, a body line unique to one doc is kept, and
    another host's identical nav text is judged by ITS OWN host df."""
    from combblas_spark.functions.text import boilerplate_scrub

    docs = spark.createDataFrame(
        [
            (1, "a", "NAV\nbody one"),
            (2, "a", "NAV\nbody two"),
            (3, "a", "body three"),
            (4, "b", "NAV\nonly doc keeps its nav? no: df 1/1 >= 2/5"),
        ],
        "doc_id long, host string, text string",
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_removed"], r["clean_text"])
        for r in boilerplate_scrub(docs).collect()
    }
    assert got[1] == (2, 1, "body one")
    assert got[2] == (2, 1, "body two")
    assert got[3] == (1, 0, "body three")
    # host b has ONE doc: every line reaches df 1/1 >= 2/5 and is
    # scrubbed — the degenerate-host regime callers must size for
    assert got[4][1] == 2 and got[4][2] == ""


def test_boilerplate_untouched_docs_keep_exact_content(spark):
    """Docs that drew neither promo nor footer must come out of the
    scrub byte-identical (clean_fp == md5(original text)) — the scrub
    may never touch body content."""
    import hashlib

    import __spark_entry__ as entrymod

    def h60(salt, key):
        return int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:15], 16)

    sf = "/root/testdata/sf0.001"
    orig = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf}/documents.parquet").collect()
    }
    plain = {
        d
        for d in orig
        if h60("bp1", d) % 4 == 0 and h60("bp2", d) % 2 != 0
    }
    assert plain  # fixture must exercise the untouched regime
    rows = {
        r["doc_id"]: r
        for r in entrymod.q_boilerplate(spark, sf).collect()
    }
    for d in plain:
        r = rows[d]
        assert r["n_removed"] == 0
        assert r["clean_fp"] == hashlib.md5(orig[d].encode()).hexdigest()


# --------------------------------------------------------------------------
# conjunctive + phrase retrieval (functions/text.py)
# --------------------------------------------------------------------------


def test_conjunctive_hand_case(spark):
    """AND semantics + ranking: docs missing any query term are out;
    among full matches the higher summed-tf doc ranks first."""
    from combblas_spark.functions.text import conjunctive_topk

    docs = spark.createDataFrame(
        [
            (1, "x y x y z filler"),
            (2, "x y z"),
            (3, "x x x y filler"),  # no z -> excluded
            (4, "z z z filler"),  # no x, y -> excluded
        ],
        "doc_id long, text string",
    )
    rows = conjunctive_topk(docs, ["x", "y", "z"], k=10).collect()
    assert [r["doc_id"] for r in rows] == [1, 2]
    assert rows[0]["n_hits"] == 5 and rows[1]["n_hits"] == 3


def test_phrase_hand_cases(spark):
    """Adjacency incl. the overlapping-occurrence regime: 'a b a b a'
    has 2 'a b' starts; 'a a a' has 2 overlapping 'a a' starts."""
    from combblas_spark.functions.text import phrase_occurrences

    docs = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a a a"), (3, "b a"), (4, "a c b")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_occurrences(docs, ["a", "b"]).collect()
    }
    # doc 1 has starts {0, 2}; doc 3 is 'b a' (reversed), doc 4 has a
    # gap — neither matches
    assert got == {1: 2}
    got2 = {
        r["doc_id"]: r["n_occ"]
        for r in phrase_occurrences(docs, ["a", "a"]).collect()
    }
    assert got2 == {2: 2}  # overlapping starts {0, 1} both count


def test_phrase_python_replay(spark):
    """Full corpus replay at sf0.001: python bigram scan must reproduce
    every per-doc occurrence count."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    exp = {}
    for r in spark.read.parquet(f"{sf}/documents.parquet").collect():
        toks = [t for t in r["text"].split(" ") if t]
        c = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "merge" and toks[i + 1] == "sort"
        )
        if c:
            exp[r["doc_id"]] = c
    got = {
        r["doc_id"]: r["n_occ"]
        for r in entrymod.q_phrase_search(spark, sf).collect()
    }
    assert got == exp


# --------------------------------------------------------------------------
# superstep convergence trace (algorithms/cc.cc_trace)
# --------------------------------------------------------------------------


def test_cc_trace_hand_case_and_laws(spark):
    """On a 4-path + isolated pair: n_changed hits zero exactly when
    min-label converges and n_labels is monotone non-increasing, ending
    at the true component count."""
    from combblas_spark.algorithms.cc import cc_trace

    pairs = [(1, 2), (2, 3), (3, 4), (10, 11)]
    e = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs] + [(b, a, 1.0) for a, b in pairs],
        "src long, dst long, w double",
    )
    rows = sorted(
        cc_trace(spark, e, num_iters=5).collect(), key=lambda r: r["iter"]
    )
    changed = [r["n_changed"] for r in rows]
    labels = [r["n_labels"] for r in rows]
    # path 1-2-3-4: label 1 reaches 4 in 3 supersteps; pair in 1
    # (labels after step 1: v2,v1->1, v3->2, v4->3, pair->10 = 4 distinct)
    assert changed == [4, 2, 1, 0, 0]
    assert labels == [4, 3, 2, 2, 2]
    assert all(a >= b for a, b in zip(labels, labels[1:]))


# --------------------------------------------------------------------------
# histogram quantile sketch (functions/sketch.hist_sketch/hist_quantiles)
# --------------------------------------------------------------------------


def test_hist_sketch_hand_case_and_merge(spark):
    """Bin placement (edges clamp into the last bin) and mergeability:
    the sketch of a union equals the bin-wise sum of the parts."""
    from combblas_spark.functions.sketch import hist_sketch

    a = spark.createDataFrame([(v,) for v in [0.0, 1.0, 9.9]], "v double")
    b = spark.createDataFrame(
        [(v,) for v in [5.0, 10.0, 99.0]], "v double"
    )
    # lo=0, hi=10, 4 bins of width 2.5; 10.0 and 99.0 clamp to bin 3
    got_a = {r["bin"]: r["cnt"] for r in hist_sketch(a, "v", 0.0, 10.0, 4).collect()}
    got_b = {r["bin"]: r["cnt"] for r in hist_sketch(b, "v", 0.0, 10.0, 4).collect()}
    assert got_a == {0: 2, 3: 1}
    assert got_b == {2: 1, 3: 2}
    u = hist_sketch(a.unionByName(b), "v", 0.0, 10.0, 4)
    merged = {r["bin"]: r["cnt"] for r in u.collect()}
    assert merged == {
        k: got_a.get(k, 0) + got_b.get(k, 0) for k in set(got_a) | set(got_b)
    }


def test_hist_quantile_error_bounded_by_bin_width(spark):
    """Law over the contract output: every interpolated estimate sits
    within one bin width of the exact order statistic."""
    import __spark_entry__ as entrymod

    rows = entrymod.q_hist_quantiles(spark, "/root/testdata/sf0.001").collect()
    assert {r["pct"] for r in rows} == set(entrymod.HQ_PCTS)
    width = (entrymod.HQ_HI - entrymod.HQ_LO) / entrymod.HQ_BINS
    for r in rows:
        assert abs(r["est"] - r["exact_val"]) <= width


# --------------------------------------------------------------------------
# politeness fetch scheduling (functions/urls.fetch_schedule)
# --------------------------------------------------------------------------


def test_fetch_schedule_hand_case(spark):
    """Serial-queue semantics: per-host ranks follow priority DESC with
    id tiebreak, slots step by the host's own delay, queues never
    interleave."""
    from combblas_spark.functions.urls import fetch_schedule

    frontier = spark.createDataFrame(
        [
            (1, "a", 10),
            (2, "a", 30),
            (3, "a", 30),
            (4, "b", 99),
        ],
        "url_id long, host string, priority long",
    )
    delays = spark.createDataFrame(
        [("a", 1000), ("b", 250)], "host string, delay_ms long"
    )
    got = {
        r["url_id"]: (r["sched_rank"], r["slot_ms"])
        for r in fetch_schedule(frontier, delays).collect()
    }
    # host a: 2 (pri 30, id 2) -> rank 1, 3 -> rank 2, 1 -> rank 3
    assert got[2] == (1, 0)
    assert got[3] == (2, 1000)
    assert got[1] == (3, 2000)
    assert got[4] == (1, 0)


def test_fetch_schedule_politeness_law(spark):
    """Law over the contract output at sf0.001: within every host the
    slot gap between consecutive ranks is exactly the host's delay, and
    no two fetches of a host share a slot."""
    import __spark_entry__ as entrymod

    rows = entrymod.q_fetch_schedule(spark, "/root/testdata/sf0.001").collect()
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(
            (r["sched_rank"], r["slot_ms"])
        )
    for host, q in by_host.items():
        q.sort()
        assert [r for r, _ in q] == list(range(1, len(q) + 1))
        gaps = {b - a for (_, a), (_, b) in zip(q, q[1:])}
        assert len(gaps) == 1  # constant per-host delay
        assert gaps.pop() >= 500


# --------------------------------------------------------------------------
# independent-cascade influence (algorithms/cascade.py)
# --------------------------------------------------------------------------


def test_ic_cascade_python_replay(spark):
    """Full realization replay: python BFS over the same md5-coin live
    subgraph must give the identical (vertex, round) table at sf0.001."""
    import hashlib
    from collections import deque

    import __spark_entry__ as entrymod
    from combblas_spark.sources.graphs import part_supplier_graph

    sf = "/root/testdata/sf0.001"
    e = part_supplier_graph(spark, sf)
    edges = [(r["src"], r["dst"]) for r in e.select("src", "dst").collect()]
    seeds = sorted({s for s, _ in edges})[: entrymod.IC_SEEDS]

    def coin(u, v):
        h = int(
            hashlib.md5(f"ic|{u}|{v}".encode()).hexdigest()[:15], 16
        )
        return h % entrymod.IC_P_DEN < entrymod.IC_P_NUM

    adj = {}
    for u, v in edges:
        if coin(u, v):
            adj.setdefault(u, []).append(v)
    dist = {s: 0 for s in seeds}
    dq = deque(seeds)
    while dq:
        u = dq.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                dq.append(v)
    got = {
        r["id"]: r["round"]
        for r in entrymod.q_ic_cascade(spark, sf).collect()
    }
    assert got == dist


def test_ic_cascade_monotone_in_p(spark):
    """Live-edge law: a realization at higher p activates a superset of
    vertices (same salt -> coin sets are nested: h%100 < 15 implies
    h%100 < 60)."""
    from combblas_spark.algorithms.cascade import ic_cascade
    from combblas_spark.sources.graphs import part_supplier_graph

    e = part_supplier_graph(spark, "/root/testdata/sf0.001")
    seeds = [
        r["src"] for r in e.select("src").distinct().orderBy("src").limit(2).collect()
    ]
    lo = {r["id"] for r in ic_cascade(spark, e, seeds, 15, 100).collect()}
    hi = {r["id"] for r in ic_cascade(spark, e, seeds, 60, 100).collect()}
    assert lo <= hi
    assert len(hi) > len(lo)


# --------------------------------------------------------------------------
# burst detection (functions/sessions.burst_days)
# --------------------------------------------------------------------------


def test_burst_days_hand_case(spark):
    """Hand series: a 10x spike after steady history bursts; the first
    days (insufficient trail) and the steady days never do; the spike
    itself then inflates the next days' trailing sum."""
    from combblas_spark.functions.sessions import burst_days

    series = spark.createDataFrame(
        [("k", t, c) for t, c in [(1, 5), (2, 5), (3, 5), (4, 5), (5, 50), (6, 5)]],
        "key string, t long, cnt long",
    )
    got = {
        r["t"]: (r["trail_sum"], r["trail_n"], r["is_burst"])
        for r in burst_days(series).collect()
    }
    assert got[1] == (0, 0, False)  # no history
    assert got[3] == (10, 2, False)  # trail_n < min_trail
    assert got[4] == (15, 3, False)  # 5*3 = 15 not > 3*15
    assert got[5] == (20, 4, True)  # 50*4 = 200 > 3*20
    assert got[6] == (70, 5, False)  # 5*5 < 3*70


def test_bursts_planted_spikes_flag(spark):
    """Contract fixture: exactly the two planted click spikes burst at
    sf0.001 (uniform ~7/day background cannot triple its trailing
    mean)."""
    import __spark_entry__ as entrymod

    rows = entrymod.q_bursts(spark, "/root/testdata/sf0.001").collect()
    flagged = {(r["key"], r["t"]) for r in rows if r["is_burst"]}
    assert flagged == {("click", 10), ("click", 20)}


# --------------------------------------------------------------------------
# KWIC snippets + Hamilton apportionment
# --------------------------------------------------------------------------


def test_kwic_hand_cases(spark):
    """Window clamping at both document edges, first-occurrence
    semantics, absent-term drop."""
    from combblas_spark.functions.text import kwic_snippets

    docs = spark.createDataFrame(
        [
            (1, "a b c TERM d e f g"),
            (2, "TERM x y z"),
            (3, "p q r s TERM"),
            (4, "TERM m TERM n"),
            (5, "no hit here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["pos"], r["snippet"])
        for r in kwic_snippets(docs, "TERM", radius=2).collect()
    }
    assert got[1] == (4, "b c TERM d e")
    assert got[2] == (1, "TERM x y")  # left-clamped
    assert got[3] == (5, "r s TERM")  # right-clamped
    assert got[4] == (1, "TERM m TERM")  # first occurrence wins
    assert 5 not in got


def test_hamilton_quota_laws(spark):
    """Exactness laws on the contract output: quotas sum to EXACTLY the
    budget and each quota is within 1 of the real-valued share."""
    import __spark_entry__ as entrymod

    rows = entrymod.q_crawl_budget(spark, "/root/testdata/sf0.001").collect()
    total_score = sum(r["score"] for r in rows)
    assert sum(r["quota"] for r in rows) == entrymod.HAM_BUDGET
    for r in rows:
        share = entrymod.HAM_BUDGET * r["score"] / total_score
        assert share - 1 < r["quota"] < share + 1


def test_hamilton_hand_case(spark):
    """Equal scores over budget 10: floors 3,3,3 leave one unit, which
    the remainder tie sends to the smallest key."""
    from combblas_spark.functions.sampling import hamilton_quota

    s = spark.createDataFrame(
        [("a", 1), ("b", 1), ("c", 1)], "key string, score long"
    )
    got = {
        r["key"]: r["quota"] for r in hamilton_quota(s, 10).collect()
    }
    assert got == {"a": 4, "b": 3, "c": 3}


# --------------------------------------------------------------------------
# split-leakage audit
# --------------------------------------------------------------------------


def test_split_leakage_hand_case(spark):
    """Two byte-identical docs placed on opposite sides of the hash
    split must surface as exactly one leaky cluster / one cross pair;
    a unique doc never does."""
    import hashlib

    from combblas_spark.functions.dedup import near_dup_clusters
    from combblas_spark.functions.sampling import split_by_hash

    def split_of(d):
        h = int(hashlib.md5(f"split|{d}".encode()).hexdigest()[:15], 16)
        return "test" if h % 1000 < 100 else "train"

    train_id = next(d for d in range(1000) if split_of(d) == "train")
    test_id = next(d for d in range(1000) if split_of(d) == "test")
    other = next(
        d for d in range(1000) if d not in (train_id, test_id)
    )
    dup = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (train_id, dup),
            (test_id, dup),
            (other, "completely different words nothing shared here at all"),
        ],
        "doc_id long, text string",
    )
    cl = near_dup_clusters(docs, k=3, num_hashes=4, bands=2, rows_per_band=2)
    sp = split_by_hash(docs, test_permille=100).select("doc_id", "split")
    per = (
        cl.join(sp, "doc_id")
        .groupBy("canonical_id")
        .agg(
            F.sum((F.col("split") == "train").cast("int")).alias("a"),
            F.sum((F.col("split") == "test").cast("int")).alias("b"),
        )
    )
    leaky = [r for r in per.collect() if r["a"] > 0 and r["b"] > 0]
    assert len(leaky) == 1
    assert leaky[0]["a"] == 1 and leaky[0]["b"] == 1


def test_proximity_hand_case(spark):
    """Either-order window semantics with overlap counting: 'x . . y'
    gap 3 passes max_gap 3; 'y x' gap 1; a doc with min gap 5 drops."""
    from combblas_spark.functions.text import proximity_pairs

    docs = spark.createDataFrame(
        [
            (1, "x a b y"),
            (2, "y x"),
            (3, "x a b c d y"),
            (4, "x only"),
            (5, "x y a x"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["min_gap"], r["n_pairs_within"])
        for r in proximity_pairs(docs, "x", "y", max_gap=3).collect()
    }
    # doc 5: x@0,x@3, y@1 -> gaps {1, 2}, both within
    assert got == {1: (3, 1), 2: (1, 1), 5: (1, 2)}


# --------------------------------------------------------------------------
# triangular-solve level scheduling (algorithms/ordering.level_schedule)
# --------------------------------------------------------------------------


def test_level_schedule_hand_case(spark):
    """Diamond + tail DAG: level = longest chain, not shortest (the
    diamond's join node takes the 2-long arm), independent roots stay
    at level 0."""
    from combblas_spark.algorithms.ordering import level_schedule

    # 1 -> 2 -> 4, 1 -> 4 (diamond), 4 -> 5; root 9 -> 5 as well
    e = spark.createDataFrame(
        [(1, 2), (2, 4), (1, 4), (4, 5), (9, 5)],
        "src long, dst long",
    )
    got = {
        r["id"]: r["level"]
        for r in level_schedule(spark, e, max_iter=10).collect()
    }
    assert got == {1: 0, 9: 0, 2: 1, 4: 2, 5: 3}


def test_level_schedule_cycle_raises(spark):
    """Cycles make level sets undefined: the fixpoint never arrives and
    the loop must raise rather than return truncated levels."""
    import pytest as _pytest

    from combblas_spark.algorithms.ordering import level_schedule

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="cycle|fixpoint|max_iter"):
        level_schedule(spark, e, max_iter=6)


def test_level_schedule_is_valid_topological_layering(spark):
    """Law over the contract output at sf0.001: every edge goes to a
    strictly higher level (the wavefront property that makes each level
    safe to execute in parallel)."""
    import hashlib

    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    lv = {
        r["id"]: r["level"]
        for r in entrymod.q_level_schedule(spark, sf).collect()
    }

    def h60(salt, key):
        return int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:15], 16)

    orders = [
        r["o_orderkey"]
        for r in spark.read.parquet(f"{sf}/orders.parquet").collect()
    ]
    for o in orders:
        layer = h60("ll", o) % 11
        s = layer * 83 + h60("ls", o) % 83
        d = (layer + 1) * 83 + h60("ld", o) % 83
        assert lv[d] > lv[s]


# --------------------------------------------------------------------------
# SymSpell fuzzy self-join (functions/dedup.fuzzy_pairs)
# --------------------------------------------------------------------------


def test_fuzzy_pairs_hand_case(spark):
    """Substitution, deletion, insertion and exact-dup all pair at
    dist <= 1; a 2-edit string pairs with nothing."""
    from combblas_spark.functions.dedup import fuzzy_pairs

    rows = [
        (1, "cat"),
        (2, "cut"),   # substitution vs 1
        (3, "ca"),    # deletion vs 1
        (4, "cart"),  # insertion vs 1
        (5, "cat"),   # exact dup of 1
        (6, "dog"),   # 3 edits from everything
    ]
    df = spark.createDataFrame(rows, "key long, s string")
    got = {
        (r["key_a"], r["key_b"]): r["dist"]
        for r in fuzzy_pairs(df).collect()
    }
    assert got == {
        (1, 2): 1,
        (1, 3): 1,
        (1, 4): 1,
        (1, 5): 0,
        (2, 5): 1,
        (3, 5): 1,
        (4, 5): 1,
        # (2,3) 'cut'/'ca' = 2 edits, (3,4) 'ca'/'cart' = 2 edits: absent
    }


def test_fuzzy_pairs_completeness_law(spark):
    """Blocking completeness for d = 1: on a deterministic 120-string
    set, fuzzy_pairs == python brute-force levenshtein over all pairs."""
    import hashlib

    from combblas_spark.functions.dedup import fuzzy_pairs

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    strs = []
    for k in range(120):
        h = hashlib.md5(f"fz|{k}".encode()).hexdigest()
        base = f"w{h[0]}{h[1]}{k % 12}"
        if k % 3 == 1:
            base = base[:-1]          # deletion variant
        elif k % 3 == 2:
            base = base[:2] + "q" + base[3:]  # substitution variant
        strs.append((k, base))
    df = spark.createDataFrame(strs, "key long, s string")
    got = {
        (r["key_a"], r["key_b"], r["dist"])
        for r in fuzzy_pairs(df, max_bucket=1000).collect()
    }
    want = {
        (a, b, lev(sa, sb))
        for (a, sa) in strs
        for (b, sb) in strs
        if a < b and lev(sa, sb) <= 1
    }
    assert got == want and len(want) > 0


def test_fuzzy_pairs_bucket_cap_drops_stop_fragments(spark):
    """A signature shared by > max_bucket strings is dropped before the
    join (the documented false-negative source): 70 strings '<c>zz'
    pairwise differ only in the first character, so every pair's ONLY
    shared signature is the deletion fragment 'zz' — a 70-string bucket
    that max_bucket=64 kills entirely while a loose cap finds all
    C(70,2) substitution pairs."""
    from combblas_spark.functions.dedup import fuzzy_pairs

    df = spark.createDataFrame(
        [(k, chr(48 + k) + "zz") for k in range(70)],
        "key long, s string",
    )
    loose = fuzzy_pairs(df, max_bucket=1000).count()
    tight = fuzzy_pairs(df, max_bucket=64).count()
    assert loose == 70 * 69 // 2
    assert tight == 0


# --------------------------------------------------------------------------
# A-ES weighted reservoir sample (functions/sampling.reservoir_sample)
# --------------------------------------------------------------------------


def test_reservoir_sample_python_replay(spark):
    """Exact selection replay: the k winners and their ranks equal the
    python A-ES computation with the same md5-60bit draws."""
    import hashlib
    import math

    from combblas_spark.functions.sampling import reservoir_sample

    rows = [(k, k % 7 + 1) for k in range(500)]
    df = spark.createDataFrame(rows, "key long, w long")
    got = [
        (r["key"], r["w"], r["prio"], r["rank"])
        for r in reservoir_sample(df, 50, "w")
        .orderBy("rank")
        .collect()
    ]

    def prio(k, w):
        h = int(hashlib.md5(f"res|{k}".encode()).hexdigest()[:15], 16)
        return round(math.log((h + 1) / float(1 << 60)) / w, 6) + 0.0

    want = sorted(
        ((k, w, prio(k, w)) for k, w in rows),
        key=lambda t: (-t[2], t[0]),
    )[:50]
    assert got == [
        (k, w, p, i + 1) for i, (k, w, p) in enumerate(want)
    ]


def test_reservoir_sample_partition_invariance(spark):
    """The selected set is a pure function of (salt, keys, weights):
    identical across input partitionings."""
    from combblas_spark.functions.sampling import reservoir_sample

    rows = [(k, k % 5 + 1) for k in range(300)]
    a = spark.createDataFrame(rows, "key long, w long").repartition(1)
    b = spark.createDataFrame(rows, "key long, w long").repartition(13)
    ra = [tuple(r) for r in reservoir_sample(a, 40, "w").orderBy("rank").collect()]
    rb = [tuple(r) for r in reservoir_sample(b, 40, "w").orderBy("rank").collect()]
    assert ra == rb and len(ra) == 40


def test_reservoir_sample_nonpositive_weight_raises(spark):
    """Weights must be >= 1: a zero weight raises at execution time
    instead of silently skewing the draw."""
    import pytest as _pytest

    from combblas_spark.functions.sampling import reservoir_sample

    df = spark.createDataFrame(
        [(1, 3), (2, 0)], "key long, w long"
    )
    with _pytest.raises(Exception, match="nonpositive weight"):
        reservoir_sample(df, 2, "w").collect()


# --------------------------------------------------------------------------
# DAG path counting (algorithms/ordering.path_count)
# --------------------------------------------------------------------------


def test_path_count_hand_case(spark):
    """Diamond: the join vertex multiplies (2 paths), downstream
    inherits the product; an independent extra root adds additively;
    roots count their own empty path."""
    from combblas_spark.algorithms.ordering import path_count

    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5), (9, 5)],
        "src long, dst long",
    )
    got = {
        r["id"]: r["n_paths"]
        for r in path_count(spark, e, max_iter=10).collect()
    }
    assert got == {1: 1, 9: 1, 2: 1, 3: 1, 4: 2, 5: 3}


def test_path_count_cycle_raises(spark):
    """A root-reachable cycle never drains the frontier: path counts
    are infinite, so the kernel must raise rather than return truncated
    counts. A ROOT-LESS cycle has no root paths at all — empty output,
    not an error (nothing is reachable from a root)."""
    import pytest as _pytest

    from combblas_spark.algorithms.ordering import path_count

    rooted = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="cycle|drained|max_iter"):
        path_count(spark, rooted, max_iter=6)

    rootless = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "src long, dst long"
    )
    assert path_count(spark, rootless, max_iter=6).count() == 0


def test_path_count_recurrence_law(spark):
    """Defining recurrence on the contract output at sf0.001: roots
    count exactly 1 and every non-root's count equals the sum of its
    in-neighbors' counts — with the DAG property this pins the unique
    correct fixpoint."""
    import hashlib
    from collections import defaultdict

    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    got = {
        r["id"]: r["n_paths"]
        for r in entrymod.q_path_count(spark, sf).collect()
    }

    def h60(salt, key):
        return int(hashlib.md5(f"{salt}|{key}".encode()).hexdigest()[:15], 16)

    gs = {
        r["o_orderkey"] % 2000
        for r in spark.read.parquet(f"{sf}/orders.parquet").collect()
    }
    edges = set()
    for g in gs:
        layer = h60("pl", g) % 11
        edges.add((layer * 83 + h60("ps", g) % 83,
                   (layer + 1) * 83 + h60("pd", g) % 83))
    preds = defaultdict(list)
    dsts = {d for _, d in edges}
    for s, d in edges:
        preds[d].append(s)
    for v, n in got.items():
        if v not in dsts:
            assert n == 1
        else:
            assert n == sum(got[s] for s in preds[v])
    # every reachable vertex is present
    assert {s for s, _ in edges if s not in dsts} <= set(got)


# --------------------------------------------------------------------------
# crawler-trap audit (functions/urls.trap_signals)
# --------------------------------------------------------------------------


def test_trap_signals_hand_case(spark):
    """Loop detection (s[i] = s[i-2]), depth counting with messy
    slashes, the depth-guard on short paths, and the 1/3-ratio flag."""
    from combblas_spark.functions.urls import trap_signals

    rows = [
        ("t.com", "/a/b/a/b/a"),      # loopy, depth 5
        ("t.com", "/a/b/a"),          # loopy, depth 3
        ("t.com", "/x/y/z"),          # clean
        ("n.com", "/p1/p2//p3/"),     # depth 3 (empty segs dropped)
        ("n.com", "/"),               # depth 0, must not error
        ("n.com", "/q0/q1/q2/q3/q4/q5/q6/q7/q8"),  # depth 9 > 8: deep
        ("n.com", "/one/two"),
        ("n.com", "/solo"),
        ("n.com", "/cat3/item7"),
        ("n.com", "/cat4/item9"),
    ]
    df = spark.createDataFrame(rows, "host string, path string")
    got = {
        r["host"]: (
            r["n_urls"], r["n_loopy"], r["n_deep"],
            r["max_depth"], r["is_trap"],
        )
        for r in trap_signals(df, depth_limit=8).collect()
    }
    assert got == {
        "t.com": (3, 2, 0, 5, True),   # 3*2 >= 3
        "n.com": (7, 0, 1, 9, False),  # 3*1 < 7
    }


# --------------------------------------------------------------------------
# Dunning LLR co-occurrence (functions/sessions.llr_pairs)
# --------------------------------------------------------------------------


def test_llr_pairs_hand_case(spark):
    """Hand 2x2 table vs python-computed G^2, and the independence
    table scoring EXACTLY zero (its llr term cancels analytically)."""
    import math

    from combblas_spark.functions.sessions import llr_pairs

    # A: u1,u2,u3  B: u1,u2,u4  -> k11=2 k12=1 k21=1 k22=1 (N=5: u5 C-only)
    rows = [
        (1, "A"), (2, "A"), (3, "A"),
        (1, "B"), (2, "B"), (4, "B"),
        (5, "C"),
        # independence block: D/E over the same 5 users
        # D: u1..u4 (4), E: u1,u2,u5? -> keep simple below
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    got = {
        (r["type_a"], r["type_b"]): (
            r["k11"], r["k12"], r["k21"], r["k22"], r["llr"]
        )
        for r in llr_pairs(df).collect()
    }

    def s(x):
        return x * math.log(x) if x > 0 else 0.0

    def llr(k11, k12, k21, k22):
        na, nb, n = k11 + k12, k11 + k21, k11 + k12 + k21 + k22
        return round(2.0 * (s(k11) + s(k12) + s(k21) + s(k22)
                            - s(na) - s(n - na) - s(nb) - s(n - nb)
                            + s(n)), 6) + 0.0

    assert got[("A", "B")] == (2, 1, 1, 1, llr(2, 1, 1, 1))
    # co-occurrence pairs only: (A, C) never share a user -> absent
    assert ("A", "C") not in got


def test_llr_independence_scores_zero(spark):
    """A perfectly independent 2x2 (1,1,1,1) must score llr = 0.0 (and
    normalize away -0.0 so both engines hash identically)."""
    from combblas_spark.functions.sessions import llr_pairs

    # user 4 carries only C, putting one user in the neither-A-nor-B
    # cell: table (1,1,1,1) with N = 4
    rows = [(1, "A"), (1, "B"), (2, "A"), (3, "B"), (4, "C")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    [r] = llr_pairs(df).filter("type_a = 'A' AND type_b = 'B'").collect()
    assert (r["k11"], r["k12"], r["k21"], r["k22"]) == (1, 1, 1, 1)
    assert r["llr"] == 0.0 and str(r["llr"]) == "0.0"


# --------------------------------------------------------------------------
# KMV bottom-k Jaccard (functions/sketch.kmv_jaccard)
# --------------------------------------------------------------------------


def test_kmv_jaccard_exact_regime(spark):
    """Unions under k: the sketch degenerates to the exact Jaccard of
    every pair."""
    from combblas_spark.functions.sketch import kmv_jaccard

    rows = (
        [("a", m) for m in range(0, 30)]
        + [("b", m) for m in range(15, 45)]   # |a^b|=15 |aub|=45
        + [("c", m) for m in range(100, 110)]  # disjoint
    )
    df = spark.createDataFrame(rows, "grp string, member long")
    got = {
        (r["grp_a"], r["grp_b"]): (r["n_kmv"], r["n_shared"], r["jacc_est"])
        for r in kmv_jaccard(df, k=1000).collect()
    }
    assert got[("a", "b")] == (45, 15, round(15 / 45, 6))
    assert got[("a", "c")] == (40, 0, 0.0)
    assert got[("b", "c")] == (40, 0, 0.0)


def test_kmv_jaccard_sketch_regime_python_replay(spark):
    """Truncating k: the estimate equals the python bottom-k replay
    with the same md5 draws, and is partition-invariant."""
    import hashlib

    from combblas_spark.functions.sketch import kmv_jaccard

    a = set(range(0, 150))
    b = set(range(100, 260))
    rows = [("a", m) for m in a] + [("b", m) for m in b]
    k = 32

    def h(m):
        return int(hashlib.md5(f"kj|{m}".encode()).hexdigest()[:15], 16)

    union = sorted(a | b, key=lambda m: (h(m), m))[:k]
    n_shared = sum(1 for m in union if m in a and m in b)
    want = (k, n_shared, round(n_shared / k, 6) + 0.0)

    for parts in (1, 7):
        df = spark.createDataFrame(
            rows, "grp string, member long"
        ).repartition(parts)
        [r] = kmv_jaccard(df, k=k).collect()
        assert (r["n_kmv"], r["n_shared"], r["jacc_est"]) == want


# --------------------------------------------------------------------------
# bond-percolation robustness (algorithms/stats.percolation_profile)
# --------------------------------------------------------------------------


def test_percolation_profile_python_replay(spark):
    """Full union-find replay with the same md5 coins on a two-cluster
    bridge graph, plus the nesting law (keep sets nest upward in p, so
    n_edges and gcc_size are monotone along the curve)."""
    import hashlib

    from combblas_spark.algorithms.stats import percolation_profile

    edges = [(i, i + 1) for i in range(0, 9)] + [
        (20, 21), (21, 22), (22, 20), (9, 20),  # bridge 9-20
        (2, 1), (5, 5),  # reverse dup + self loop: both must be ignored
    ]
    df = spark.createDataFrame(
        [(s, d, 1.0) for s, d in edges], "src long, dst long, w double"
    )
    levels = (200, 500, 900)
    got = {
        r["p_permille"]: (
            r["n_edges"], r["n_vertices"], r["gcc_size"], r["n_components"]
        )
        for r in percolation_profile(spark, df, levels=levels).collect()
    }

    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}

    def coin(a, b):
        h = hashlib.md5(f"rb|{a}|{b}".encode()).hexdigest()
        return int(h[:15], 16) % 1000

    for p in levels:
        keep = [(a, b) for a, b in und if coin(a, b) < p]
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in keep:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comps = {}
        for v in {v for e in keep for v in e}:
            comps.setdefault(find(v), set()).add(v)
        want = (
            len(keep),
            sum(len(c) for c in comps.values()),
            max((len(c) for c in comps.values()), default=None),
            len(comps),
        )
        assert got[p] == want
    # nesting law
    ps = sorted(levels)
    for lo, hi in zip(ps, ps[1:]):
        assert got[lo][0] <= got[hi][0] and got[lo][2] <= got[hi][2]


# --------------------------------------------------------------------------
# ranking drift (algorithms/stats.rank_correlation)
# --------------------------------------------------------------------------


def test_rank_correlation_identity_and_reversal(spark):
    """Identical rankings score exactly 1.0; an exact reversal scores
    exactly -1.0 (sum_d2 = n(n^2-1)/3); disjoint-id rows drop into n."""
    from combblas_spark.algorithms.stats import rank_correlation

    n = 40
    a = spark.createDataFrame(
        [(i, float(n - i)) for i in range(n)], "id long, val double"
    )
    [r] = rank_correlation(a, a, k=10).collect()
    assert (r["n"], r["sum_d2"], r["topk_overlap"], r["spearman"]) == (
        n, 0, 10, 1.0,
    )

    rev = spark.createDataFrame(
        [(i, float(i)) for i in range(n)], "id long, val double"
    )
    [r] = rank_correlation(a, rev, k=10).collect()
    assert r["sum_d2"] == n * (n * n - 1) // 3
    assert r["spearman"] == -1.0 and r["topk_overlap"] == 0

    # id present in only one ranking drops out of the audit, n discloses
    extra = spark.createDataFrame(
        [(i, float(n - i)) for i in range(n + 5)], "id long, val double"
    )
    [r] = rank_correlation(a, extra, k=10).collect()
    assert r["n"] == n and r["spearman"] == 1.0


# --------------------------------------------------------------------------
# DOULION sampled triangles (algorithms/triangles.doulion_estimate)
# --------------------------------------------------------------------------


def test_doulion_full_retention_is_exact_and_replay(spark):
    """p=1000 keeps everything (estimate == exact, scale 1); p=500 must
    equal the python brute-force count over the md5-kept edge set; a
    non-divisor p raises."""
    import hashlib
    from itertools import combinations

    import pytest as _pytest

    from combblas_spark.algorithms.triangles import doulion_estimate

    verts = list(range(8))
    und = list(combinations(verts, 2))  # K8: C(8,3)=56 triangles
    df = spark.createDataFrame(
        [(a, b, 1.0) for a, b in und], "src long, dst long, w double"
    )
    [r] = doulion_estimate(df, p_permille=1000).collect()
    assert (r["n_edges_kept"], r["n_tri_sampled"],
            r["est_triangles"], r["n_tri_exact"]) == (28, 56, 56, 56)

    def coin(a, b):
        h = hashlib.md5(f"dl|{a}|{b}".encode()).hexdigest()
        return int(h[:15], 16) % 1000

    keep = {(a, b) for a, b in und if coin(a, b) < 500}
    tri = sum(
        1
        for x, y, z in combinations(verts, 3)
        if (x, y) in keep and (y, z) in keep and (x, z) in keep
    )
    [r] = doulion_estimate(df, p_permille=500).collect()
    assert (r["n_edges_kept"], r["n_tri_sampled"], r["est_triangles"]) == (
        len(keep), tri, 8 * tri,
    )
    assert r["n_tri_exact"] == 56

    with _pytest.raises(ValueError, match="divisor"):
        doulion_estimate(df, p_permille=300)


# --------------------------------------------------------------------------
# widest path / MAX_MIN bottleneck (algorithms/sssp.widest_path)
# --------------------------------------------------------------------------


def test_widest_path_hand_case(spark):
    """Bottleneck beats shortness: the 2-hop wide route (capacity 5)
    must win over the direct thin edge (capacity 2); unreachable
    vertices stay absent; the source carries the finite inf stand-in."""
    from combblas_spark.algorithms.sssp import WIDEST_SOURCE_CAP, widest_path

    e = spark.createDataFrame(
        [
            (1, 4, 2.0),          # direct but thin
            (1, 2, 9.0), (2, 4, 5.0),   # wide detour: bottleneck 5
            (4, 5, 3.0),
            (8, 9, 7.0),          # disconnected from source
        ],
        "src long, dst long, w double",
    )
    got = {
        r["id"]: r["val"] for r in widest_path(spark, e, source=1).collect()
    }
    assert got == {1: WIDEST_SOURCE_CAP, 2: 9.0, 4: 5.0, 5: 3.0}


def test_widest_path_monotone_law(spark):
    """Law on the contract output at sf0.001: for every edge (s,d),
    cap[d] >= LEAST(cap[s], w) (relaxation fixpoint), and every
    non-source capacity is achieved by some in-edge."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    cap = {
        r["id"]: r["val"] for r in entrymod.q_widest_ps(spark, sf).collect()
    }
    e = entrymod.part_supplier_graph(spark, sf).collect()
    src0 = min(r["src"] for r in e)
    achieved = {src0}
    for r in e:
        s, d, w = r["src"], r["dst"], r["w"]
        if s in cap and d in cap:
            assert cap[d] >= min(cap[s], w)
            if cap[d] == min(cap[s], w):
                achieved.add(d)
    assert achieved == set(cap)


def test_reservoir_sample_growth_stability(spark):
    """Growth law from the A-ES docstring: adding one new row never
    reorders surviving rows (priorities are per-key pure functions);
    the selected set changes by at most one displacement."""
    from combblas_spark.functions.sampling import reservoir_sample

    base = [(k, k % 3 + 1) for k in range(120)]
    df0 = spark.createDataFrame(base, "key long, w long")
    df1 = spark.createDataFrame(base + [(999, 3)], "key long, w long")
    s0 = [r["key"] for r in reservoir_sample(df0, 30, "w").orderBy("rank").collect()]
    s1 = [r["key"] for r in reservoir_sample(df1, 30, "w").orderBy("rank").collect()]
    assert len(set(s0) - set(s1)) <= 1
    # survivors keep their relative order
    surv = [k for k in s0 if k in set(s1)]
    assert [k for k in s1 if k in set(s0)] == surv


# --------------------------------------------------------------------------
# interval-overlap join (operators/interval.overlap_join)
# --------------------------------------------------------------------------


def test_overlap_join_exactly_once_and_edges(spark):
    """Two long intervals sharing MANY grid cells must pair exactly
    once (canonical-cell dedup, no distinct); touching endpoints count
    (inclusive); disjoint and cross-key pairs do not; an over-long
    interval raises at execution."""
    import pytest as _pytest

    from combblas_spark.operators.interval import overlap_join

    left = spark.createDataFrame(
        [
            (1, 10, 0, 1000),     # spans cells 0..10 at bucket=100
            (1, 11, 2000, 2100),
            (1, 12, 3000, 3050),
            (2, 20, 0, 1000),     # other key: must not pair with key 1
        ],
        "k long, lid long, ls long, le long",
    )
    right = spark.createDataFrame(
        [
            (1, 50, 500, 1500),   # overlaps lid=10 over cells 5..10
            (1, 51, 1000, 1100),  # touches lid=10 at exactly 1000
            (1, 52, 2101, 2200),  # adjacent but NOT touching lid=11
        ],
        "k long, rid long, rs long, re long",
    )
    got = sorted(
        (r["lid"], r["rid"])
        for r in overlap_join(
            left, right, key="k", l_start="ls", l_end="le",
            r_start="rs", r_end="re", bucket=100,
        ).collect()
    )
    assert got == [(10, 50), (10, 51)]

    bad = spark.createDataFrame(
        [(1, 9, 0, 100_000)], "k long, rid long, rs long, re long"
    )
    with _pytest.raises(Exception, match="overlap_join"):
        overlap_join(
            left.select("k", "lid", "ls", "le"), bad, key="k",
            l_start="ls", l_end="le", r_start="rs", r_end="re",
            bucket=100,
        ).collect()


def test_overlap_join_brute_force_law(spark):
    """Random-ish deterministic fixture vs the O(n^2) predicate join."""
    import hashlib

    from combblas_spark.operators.interval import overlap_join

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    L = [(h(f"k{i}") % 3, i, h(f"a{i}") % 500, 0) for i in range(40)]
    L = [(k, i, s, s + h(f"l{i}") % 300) for k, i, s, _ in L]
    R = [(h(f"K{i}") % 3, 100 + i, h(f"b{i}") % 500, 0) for i in range(40)]
    R = [(k, i, s, s + h(f"r{i}") % 300) for k, i, s, _ in R]
    lf = spark.createDataFrame(L, "k long, lid long, ls long, le long")
    rf = spark.createDataFrame(R, "k long, rid long, rs long, re long")
    got = sorted(
        (r["lid"], r["rid"])
        for r in overlap_join(
            lf, rf, key="k", l_start="ls", l_end="le",
            r_start="rs", r_end="re", bucket=64,
        ).collect()
    )
    want = sorted(
        (li, ri)
        for (lk, li, ls, le) in L
        for (rk, ri, rs, re) in R
        if lk == rk and ls <= re and rs <= le
    )
    assert got == want and len(want) > 0


# --------------------------------------------------------------------------
# targeted-attack robustness (algorithms/stats.attack_profile)
# --------------------------------------------------------------------------


def test_attack_profile_python_replay(spark):
    """Union-find replay after deterministic hub removal on a star+ring
    graph: removing the star center shatters the leaves while the ring
    survives; removing enough hubs collapses to all-zero (coalesced,
    not null)."""
    from combblas_spark.algorithms.stats import attack_profile

    edges = (
        [(0, i, 1.0) for i in range(1, 8)]          # star center 0, 7 leaves
        + [(10, 11, 1.0), (11, 12, 1.0), (12, 10, 1.0)]  # ring
    )
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    got = {
        r["n_removed"]: (
            r["n_edges"], r["n_vertices"], r["gcc_size"], r["n_components"]
        )
        for r in attack_profile(spark, df, levels=(0, 1, 11)).collect()
    }
    # n=1 removes vertex 0 (deg 7): leaves isolate (no edges), ring stays
    assert got[0] == (10, 11, 8, 2)
    assert got[1] == (3, 3, 3, 1)
    # n=11 removes every vertex: total collapse reads zeros
    assert got[11] == (0, 0, 0, 0)


# --------------------------------------------------------------------------
# per-group reservoir (functions/sampling.grouped_reservoir)
# --------------------------------------------------------------------------


def test_grouped_reservoir_python_replay(spark):
    """Per-group A-ES replay: each group's k winners and ranks equal
    the python computation; groups smaller than k keep everything."""
    import hashlib
    import math

    from combblas_spark.functions.sampling import grouped_reservoir

    rows = [(f"g{k % 4}", k, k % 6 + 1) for k in range(200)] + [
        ("tiny", 900, 3), ("tiny", 901, 1)
    ]
    df = spark.createDataFrame(rows, "grp string, key long, w long")
    got = {}
    for r in grouped_reservoir(df, 10, "w").collect():
        got.setdefault(r["grp"], []).append(
            (r["rank"], r["key"], r["w"], r["prio"])
        )

    def prio(k, w):
        h = int(hashlib.md5(f"gres|{k}".encode()).hexdigest()[:15], 16)
        return round(math.log((h + 1) / float(1 << 60)) / w, 6) + 0.0

    for g in {g for g, _, _ in rows}:
        members = [(k, w) for gg, k, w in rows if gg == g]
        want = sorted(
            ((k, w, prio(k, w)) for k, w in members),
            key=lambda t: (-t[2], t[0]),
        )[:10]
        assert sorted(got[g]) == [
            (i + 1, k, w, p) for i, (k, w, p) in enumerate(want)
        ]
    assert len(got["tiny"]) == 2


# --------------------------------------------------------------------------
# lakehouse plane: skew_join / zorder / cdc_apply
# --------------------------------------------------------------------------


def test_skew_join_equals_plain_join(spark):
    """The salt only routes rows: on a pathologically skewed fact (one
    hot key carrying 90% of rows) the salted join's result must equal
    the plain join exactly, for inner and left, any n_salt."""
    from combblas_spark.operators.skew import skew_join

    fact = spark.createDataFrame(
        [(1, i, i * 10) for i in range(90)]
        + [(2, 1000 + i, i) for i in range(8)]
        + [(99, 2000, 5)],  # no dim match
        "k long, rid long, v long",
    )
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "unused")], "k long, name string"
    )
    for how in ("inner", "left"):
        want = sorted(
            tuple(r) for r in fact.join(dim, "k", how).collect()
        )
        for n in (1, 4, 16):
            got = sorted(
                tuple(r)
                for r in skew_join(
                    fact, dim, key="k", salt_col="rid", n_salt=n, how=how
                ).collect()
            )
            assert got == want

    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner/left"):
        skew_join(fact, dim, key="k", salt_col="rid", how="outer")


def test_zorder_key_hand_interleave_and_range_guard(spark):
    """Bit-interleave against hand-computed Morton codes; out-of-range
    input raises at execution instead of aliasing."""
    import pyspark.sql.functions as SF
    import pytest as _pytest

    from combblas_spark.operators.layout import zorder_key

    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 3), (255, 255)],
        "x long, y long",
    )
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select(
            "x", "y", zorder_key(SF.col("x"), SF.col("y"), bits=8).alias("z")
        ).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x, y in got}
    bad = spark.createDataFrame([(256, 0)], "x long, y long")
    with _pytest.raises(Exception, match="zorder_key"):
        bad.select(zorder_key(SF.col("x"), SF.col("y"), bits=8)).collect()


def test_locality_audit_z_beats_row_sort_on_sparse_points(spark):
    """On a COMPLETE grid both walks tie (unit steps everywhere), so
    the audit is exercised where layout actually matters: a sparse
    hash-selected point set, where the x-then-y sort pays a full
    y-range jump at every x wrap while the Z walk stays block-local.
    Also pins the complete-grid tie as a hand-checkable total."""
    import hashlib

    from combblas_spark.operators.layout import locality_audit

    full = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x long, y long"
    )
    [r] = locality_audit(full, bits=5).collect()
    assert r["n_rows"] == 1024
    # row-major: 31 unit steps per column sweep + 31 wrap jumps of 31
    assert r["row_total_manhattan"] == 1023 * 1 + 31 * 31
    assert r["z_total_manhattan"] == r["row_total_manhattan"]  # the tie

    sparse = [
        (x, y)
        for x in range(64)
        for y in range(64)
        if int(hashlib.md5(f"zt|{x}|{y}".encode()).hexdigest()[:8], 16) % 5
        == 0
    ]
    df = spark.createDataFrame(sparse, "x long, y long")
    [r] = locality_audit(df, bits=6).collect()
    assert r["n_rows"] == len(sparse)
    assert r["z_total_manhattan"] < r["row_total_manhattan"]


def test_cdc_apply_hand_case(spark):
    """Update wins over snapshot, delete removes, post-delete update
    resurrects, untouched keys keep version 0, malformed op raises."""
    import pytest as _pytest

    from combblas_spark.functions.cdc import cdc_apply

    snap = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30), (4, 40)], "key long, vm long"
    )
    ch = spark.createDataFrame(
        [
            (1, 1, "u", 11),       # plain update
            (2, 1, "d", None),     # delete
            (3, 1, "d", None), (3, 2, "u", 33),  # delete then resurrect
        ],
        "key long, version long, op string, vm long",
    )
    got = {
        r["key"]: (r["vm"], r["last_version"])
        for r in cdc_apply(snap, ch).collect()
    }
    assert got == {1: (11, 1), 3: (33, 2), 4: (40, 0)}

    bad = spark.createDataFrame(
        [(1, 1, "x", 5)], "key long, version long, op string, vm long"
    )
    with _pytest.raises(Exception, match="cdc_apply"):
        cdc_apply(snap, bad).collect()


# --------------------------------------------------------------------------
# most-reliable path (algorithms/sssp.reliability_path)
# --------------------------------------------------------------------------


def test_reliability_path_hand_case(spark):
    """Max product beats fewest hops: the 2-hop 0.9*0.9 = 0.81 route
    must win over the direct 0.5 edge; out-of-range probabilities
    raise at execution."""
    import pytest as _pytest

    from combblas_spark.algorithms.sssp import reliability_path

    e = spark.createDataFrame(
        [
            (1, 4, 0.5),
            (1, 2, 0.9), (2, 4, 0.9),
            (4, 5, 1.0),
        ],
        "src long, dst long, w double",
    )
    got = {
        r["id"]: round(r["val"], 6)
        for r in reliability_path(spark, e, source=1).collect()
    }
    assert got == {1: 1.0, 2: 0.9, 4: 0.81, 5: 0.81}

    bad = spark.createDataFrame([(1, 2, 1.5)], "src long, dst long, w double")
    with _pytest.raises(Exception, match="reliability_path"):
        reliability_path(spark, bad, source=1, num_iters=1).collect()


def test_condensation_levels_law(spark):
    """Laws on the contract output at sf0.001: level_schedule did not
    raise (the condensation is acyclic — an SCC-correctness canary),
    and every quotient edge strictly climbs levels."""
    import __spark_entry__ as entrymod

    sf = "/root/testdata/sf0.001"
    lv = {
        r["id"]: r["level"]
        for r in entrymod.q_condensation(spark, sf).collect()
    }
    from combblas_spark.algorithms.scc import scc
    import pyspark.sql.functions as SF

    e = entrymod.events_digraph(spark, sf).select("src", "dst")
    lab = {r["id"]: r["scc_id"] for r in scc(spark, e).collect()}
    qedges = {
        (lab[r["src"]], lab[r["dst"]])
        for r in e.collect()
        if lab[r["src"]] != lab[r["dst"]]
    }
    assert len(lv) > 0
    for s, d in qedges:
        assert lv[d] > lv[s]


# --------------------------------------------------------------------------
# HLL rollup mergeability + split healing
# --------------------------------------------------------------------------


def test_hll_rollup_merge_equals_direct(spark):
    """Theorem check on data: MAX-merging per-fine register planes
    scores exactly the directly-built group sketch (merge_consistent=1
    for every group), and the merged estimate equals hll_distinct's on
    the same rows."""
    import pyspark.sql.functions as SF

    from combblas_spark.functions.sketch import hll_distinct, hll_rollup

    rows = [
        (f"g{v % 3}", f"d{v % 7}", str(v * 13 % 500)) for v in range(900)
    ]
    df = spark.createDataFrame(rows, "grp string, f string, v string")
    roll = {
        r["grp"]: (r["hll_est"], r["merge_consistent"], r["n_fine"])
        for r in hll_rollup(df, "grp", "f", SF.col("v")).collect()
    }
    direct = {
        r["grp"]: r["hll_est"]
        for r in hll_distinct(df, "grp", SF.col("v")).collect()
    }
    assert set(roll) == set(direct) and len(roll) == 3
    for g, (est, ok, n_fine) in roll.items():
        assert ok == 1 and est == direct[g] and n_fine == 7


def test_split_heal_zeroes_the_leak(spark):
    """Law over the contract output at sf0.001: applying the emitted
    moves makes every near-dup cluster single-sided (re-audited leak
    count drops to exactly zero), and every move targets its cluster
    canonical's side."""
    import __spark_entry__ as entrymod
    from combblas_spark.functions.dedup import near_dup_clusters
    from combblas_spark.functions.sampling import split_by_hash

    sf = "/root/testdata/sf0.001"
    moves = {
        r["doc_id"]: r["to_split"]
        for r in entrymod.q_split_heal(spark, sf).collect()
    }
    d = spark.read.parquet(f"{sf}/documents.parquet")
    cl = {
        r["doc_id"]: r["canonical_id"]
        for r in near_dup_clusters(
            d, k=3, num_hashes=4, bands=2, rows_per_band=2
        ).collect()
    }
    sp = {
        r["doc_id"]: r["split"]
        for r in split_by_hash(d, test_permille=100)
        .select("doc_id", "split")
        .collect()
    }
    healed = {k: moves.get(k, sp[k]) for k in sp}
    # per-cluster sides after healing: exactly one side each
    sides = {}
    for doc, canon in cl.items():
        sides.setdefault(canon, set()).add(healed[doc])
    assert all(len(s) == 1 for s in sides.values())
    # the original split DID leak (the audit exists for a reason)
    before = {}
    for doc, canon in cl.items():
        before.setdefault(canon, set()).add(sp[doc])
    assert any(len(s) > 1 for s in before.values())
    # and every move lands on its canonical's side
    for doc, to in moves.items():
        assert to == sp[cl[doc]]


def test_regularity_audit_hand_case(spark):
    """An exact metronome (CV=0) flags; jittered gaps with CV ~ 25%
    don't; below min_gaps never flags even at CV=0; timestamp ties
    contribute zero gaps deterministically."""
    from combblas_spark.functions.sessions import regularity_audit

    rows = (
        [(1, 1000 + 60 * i) for i in range(20)]            # metronome
        + [(2, 1000 + s) for s in [0, 50, 150, 180, 260,   # bursty human
                                   400, 410, 600, 900, 1000, 1300]]
        + [(3, 1000 + 60 * i) for i in range(4)]           # regular, short
        + [(4, 500), (4, 500), (4, 560)]                   # ties
    )
    df = spark.createDataFrame(rows, "user_id long, t_s long")
    got = {
        r["user"]: (r["n_gaps"], r["is_bot"])
        for r in regularity_audit(df, min_gaps=8).collect()
    }
    assert got[1] == (19, 1)
    assert got[2][1] == 0
    assert got[3] == (3, 0)
    assert got[4] == (2, 0)  # gaps {0, 60} regardless of tie order


def test_blocked_link_hand_case(spark):
    """Edits at EVERY position are recovered (front edits via the
    last-2 key, back edits via the first-2 key), phone-only agreement
    does not reach threshold, and cross-block pairs never meet."""
    from combblas_spark.functions.linkage import blocked_link

    master = spark.createDataFrame(
        [
            (1, 7, "abcdef", 5551234),
            (2, 7, "zzzzzz", 5550000),
            (3, 8, "abcdef", 5551234),  # same name, other block
        ],
        "rid long, blk long, name string, phone long",
    )
    dirty = spark.createDataFrame(
        [
            (101, 7, "bcdef", 5551234),   # deletion at pos 0 -> last2 key
            (102, 7, "abcde", 1111111),   # deletion at end -> first2 key
            (103, 7, "abXdef", 5551234),  # substitution mid
            (104, 7, "qwerty", 5550000),  # phone-only: score 1, excluded
            (105, 9, "abcdef", 5551234),  # block 9: no master there
        ],
        "rid long, blk long, name string, phone long",
    )
    got = {
        (r["master_id"], r["dirty_id"]): (
            r["name_dist"], r["phone_match"], r["score"]
        )
        for r in blocked_link(master, dirty).collect()
    }
    assert got == {
        (1, 101): (1, 1, 3),
        (1, 102): (1, 0, 2),
        (1, 103): (1, 1, 3),
    }


def test_reshard_audit_python_replay_and_minimal_movement(spark):
    """HRW replay: assignments match the python argmax with the same
    md5 draws; growing 4 -> 5 moves keys ONLY to the new shard and
    totals balance (sum departed == sum arrived == new shard's
    population)."""
    import hashlib

    from combblas_spark.operators.layout import reshard_audit

    keys = list(range(400))
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    rows = {r["shard"]: r for r in reshard_audit(df, "k", 4, 5).collect()}

    def hrw(k, n):
        return max(
            range(n),
            key=lambda r: (
                int(hashlib.md5(f"sh{r}|{k}".encode()).hexdigest()[:15], 16),
                -r,
            ),
        )

    import collections

    old = collections.Counter(hrw(k, 4) for k in keys)
    new = collections.Counter(hrw(k, 5) for k in keys)
    moved = collections.Counter(
        hrw(k, 5) for k in keys if hrw(k, 4) != hrw(k, 5)
    )
    for s in range(5):
        r = rows[s]
        assert r["n_old_keys"] == old.get(s, 0)
        assert r["n_new_keys"] == new.get(s, 0)
        assert r["n_arrived"] == moved.get(s, 0)
    assert all(rows[s]["n_arrived"] == 0 for s in range(4))
    assert rows[4]["n_arrived"] == rows[4]["n_new_keys"] > 0
    assert sum(r["n_departed"] for r in rows.values()) == rows[4]["n_arrived"]


def test_waterfill_laws_and_hand_case(spark):
    """Water-filling laws: allocations sum to EXACTLY min(capacity,
    total demand), alloc <= demand everywhere, saturated rows get full
    demand, unsaturated allocations differ by at most 1 (the max-min
    level), and the under-capacity regime saturates everyone."""
    from combblas_spark.functions.sampling import waterfill_quota

    dem = spark.createDataFrame(
        [("a", 5), ("b", 10), ("c", 100), ("d", 200), ("e", 7)],
        "key string, demand long",
    )
    rows = {r["key"]: r for r in waterfill_quota(dem, 100).collect()}
    assert sum(r["alloc"] for r in rows.values()) == 100
    for r in rows.values():
        assert r["alloc"] <= r["demand"]
        if r["saturated"]:
            assert r["alloc"] == r["demand"]
    unsat = [r["alloc"] for r in rows.values() if not r["saturated"]]
    assert unsat and max(unsat) - min(unsat) <= 1
    # a, b, e (5+10+7=22) saturate; c and d split the remaining 78: 39+39
    assert rows["a"]["alloc"] == 5 and rows["e"]["alloc"] == 7
    assert sorted([rows["c"]["alloc"], rows["d"]["alloc"]]) == [39, 39]

    # capacity above total demand: everyone saturated, leftover unspent
    rows = {r["key"]: r for r in waterfill_quota(dem, 10_000).collect()}
    assert all(r["alloc"] == r["demand"] == rows[k]["demand"]
               for k, r in rows.items())
