"""Round-5 operators: clustering coefficient, sessionization, KMV sketch,
corpus-wide duplicated-n-gram fraction. Pure-python oracles, no scipy."""

from __future__ import annotations

import datetime
import hashlib
from itertools import combinations

import pyspark.sql.functions as F

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
