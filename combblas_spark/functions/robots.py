"""robots.txt longest-match evaluation — the crawl-admission pass.

Every fetch a web-scale crawler schedules must first clear the target
host's robots.txt: among the host's rules whose path-prefix matches the
URL's path, the LONGEST prefix wins, and on a length tie the
least-restrictive rule (Allow) wins; a URL matching no rule is allowed
by default. That is the Robots Exclusion Protocol resolution order
(RFC 9309 §2.2.2, Google's reference semantics). The reference engine
assumes its edge list is already an admitted crawl
(ReadGeneralizedTuples takes opaque ids — SpParMat.cpp:3722+); this is
the admission pass a crawl pipeline bolts on in front, at frontier
scale: billions of candidate URLs against millions of tiny per-host
rule sets.

Scale shape: the rule table is O(hosts x ~tens of rules) — orders of
magnitude smaller than the frontier — so the match join broadcasts the
rules and the frontier NEVER shuffles; resolution is one map-side
max-aggregate per URL. The longest-match-then-allow order collapses
into a single integer: score = 2*len(rule) + allow, so MAX(score)
per URL is the whole precedence ladder (longer rule wins; equal length
-> the Allow's +1 wins), and allowed = score % 2 == 1. No window, no
sort, no UDF.

Subset honestly declared: literal path-prefix rules only — RFC 9309
wildcard '*' and anchor '$' are not parsed (raise upstream if present);
crawl-delay and sitemap lines are out of scope.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from combblas_spark.functions.urls import _h60


def robots_decision(
    urls: DataFrame,
    rules: DataFrame,
    broadcast_rules: bool = True,
) -> DataFrame:
    """Resolve every URL against its host's robots rules.

    ``urls``: (url_id, host, path); ``path`` must start with '/'.
    ``rules``: (host, rule_path, allow) with allow in {0, 1}; literal
    prefix rules only (no '*' / '$' — validated here).

    Returns (url_id, host, path, allowed, matched_len): ``allowed`` is
    boolean, ``matched_len`` the length of the winning rule (0 when no
    rule matched => default allow).

    Precedence is computed as MAX(2*length(rule_path) + allow) over the
    matching rules — longest match wins, Allow wins ties — so the whole
    RFC 9309 ladder is one map-side-combinable aggregate. With
    ``broadcast_rules`` (the 100-TB default: rules are tiny vs the
    frontier) the frontier never shuffles.
    """
    scored = rules.select(
        F.col("host").alias("r_host"),
        F.col("rule_path"),
        # fail loudly at execution time on wildcard rules instead of
        # silently treating the metacharacter as a literal byte
        F.when(
            F.col("rule_path").contains("*") | F.col("rule_path").contains("$"),
            F.raise_error(
                F.concat(
                    F.lit("robots_decision: wildcard rule not supported: "),
                    F.col("rule_path"),
                )
            ),
        )
        .otherwise(
            (F.length("rule_path") * 2 + F.col("allow").cast("long"))
        )
        .alias("score"),
    )
    if broadcast_rules:
        scored = F.broadcast(scored)
    matched = (
        urls.join(
            scored,
            (urls["host"] == scored["r_host"])
            & (
                F.substring(urls["path"], 1, F.length(scored["rule_path"]))
                == scored["rule_path"]
            ),
            "left",
        )
        .groupBy("url_id", "host", "path")
        .agg(F.max("score").alias("score"))
    )
    return matched.select(
        "url_id",
        "host",
        "path",
        (F.coalesce(F.col("score") % 2, F.lit(1)) == 1).alias("allowed"),
        F.coalesce(
            (F.col("score") / 2).cast("long"), F.lit(0)
        ).alias("matched_len"),
    )


def crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic frontier fixture over the orders keyspace: 50 hosts
    ('shop<k>.example.com', matching the dirty-URL fixture's canonical
    hosts) and five path families — deep item pages, a private section,
    the root, bare category pages, static assets — chosen so every rule
    in :func:`robots_rules` (root disallow, section disallow, tie,
    longest-match override) decides some URLs. All draws are md5-60bit
    (engine-replayable)."""
    u = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("long").alias("url_id")
    )
    k = F.col("url_id")
    cat = (_h60("rbc", k) % 12).cast("string")
    item = (_h60("rbi", k) % 997).cast("string")
    sec = _h60("rbsec", k) % 5
    path = (
        F.when(sec == 0, F.concat(F.lit("/cat"), cat, F.lit("/item"), item))
        .when(sec == 1, F.concat(F.lit("/private/doc"), item))
        .when(sec == 2, F.lit("/"))
        .when(sec == 3, F.concat(F.lit("/cat"), cat))
        .otherwise(F.concat(F.lit("/static/img"), item, F.lit(".png")))
    )
    return u.select(
        "url_id",
        F.concat(
            F.lit("shop"), (k % 50).cast("string"), F.lit(".example.com")
        ).alias("host"),
        path.alias("path"),
    )


def robots_rules(spark: SparkSession) -> DataFrame:
    """Deterministic per-host rule sets for the 50 fixture hosts: every
    host allows its own category ('/cat<k%12>'); md5-60bit draws give
    ~half the hosts a '/private' disallow, 1-in-7 a SAME-LENGTH
    '/private' allow (the RFC tie, allow must win), 1-in-5 a root
    disallow, 1-in-3 a '/cat' disallow (one byte shorter than the
    always-on allow — the longest-match override), and 1-in-4 a
    '/static' disallow."""
    k = F.col("id")
    rows = F.array(
        F.struct(
            F.concat(F.lit("/cat"), (k % 12).cast("string")).alias("rule_path"),
            F.lit(1).alias("allow"),
            F.lit(True).alias("keep"),
        ),
        F.struct(
            F.lit("/private").alias("rule_path"),
            F.lit(0).alias("allow"),
            (_h60("rb1", k) % 2 == 0).alias("keep"),
        ),
        F.struct(
            F.lit("/private").alias("rule_path"),
            F.lit(1).alias("allow"),
            (_h60("rb4", k) % 7 == 0).alias("keep"),
        ),
        F.struct(
            F.lit("/").alias("rule_path"),
            F.lit(0).alias("allow"),
            (_h60("rb2", k) % 5 == 0).alias("keep"),
        ),
        F.struct(
            F.lit("/cat").alias("rule_path"),
            F.lit(0).alias("allow"),
            (_h60("rb3", k) % 3 == 0).alias("keep"),
        ),
        F.struct(
            F.lit("/static").alias("rule_path"),
            F.lit(0).alias("allow"),
            (_h60("rb5", k) % 4 == 0).alias("keep"),
        ),
    )
    return (
        spark.range(50)
        .select(
            F.concat(
                F.lit("shop"), k.cast("string"), F.lit(".example.com")
            ).alias("host"),
            F.explode(rows).alias("r"),
        )
        .filter(F.col("r.keep"))
        .select("host", F.col("r.rule_path").alias("rule_path"),
                F.col("r.allow").alias("allow"))
    )
