"""URL canonicalization — the normalize pass of link-graph ingest.

Before a crawl's edges mean anything, both endpoints must be canonical:
case-folded scheme/host, fragment stripped, default port dropped,
tracking parameters removed, remaining query parameters sorted, empty
path normalized to '/'. Together with redirect resolution
(algorithms/redirects.py) this is the pair of passes that turns raw
crawl output into a usable link graph; the reference assumes its inputs
are already canonical ids (ReadGeneralizedTuples takes opaque labels —
SpParMat.cpp:3722+), so this is the ingest step a user would otherwise
bolt on.

Everything is pure Column expressions (string slicing + one higher-order
filter/sort over the split query string) — JVM codegen, no UDFs, no
regex (engine regex dialects differ; strpos/substr arithmetic does not).
The DuckDB oracle implements the same rules INDEPENDENTLY with its own
string functions, so the contract query cross-checks two
implementations of the spec rather than one implementation against
itself.

Canonicalization rules (documented order):
1. strip '#fragment'
2. scheme := lower(scheme)
3. host := lower(host), then strip one leading 'www.'
4. drop the port if empty, or http:80 / https:443
5. path '' -> '/'
6. drop query params that are empty, 'utm_*', 'fbclid=*', 'gclid=*'
7. sort surviving params bytewise, rejoin with '&'
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
import pyspark.sql.functions as F

TRACKING_PREFIXES = ("utm_", "fbclid=", "gclid=")


def _parts(url: Column):
    """Split a URL into (scheme, host, port, path, sorted-query-params)
    Columns. Pure string arithmetic: the authority ends at the first '/'
    or '?' (whichever comes first), so schemeless paths and
    query-without-path URLs both parse."""
    no_frag = F.substring_index(url, "#", 1)
    scheme = F.lower(F.substring_index(no_frag, "://", 1))
    rest = F.substring(
        no_frag, F.length(F.substring_index(no_frag, "://", 1)) + 4, 1 << 20
    )
    slash = F.instr(rest, "/")
    qmark = F.instr(rest, "?")
    cut = (
        F.when((slash > 0) & ((qmark == 0) | (slash < qmark)), slash)
        .when(qmark > 0, qmark)
        .otherwise(F.lit(0))
    )
    hostport = F.when(cut > 0, F.substring(rest, 1, cut - 1)).otherwise(rest)
    pathq = F.when(cut > 0, F.substring(rest, cut, 1 << 20)).otherwise(F.lit(""))
    q2 = F.instr(pathq, "?")
    path = F.when(q2 > 0, F.substring(pathq, 1, q2 - 1)).otherwise(pathq)
    query = F.when(q2 > 0, F.substring(pathq, q2 + 1, 1 << 20)).otherwise(
        F.lit("")
    )
    colon = F.instr(hostport, ":")
    host0 = F.lower(
        F.when(colon > 0, F.substring(hostport, 1, colon - 1)).otherwise(
            hostport
        )
    )
    port = F.when(colon > 0, F.substring(hostport, colon + 1, 1 << 20)).otherwise(
        F.lit("")
    )
    host = F.when(
        F.substring(host0, 1, 4) == "www.", F.substring(host0, 5, 1 << 20)
    ).otherwise(host0)
    keep = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & (F.substring(p, 1, 4) != "utm_")
        & (F.substring(p, 1, 7) != "fbclid=")
        & (F.substring(p, 1, 6) != "gclid="),
    )
    params = F.array_sort(keep)
    return scheme, host, port, path, params


def url_host(url: Column) -> Column:
    """Canonical host (lowercased, one leading 'www.' stripped)."""
    _, host, _, _, _ = _parts(url)
    return host


def canonical_url(url: Column) -> Column:
    """The canonical form of ``url`` per the module rules."""
    scheme, host, port, path, params = _parts(url)
    port_part = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    q_part = F.when(
        F.size(params) > 0,
        F.concat(F.lit("?"), F.array_join(params, "&")),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_part, path_part, q_part)


def _h60(salt: str, key: Column) -> Column:
    """md5-60bit draw keyed on ``salt | key`` (the RandPerm trick)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + "|"), key.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")


def dirty_url_expr(u: Column) -> Column:
    """The dirty-URL fixture as a Column expression over any int key
    column: mixed-case schemes and hosts, optional 'www.', default and
    non-default ports, empty / short paths, tracking-polluted and
    unsorted query strings, and fragments — every canonicalization rule
    exercised; md5-60bit draws keep it engine-portable. The canonical
    host of the produced URL is 'shop<u%50>.example.com' in closed form,
    which downstream oracles (host_graph) exploit."""
    scheme = (
        F.when(_h60("sch", u) % 3 == 0, "http")
        .when(_h60("sch", u) % 3 == 1, "https")
        .otherwise("HTTP")
    )
    www = F.when(_h60("www", u) % 2 == 0, "www.").otherwise("")
    host = F.concat(
        F.lit("Shop"), (u % 50).cast("string"), F.lit(".Example.COM")
    )
    port = (
        F.when(_h60("prt", u) % 4 == 0, ":80")
        .when(_h60("prt", u) % 4 == 1, ":8080")
        .otherwise("")
    )
    path = (
        F.when(_h60("pth", u) % 3 == 0, F.lit(""))
        .when(
            _h60("pth", u) % 3 == 1,
            F.concat(F.lit("/item/"), (u % 97).cast("string")),
        )
        .otherwise(F.lit("/a/b"))
    )
    idp = F.concat(F.lit("id="), (u % 13).cast("string"))
    query = (
        F.when(_h60("qry", u) % 4 == 0, F.lit(""))
        .when(_h60("qry", u) % 4 == 1, F.concat(F.lit("?utm_source=news&"), idp))
        .when(
            _h60("qry", u) % 4 == 2,
            F.concat(F.lit("?"), idp, F.lit("&utm_campaign=x&b=2")),
        )
        .otherwise(F.lit("?b=2&a=1"))
    )
    frag = F.when(_h60("frg", u) % 3 == 0, "#frag").otherwise("")
    return F.concat(scheme, F.lit("://"), www, host, port, path, query, frag)


def dirty_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dirty-URL fixture over the orders keyspace: (src, url)."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("long").alias("u")
    )
    return o.select(
        F.col("u").alias("src"), dirty_url_expr(F.col("u")).alias("url")
    )


def host_links(links: DataFrame) -> DataFrame:
    """Collapse a URL-level link table (src_url, dst_url) onto the
    canonical host graph: (src_host, dst_host, n_links). THE ingest
    aggregation of web-graph pipelines — host-level graphs are what
    centrality/spam analyses actually run on (the reference's generalized
    tuple reader assumes this collapse already happened). One projection
    through the pure-Column canonicalizer + one map-side-combinable
    count."""
    return (
        links.select(
            url_host(F.col("src_url")).alias("src_host"),
            url_host(F.col("dst_url")).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).cast("long").alias("n_links"))
    )


def link_farm_pairs(
    host_links: DataFrame,
    min_links: int = 10,
    lift_x1000_min: int = 3000,
) -> DataFrame:
    """Nepotistic-link (link-farm) detection over the collapsed host
    graph: flag ordered host pairs whose interlink count exceeds the
    configuration-model expectation out(s)*in(d)/L by a lift factor —
    the classic TKC/link-spam signal (cf. Gyongyi & Garcia-Molina,
    complementing the trust-propagation view in
    ``algorithms/pagerank.spam_mass``; the reference ships the rank
    kernels but no admission analytics — Applications/ assume clean
    inputs).

    lift_x1000 = floor(1000 * n_links * L / (out(s) * in(d))) is kept in
    exact int64 arithmetic (engine-portable; needs n_links * L <
    9.2e15, comfortably true for host-level graphs — L ~ 1e10 links,
    pair counts ~ 1e5). Scale shape: everything here is O(hosts) /
    O(host pairs), orders smaller than the crawl — the two degree
    tables broadcast, the total is a 1-row broadcast scalar, and the
    pair table never shuffles.
    """
    total = host_links.agg(
        F.sum("n_links").cast("long").alias("total_links")
    )
    outd = host_links.groupBy("src_host").agg(
        F.sum("n_links").cast("long").alias("out_links")
    )
    ind = host_links.groupBy("dst_host").agg(
        F.sum("n_links").cast("long").alias("in_links")
    )
    j = (
        host_links.join(F.broadcast(outd), "src_host")
        .join(F.broadcast(ind), "dst_host")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "lift_x1000",
            F.expr(
                "CAST((1000 * n_links * total_links)"
                " DIV (out_links * in_links) AS BIGINT)"
            ),
        )
    )
    return j.filter(
        (F.col("n_links") >= min_links)
        & (F.col("lift_x1000") >= lift_x1000_min)
    ).select(
        "src_host", "dst_host", "n_links", "out_links", "in_links",
        "lift_x1000",
    )


def change_rate(
    history: DataFrame,
    id_col: str = "url_id",
    snap_col: str = "snapshot",
    hash_col: str = "content_hash",
) -> DataFrame:
    """Per-URL change-frequency estimate from a multi-snapshot crawl
    log — the recrawl-scheduling pass (Cho & Garcia-Molina, "Estimating
    frequency of change", TOIT 2003). A change in interval s is
    content_hash(s) != content_hash(s-1), detected with one lag window
    whose partition IS the URL's own history (billions of URLs x tens of
    snapshots: hash-partitioned by URL, bounded per-partition work, no
    global ordering anywhere). The per-URL estimator is their
    bias-corrected lambda_hat = -ln((n - X + 0.5)/(n + 0.5)) for X
    observed changes in n intervals — the recrawl priority a scheduler
    sorts on.

    Returns (url_id, n_obs, n_changes, lambda_hat); n_obs = snapshots-1
    intervals, lambda_hat ROUND(.,6) (float output, rounded by the
    cross-engine convention).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(snap_col)
    ch = history.select(
        F.col(id_col).alias("url_id"),
        F.lag(F.col(hash_col)).over(w).alias("prev"),
        F.col(hash_col).alias("cur"),
    )
    per = ch.groupBy("url_id").agg(
        F.sum(F.when(F.col("prev").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_obs"),
        F.sum(
            F.when(
                F.col("prev").isNotNull() & (F.col("cur") != F.col("prev")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_changes"),
    )
    lam = -F.log(
        (F.col("n_obs") - F.col("n_changes") + F.lit(0.5))
        / (F.col("n_obs") + F.lit(0.5))
    )
    return per.select(
        "url_id", "n_obs", "n_changes", F.round(lam, 6).alias("lambda_hat")
    )


def crawl_history(spark: SparkSession, sf_dir: str, n_snapshots: int = 7):
    """Deterministic crawl-log fixture: 7 content-hash observations per
    orders-keyspace URL. URLs fall in three volatility classes
    (u % 3 -> per-interval change probability 1/8, 4/8, 7/8 via
    md5-60bit draws); the content hash at snapshot s fingerprints the
    CUMULATIVE version count, so hash inequality between adjacent
    snapshots reproduces the class's change draws exactly — any defect
    in the lag-window change detection breaks the replay."""
    u = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").cast("long").alias("url_id")
    )
    k = F.col("url_id")
    thr = F.when(k % 3 == 0, 1).when(k % 3 == 1, 4).otherwise(7)
    snaps = u.select(
        "url_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(n_snapshots - 1))
        ).alias("snapshot"),
        thr.alias("thr"),
    )
    # changed(u, s) for s >= 1; version(u, s) = number of changes <= s
    changed = F.when(
        (F.col("snapshot") > 0)
        & (
            _h60(
                "chg",
                F.concat(
                    k.cast("string"), F.lit("|"), F.col("snapshot").cast("string")
                ),
            )
            % 8
            < F.col("thr")
        ),
        1,
    ).otherwise(0)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("url_id")
        .orderBy("snapshot")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return snaps.select(
        "url_id",
        "snapshot",
        F.md5(
            F.concat(
                k.cast("string"),
                F.lit("|v"),
                F.sum(changed).over(w).cast("string"),
            )
        ).alias("content_hash"),
    )


def fetch_schedule(
    frontier: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    id_col: str = "url_id",
    priority_col: str = "priority",
) -> DataFrame:
    """Politeness-constrained fetch scheduling — the dispatch pass
    between frontier scoring and the fetchers: each host is a serial
    queue (one connection per host, the universal crawler politeness
    rule), drained in priority order with ``delay_ms`` between hits, so
    URL at queue rank r fetches at slot (r-1)*delay_ms. One row_number
    window whose partition IS the host queue (millions of hosts, each
    queue tiny-to-moderate: balanced at any scale; a mega-host queue is
    bounded by the frontier's own per-host budget upstream) plus a
    broadcast join of the O(hosts) delay table. All outputs exact
    integers.

    ``frontier``: (url_id, host, priority); ``delays``: (host,
    delay_ms). Returns (url_id, host, sched_rank, slot_ms).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(
        F.col(priority_col).desc(), F.col(id_col)
    )
    return (
        frontier.join(F.broadcast(delays), host_col)
        .withColumn("sched_rank", F.row_number().over(w).cast("long"))
        .select(
            F.col(id_col).alias("url_id"),
            F.col(host_col).alias("host"),
            "sched_rank",
            ((F.col("sched_rank") - 1) * F.col("delay_ms"))
            .cast("long")
            .alias("slot_ms"),
        )
    )


def trap_signals(
    urls: DataFrame,
    depth_limit: int = 8,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """Per-host crawler-trap audit — the frontier-hygiene pass between
    discovery and scheduling: spider traps (calendar pages, session-id
    mazes, symlink loops) manufacture unbounded URL spaces that eat a
    host's crawl budget without new content. The two classic per-URL
    signals (IRLbot-style heuristics; the reference has no crawl
    plane):

    - ``deep``: path depth (non-empty '/'-segments) > ``depth_limit``;
    - ``loopy``: some segment repeats two positions earlier
      (s[i] = s[i-2], the /a/b/a/b/... self-similar pattern a cyclic
      link structure unrolls into).

    Both are pure Column expressions (split + one ``exists`` over an
    index sequence — JVM codegen, no UDF, no join), then ONE map-side-
    combinable groupBy(host) — at crawl scale this is a single pass
    over the frontier with a tiny per-host result. A host is flagged
    ``is_trap`` when a third or more of its URLs are loopy or deep:
    ratio test on exact int64 counts (3*n_bad >= n_urls), no doubles.

    Returns (host, n_urls, n_loopy, n_deep, max_depth, is_trap).
    """
    segs = F.expr(
        f"filter(split({path_col}, '/'), x -> x != '')"
    )
    d = urls.withColumn("_segs", segs).withColumn(
        "_depth", F.size("_segs").cast("long")
    )
    # CASE WHEN for the depth guard: sequence(3, n) flips to a DESCENDING
    # [3,2,..] when n < 3 and element_at(_, 0) then throws — WHEN is the
    # one construct with guaranteed lazy branch evaluation.
    loopy = F.when(
        F.col("_depth") >= 3,
        F.expr(
            "exists(sequence(3, size(_segs)), "
            "i -> element_at(_segs, i) = element_at(_segs, i - 2))"
        ),
    ).otherwise(F.lit(False))
    deep = F.col("_depth") > depth_limit
    per = d.select(
        F.col(host_col).alias("host"),
        F.col("_depth").alias("depth"),
        loopy.cast("long").alias("loopy"),
        deep.cast("long").alias("deep"),
    )
    agg = per.groupBy("host").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"),
        F.sum("loopy").cast("long").alias("n_loopy"),
        F.sum("deep").cast("long").alias("n_deep"),
        F.max("depth").cast("long").alias("max_depth"),
    )
    return agg.withColumn(
        "is_trap",
        (F.lit(3) * F.greatest("n_loopy", "n_deep")) >= F.col("n_urls"),
    )
