"""Web-link operators: anchor extraction, URL canonicalization, host graph.

The first mile of every web-scale corpus pipeline: pull the ``<a href>``
edges out of raw HTML, canonicalize the URLs so crawl-time variants of the
same logical page collide, and roll the result up to a host-level web graph
that downstream ranking (PageRank over hosts) consumes.

Everything here is JVM-side built-ins (``regexp_extract_all`` /
``regexp_replace`` / one partial-agg shuffle) — whole-stage codegen end to
end, no Python in the hot path. At 100 TB the extraction is a pure
projection over the pages scan (parallel by input split, zero shuffle); the
host rollup is one exchange on a 10^5-cardinality key (hosts), which is the
cheapest aggregate in the pipeline.

Reference anchor: the reference operates on crawled pages
(`crawler.py`, `html_utils.py:16` strip-tags) but never builds the link
graph; this module is the additive web-graph path of SURVEY §2's scope.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HREF_RE = r'<a href="([^"]*)">'
_ANCHOR_RE = r'<a href="[^"]*">([^<]*)</a>'


def extract_links(pages: DataFrame) -> DataFrame:
    """(src_url, pos, href, anchor) — one row per anchor tag, in document
    order.

    Two ``regexp_extract_all`` passes (href, anchor text) zipped positionally
    then ``posexplode``d: a pure projection with no shuffle, parallel by
    input split. Malformed pages simply yield zero rows.
    """
    html = F.decode(F.col("html"), "utf-8")
    zipped = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(_HREF_RE), 1).alias("href"),
        F.regexp_extract_all(html, F.lit(_ANCHOR_RE), 1).alias("anchor"),
    )
    return (
        pages.select(F.col("url").alias("src_url"), zipped.alias("z"))
        .select("src_url", F.posexplode("z").alias("pos", "la"))
        .select(
            "src_url",
            F.col("pos").cast("int").alias("pos"),
            F.col("la.href").alias("href"),
            F.col("la.anchor").alias("anchor"),
        )
    )


def normalize_url(u: Column) -> Column:
    """Canonicalize a URL with engine-portable regex/string ops.

    Rules (applied in order, each a single anchored regex so Spark's
    replace-all and DuckDB's replace-first semantics agree):

    1. strip ``#fragment``
    2. drop a query string consisting of tracking params (``?utm_...``)
    3. lowercase the ``scheme://host`` prefix (path stays case-sensitive)
    4. strip default ports ``:443`` / ``:80``
    5. strip a trailing slash from the path
    """
    u1 = F.regexp_replace(u, r"#.*$", "")
    u2 = F.regexp_replace(u1, r"\?utm_[^#]*$", "")
    prefix = F.regexp_replace(
        F.lower(F.regexp_extract(u2, r"^([^/]+//[^/]+)", 1)),
        r":(443|80)$",
        "",
    )
    rest = F.regexp_replace(
        F.regexp_replace(u2, r"^[^/]+//[^/]+", ""), r"/$", ""
    )
    return F.concat(prefix, rest)


def host_of(u: Column) -> Column:
    """Host part of an (already normalized) URL."""
    return F.regexp_extract(u, r"^[^/]+//([^/:]+)", 1)


def normalized_links(links: DataFrame) -> DataFrame:
    """Add ``norm_href`` / ``src_host`` / ``dst_host`` — still a pure
    projection."""
    return links.select(
        "src_url",
        "pos",
        "href",
        host_of(F.col("src_url")).alias("src_host"),
        normalize_url(F.col("href")).alias("norm_href"),
        host_of(normalize_url(F.col("href"))).alias("dst_host"),
    )


def url_dedup(links: DataFrame) -> DataFrame:
    """Collapse raw href variants onto canonical URLs.

    (norm_href, n_raw, n_variants, n_src_pages): one hash-partial-agg
    shuffle on the canonical URL — the crawl-frontier dedup shape (at crawl
    scale the same logical URL arrives spelled dozens of ways).
    """
    n = normalized_links(links)
    return n.groupBy("norm_href").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.countDistinct("href").alias("n_variants"),
        F.countDistinct("src_url").alias("n_src_pages"),
    )


def host_graph(links: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links, n_src_pages) — the host-level web
    graph. One partial-agg shuffle on the (src,dst) host pair; host
    cardinality is tiny relative to pages, so the exchange is cheap and
    skew-free (AQE coalesces post-shuffle partitions)."""
    n = normalized_links(links)
    return n.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("n_links"),
        F.countDistinct("src_url").alias("n_src_pages"),
    )


def dead_links(links: DataFrame, pages: DataFrame,
               n_buckets: int = 4096) -> DataFrame:
    """Crawl-frontier anti-join: link targets NOT in the crawled page set.

    (norm_href, dst_host, n_refs, n_src_pages) per uncrawled target URL.
    Both sides are page-scale at 100 TB, so neither can broadcast — but a
    Bloom filter of the crawled-URL set *can* (8 bytes/bucket). Rows failing
    the broadcast Bloom are definite non-members and bypass the anti-join
    exchange entirely (``functions/bloom.py``); only the bloom-positive
    sliver pays the shuffle for the exact check. In a frontier most
    discovered links are uncrawled, so the bulk of the fact side skips the
    exchange — the result is still the exact anti-join.
    """
    from text_to_graph_spark.functions.bloom import bloom_anti_join

    n = normalized_links(links)
    crawled = pages.select(normalize_url(F.col("url")).alias("page_url"))
    dead = bloom_anti_join(n, crawled, "norm_href", "page_url", n_buckets)
    return dead.groupBy("norm_href", "dst_host").agg(
        F.count(F.lit(1)).alias("n_refs"),
        F.countDistinct("src_url").alias("n_src_pages"),
    )


def resolved_links(links: DataFrame, pages: DataFrame,
                   n_buckets: int = 4096) -> DataFrame:
    """Resolve in-crawl links to their target page — the big⋈big frontier
    join.

    (src_url, pos, norm_href, dst_lang) per link whose canonical target was
    crawled. The links fact table is Bloom-pruned against the crawled-URL
    set before the exact shuffle join (``functions/bloom.py``): at frontier
    selectivity only the surviving sliver is exchanged, instead of every
    discovered anchor. Output is identical to the plain inner join.
    """
    from text_to_graph_spark.functions.bloom import bloom_pruned_join

    n = normalized_links(links)
    targets = pages.select(
        normalize_url(F.col("url")).alias("page_url"), F.col("lang")
    )
    joined = bloom_pruned_join(n, targets, "norm_href", "page_url", n_buckets)
    return joined.select(
        "src_url", "pos", "norm_href", F.col("lang").alias("dst_lang")
    )


def anchor_text_profiles(links: DataFrame) -> DataFrame:
    """Anchor-text profile per canonical target URL — the web-graph alias
    source.

    (norm_href, n_anchors, n_texts, anchor_texts) with the distinct texts
    ``array_sort``ed for a deterministic render. Anchor text is how the rest
    of the web *names* a page, so this table doubles as an entity-alias
    candidate source for KG linking. One partial-agg shuffle on the
    canonical URL; collect_set is bounded by the distinct-text count per
    target (anchor vocabularies are tiny relative to in-degree).
    """
    return (
        links.select(
            normalize_url(F.col("href")).alias("norm_href"), "anchor"
        )
        .groupBy("norm_href")
        .agg(
            F.count(F.lit(1)).alias("n_anchors"),
            F.countDistinct("anchor").alias("n_texts"),
            F.array_sort(F.collect_set("anchor")).alias("anchor_texts"),
        )
    )


def crawl_frontier(links: DataFrame, pages: DataFrame,
                   per_host: int = 3) -> DataFrame:
    """Next-wave crawl scheduler: top uncrawled targets per destination host.

    Composes the Bloom-fast-path dead-link anti-join with host PageRank:
    uncrawled targets are ranked inside each dst_host by reference count
    (ties broken by URL for determinism), capped at ``per_host``, and
    carry the host's rank so the scheduler can order hosts globally.
    The per-host top-k is a single window over the dead-link aggregate —
    already tiny relative to the link fact table — and the host-rank join
    broadcasts (host cardinality ≪ pages).
    """
    from pyspark.sql import Window

    dead = dead_links(links, pages)
    ranks = host_rank(host_graph(links))
    w = Window.partitionBy("dst_host").orderBy(
        F.desc("n_refs"), F.asc("norm_href")
    )
    return (
        dead.withColumn("pick", F.row_number().over(w))
        .where(F.col("pick") <= per_host)
        .join(
            F.broadcast(ranks),
            dead["dst_host"] == ranks["host"],
            "left",
        )
        .select(
            "dst_host",
            F.col("pick").cast("int").alias("pick"),
            "norm_href",
            "n_refs",
            F.coalesce("rank_e9", F.lit(0).cast("bigint")).alias("host_rank_e9"),
        )
    )


def host_rank(hosts: DataFrame, iterations: int = 5) -> DataFrame:
    """PageRank over the host graph — (host, rank_e9).

    Reuses the exact-bigint fixed-point PageRank (operators/graphalgo.py):
    bit-identical across engines and partitionings, oracle-checkable via the
    unrolled-CTE twin.
    """
    from text_to_graph_spark.operators.graphalgo import pagerank

    ranks = pagerank(hosts, src="src_host", dst="dst_host",
                     iterations=iterations)
    return ranks.withColumnRenamed("node", "host")


def robots_filter(
    links: DataFrame, rules: DataFrame
) -> DataFrame:
    """Crawl-politeness filter: drop frontier URLs matched by a host's
    disallow PREFIX rules (the robots.txt subset that matters for a
    frontier: ``Disallow: /path-prefix`` per host).

    ``rules`` is (host, disallow_prefix) — a per-host policy table, tiny
    relative to the frontier, so it broadcasts; the match is one
    equi-join on host plus a ``startswith`` on the path (no regex, no
    cross join). A URL survives when NO rule of its host matches
    (left_anti on the matched set). Returns the surviving
    (norm_href, dst_host) frontier rows, deduplicated.
    """
    n = normalized_links(links).select("norm_href", "dst_host").distinct()
    path = F.regexp_replace(F.col("norm_href"), r"^[^/]+//[^/]+", "")
    with_path = n.select(
        "norm_href", "dst_host", path.alias("path")
    )
    matched = (
        with_path.join(
            F.broadcast(rules.select(F.col("host").alias("dst_host"),
                                     "disallow_prefix")),
            "dst_host",
        )
        .where(F.col("path").startswith(F.col("disallow_prefix")))
        .select("norm_href")
        .distinct()
    )
    return (
        n.join(matched, "norm_href", "left_anti")
        .select("norm_href", "dst_host")
    )


def resolve_redirects(
    redirects: DataFrame,
    src: str = "src_url",
    dst: str = "dst_url",
    max_hops: int = 16,
    lineage_cuts: bool = True,
) -> DataFrame:
    """Resolve redirect chains to their terminal URL by POINTER DOUBLING:
    each round substitutes every row's current endpoint with that
    endpoint's own resolution, so chain depth covered doubles per round —
    ceil(log2(max_hops)) self-equi-joins instead of max_hops sequential
    probes. The reference's crawler follows redirects per-fetch
    (crawler.py); a 100-TB crawl resolves its 301 map as this batch join,
    and the log-round shape is what keeps a billion-row chain table to a
    handful of shuffles.

    Returns (src_url, final_url, hops, resolved); ``resolved`` is false
    only when the endpoint is still itself a redirect source after the
    round budget — i.e. a redirect cycle or a chain longer than
    ``max_hops`` — flagged rather than silently half-resolved.
    """
    import math

    cur = redirects.select(
        F.col(src).alias("src_url"),
        F.col(dst).alias("final_url"),
        F.lit(1).cast("long").alias("hops"),
    )
    for _ in range(max(1, math.ceil(math.log2(max_hops)))):
        # each round references `cur` twice (probe + build); the lazy
        # checkpoint stops the 2^rounds subtree re-computation. Explain-only
        # callers (plan dumps) pass lineage_cuts=False: Spark's explain
        # forces lazy checkpoints and can deadlock on the twin reference.
        if lineage_cuts:
            cur = cur.localCheckpoint(eager=False)
        nxt = cur.select(
            F.col("src_url").alias("_m"),
            F.col("final_url").alias("_f"),
            F.col("hops").alias("_h"),
        )
        cur = (
            cur.join(nxt, cur["final_url"] == nxt["_m"], "left")
            .select(
                "src_url",
                F.coalesce("_f", "final_url").alias("final_url"),
                (F.col("hops") + F.coalesce("_h", F.lit(0)))
                .cast("long")
                .alias("hops"),
            )
        )
    srcs = redirects.select(F.col(src).alias("final_url")).distinct()
    return (
        cur.join(srcs.withColumn("_is_src", F.lit(1)), "final_url", "left")
        .select(
            "src_url",
            "final_url",
            "hops",
            F.col("_is_src").isNull().alias("resolved"),
        )
    )


def politeness_schedule(
    frontier: DataFrame,
    url_col: str = "norm_href",
    host_col: str = "dst_host",
    per_host_per_wave: int = 2,
) -> DataFrame:
    """Full-frontier politeness scheduler: partition ALL pending fetches
    into numbered waves so no wave asks any host for more than
    ``per_host_per_wave`` URLs — the rate-limit plan a distributed crawler
    executes wave-by-wave (``crawl_frontier`` picks only the next top-k;
    this schedules the whole backlog). The reference's crawler rate-limits
    in-process per fetch (crawler.py); at fleet scale the limit has to be
    planned, not reacted to.

    Deterministic: within a host, URLs order by ``md5(url)`` (uniform,
    engine-portable, no rand()); wave = (rank-1) DIV cap. One rank window
    partitioned by host — the host key is the natural partition and the
    cap bounds nothing (ranking is linear per host); a pathologically hot
    host makes a big partition, which is exactly the host whose schedule
    MUST be long.

    Returns (host, url, wave, slot): slot in [0, per_host_per_wave).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(host_col).orderBy(F.md5(F.col(url_col)))
    rank = F.row_number().over(w) - 1
    return frontier.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        F.floor(rank / per_host_per_wave).cast("long").alias("wave"),
        (rank % per_host_per_wave).cast("long").alias("slot"),
    )
