"""Web-link suite: anchor extraction, URL canonicalization, host graph.

Unit-level checks on handcrafted URLs/HTML plus plan-shape assertions (the
extraction path must stay a shuffle-free projection; the host rollup must be
a single partial-agg exchange)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from text_to_graph_spark.operators import weblinks as WL
from text_to_graph_spark.plans.introspect import (
    count_exchanges,
    plan_str,
    python_eval_count,
)


def _norm_one(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "u string")
    return df.select(WL.normalize_url(F.col("u")).alias("n")).first()["n"]


def test_normalize_url_rules(spark):
    cases = {
        # fragment stripped
        "https://a.test/p/1#frag": "https://a.test/p/1",
        # utm query dropped
        "https://a.test/p/1?utm_source=feed": "https://a.test/p/1",
        # scheme+host lowercased, path case kept, trailing slash stripped
        "HTTPS://A.TEST/Path/": "https://a.test/Path",
        # default ports stripped
        "https://a.test:443/p": "https://a.test/p",
        "http://a.test:80/p": "http://a.test/p",
        # non-default port kept
        "https://a.test:8443/p": "https://a.test:8443/p",
        # already canonical: unchanged
        "https://a.test/p/1": "https://a.test/p/1",
    }
    for raw, want in cases.items():
        assert _norm_one(spark, raw) == want, raw


def test_extract_links_from_handcrafted_html(spark):
    html = (
        '<html><body><p>x</p><nav><a href="https://h1.test/a">one</a>'
        '<a href="https://h2.test/b#f">two</a></nav></body></html>'
    ).encode()
    pages = spark.createDataFrame(
        [("https://src.test/p", bytearray(html))], "url string, html binary"
    )
    rows = WL.extract_links(pages).orderBy("pos").collect()
    assert [(r.pos, r.href, r.anchor) for r in rows] == [
        (0, "https://h1.test/a", "one"),
        (1, "https://h2.test/b#f", "two"),
    ]


def test_linked_pages_link_counts(spark):
    from text_to_graph_spark.sources.weblinks import synthesize_linked_pages

    pages = synthesize_linked_pages(spark, SF_SMOKE)
    links = WL.extract_links(pages)
    per_page = links.groupBy("src_url").count()
    # pages alternate 2 vs 3 outlinks; smoke corpus is 500 docs
    counts = dict(
        per_page.groupBy("count").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert counts == {2: 250, 3: 250}


def test_host_graph_is_skewed_toward_hub_hosts(spark):
    from text_to_graph_spark.sources.weblinks import synthesize_linked_pages

    hg = WL.host_graph(WL.extract_links(synthesize_linked_pages(spark, SF_SMOKE)))
    indeg = dict(
        hg.groupBy("dst_host").agg(F.sum("n_links").alias("n")).collect()
    )
    # quadratic-residue targets: only the six hub hosts receive links
    hubs = {f"src{i}.example.test" for i in (0, 1, 4, 5, 9, 16)}
    assert set(indeg) == hubs
    # and the host PageRank separates hubs from the 14 zero-indegree hosts
    ranks = WL.host_rank(hg).collect()
    hub_ranks = {r.host: r.rank_e9 for r in ranks if r.host in hubs}
    cold = [r.rank_e9 for r in ranks if r.host not in hubs]
    assert cold and max(cold) < min(hub_ranks.values())


def test_extraction_and_normalization_are_shuffle_free(spark):
    from text_to_graph_spark.sources.weblinks import synthesize_linked_pages

    n = WL.normalized_links(
        WL.extract_links(synthesize_linked_pages(spark, SF_SMOKE))
    )
    # pure projection: no Python stage, at most the sandbox input repartition
    assert python_eval_count(n) == 0
    assert count_exchanges(n) <= 1


def test_host_graph_is_single_partial_agg_exchange(spark):
    from text_to_graph_spark.sources.weblinks import synthesize_linked_pages

    hg = WL.host_graph(WL.extract_links(synthesize_linked_pages(spark, SF_SMOKE)))
    # count(distinct src_url) legitimately needs the two-phase distinct
    # shape (pre-agg on keys+src_url, then final agg): 2 exchanges + the
    # sandbox input repartition, every phase map-side partial-agg'd
    assert count_exchanges(hg) <= 3
    p = plan_str(hg, "simple")
    assert "partial_count" in p and "CartesianProduct" not in p


class TestBloomJoins:
    """functions/bloom.py: exactness vs the plain joins + plan shapes."""

    def _sides(self, spark):
        fact = spark.createDataFrame(
            [(i, f"k{i % 50}") for i in range(400)], "row_id int, k string"
        )
        keys = spark.createDataFrame(
            [(f"k{i}", i * 10) for i in range(0, 50, 7)], "key string, attr int"
        )
        return fact, keys

    def test_pruned_join_equals_plain_inner_join(self, spark):
        from text_to_graph_spark.functions.bloom import bloom_pruned_join

        fact, keys = self._sides(spark)
        got = bloom_pruned_join(fact, keys, "k", "key", n_buckets=8)
        want = fact.join(keys, fact["k"] == keys["key"], "inner")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_anti_join_equals_plain_left_anti(self, spark):
        from text_to_graph_spark.functions.bloom import bloom_anti_join

        fact, keys = self._sides(spark)
        # tiny filter → lots of false positives; result must still be exact
        got = bloom_anti_join(fact, keys, "k", "key", n_buckets=2)
        want = fact.join(keys, fact["k"] == keys["key"], "left_anti")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_prune_is_superset_of_members_and_broadcast_only(self, spark):
        from text_to_graph_spark.functions.bloom import (
            bloom_prune,
            build_bloom,
        )
        from text_to_graph_spark.plans.introspect import (
            has_broadcast_join,
            has_sort_merge_join,
        )

        fact, keys = self._sides(spark)
        pruned = bloom_prune(fact, "k", build_bloom(keys, "key", 64), 64)
        kept = {r.k for r in pruned.select("k").distinct().collect()}
        members = {r.key for r in keys.collect()}
        assert members <= kept  # false negatives are impossible
        # the probe itself must not shuffle the fact side
        assert has_broadcast_join(pruned)
        assert not has_sort_merge_join(pruned)

    def test_dead_links_bloom_plan_and_result(self, spark):
        from text_to_graph_spark.sources.weblinks import synthesize_linked_pages
        from text_to_graph_spark.plans.introspect import plan_str

        pages = synthesize_linked_pages(spark, SF_SMOKE)
        links = WL.extract_links(pages)
        dead = WL.dead_links(links, pages)
        p = plan_str(dead, "simple")
        assert "CartesianProduct" not in p
        assert "BroadcastHashJoin" in p  # the bloom probe
        # exact semantics: dead ∪ resolved == all distinct targets
        n_dead = dead.count()
        n_live = (
            WL.resolved_links(links, pages)
            .select("norm_href").distinct().count()
        )
        n_all = (
            WL.normalized_links(links).select("norm_href").distinct().count()
        )
        assert n_dead + n_live == n_all


def test_anchor_text_profiles_collapse_variants(spark):
    links = spark.createDataFrame(
        [
            ("https://s.test/a", 0, "https://t.test/p#x", "Alpha"),
            ("https://s.test/b", 0, "https://t.test/p?utm_source=f", "Beta"),
            ("https://s.test/c", 0, "https://t.test/p", "Alpha"),
            ("https://s.test/c", 1, "https://other.test/q", "Gamma"),
        ],
        "src_url string, pos int, href string, anchor string",
    )
    rows = {r.norm_href: r for r in WL.anchor_text_profiles(links).collect()}
    p = rows["https://t.test/p"]
    # three raw variants collapse onto one canonical target
    assert p.n_anchors == 3 and p.n_texts == 2
    assert p.anchor_texts == ["Alpha", "Beta"]
    assert rows["https://other.test/q"].anchor_texts == ["Gamma"]


def test_crawl_frontier_caps_per_host_and_ranks_by_refs(spark):
    from text_to_graph_spark.sources.weblinks import synthesize_linked_pages

    pages = synthesize_linked_pages(spark, SF_SMOKE)
    links = WL.extract_links(pages)
    rows = WL.crawl_frontier(links, pages, per_host=2).collect()
    by_host: dict = {}
    for r in rows:
        by_host.setdefault(r.dst_host, []).append(r)
    for host, rs in by_host.items():
        assert len(rs) <= 2, host
        rs.sort(key=lambda r: r.pick)
        # ordered by reference count, never a crawled URL
        refs = [r.n_refs for r in rs]
        assert refs == sorted(refs, reverse=True)
    # frontier rows must be a subset of the dead links
    dead = {r.norm_href for r in WL.dead_links(links, pages).collect()}
    assert {r.norm_href for r in rows} <= dead


def test_normalize_url_idempotent_on_fuzz_corpus(spark):
    # canonicalization must be a projection onto its own fixed points:
    # normalize(normalize(u)) == normalize(u) for the full combinatorial
    # grid of scheme/host/port/path/query/fragment messiness
    import itertools

    schemes = ["https://", "HTTP://", "http://"]
    hosts = ["A.Test", "a.test:443", "b.test:80", "b.test:8443", "x.y.test"]
    paths = ["", "/", "/P/1", "/p/1/", "/Mixed/Case"]
    tails = ["", "#f", "?utm_source=x", "?q=1", "?utm_a=1#z", "#a#b"]
    urls = ["".join(p) for p in itertools.product(schemes, hosts, paths, tails)]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    rows = (
        df.select(WL.normalize_url(F.col("u")).alias("n1"))
        .select("n1", WL.normalize_url(F.col("n1")).alias("n2"))
        .collect()
    )
    bad = [(r.n1, r.n2) for r in rows if r.n1 != r.n2]
    assert not bad, bad[:5]


class TestResolveRedirects:
    def test_chains_and_cycle(self, spark):
        from text_to_graph_spark.operators.weblinks import resolve_redirects

        # chain a->b->c->d (terminal), singleton e->d, cycle x->y->x
        red = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("e", "d"),
             ("x", "y"), ("y", "x")],
            "src_url string, dst_url string",
        )
        got = {r.src_url: r for r in resolve_redirects(red).collect()}
        assert (got["a"].final_url, got["a"].hops, got["a"].resolved) == ("d", 3, True)
        assert (got["b"].final_url, got["b"].hops) == ("d", 2)
        assert (got["e"].final_url, got["e"].hops, got["e"].resolved) == ("d", 1, True)
        # cycle members never terminate: flagged unresolved, not dropped
        assert got["x"].resolved is False and got["y"].resolved is False

    def test_log_rounds_cover_max_hops(self, spark):
        from text_to_graph_spark.operators.weblinks import resolve_redirects

        # a 10-deep chain resolves fully with the default max_hops=16
        # (4 doubling rounds cover depth 16)
        red = spark.createDataFrame(
            [(f"u{i}", f"u{i+1}") for i in range(10)],
            "src_url string, dst_url string",
        )
        got = {r.src_url: r for r in resolve_redirects(red).collect()}
        assert (got["u0"].final_url, got["u0"].hops, got["u0"].resolved) == (
            "u10", 10, True,
        )


class TestPolitenessSchedule:
    def test_wave_cap_and_determinism(self, spark):
        from text_to_graph_spark.operators.weblinks import politeness_schedule

        rows = [(f"https://h{i % 3}.test/p{i}", f"h{i % 3}.test") for i in range(20)]
        df = spark.createDataFrame(rows, "norm_href string, dst_host string")
        out = politeness_schedule(df, per_host_per_wave=2).collect()
        assert len(out) == 20
        # no (host, wave) bucket exceeds the cap; slots enumerate within it
        from collections import Counter

        c = Counter((r.host, r.wave) for r in out)
        assert max(c.values()) <= 2
        assert all(r.slot in (0, 1) for r in out)
        # waves are contiguous from 0 per host
        for h in {r.host for r in out}:
            waves = sorted({r.wave for r in out if r.host == h})
            assert waves == list(range(len(waves)))
        again = politeness_schedule(df, per_host_per_wave=2).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))


class TestSitemap:
    def test_round_trip_with_escaping_and_part_split(self, spark):
        from pyspark.sql import functions as F

        from text_to_graph_spark.sources.sitemap import (
            build_sitemaps,
            parse_sitemaps,
        )

        rows = [
            ("https://h1.test/a?x=1&y=<2>", "2025-01-01 00:00:01"),
            ("https://h1.test/b", "2025-01-01 00:00:02"),
            ("https://h1.test/c", "2025-01-01 00:00:03"),
            ("https://h2.test/only", "2025-01-01 00:00:04"),
        ]
        pages = spark.createDataFrame(
            rows, "url string, ts string"
        ).select("url", F.to_timestamp("ts").alias("warc_ts"))
        sm = build_sitemaps(pages, max_urls_per_file=2)
        files = {(r.host, r.part): r.xml for r in sm.collect()}
        # h1 has 3 urls at cap 2 -> parts 0 and 1; h2 -> one part
        assert set(files) == {("h1.test", 0), ("h1.test", 1), ("h2.test", 0)}
        # adversarial URL is XML-escaped on the wire
        assert "&amp;" in files[("h1.test", 0)]
        assert "y=<2>" not in files[("h1.test", 0)]
        got = {
            (r.host, r.part, r.loc, r.lastmod)
            for r in parse_sitemaps(sm).collect()
        }
        assert got == {
            ("h1.test", 0, "https://h1.test/a?x=1&y=<2>", "2025-01-01T00:00:01Z"),
            ("h1.test", 0, "https://h1.test/b", "2025-01-01T00:00:02Z"),
            ("h1.test", 1, "https://h1.test/c", "2025-01-01T00:00:03Z"),
            ("h2.test", 0, "https://h2.test/only", "2025-01-01T00:00:04Z"),
        }

    def test_file_bytes_invariant_to_partitioning(self, spark):
        from pyspark.sql import functions as F

        from text_to_graph_spark.sources.sitemap import build_sitemaps
        from text_to_graph_spark.sources.pages import synthesize_pages

        pages = synthesize_pages(spark, "/root/testdata/sf0.001")
        a = {
            (r.host, r.part): r.xml
            for r in build_sitemaps(pages).collect()
        }
        b = {
            (r.host, r.part): r.xml
            for r in build_sitemaps(pages.repartition(13)).collect()
        }
        assert a == b and a
