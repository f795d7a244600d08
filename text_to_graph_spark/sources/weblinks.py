"""Linked-pages synthesis — web pages carrying anchor links.

The build spec's input table (``sources/pages.py``) has no hyperlinks, so the
web-graph operators (``operators/weblinks.py``) get their own deterministic
twin: the same Common-Crawl-style shape ``(url, warc_ts, html, lang)`` plus a
``<nav>`` footer of three ``<a href>`` links per page. Every column is a pure
JVM-side expression of ``doc_id``/``text`` (no UDF, no RNG), so the DuckDB
oracle reproduces the corpus exactly and the link formulas below double as
the oracle's closed form.

Link model (per page ``d``, link slot ``j`` in 0..2):

- source host       ``src{d % 20}.example.test`` (20 hosts, from ``source``)
- link count        ``2 + d % 2`` (pages alternate 2 vs 3 outlinks)
- target host index ``h = ((d + 7*j + d // 20)^2) % 20`` — quadratic
  residues mod 20 land only on {0,1,4,5,9,16}, so six hosts become hubs
  with heavy in-degree and the rest get none: a deliberately skewed
  (power-law-ish) web graph, so host PageRank is non-uniform and the
  host-rollup exercises the hot-key path.
- target page id    ``p = d // 20``
- URL messiness     ``v = (d + j) % 4`` — 0 clean, 1 UPPERCASE+trailing
  slash, 2 default ``:443`` port + ``utm_source`` param, 3 ``#frag`` —
  exercising every rule in ``operators.weblinks.normalize_url`` so that raw
  variants of the same logical URL collide after canonicalization.

Reference anchor: the reference crawls real pages (`crawler.py`), where link
extraction/normalization is the canonical first step of any web-scale corpus;
the reference itself leaves links unused, so this suite is the additive
web-graph path, not a parity requirement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

N_HOSTS = 20
N_LINKS = 3


def _host_idx(j: int) -> Column:
    """Skewed target-host index: quadratic residue mod 20 of a doc/slot mix
    — lands only on {0,1,4,5,9,16}, making those hosts hubs."""
    d = F.col("doc_id")
    x = d + 7 * j + F.expr("doc_id DIV 20")
    return (x * x) % N_HOSTS


def _messy_href(j: int) -> Column:
    """Raw href for link slot ``j`` as a pure column expression of doc_id."""
    d = F.col("doc_id")
    h = _host_idx(j).cast("string")
    p = F.expr("doc_id DIV 20").cast("string")
    v = (d + j) % 4
    clean = F.concat(F.lit("https://src"), h, F.lit(".example.test/page/"), p)
    return (
        F.when(v == 1, F.concat(F.lit("HTTPS://SRC"), h,
                                F.lit(".EXAMPLE.TEST/page/"), p, F.lit("/")))
        .when(v == 2, F.concat(F.lit("https://src"), h,
                               F.lit(".example.test:443/page/"), p,
                               F.lit("?utm_source=feed")))
        .when(v == 3, F.concat(clean, F.lit("#frag")))
        .otherwise(clean)
    )


def _anchor_tag(j: int) -> Column:
    d = F.col("doc_id")
    h = _host_idx(j).cast("string")
    p = F.expr("doc_id DIV 20").cast("string")
    tag = F.concat(
        F.lit('<a href="'), _messy_href(j), F.lit('">see src'), h,
        F.lit(" p"), p, F.lit("</a>"),
    )
    if j < 2:
        return tag
    # pages alternate 2 vs 3 outlinks: slot 2 only on odd doc_id
    return F.when(d % 2 == 1, tag).otherwise(F.lit(""))


def synthesize_linked_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages table with a ``<nav>`` link footer; pure projection, no shuffle.

    At 100 TB this is just the Iceberg pages scan — the synthesis stands in
    for ``spark.read.format("iceberg").load("pages")`` exactly like
    ``sources.pages.synthesize_pages`` does for the linkless contract table.
    """
    from text_to_graph_spark.session import ensure_min_partitions
    from text_to_graph_spark.sources.pages import (
        WARC_EPOCH,
        _escaped_text,
        load_table,
    )

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))
    paragraphs = F.concat(
        F.lit("<p>"),
        F.replace(_escaped_text(F.col("text")), F.lit("\n\n"), F.lit("</p><p>")),
        F.lit("</p>"),
    )
    nav = F.concat(
        F.lit("<nav>"),
        *[_anchor_tag(j) for j in range(N_LINKS)],
        F.lit("</nav>"),
    )
    return docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.test/page/"),
            F.col("doc_id").cast("string"),
        ).alias("url"),
        F.timestamp_seconds(F.lit(WARC_EPOCH) + F.col("doc_id")).alias("warc_ts"),
        F.encode(
            F.concat(F.lit("<html><body>"), paragraphs, nav,
                     F.lit("</body></html>")),
            "utf-8",
        ).alias("html"),
        F.col("lang"),
    )


# DuckDB mirror. The oracle derives the *links* straight from the closed-form
# formulas (never re-parsing html), so the Spark regex-extraction path is
# checked against an independent derivation, not against itself.
LINKED_PAGES_LINKS_CTE = """
slots AS (SELECT * FROM (VALUES (0), (1), (2)) s(j)),
rawlinks AS (
  SELECT
    'https://' || d.source || '.example.test/page/' || d.doc_id AS src_url,
    s.j AS pos,
    CAST(((d.doc_id + 7 * s.j + d.doc_id // 20)
          * (d.doc_id + 7 * s.j + d.doc_id // 20)) % 20 AS varchar) AS h,
    CAST(d.doc_id // 20 AS varchar) AS p,
    (d.doc_id + s.j) % 4 AS v
  FROM documents d CROSS JOIN slots s
  WHERE NOT (s.j = 2 AND d.doc_id % 2 = 0)
),
links AS (
  SELECT src_url, pos,
    CASE v
      WHEN 1 THEN 'HTTPS://SRC' || h || '.EXAMPLE.TEST/page/' || p || '/'
      WHEN 2 THEN 'https://src' || h || '.example.test:443/page/' || p
                  || '?utm_source=feed'
      WHEN 3 THEN 'https://src' || h || '.example.test/page/' || p || '#frag'
      ELSE 'https://src' || h || '.example.test/page/' || p
    END AS href,
    'see src' || h || ' p' || p AS anchor
  FROM rawlinks
)
"""


def synthesize_redirects(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-step redirect table ``(src_url, dst_url)`` over the linked
    corpus: page ``d`` with ``d % 4 != 0`` permanently redirects to page
    ``d - 1`` — the deterministic stand-in for a crawl's 301 map. Chains
    run up to length 3 and terminate at multiples of 4, so the resolver
    has real multi-hop work. Pure projection + one narrow self-equi-join
    (the target page's host prefix comes from its own ``source``); the
    closed form doubles as the oracle's derivation.
    """
    from text_to_graph_spark.sources.pages import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")

    def _url(idc: Column, srcc: Column) -> Column:
        return F.concat(
            F.lit("https://"), srcc, F.lit(".example.test/page/"),
            idc.cast("string"),
        )

    tgt = docs.select(
        F.col("doc_id").alias("tgt_id"), F.col("source").alias("tgt_source")
    )
    return (
        docs.where(F.col("doc_id") % 4 != 0)
        .join(tgt, F.col("doc_id") - 1 == F.col("tgt_id"))
        .select(
            _url(F.col("doc_id"), F.col("source")).alias("src_url"),
            _url(F.col("tgt_id"), F.col("tgt_source")).alias("dst_url"),
        )
    )
