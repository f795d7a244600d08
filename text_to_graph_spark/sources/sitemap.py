"""Sitemap connector — the crawl-seeding wire format (sitemaps.org
``urlset`` protocol; the reference crawls explicit URL lists, a production
Common-Crawl-style pipeline discovers them from per-host sitemaps).

``build_sitemaps`` renders one XML document per (host, part), honoring the
protocol's per-file URL cap (the real limit is 50 000; callers pass a
fixture-scale cap) with deterministic membership — URLs rank by raw URL
within host, so file contents are invariant to input partitioning, the
same property the WARC writer pins. ``parse_sitemaps`` is the inverse:
element split + field extraction + XML unescape, all codegen'd regex
(no XML library, no Python).

Scale shape: ONE host-keyed window rank + one (host, part) aggregation on
the build side (sitemap files are naturally host-partitioned — exactly how
crawlers fetch them); the parse side is a projection + explode. Entity
escaping covers & < > (the three XML requires in text nodes), applied
build-side and inverted parse-side so arbitrary URLs round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_HEADER = (
    '<?xml version="1.0" encoding="UTF-8"?>'
    '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
)
_FOOTER = "</urlset>"


def _xml_escape(col):
    return F.replace(
        F.replace(
            F.replace(col, F.lit("&"), F.lit("&amp;")),
            F.lit("<"),
            F.lit("&lt;"),
        ),
        F.lit(">"),
        F.lit("&gt;"),
    )


def _xml_unescape(col):
    return F.replace(
        F.replace(
            F.replace(col, F.lit("&lt;"), F.lit("<")),
            F.lit("&gt;"),
            F.lit(">"),
        ),
        F.lit("&amp;"),
        F.lit("&"),
    )


def build_sitemaps(
    pages: DataFrame, max_urls_per_file: int = 200
) -> DataFrame:
    """(host, part, xml): the urlset documents a host would serve, split
    into files of at most ``max_urls_per_file`` URLs (parts numbered from
    0 in URL order). ``lastmod`` is the page's capture timestamp in the
    protocol's ISO form."""
    w = Window.partitionBy("host").orderBy("url")
    ranked = pages.select(
        F.regexp_extract("url", r"^https?://([^/]+)", 1).alias("host"),
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias(
            "lastmod"
        ),
    ).withColumn(
        "part",
        ((F.row_number().over(w) - 1) / max_urls_per_file).cast("int"),
    )
    entry = F.concat(
        F.lit("<url><loc>"),
        _xml_escape(F.col("url")),
        F.lit("</loc><lastmod>"),
        F.col("lastmod"),
        F.lit("</lastmod></url>"),
    )
    return (
        ranked.withColumn("entry", entry)
        .groupBy("host", "part")
        .agg(
            F.concat(
                F.lit(_HEADER),
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("url", "entry"))
                        ),
                        lambda s: s["entry"],
                    ),
                    "",
                ),
                F.lit(_FOOTER),
            ).alias("xml")
        )
    )


def parse_sitemaps(sitemaps: DataFrame) -> DataFrame:
    """Inverse of :func:`build_sitemaps`: (host, part, loc, lastmod) rows
    recovered from the XML — non-greedy element split, per-element field
    extraction, entity unescape."""
    el = sitemaps.select(
        "host",
        "part",
        F.explode(
            F.regexp_extract_all("xml", F.lit(r"<url>(.*?)</url>"), F.lit(1))
        ).alias("el"),
    )
    return el.select(
        "host",
        "part",
        _xml_unescape(
            F.regexp_extract("el", r"<loc>(.*?)</loc>", 1)
        ).alias("loc"),
        F.regexp_extract("el", r"<lastmod>(.*?)</lastmod>", 1).alias(
            "lastmod"
        ),
    )
