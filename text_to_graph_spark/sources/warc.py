"""WARC segment sink/source — distributed ``.warc.gz`` write and read.

Common Crawl publishes its corpus as WARC segments (gzip member per
record); this pair moves the pages input contract in and out of that
format without any driver-side loop:

- :func:`pages_to_warc_segments`: bin-pack pages into ``n_segments``
  segment blobs. ONE shuffle (the writer's bin-pack, keyed on an
  md5-bucketed url — engine-portable, no RNG); records inside a segment
  are url-sorted so segment bytes are deterministic under any input
  partitioning. At 100 TB the same ``applyInPandas`` runs with thousands
  of segment keys, each segment sized to the crawl's ~1 GiB convention.
- :func:`warc_segments_to_pages`: split each blob at gzip-member
  boundaries and parse records back to the input contract
  ``(url, warc_ts, html)`` — a shuffle-free 1->N ``mapInPandas``
  expansion, parallel by segment exactly like production reading a
  directory of ``.warc.gz`` objects with ``binaryFile``.

Reference anchor: the reference ingests one local document at a time
(`doc_utils.py:64` -> `extract_text_from_document`); the corpus-scale
equivalent of that input stage is reading crawl WARC segments, which the
reference has no path for — this source is the additive web-scale ingest
twin, like `sources/pages.py` is for the Iceberg contract table.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_to_graph_spark.kit.warc import decode_segment, encode_record

WARC_SEGMENT_SCHEMA = "segment_id int, n_records int, warc binary"
_PAGES_RAW_SCHEMA = "url string, warc_epoch long, html binary"


def pages_to_warc_segments(pages: DataFrame, n_segments: int = 8) -> DataFrame:
    """Pages -> ``(segment_id, n_records, warc)`` segment blobs."""
    sel = pages.select(
        "url",
        F.col("warc_ts").cast("long").alias("warc_epoch"),
        "html",
        F.pmod(
            F.conv(F.substring(F.md5("url"), 1, 8), 16, 10).cast("bigint"),
            F.lit(n_segments),
        )
        .cast("int")
        .alias("segment_id"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("url")
        blob = b"".join(
            encode_record(u, int(e), bytes(h))
            for u, e, h in zip(pdf["url"], pdf["warc_epoch"], pdf["html"])
        )
        return pd.DataFrame(
            {
                "segment_id": [int(pdf["segment_id"].iloc[0])],
                "n_records": [len(pdf)],
                "warc": [blob],
            }
        )

    return sel.groupBy("segment_id").applyInPandas(_pack, schema=WARC_SEGMENT_SCHEMA)


def warc_segments_to_pages(segments: DataFrame) -> DataFrame:
    """Segment blobs -> the pages input contract ``(url, warc_ts, html)``."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows: list[tuple[str, int, bytes]] = []
            for blob in pdf["warc"]:
                rows.extend(decode_segment(bytes(blob)))
            yield pd.DataFrame(rows, columns=["url", "warc_epoch", "html"])

    raw = segments.select("warc").mapInPandas(_batches, schema=_PAGES_RAW_SCHEMA)
    return raw.select(
        "url",
        F.timestamp_seconds("warc_epoch").alias("warc_ts"),
        "html",
    )
