"""Legacy-encoding pages synthesis + the sniff-and-extract ingest stage.

The contract pages table (``sources/pages.py``) is clean utf-8; this twin
stands in for the messy slice of a real crawl: the same html wrap encoded
as BOM'd utf-16 (LE and BE), windows-1252, or plain utf-8, with a per-page
non-ASCII decoration so the encodings genuinely differ on the wire (an
ASCII-only corpus would make every sniff verdict vacuous).

Synthesis rule (pure function of ``doc_id``/``text``/``source``, so the
DuckDB oracle recomputes the expected output arithmetically):

- url        = ``https://legacy.test/{source}/page/{doc_id}``
- decoration = by ``doc_id % 4``: ``' ☂雨'`` / ``' ☃λ'`` / ``' Ω≈'`` /
  ``' €é'`` (the last chosen to be invalid utf-8 as cp1252 bytes, so the
  sniff MUST fall through to windows-1252)
- encoding   = by ``doc_id % 4``: utf-8 / utf-16-le / utf-16-be /
  windows-1252 (utf-16 variants BOM-prefixed, as shipped by real servers)

:func:`transcode_extract` is the ingest stage: sniff (``kit/charset.py``),
decode, and run the standard html->text extraction on the transcoded
document — ONE ``mapInPandas`` projection, shuffle-free, parallel by input
split; at 100 TB this fuses with the extraction stage it feeds.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_to_graph_spark.kit.charset import detect_decode
from text_to_graph_spark.kit.htmlcodec import extract_text_from_html, wrap_text_as_html

_DECOR = [" ☂雨", " ☃λ", " Ω≈", " €é"]
_ENC = ["utf-8", "utf-16-le", "utf-16-be", "windows-1252"]
_PY_CODEC = {"utf-8": "utf-8", "utf-16-le": "utf-16-le",
             "utf-16-be": "utf-16-be", "windows-1252": "cp1252"}
_BOM = {"utf-16-le": b"\xff\xfe", "utf-16-be": b"\xfe\xff"}


def synthesize_legacy_pages(spark, sf_dir: str) -> DataFrame:
    """(url, html) with html in a doc_id-selected legacy encoding."""
    from text_to_graph_spark.session import ensure_min_partitions
    from text_to_graph_spark.sources.pages import load_table

    docs = ensure_min_partitions(load_table(spark, sf_dir, "documents"))

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            urls, blobs = [], []
            for doc_id, text, source in zip(
                pdf["doc_id"], pdf["text"], pdf["source"]
            ):
                k = int(doc_id) % 4
                # wrap_text_as_html returns utf-8 bytes of the canonical
                # wrap; re-encode the decoded wrap in the legacy charset
                page = wrap_text_as_html(str(text) + _DECOR[k]).decode("utf-8")
                blob = _BOM.get(_ENC[k], b"") + page.encode(_PY_CODEC[_ENC[k]])
                urls.append(f"https://legacy.test/{source}/page/{int(doc_id)}")
                blobs.append(blob)
            yield pd.DataFrame({"url": urls, "html": blobs})

    return docs.select("doc_id", "text", "source").mapInPandas(
        _batches, schema="url string, html binary"
    )


def transcode_extract(pages: DataFrame) -> DataFrame:
    """Sniff + decode + extract: (url, html:binary) -> (url, encoding,
    text). A poisoned row (sniffed fine but not the html wrap) yields a
    null text, never a task failure — same policy as the utf-8 extractor.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            encs, texts = [], []
            for blob in pdf["html"]:
                enc, decoded = detect_decode(bytes(blob))
                encs.append(enc)
                texts.append(extract_text_from_html(decoded.encode("utf-8")))
            yield pd.DataFrame(
                {"url": pdf["url"], "encoding": encs, "text": texts}
            )

    return pages.select("url", "html").mapInPandas(
        _batches, schema="url string, encoding string, text string"
    )
