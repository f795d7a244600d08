"""Reference wire-format response source — the compat ingestion path (S9).

The reference caches every extractor response as two CSV tables in one text
blob (nodes ``id,entity,category``, edges ``source,target,relationship`` —
``graph_extractor/src/prompts.py:30-42``, parsed at
``response_parser.py:10-207``). An engine replacing it must be able to
*ingest* that wire format: existing SQLite caches become DataFrames without
re-running extraction.

``parse_responses`` maps the shared ``kit.parser`` (golden-tested against
the reference's own inline fixture texts) over a DataFrame of raw response
blobs inside ``mapInPandas`` — one Arrow batch per invocation, the parser is
pure Python per blob (wire blobs are small; the corpus-scale path emits
structs directly and never materializes CSV).

``render_response`` is the inverse — triples back to the wire format — so
round-trip identity is testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

RESPONSE_NODES_SCHEMA = (
    "url string, chunk_index int, node_id int, label string, type string"
)
RESPONSE_EDGES_SCHEMA = (
    "url string, chunk_index int, source int, target int, label string"
)


def parse_responses(
    responses: DataFrame,
    url_col: str = "url",
    chunk_col: str = "chunk_index",
    text_col: str = "response_text",
) -> tuple[DataFrame, DataFrame]:
    """(url, chunk_index, response_text) -> (nodes_df, edges_df).

    Reference semantics per blob: hard rejects (bad header, duplicate node
    ids) drop the whole response (``response_parser.py:59-61,125-128``);
    malformed rows are skipped; orphan nodes pruned + dense reindex
    (``response_parser.py:178-207``).
    """
    from pyspark.sql import functions as F

    from text_to_graph_spark.kit.parser import parse_response_text

    cols = responses.select(
        url_col, chunk_col, text_col
    ).withColumnsRenamed({url_col: "url", chunk_col: "chunk_index", text_col: "response_text"})

    # ONE parse per blob: a single mapInPandas emits node and edge rows in a
    # combined frame (kind-discriminated), materialized once and split by
    # filter — the two-pass shape parsed every blob twice and re-executed
    # the upstream lineage for each output
    combined_schema = (
        "url string, chunk_index int, kind string, "
        "a int, b int, label string, type string"
    )

    def _both(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for url, ci, text in zip(
                pdf["url"], pdf["chunk_index"], pdf["response_text"]
            ):
                nodes, edges = parse_response_text(text)
                if nodes is None:
                    continue
                ci = int(ci)
                out.extend(
                    (url, ci, "node", int(node_id), None, str(label), str(typ))
                    for node_id, label, typ in zip(
                        nodes.index, nodes["label"], nodes["type"]
                    )
                )
                if edges is None:
                    continue
                out.extend(
                    (url, ci, "edge", int(s), int(t), str(lbl), None)
                    for s, t, lbl in zip(
                        edges["source"], edges["target"], edges["label"]
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["url", "chunk_index", "kind", "a", "b", "label", "type"],
            )

    combined = cols.mapInPandas(_both, schema=combined_schema).localCheckpoint(
        eager=False
    )
    nodes_df = combined.where(F.col("kind") == "node").select(
        "url",
        "chunk_index",
        F.col("a").alias("node_id"),
        "label",
        "type",
    )
    edges_df = combined.where(F.col("kind") == "edge").select(
        "url",
        "chunk_index",
        F.col("a").alias("source"),
        F.col("b").alias("target"),
        "label",
    )
    return nodes_df, edges_df


def render_response(
    nodes: list[tuple[int, str, str]], edges: list[tuple[int, int, str]]
) -> str:
    """Triples -> the reference wire format (inverse of the parser).

    Quoting matches the reference's CSV contract: fields containing commas
    or quotes are double-quoted.
    """
    import csv
    import io

    buf = io.StringIO()
    w = csv.writer(buf, lineterminator="\n")
    w.writerow(["id", "entity", "category"])
    for node_id, label, typ in nodes:
        w.writerow([node_id, label, typ])
    w.writerow(["source", "target", "relationship"])
    for src, dst, label in edges:
        w.writerow([src, dst, label])
    return buf.getvalue()
