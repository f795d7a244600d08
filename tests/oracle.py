"""Single-process pandas oracle of the full KG pipeline (SURVEY.md §5).

Implements the reference semantics (chunk -> extract -> canonicalize) using
the *same* pure kit functions the Spark UDFs call, plus independent pandas
group logic for the canonical merges — this is the "reference output"
generator for the P/R and byte-identical-text assertions.
"""

from __future__ import annotations

import pandas as pd

from text_to_graph_spark.kit.chunker import pack_units
from text_to_graph_spark.kit.extract import get_model
from text_to_graph_spark.kit.htmlcodec import extract_text_from_html
from text_to_graph_spark.kit.sanitize import sanitize


def oracle_extract(pages: pd.DataFrame) -> pd.DataFrame:
    """(url, html) -> (url, text)."""
    return pd.DataFrame(
        {"url": pages["url"], "text": pages["html"].map(extract_text_from_html)}
    )


def oracle_chunks(extracted: pd.DataFrame, chunk_size: int = 1000) -> pd.DataFrame:
    rows = []
    for url, text in zip(extracted["url"], extracted["text"]):
        for r in pack_units(text, chunk_size):
            r["url"] = url
            rows.append(r)
    return pd.DataFrame(
        rows,
        columns=["url", "chunk_index", "chunk_size", "token_start", "token_end", "text"],
    )


def oracle_triples(chunks: pd.DataFrame, model_name: str = "vocab") -> pd.DataFrame:
    """(url, chunk_index, text) -> (url, chunk_index, pos, subj, pred, obj)."""
    model = get_model(model_name)
    t = model.triples(chunks["text"].reset_index(drop=True))
    if t.empty:
        return pd.DataFrame(columns=["url", "chunk_index", "pos", "subj", "pred", "obj"])
    meta = chunks[["url", "chunk_index"]].reset_index(drop=True)
    t = t.join(meta, on="row")
    return t[["url", "chunk_index", "pos", "subj", "pred", "obj"]]


def _key(s: str) -> str:
    return sanitize(s).lower()


def oracle_canonical_edges(triples: pd.DataFrame) -> pd.DataFrame:
    """Reference merge semantics (graph_utils.py:50-64): dedup on lowered
    sanitized (subj, pred, obj); first occurrence (url, chunk_index, pos
    order) wins the display label."""
    t = triples.copy()
    for c in ("subj", "pred", "obj"):
        t[c + "_key"] = t[c].map(_key)
        t[c + "_s"] = t[c].map(sanitize)
    t = t[(t["subj_key"] != "") & (t["obj_key"] != "")]
    t = t.sort_values(["url", "chunk_index", "pos"], kind="mergesort")
    g = t.groupby(["subj_key", "pred_key", "obj_key"], sort=False)
    out = g.agg(
        subj_label=("subj_s", "first"),
        pred_label=("pred_s", "first"),
        obj_label=("obj_s", "first"),
        n_docs=("url", "nunique"),
        n_occurrences=("url", "size"),
    ).reset_index()
    return out


def oracle_canonical_nodes(triples: pd.DataFrame) -> pd.DataFrame:
    """Node per distinct participant key; first-occurrence label with the
    explicit total order (url, chunk_index, pos, role subj<obj)."""
    subj = triples[["url", "chunk_index", "pos", "subj"]].rename(
        columns={"subj": "raw"}
    )
    subj["role"] = 0
    obj = triples[["url", "chunk_index", "pos", "obj"]].rename(columns={"obj": "raw"})
    obj["role"] = 1
    occ = pd.concat([subj, obj], ignore_index=True)
    occ["label_s"] = occ["raw"].map(sanitize)
    occ["key"] = occ["label_s"].str.lower()
    occ = occ[occ["key"] != ""]
    occ = occ.sort_values(["url", "chunk_index", "pos", "role"], kind="mergesort")
    g = occ.groupby("key", sort=False)
    out = g.agg(label=("label_s", "first"), n_docs=("url", "nunique")).reset_index()
    return out
