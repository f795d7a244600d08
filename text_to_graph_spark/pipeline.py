"""End-to-end KG construction pipeline: pages -> canonical nodes/edges.

The stage DAG (SURVEY.md §7.1), each stage a DataFrame transformation; at
scale each stage boundary is an Iceberg checkpoint table (sandbox: parquet —
see ``sources/checkpoint.py``):

    pages (url, warc_ts, html, text, lang)
      -> extracted (url, text)            mapInPandas, byte-identical
      -> chunks (url, chunk_index, ...)   applyInPandas greedy packer
      -> triples (url, chunk_index, pos, subj, pred, obj)   mapInPandas model
      -> canonical edges + nodes          groupBy/min_by/collect_set
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_to_graph_spark.kit.extract import ENTITY_CATEGORIES
from text_to_graph_spark.operators.canonicalize import (
    triples_to_canonical_edges,
    triples_to_canonical_nodes,
)
from text_to_graph_spark.operators.chunking import chunk_pages
from text_to_graph_spark.operators.extraction import (
    extract_mentions,
    extract_text,
    extract_triples,
)


@dataclass(frozen=True)
class PipelineConfig:
    """Identity of a run — hashed into every checkpoint key (the reference's
    Configurations row, ``sqlite_support.py:50-60``)."""

    model: str = "vocab"
    chunk_size: int = 1000
    overlap: int = 0
    # extraction impl: "pandas" (staged contract path) | "sql" (pure
    # Catalyst) | "fused" (single mapInPandas, fastest — no stage tables)
    impl: str = "pandas"
    lang_filter: str | None = None
    # content-hash pre-dedup (the reference never re-extracts identical
    # bytes, graph_generator.py:341-358): keep one page per sha256(html),
    # min(url) wins deterministically. Essential at CC scale.
    dedup_pages: bool = False
    # C5 token counter: "whitespace" (reference fallback, gpt.py:32-34),
    # "pretoken" (BPE pre-tokenizer regex pieces), or "bpe" (trained
    # merges; pass merges to chunk_pages directly for that path)
    token_counter: str = "whitespace"

    def config_id(self) -> str:
        import hashlib
        import json

        blob = json.dumps(self.__dict__, sort_keys=True)
        return hashlib.sha256(blob.encode()).hexdigest()[:16]


def vocab_category_table(spark: SparkSession) -> DataFrame:
    rows = [(k, v) for k, v in sorted(ENTITY_CATEGORIES.items())]
    return spark.createDataFrame(rows, "key string, type string")


def run_pipeline_checkpointed(
    spark: SparkSession,
    pages: DataFrame,
    workdir: str,
    cfg: PipelineConfig = PipelineConfig(),
) -> dict[str, DataFrame]:
    """The stage DAG with every boundary materialized through
    ``StageCheckpoint`` — the production shape: a killed run resumes from
    the last completed stage table (reference ``optimization_on`` semantics,
    ``graph_generator.py:183``), reruns recompute only missing keys, and
    every materialization appends per-partition lineage metrics.
    """
    from text_to_graph_spark.operators.extraction import (
        extract_mentions as _mentions,
    )
    from text_to_graph_spark.sources.checkpoint import StageCheckpoint

    ck = StageCheckpoint(spark, workdir)
    cid = cfg.config_id()
    if cfg.lang_filter:
        pages = pages.where(F.col("lang") == cfg.lang_filter)
    if cfg.dedup_pages:
        pages = dedup_pages_by_content(pages)

    extracted = ck.resume(
        pages, "extracted", cid, ["url"],
        lambda missing: extract_text(missing),
    )
    chunks = ck.resume(
        extracted, "chunks", cid, ["url"],
        lambda missing: chunk_pages(
            missing, chunk_size=cfg.chunk_size,
            token_counter=cfg.token_counter,
        ),
    )
    triples = ck.resume(
        chunks, "triples", cid, ["url"],
        # fused has no stage tables; under checkpointing it runs staged pandas
        lambda missing: extract_triples(
            missing, cfg.model, impl="sql" if cfg.impl == "sql" else "pandas"
        ),
    )
    # canonicalization is a global aggregate — rewritten wholesale per run
    # (cheap relative to extraction; keyed resume does not apply to a
    # whole-corpus groupBy)
    edges = ck.write(triples_to_canonical_edges(triples), "edges", cid)
    cats = vocab_category_table(spark) if cfg.model == "vocab" else None
    nodes = ck.write(
        triples_to_canonical_nodes(triples, category_of=cats), "nodes", cid
    )
    mentions = _mentions(chunks.select("url", "chunk_index", "text"), cfg.model)
    return {
        "pages": pages,
        "extracted": extracted,
        "chunks": chunks,
        "mentions": mentions,
        "triples": triples,
        "edges": edges,
        "nodes": nodes,
        "checkpoint": ck,  # type: ignore[dict-item]
    }


def dedup_pages_by_content(pages: DataFrame) -> DataFrame:
    """One page per distinct html content: ``sha2(html, 256)`` group, the
    lexicographically smallest url is the deterministic representative (the
    reference's never-re-extract-same-bytes cache, generalized — Common
    Crawl is massively duplicated, so this typically drops most of the
    corpus before the expensive extraction stage)."""
    h = pages.withColumn("_h", F.sha2("html", 256))
    reps = h.groupBy("_h").agg(F.min("url").alias("url"))
    return h.join(reps, ["_h", "url"], "left_semi").drop("_h")


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    cfg: PipelineConfig = PipelineConfig(),
) -> dict[str, DataFrame]:
    """Run pages -> graph; returns every stage for checkpointing/inspection."""
    if cfg.lang_filter:
        pages = pages.where(F.col("lang") == cfg.lang_filter)
    if cfg.dedup_pages:
        pages = dedup_pages_by_content(pages)
    if cfg.impl == "fused":
        from text_to_graph_spark.operators.extraction import (
            extract_triples_from_pages,
        )

        triples = extract_triples_from_pages(
            pages, cfg.model, chunk_size=cfg.chunk_size
        )
        edges = triples_to_canonical_edges(triples)
        cats = vocab_category_table(spark) if cfg.model == "vocab" else None
        nodes = triples_to_canonical_nodes(triples, category_of=cats)
        return {"pages": pages, "triples": triples, "edges": edges, "nodes": nodes}
    extracted = extract_text(pages)
    chunks = chunk_pages(
        extracted, chunk_size=cfg.chunk_size, token_counter=cfg.token_counter
    )
    if cfg.overlap > 0:
        from text_to_graph_spark.operators.chunking import with_neighbor_context

        ctx = with_neighbor_context(chunks, cfg.chunk_size, cfg.overlap)
        chunk_input = ctx.select(
            "url", "chunk_index", F.col("context_text").alias("text")
        )
    else:
        chunk_input = chunks.select("url", "chunk_index", "text")
    mentions = extract_mentions(chunk_input, cfg.model)
    triples = extract_triples(chunk_input, cfg.model, impl=cfg.impl)
    edges = triples_to_canonical_edges(triples)
    cats = vocab_category_table(spark) if cfg.model == "vocab" else None
    nodes = triples_to_canonical_nodes(triples, category_of=cats)
    return {
        "pages": pages,
        "extracted": extracted,
        "chunks": chunks,
        "mentions": mentions,
        "triples": triples,
        "edges": edges,
        "nodes": nodes,
    }
