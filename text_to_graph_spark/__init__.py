"""text_to_graph_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch re-expression of the computed semantics of the reference
``nobody-qwert/text-to-graph`` (text -> (entity, relation, entity) triples ->
canonicalized nodes/edges tables) as Spark DataFrame stages:

- pages scan (Iceberg in production; Parquet in this sandbox)
- HTML -> text extraction (vectorized pandas UDF, byte-identical per url)
- greedy token-budget chunking (``groupBy(url).applyInPandas``)
- deterministic batched mention detection + open-IE triple extraction
  (``mapInPandas``; the reference's LLM call is replaced by a deterministic
  batched model per the build contract)
- entity canonicalization as hash/broadcast joins + salted aggregation
- connected components (large-star/small-star) for coreferent-node merging
- checkpoint-resumable stage boundaries (anti-join on stage keys)

plus the large-scale training-data operators a 100 TB corpus pipeline needs:
dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
similarity search, text quality stats, and multimodal column plumbing.
"""

__version__ = "0.1.0"
