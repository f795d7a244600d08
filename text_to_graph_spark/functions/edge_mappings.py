"""Predicate (edge-label) remapping — the reference's ``edge_utils`` analog.

The reference ships a dict-driven predicate renamer: ``extract_edge_labels``
collects the distinct edge labels of a graph JSON and ``apply_edge_mappings``
rewrites each edge's label through a ``{old: new}`` mapping, leaving
unmapped labels untouched (``graph_extractor/src/edge_utils.py:6-41``).

Spark-first: the mapping is a small DataFrame broadcast-joined against the
edge stream (left join + coalesce) — the edge table never shuffles. After a
remap two formerly-distinct predicates may collide on the same
(src, pred, obj) key, so ``apply_edge_mappings`` re-aggregates with the same
dedup key the canonical merge uses (``graph_utils.py:61-64``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# deterministic default mapping (mirrored into the DuckDB oracle as a VALUES
# literal): normalize predicate synonyms the same way the reference's JSON
# mapping files do (module_tests/test_data/edge_utils/*.json are the shape).
EDGE_MAPPINGS: dict[str, str] = {
    "scan": "read",
    "filter": "select",
    "group": "aggregate",
}


def edge_mapping_table(spark: SparkSession) -> DataFrame:
    rows = sorted(EDGE_MAPPINGS.items())
    return spark.createDataFrame(rows, "old_label string, new_label string")


def extract_edge_labels(edges: DataFrame, label_col: str = "pred_key") -> DataFrame:
    """Distinct sorted edge labels (``edge_utils.py:6-26``)."""
    return edges.select(F.col(label_col).alias("label")).distinct()


def apply_edge_mappings(
    edges: DataFrame,
    mapping: DataFrame,
    src: str = "subj_key",
    dst: str = "obj_key",
    label_col: str = "pred_key",
) -> DataFrame:
    """Rewrite edge labels through the mapping; unmapped labels pass through
    (``edge_utils.py:29-41``), then re-dedup on the canonical edge key.

    Output: (src, pred, dst, n_docs, n_occurrences) with counts re-merged
    across collided predicates when the input carries them.
    """
    joined = edges.join(
        F.broadcast(mapping.withColumnRenamed("old_label", label_col)),
        label_col,
        "left",
    ).withColumn("_pred", F.coalesce(F.col("new_label"), F.col(label_col)))
    aggs = []
    if "doc_ids" in edges.columns:
        # true doc-set union across collided predicates, then recount
        aggs.append(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_set("doc_ids")))
            ).alias("doc_ids")
        )
    if "n_occurrences" in edges.columns:
        aggs.append(F.sum("n_occurrences").alias("n_occurrences"))
    if not aggs:
        aggs = [F.count(F.lit(1)).alias("n_merged")]
    out = joined.groupBy(
        F.col(src).alias(src), F.col("_pred").alias(label_col), F.col(dst).alias(dst)
    ).agg(*aggs)
    if "doc_ids" in edges.columns:
        out = out.withColumn("n_docs", F.size("doc_ids").cast("long"))
    return out
