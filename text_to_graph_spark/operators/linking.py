"""Entity linking + coreference blocking — the beyond-exact-label merge.

The reference canonicalizes entities *only* by exact ``lower(sanitize(label))``
equality (``graph_extractor/src/graph_utils.py:29-30``). The build contract
extends this with the standard large-scale linking stack, expressed
Spark-first:

1. **Alias resolution** (`link_mentions`): mention surface forms are joined
   against a small candidate alias table with a ``broadcast`` hash join —
   the alias table is the small side by construction (dictionary-sized vs a
   web-scale mention stream), so no shuffle of the mention stream happens at
   all. Hot surface forms ("the company") skew *map* work only, which Spark
   balances across input partitions; an optional value-derived salt is
   provided for the pathological reduce-side case (`salted=True` routes the
   post-join aggregation through a two-phase salted groupBy).

2. **Near-duplicate surface-form blocking** (`coref_candidate_pairs`):
   character-3-gram MinHash/LSH over canonical labels. Signatures and bands
   are md5-based (portable across engines, deterministic), candidates are
   band-bucket self-join pairs, verified with exact n-gram Jaccard — the
   classic block-then-verify shape: the O(n²) comparison collapses to a
   bucket-equi-join that Catalyst executes as a shuffle hash join on the
   band hash.

3. **Coreferent-node merge** (`coref_components`, `merge_coreferent_nodes`):
   verified pairs form an undirected graph; connected components
   (small-star/large-star fixpoint, ``operators/components.py``) assign one
   canonical key per cluster; node/edge tables are remapped with broadcast
   joins exactly like the reference's ``entity_id_map`` remap
   (``graph_utils.py:47-59``) — the component map is ≤ the distinct-label
   count, far smaller than the edge stream.

At 100 TB the mention stream is the only big table in sight; every join here
keeps it shuffle-free (broadcast) or joins on a pre-hashed bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from text_to_graph_spark.functions.portable import round_half_up
from text_to_graph_spark.operators.components import connected_components

# ---------------------------------------------------------------------------
# deterministic alias dictionary (single source of truth, mirrored into the
# DuckDB oracle as a VALUES literal by __spark_entry__.py)
# ---------------------------------------------------------------------------

# alias (lower) -> canonical label. Identity aliases are implicit; these add
# the non-trivial many-to-one mappings the linking stage must resolve.
ALIASES: dict[str, str] = {
    "row": "record",
    "line": "record",
    "column": "field",
    "key": "field",
    "vector": "embedding",
    "stream": "data",
    "value": "data",
    "dup": "duplicate",
    "agg": "aggregate",
    "part": "partition",
}


def alias_table(spark: SparkSession) -> DataFrame:
    """(alias, canonical_label) — the broadcast-side candidate table."""
    rows = sorted(ALIASES.items())
    return spark.createDataFrame(rows, "alias string, canonical_label string")


def link_mentions(
    mentions: DataFrame,
    aliases: DataFrame,
    mention_col: str = "mention",
) -> DataFrame:
    """Resolve each mention to its canonical label via the alias table.

    Left broadcast join; unmatched mentions resolve to their normalized
    (lower-cased, trimmed) surface form — the same key the join uses, and
    the same normalization canonicalization applies downstream. Output adds
    ``canonical_label`` and ``linked:boolean``. The
    mention stream never shuffles — the only exchange in the plan is the
    broadcast of the (tiny) alias table.
    """
    key = F.lower(F.trim(F.col(mention_col)))
    out = mentions.withColumn("_alias_key", key).join(
        F.broadcast(aliases.withColumnRenamed("alias", "_alias_key")),
        "_alias_key",
        "left",
    )
    return (
        out.withColumn("linked", F.col("canonical_label").isNotNull())
        .withColumn(
            "canonical_label",
            F.coalesce(F.col("canonical_label"), F.col("_alias_key")),
        )
        .drop("_alias_key")
    )


def linked_mention_counts(
    mentions: DataFrame, aliases: DataFrame, salted: bool = False, buckets: int = 16
) -> DataFrame:
    """Canonical-label occurrence counts after linking.

    ``salted=True`` demonstrates the two-phase aggregation for a
    pathologically hot canonical label: partial counts per (label, salt)
    where salt derives from the url hash (deterministic under retries —
    never rand()), then a final merge. With map-side partial aggregation the
    unsalted path already absorbs most skew; both paths produce identical
    results and tests assert so.
    """
    linked = link_mentions(mentions, aliases)
    if not salted:
        return linked.groupBy("canonical_label").agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("url").alias("n_docs"),
        )
    salted_df = linked.withColumn(
        "_salt", F.pmod(F.xxhash64("url"), F.lit(buckets))
    )
    partial = salted_df.groupBy("canonical_label", "_salt").agg(
        F.count(F.lit(1)).alias("_n"),
        F.collect_set("url").alias("_urls"),
    )
    return partial.groupBy("canonical_label").agg(
        F.sum("_n").alias("n_occurrences"),
        F.size(F.array_distinct(F.flatten(F.collect_list("_urls")))).cast(
            "long"
        ).alias("n_docs"),
    )


# ---------------------------------------------------------------------------
# character-n-gram MinHash/LSH blocking over labels
# ---------------------------------------------------------------------------

N_HASHES = 4  # md5-minhash functions, one band each (bands=4, rows=1)


def _char_ngrams(col, n: int = 3):
    """Distinct character n-grams of a label as an array — built-ins only.

    For labels shorter than n the whole label is the single gram, so every
    label gets a non-empty gram set.
    """
    padded = F.lower(F.trim(col))
    idx = F.sequence(
        F.lit(1), F.greatest(F.length(padded) - F.lit(n - 1), F.lit(1))
    )
    grams = F.transform(idx, lambda i: F.substring(padded, i, n))
    return F.array_distinct(grams)


def label_minhash(labels: DataFrame, label_col: str = "label") -> DataFrame:
    """Per-label md5-minhash signature over character 3-grams.

    One signature column per hash function: ``min(md5('<i>#' || gram))`` —
    the identical formula the DuckDB oracle uses, so signatures are
    cross-engine comparable hex strings.
    """
    g = labels.select(
        F.col(label_col).alias("label"), _char_ngrams(F.col(label_col)).alias("_grams")
    )
    exploded = g.select("label", F.explode("_grams").alias("gram"))
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}#"), F.col("gram")))).alias(f"mh{i}")
        for i in range(N_HASHES)
    ]
    return exploded.groupBy("label").agg(*aggs)


def coref_candidate_pairs(
    labels: DataFrame, label_col: str = "label", threshold: float = 0.5
) -> DataFrame:
    """LSH-blocked label pairs with exact char-3-gram Jaccard >= threshold.

    Block: self-join on (band, band-hash) — a bucket equi-join, never the
    full cross product. Verify: exact Jaccard via distinct-gram sets
    (intersection by an equi-join on gram, sizes from per-label counts).
    Output: (label_a, label_b, jaccard) with label_a < label_b.
    """
    # signatures feed N_HASHES union branches x 2 join sides: materialize once
    sig = label_minhash(labels, label_col).localCheckpoint(eager=True)
    bands = None
    for i in range(N_HASHES):
        b = sig.select(
            "label", F.col(f"mh{i}").alias("h"), F.lit(i).alias("band")
        )
        bands = b if bands is None else bands.unionByName(b)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.label") < F.col("b.label")),
        )
        .select(
            F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b")
        )
        .distinct()
    )

    grams = (
        labels.select(
            F.col(label_col).alias("label"), _char_ngrams(F.col(label_col)).alias("g")
        )
        .select("label", F.explode("g").alias("gram"))
        .distinct()
        .localCheckpoint(eager=True)  # reused by sizes + both join sides
    )
    sizes = grams.groupBy("label").agg(F.count(F.lit(1)).alias("sz"))

    # intersection size via equi-join on gram
    ga = grams.select(F.col("label").alias("label_a"), "gram")
    gb = grams.select(F.col("label").alias("label_b"), "gram")
    inter = (
        cand.join(ga, "label_a")
        .join(gb, ["label_b", "gram"])
        .groupBy("label_a", "label_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.withColumnRenamed("label", "label_a").withColumnRenamed("sz", "sz_a")
    sb = sizes.withColumnRenamed("label", "label_b").withColumnRenamed("sz", "sz_b")
    jac = (
        inter.join(sa, "label_a")
        .join(sb, "label_b")
        .withColumn(
            "jaccard",
            round_half_up(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double"),
                4,
            ),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return jac.select("label_a", "label_b", "jaccard")


def coref_components(
    labels: DataFrame, label_col: str = "label", threshold: float = 0.5
) -> DataFrame:
    """(label, canonical) — every label mapped to the min label of its
    near-duplicate cluster (singleton labels map to themselves)."""
    pairs = coref_candidate_pairs(labels, label_col, threshold)
    comp = connected_components(pairs, src="label_a", dst="label_b")
    all_labels = labels.select(F.col(label_col).alias("label")).distinct()
    return (
        all_labels.join(comp.withColumnRenamed("node", "label"), "label", "left")
        .withColumn("canonical", F.coalesce(F.col("component"), F.col("label")))
        .select("label", "canonical")
    )


def merge_coreferent_nodes(
    nodes: DataFrame, coref_map: DataFrame, key_col: str = "key"
) -> DataFrame:
    """Remap node keys through the coref map and re-merge — the reference's
    ``entity_id_map`` remap (``graph_utils.py:47-59``) with the map as a
    broadcast join (component map ≪ node table)."""
    mapped = nodes.join(
        F.broadcast(coref_map.withColumnRenamed("label", key_col)),
        key_col,
        "left",
    ).withColumn("_ckey", F.coalesce(F.col("canonical"), F.col(key_col)))
    return mapped.groupBy(F.col("_ckey").alias(key_col)).agg(
        F.min("label").alias("label"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_set("types")))).alias(
            "types"
        ),
        F.array_sort(F.array_distinct(F.flatten(F.collect_set("doc_ids")))).alias(
            "doc_ids"
        ),
    ).withColumn("n_docs", F.size("doc_ids"))
