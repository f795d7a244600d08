"""Graph table materialization — the S7 sink at corpus scale.

The north rule materializes deduplicated nodes/edges tables "partitioned by
url-hash back into Iceberg". The sandbox has parquet, not an Iceberg
catalog, so this module reproduces the layout contract with hive-style
partition directories: ``bucket = pmod(xxhash64(key), n_buckets)`` — the
exact transform Iceberg's ``bucket(N, col)`` partition spec applies (modulo
Iceberg's murmur3 vs xxhash64 choice; swap the expression when writing
through a real catalog).

Why bucket at all: downstream point-lookups (all edges of one entity, all
nodes of one url) prune to one directory; equi-joins on the bucket key
co-locate without a shuffle when both sides share the layout; and the
bucket count bounds file counts at 10^12-row scale.

``read_*`` return the table with the bucket column attached;
``edges_of_subject`` is the pruned point-lookup whose plan
tests/test_plans.py asserts scans only its bucket's partition directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_BUCKETS = 32


def bucket_expr(col: str, n_buckets: int = DEFAULT_BUCKETS):
    return F.pmod(F.xxhash64(F.col(col)), F.lit(n_buckets)).cast("int")


def write_graph_tables(
    nodes: DataFrame,
    edges: DataFrame,
    path: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """Materialize nodes bucketed by key, edges bucketed by subject key —
    one overwrite-able layout per table, partition column ``bucket``."""
    nodes.withColumn("bucket", bucket_expr("key", n_buckets)).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(f"{path}/nodes")
    edges.withColumn("bucket", bucket_expr("subj_key", n_buckets)).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(f"{path}/edges")


def read_nodes(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/nodes")


def read_edges(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(f"{path}/edges")


def edges_of_subject(
    spark: SparkSession, path: str, subj_key: str, n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Point lookup demonstrating partition pruning: the bucket predicate is
    computable from the key alone, so only one partition directory is read
    (PartitionFilters in the scan node — asserted in tests)."""
    edges = read_edges(spark, path)
    return edges.where(
        (F.col("bucket") == bucket_expr_lit(subj_key, n_buckets))
        & (F.col("subj_key") == subj_key)
    )


def bucket_expr_lit(value: str, n_buckets: int = DEFAULT_BUCKETS):
    return F.pmod(F.xxhash64(F.lit(value)), F.lit(n_buckets)).cast("int")


def render_ntriples(edges: DataFrame) -> DataFrame:
    """Distributed RDF N-Triples export of the canonical edge table — the
    standard KG interchange the reference's CSV sink cannot speak.

    Two line families, one ``ntriple`` string column (write with
    ``.write.text()`` — a pure projection, no shuffle, any partitioning):

    - edge lines: ``<urn:t2g:node:md5(key)> <urn:t2g:pred:md5(key)>
      <urn:t2g:node:md5(key)> .`` — md5-of-key IRIs are IRI-safe by
      construction for arbitrary labels and stable across exports (no
      dense-id pass, no percent-encoding table to keep in sync).
    - label lines: ``<urn:t2g:node:md5> <urn:t2g:pred:label> "..." .``
      with N-Triples string escaping (backslash first, then quote, LF,
      CR, TAB) so round-tripping through any RDF parser is lossless.

    Deterministic: identical chained-replace escaping on both engines.
    """
    subj_iri = F.concat(F.lit("<urn:t2g:node:"), F.md5("subj_key"), F.lit(">"))
    pred_iri = F.concat(F.lit("<urn:t2g:pred:"), F.md5("pred_key"), F.lit(">"))
    obj_iri = F.concat(F.lit("<urn:t2g:node:"), F.md5("obj_key"), F.lit(">"))
    edge_lines = edges.select(
        F.concat_ws(" ", subj_iri, pred_iri, obj_iri, F.lit(".")).alias("ntriple")
    )

    def esc(col):
        # literal (non-regex) replaces; backslash first so escapes are
        # never themselves re-escaped
        out = F.replace(col, F.lit("\\"), F.lit("\\\\"))
        out = F.replace(out, F.lit('"'), F.lit('\\"'))
        out = F.replace(out, F.lit("\n"), F.lit("\\n"))
        out = F.replace(out, F.lit("\r"), F.lit("\\r"))
        out = F.replace(out, F.lit("\t"), F.lit("\\t"))
        return out

    nodes = (
        edges.select(F.col("subj_key").alias("key"))
        .unionByName(edges.select(F.col("obj_key").alias("key")))
        .distinct()
    )
    label_lines = nodes.select(
        F.concat(
            F.lit("<urn:t2g:node:"),
            F.md5("key"),
            F.lit('> <urn:t2g:pred:label> "'),
            esc(F.col("key")),
            F.lit('" .'),
        ).alias("ntriple")
    )
    return edge_lines.unionByName(label_lines)
