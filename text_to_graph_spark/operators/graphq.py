"""Graph read-path queries — the viewer's query semantics, distributed.

Each function mirrors a query the reference's HTML/D3 viewer executes
client-side over the produced nodes/edges tables
(``webpages/standalone_graph_viewer/template/dev/data_renderer.js``):

- ``node_type_counts``  — A6, ``data_renderer.js:104-110``
- ``edge_label_counts`` — A8, ``data_renderer.js:125-131``
- ``node_degrees``      — A7, ``computeNodeLabelEdgeCounts``,
  ``data_renderer.js:439-485``
- ``merge_parallel_edges`` — A9, ``data_renderer.js:623-646``
- ``filter_subgraph``   — G1/G5 multi-filter, ``data_renderer.js:275-436``
- top-k + the 1500-edge viewer cap — T3/T4, ``data_renderer.js:148-202,602``

All are single groupBy/join shapes — broadcast where one side is known-small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def node_type_counts(nodes: DataFrame) -> DataFrame:
    """count(*) per node type; types is array<string> -> per-element."""
    return (
        nodes.select(F.explode("types").alias("type"))
        .groupBy("type")
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )


def edge_label_counts(edges: DataFrame, label_col: str = "pred_key") -> DataFrame:
    return edges.groupBy(F.col(label_col).alias("predicate")).agg(
        F.count(F.lit(1)).alias("n_edges")
    )


def node_degrees(edges: DataFrame, src: str = "subj_key", dst: str = "obj_key") -> DataFrame:
    """Per-node degree: out + in over the deduped canonical edge list."""
    endpoints = edges.select(F.col(src).alias("key"), F.lit(1).alias("out_d"), F.lit(0).alias("in_d")).unionByName(
        edges.select(F.col(dst).alias("key"), F.lit(0).alias("out_d"), F.lit(1).alias("in_d"))
    )
    return endpoints.groupBy("key").agg(
        F.sum("out_d").alias("out_degree"),
        F.sum("in_d").alias("in_degree"),
        F.count(F.lit(1)).alias("degree"),
    )


def merge_parallel_edges(
    edges: DataFrame, src: str = "subj_key", dst: str = "obj_key", label: str = "pred_key"
) -> DataFrame:
    """Group parallel edges per (src, dst): sorted distinct predicate list,
    rendered '|'-joined at export (viewer A9)."""
    return edges.groupBy(src, dst).agg(
        F.array_sort(F.collect_set(label)).alias("predicates"),
        F.count(F.lit(1)).alias("n_edges"),
    )


def filter_subgraph(
    nodes: DataFrame,
    edges: DataFrame,
    node_types: list[str] | None = None,
    edge_labels: list[str] | None = None,
    edge_cap: int | None = 1500,
) -> tuple[DataFrame, DataFrame]:
    """G1/G5 multi-filter + the viewer's 1500-edge render cap (T4).

    Nodes filtered by type membership; edges kept only when both endpoints
    survive (left_semi, the viewer's set-membership check,
    ``data_renderer.js:718-723``).
    """
    n = nodes
    if node_types:
        n = n.where(F.arrays_overlap("types", F.array(*[F.lit(t) for t in node_types])))
    e = edges
    if edge_labels:
        e = e.where(F.col("pred_key").isin(edge_labels))
    kept = n.select(F.col("key").alias("_k"))
    e = (
        e.join(kept.withColumnRenamed("_k", "subj_key"), "subj_key", "left_semi")
        .join(kept.withColumnRenamed("_k", "obj_key"), "obj_key", "left_semi")
    )
    if edge_cap is not None:
        e = e.orderBy("subj_key", "pred_key", "obj_key").limit(edge_cap)
    # keep only nodes referenced by surviving edges (viewer draws from edges)
    ref = e.select(F.col("subj_key").alias("key")).unionByName(
        e.select(F.col("obj_key").alias("key"))
    ).distinct()
    n = n.join(ref, "key", "left_semi")
    return n, e


def top_k_by_count(counts: DataFrame, count_col: str, k: int) -> DataFrame:
    """T3 — deterministic top-k: count desc, then all remaining columns asc
    as tiebreak."""
    others = [c for c in counts.columns if c != count_col]
    return counts.orderBy(F.desc(count_col), *[F.asc(c) for c in others]).limit(k)


def match_2hop(
    edges: DataFrame,
    pred1: str,
    pred2: str,
    src: str = "subj_key",
    dst: str = "obj_key",
    label: str = "pred_key",
) -> DataFrame:
    """Triple-pattern match ``(a)-[pred1]->(b)-[pred2]->(c)`` — the basic
    SPARQL-style BGP join over the canonical edge table.

    Each hop filters its predicate *before* the join, so the predicate
    selectivity (pushed to the scan) bounds what reaches the exchange; the
    join itself is a plain equi-join on the shared node ``b``. Canonical
    edges are unique per (subj, pred, obj), so the output needs no distinct.
    At web scale a hub ``b`` fans out |in(b,pred1)| x |out(b,pred2)| — that
    product is the true result size, not an artifact; cap upstream with a
    degree filter when the pattern itself should exclude hubs.
    """
    hop1 = edges.where(F.col(label) == pred1).select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    )
    hop2 = edges.where(F.col(label) == pred2).select(
        F.col(src).alias("b"), F.col(dst).alias("c")
    )
    return hop1.join(hop2, "b").select("a", "b", "c")


def predicate_cooccurrence(
    edges: DataFrame, src: str = "subj_key", label: str = "pred_key"
) -> DataFrame:
    """Schema discovery: how often two predicates share a subject.

    (pred_a, pred_b, n_subjects) for unordered predicate pairs — the
    co-occurrence profile that reveals which relations describe the same
    entity class. Self-join of the distinct (subj, pred) set on subject:
    per-subject cost is (#distinct predicates)^2, bounded by the predicate
    vocabulary (schema-sized, not data-sized), so no hub blowup.
    """
    ps = edges.select(
        F.col(src).alias("subj"), F.col(label).alias("pred")
    ).distinct()
    return (
        ps.alias("a")
        .join(ps.alias("b"), "subj")
        .where(F.col("a.pred") < F.col("b.pred"))
        .groupBy(
            F.col("a.pred").alias("pred_a"), F.col("b.pred").alias("pred_b")
        )
        .agg(F.countDistinct("subj").alias("n_subjects"))
    )


def validate_edge_types(
    edges: DataFrame,
    categories: DataFrame,
    allowed: DataFrame,
    src: str = "subj_key",
    dst: str = "obj_key",
    label: str = "pred_key",
) -> DataFrame:
    """SHACL-lite constraint report: edge-type profile vs an ontology.

    (pred, subj_type, obj_type, n_edges, is_allowed) — every observed
    (predicate, subject-category, object-category) combination with its
    edge count and whether the ontology's ``allowed`` table permits it.
    The KG quality gate a construction pipeline runs before publishing.

    ``categories`` (key, type) and ``allowed`` (pred, subj_type, obj_type)
    are schema-sized dimensions: both broadcast, so the edge stream is
    typed and profiled with zero extra exchanges beyond the one
    partial-agg'd profile rollup (cardinality ≤ |preds|·|types|²).
    Unknown keys fall back to the 'entity' category.
    """
    cs = categories.select(
        F.col("key").alias(src), F.col("type").alias("_st")
    )
    co = categories.select(
        F.col("key").alias(dst), F.col("type").alias("_ot")
    )
    typed = (
        edges.join(F.broadcast(cs), src, "left")
        .join(F.broadcast(co), dst, "left")
        .select(
            F.col(label).alias("pred"),
            F.coalesce("_st", F.lit("entity")).alias("subj_type"),
            F.coalesce("_ot", F.lit("entity")).alias("obj_type"),
        )
    )
    prof = typed.groupBy("pred", "subj_type", "obj_type").agg(
        F.count(F.lit(1)).alias("n_edges")
    )
    ok = allowed.select("pred", "subj_type", "obj_type",
                        F.lit(1).alias("_ok"))
    return (
        prof.join(F.broadcast(ok), ["pred", "subj_type", "obj_type"], "left")
        .select(
            "pred", "subj_type", "obj_type", "n_edges",
            F.col("_ok").isNotNull().alias("is_allowed"),
        )
    )


def partition_edge_cut(
    edges: DataFrame,
    n_partitions: int = 32,
    src: str = "subj_key",
    dst: str = "obj_key",
) -> DataFrame:
    """Edge-cut diagnostic for hash partitioning — would bucketing help?

    One row: (n_partitions, n_edges, n_cut, cut_ppm) where an edge is cut
    when its endpoints hash to different partitions (48-bit md5 buckets,
    engine-portable). cut_ppm ≈ 1 - 1/P for a random graph; a much lower
    value means the key space has exploitable locality and co-partitioned
    bucketing of the node tables pays for itself. Pure projection + one
    global agg — the cheapest possible self-diagnostic before committing
    to a physical layout.
    """
    def bucket(c: str):
        return F.pmod(
            F.conv(F.substring(F.md5(F.col(c)), 1, 12), 16, 10).cast(
                "bigint"
            ),
            F.lit(n_partitions),
        )

    cut = (bucket(src) != bucket(dst)).cast("bigint")
    return edges.select(cut.alias("is_cut")).agg(
        F.lit(n_partitions).cast("int").alias("n_partitions"),
        F.count(F.lit(1)).alias("n_edges"),
        F.sum("is_cut").alias("n_cut"),
        F.floor(F.sum("is_cut") * 1000000 / F.count(F.lit(1)))
        .cast("bigint")
        .alias("cut_ppm"),
    )


def degree_histogram(
    edges: DataFrame, src: str = "subj_key", dst: str = "obj_key"
) -> DataFrame:
    """Log2-bucketed total-degree distribution — the web-graph skew report.

    (degree_bucket, n_nodes, min_degree, max_degree) with bucket =
    floor(log2(degree)), computed as the integer bit length (exact — no
    float log whose rounding could differ across engines at powers of two);
    the power-law tail this surfaces is what decides salting / AQE-skew
    settings for the join keys. Two partial-agg exchanges (per-node degree,
    then per-bucket rollup over ≤64 buckets).
    """
    deg = (
        edges.select(F.col(src).alias("key"))
        .unionByName(edges.select(F.col(dst).alias("key")))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    bucket = (F.length(F.bin("degree")) - 1).cast("int")
    return deg.groupBy(bucket.alias("degree_bucket")).agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.min("degree").alias("min_degree"),
        F.max("degree").alias("max_degree"),
    )


def edge_confidence(triples: DataFrame) -> DataFrame:
    """Linearized-PMI confidence per canonical edge — how much more often
    subject and object co-occur in documents than chance predicts (the
    extraction-noise filter: hallucinated/boilerplate pairings score ~1e6,
    genuinely associated pairs score high).

    lift_e6 = n_docs(s,p,o) * N * 1e6 DIV (df(s) * df(o)) over document
    frequencies of the nodes (a node "appears" in a doc when any triple
    there has it as subject or object) — the same integer linearization of
    P(s,o)/(P(s)P(o)) as textstats.term_cooccurrence: identical ranking to
    PMI with no engine-dependent ``log``.

    Scale shape: one distinct + partial-agg per input projection (edge
    docs, node docs, total), then two equi-joins of the edge list against
    the node-df table (broadcast when the vocabulary is small). Input is
    the per-doc triple table (url, subj, pred, obj). Returns
    (subj, pred, obj, n_docs, df_subj, df_obj, lift_e6).
    """
    t = triples.select("url", "subj", "pred", "obj").distinct()
    n_total = t.select("url").distinct().count()
    edge_docs = t.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    node_docs = (
        t.select("url", F.col("subj").alias("node"))
        .unionByName(t.select("url", F.col("obj").alias("node")))
        .distinct()
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    return (
        edge_docs.join(
            F.broadcast(
                node_docs.select(F.col("node").alias("subj"), F.col("df").alias("df_subj"))
            ),
            "subj",
        )
        .join(
            F.broadcast(
                node_docs.select(F.col("node").alias("obj"), F.col("df").alias("df_obj"))
            ),
            "obj",
        )
        .select(
            "subj",
            "pred",
            "obj",
            "n_docs",
            "df_subj",
            "df_obj",
            # decimal(38,0) product: n_docs * n_total * 1e6 exceeds int64
            # once n_docs * n_total > ~9.2e12 (a boilerplate edge in a ~3M
            # doc corpus); 38-digit headroom covers 10^12-doc scale.
            F.expr(
                f"CAST(n_docs AS decimal(38,0)) * {n_total} * 1000000"
                " DIV (df_subj * df_obj)"
            )
            .cast("bigint")
            .alias("lift_e6"),
        )
    )


def induce_predicate_schema(
    edges: DataFrame,
    categories: DataFrame,
    src: str = "subj_key",
    dst: str = "obj_key",
    label: str = "pred_key",
) -> DataFrame:
    """Ontology induction — the inverse of :func:`validate_edge_types`:
    instead of checking edges against a declared schema, DERIVE each
    predicate's type signature from the data (what a construction pipeline
    does on a new corpus before an ontology exists).

    (pred, subj_type, obj_type, n_edges, frac_e6, is_dominant):
    ``frac_e6`` is the signature's exact-ppm share of its predicate's
    edges; ``is_dominant`` marks the plurality signature (ties broken by
    (subj_type, obj_type) ascending, so the flag is deterministic). The
    dominant rows ARE the induced ontology; low-frac rows are the
    candidate extraction errors.

    Scale shape: the category dimension broadcasts; one partial-agg'd
    profile rollup (cardinality ≤ |preds|·|types|²) and one tiny window
    over that profile — the window partitions by predicate over an
    already-aggregated table, never over the edge stream.
    """
    cs = categories.select(F.col("key").alias(src), F.col("type").alias("_st"))
    co = categories.select(F.col("key").alias(dst), F.col("type").alias("_ot"))
    prof = (
        edges.join(F.broadcast(cs), src, "left")
        .join(F.broadcast(co), dst, "left")
        .select(
            F.col(label).alias("pred"),
            F.coalesce("_st", F.lit("entity")).alias("subj_type"),
            F.coalesce("_ot", F.lit("entity")).alias("obj_type"),
        )
        .groupBy("pred", "subj_type", "obj_type")
        .agg(F.count(F.lit(1)).alias("n_edges"))
    )
    tot = Window.partitionBy("pred")
    rank = Window.partitionBy("pred").orderBy(
        F.desc("n_edges"), F.asc("subj_type"), F.asc("obj_type")
    )
    return prof.select(
        "pred",
        "subj_type",
        "obj_type",
        "n_edges",
        F.expr(
            "n_edges * 1000000 DIV "
            + "sum(n_edges) OVER (PARTITION BY pred)"
        ).cast("bigint").alias("frac_e6"),
        (F.row_number().over(rank) == 1).alias("is_dominant"),
    )


def entity_postings(triples: DataFrame, max_docs: int = 32) -> DataFrame:
    """Entity -> document posting lists — the serving-side index behind
    "show me the sources for this node" (the viewer's provenance lookup,
    generalized to corpus scale).

    (node, n_docs, doc_urls): ``doc_urls`` is the sorted list TRUNCATED to
    ``max_docs`` entries (at web scale a boilerplate entity appears in
    millions of documents — an unbounded collect_set is the classic
    skew/OOM trap; n_docs stays exact). One distinct + one partial-agg'd
    rollup on the node key.
    """
    nodes = (
        triples.select("url", F.col("subj").alias("node"))
        .unionByName(triples.select("url", F.col("obj").alias("node")))
        .distinct()
    )
    return nodes.groupBy("node").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.slice(F.array_sort(F.collect_set("url")), 1, max_docs).alias(
            "doc_urls"
        ),
    )


def predicate_synonyms(
    edges: DataFrame,
    src: str = "subj_key",
    dst: str = "obj_key",
    label: str = "pred_key",
    min_shared: int = 2,
) -> DataFrame:
    """Synonym-predicate discovery: predicate pairs (p, q) whose edge sets
    overlap on the same (subj, obj) pairs — the ontology-dedup signal
    ("uses"/"employs", "located_in"/"in") a canonicalization pass collapses
    into one relation, the same-direction sibling of
    :func:`inverse_predicates`.

    (pred_a, pred_b, n_shared, n_a, n_b, jaccard_e6) with pred_a < pred_b;
    ``jaccard_e6`` is the exact-ppm Jaccard of the two predicates' distinct
    (subj, obj) sets. High overlap = synonym candidates; the report is
    schema-sized (≤ |preds|²) regardless of corpus size.

    Scale shape: candidates come from ONE self-equi-join on the (subj, obj)
    pair key — predicates sharing no pair never meet (never all-pairs);
    per-pair cost is C(k, 2) over the k predicates on that node pair,
    bounded by the predicate vocabulary. Totals are schema-sized and
    broadcast back.
    """
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("o"), F.col(label).alias("p")
    ).distinct()
    totals = e.groupBy("p").agg(F.count(F.lit(1)).alias("n"))
    q = e.select("s", "o", F.col("p").alias("q"))
    shared = (
        e.join(q, ["s", "o"])
        .where(F.col("p") < F.col("q"))
        .groupBy(F.col("p").alias("pred_a"), F.col("q").alias("pred_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    ta = totals.select(F.col("p").alias("pred_a"), F.col("n").alias("n_a"))
    tb = totals.select(F.col("p").alias("pred_b"), F.col("n").alias("n_b"))
    return (
        shared.join(F.broadcast(ta), "pred_a")
        .join(F.broadcast(tb), "pred_b")
        .select(
            "pred_a",
            "pred_b",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.expr(
                "CAST(n_shared AS decimal(38,0)) * 1000000"
                " DIV (n_a + n_b - n_shared)"
            ).cast("bigint").alias("jaccard_e6"),
        )
    )


def inverse_predicates(
    edges: DataFrame,
    src: str = "subj_key",
    dst: str = "obj_key",
    label: str = "pred_key",
) -> DataFrame:
    """Inverse-relation discovery: predicate pairs (p, q) where ``a p b``
    systematically co-exists with ``b q a`` — the ontology-induction signal
    for inverse pairs (links_to/linked_from, parent_of/child_of) that a
    canonicalization pass can then collapse into one directed relation.

    (pred, pred_rev, n_pairs, n_pred, frac_e6): ``n_pairs`` counts edge
    pairs where the reversed edge exists under ``pred_rev``; ``frac_e6`` is
    the exact-ppm share of ``pred``'s edges that have that reverse — near
    1e6 means "q is p's inverse". Includes p = q (symmetric relations).

    Scale shape: ONE self-equi-join of the canonical edge list on the
    reversed key pair (hash join on (subj, obj) vs (obj, subj)) + two
    partial-agg'd rollups; the share join is against the schema-sized
    per-predicate totals (broadcast).
    """
    e = edges.select(
        F.col(src).alias("s"), F.col(dst).alias("o"), F.col(label).alias("p")
    ).distinct()
    rev = e.select(
        F.col("o").alias("s"), F.col("s").alias("o"), F.col("p").alias("q")
    )
    pairs = (
        e.join(rev, ["s", "o"])
        .groupBy(F.col("p").alias("pred"), F.col("q").alias("pred_rev"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    totals = e.groupBy(F.col("p").alias("pred")).agg(
        F.count(F.lit(1)).alias("n_pred")
    )
    return pairs.join(F.broadcast(totals), "pred").select(
        "pred",
        "pred_rev",
        "n_pairs",
        "n_pred",
        F.expr("n_pairs * 1000000 DIV n_pred").cast("bigint").alias("frac_e6"),
    )


def entity_pair_lift(mentions: DataFrame, min_pair_docs: int = 2) -> DataFrame:
    """Co-mention association mining: linearized PMI over unordered entity
    pairs that appear in the SAME document — including pairs the extractor
    never joined into a triple, which is exactly the relation-discovery gap
    ``edge_confidence`` (adjacent-pair lift) cannot see. High-lift unlinked
    pairs are the candidate relations a KG-construction pipeline queues for
    a second extraction pass.

    lift_e6 = n_docs(a,b) * N * 1e6 DIV (df(a) * df(b)), exact integer; the
    product runs in decimal(38,0) because n_docs * N * 1e6 exceeds int64
    once n_docs * N > ~9.2e12 (same overflow class fixed in
    edge_confidence / vocab_coverage).

    Scale shape (100 TB): pair expansion is a codegen'd nested transform
    over each doc's sorted-distinct mention array (same shape as
    textstats.term_cooccurrence — never a per-doc self-join); per-doc
    entity sets are vocabulary-bounded, so fan-out is ~|ents|²/2 per doc.
    One partial-agg'd groupBy on the pair key; the per-entity df table is
    vocabulary-sized and broadcast.
    """
    m = mentions.select("url", "mention").distinct()
    n_total = m.select("url").distinct().count()
    df_tab = m.groupBy("mention").agg(F.count(F.lit(1)).alias("df"))
    sets = m.groupBy("url").agg(F.array_sort(F.collect_set("mention")).alias("ms"))
    pairs = (
        sets.select(
            F.explode(
                F.expr(
                    """
                    flatten(transform(ms, (a, i) ->
                      transform(slice(ms, i + 2, size(ms)),
                                b -> struct(a AS mention_a, b AS mention_b))))
                    """
                )
            ).alias("p")
        )
        .select("p.mention_a", "p.mention_b")
        .groupBy("mention_a", "mention_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .where(F.col("n_docs") >= min_pair_docs)
    )
    return (
        pairs.join(
            F.broadcast(
                df_tab.select(
                    F.col("mention").alias("mention_a"), F.col("df").alias("df_a")
                )
            ),
            "mention_a",
        )
        .join(
            F.broadcast(
                df_tab.select(
                    F.col("mention").alias("mention_b"), F.col("df").alias("df_b")
                )
            ),
            "mention_b",
        )
        .select(
            "mention_a",
            "mention_b",
            "n_docs",
            F.col("df_a").cast("long").alias("df_a"),
            F.col("df_b").cast("long").alias("df_b"),
            F.expr(
                f"CAST(n_docs AS decimal(38,0)) * {n_total} * 1000000"
                " DIV (df_a * df_b)"
            )
            .cast("bigint")
            .alias("lift_e6"),
        )
    )


def entity_cards(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-entity serving card — the denormalized profile row a KG lookup
    layer materializes next to the nodes table (label, type, corpus reach,
    degree split, dominant outgoing predicate, dominant neighbor).

    ``top_predicate`` is the most frequent outgoing predicate (edge-count
    desc, predicate asc tiebreak); ``top_neighbor`` the most frequent peer
    across both directions. Nodes with no surviving edges still get a card
    (zero degrees, empty strings) — the viewer's node list is the full node
    table, not just edge endpoints.

    Scale (100 TB): three aggregations, all keyed by the node label so the
    shuffles are partial-agg'd and co-partitioned; the two argmax ranks are
    windows partitioned by label (no global sort, no single reducer). Each
    join is label-equi; nothing is collected.
    """
    deg = node_degrees(edges, src="subj", dst="obj").withColumnRenamed("key", "label")
    wp = Window.partitionBy("label").orderBy(F.desc("n"), F.asc("top_predicate"))
    top_pred = (
        edges.groupBy(F.col("subj").alias("label"), F.col("pred").alias("top_predicate"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(wp))
        .where(F.col("rn") == 1)
        .select("label", "top_predicate")
    )
    peers = edges.select(
        F.col("subj").alias("label"), F.col("obj").alias("top_neighbor")
    ).unionByName(
        edges.select(F.col("obj").alias("label"), F.col("subj").alias("top_neighbor"))
    )
    wn = Window.partitionBy("label").orderBy(F.desc("n"), F.asc("top_neighbor"))
    top_peer = (
        peers.groupBy("label", "top_neighbor")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rn", F.row_number().over(wn))
        .where(F.col("rn") == 1)
        .select("label", "top_neighbor")
    )
    return (
        nodes.join(deg, "label", "left")
        .join(top_pred, "label", "left")
        .join(top_peer, "label", "left")
        .select(
            "label",
            F.col("node_type"),
            F.col("n_docs"),
            F.coalesce("out_degree", F.lit(0)).cast("long").alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).cast("long").alias("in_degree"),
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("top_predicate", F.lit("")).alias("top_predicate"),
            F.coalesce("top_neighbor", F.lit("")).alias("top_neighbor"),
        )
    )


def property_table(
    edges: DataFrame,
    predicates: tuple[str, ...],
    subj: str = "subj",
    pred: str = "pred",
    obj: str = "obj",
) -> DataFrame:
    """Pivot the edge list into a wide per-entity property table — the
    serving/feature layout downstream of KG construction (one row per
    subject, one column per schema predicate, the entity's value for it).
    The reference serves triples row-wise from SQLite; at warehouse scale
    the property-table (a.k.a. vertical-to-horizontal) layout is what
    feature stores and entity-resolution models consume.

    A predicate column holds the MINIMUM object among that subject's
    values — a deterministic single-value policy (functional-property
    semantics; multi-valued predicates keep their full rows in the edge
    table, this is the flattened view). Missing predicates are empty
    strings so the row is dense. ``predicates`` is the static schema list
    (extraction vocabulary / induced schema), fixed at plan time — NO
    driver-side collect and no Spark `pivot()` value inference, which
    would trigger an extra distinct-scan job at 100 TB.

    Scale shape: one partial-agg'd groupBy on the subject key; each
    property is a conditional `min` folded into the same aggregation —
    one shuffle total, independent of schema width.
    """
    aggs = [
        F.min(F.when(F.col(pred) == p, F.col(obj))).alias(f"p_{p}")
        for p in predicates
    ]
    out = edges.groupBy(F.col(subj).alias("entity")).agg(
        *aggs, F.count(F.lit(1)).cast("long").alias("n_facts")
    )
    return out.select(
        "entity",
        *[F.coalesce(f"p_{p}", F.lit("")).alias(f"p_{p}") for p in predicates],
        "n_facts",
    )


def match_star(
    edges: DataFrame,
    preds: tuple[str, ...],
    src: str = "subj_key",
    dst: str = "obj_key",
    label: str = "pred_key",
) -> DataFrame:
    """Star BGP match ``(a)-[p1]->(o1), (a)-[p2]->(o2), ...`` — the other
    fundamental SPARQL join shape next to the path (``match_2hop``).

    Every branch filters its predicate BEFORE the join and all branches
    share the SAME join key (the star center ``a``), so each branch
    shuffles on one key and the exchanges co-partition — a star never pays
    the key-switch reshuffle a path does. Canonical edges are unique per
    (subj, pred, obj), so the output is the exact cross product of the
    center's per-predicate fan-outs — the true BGP result size, capped
    upstream with a degree filter when hubs should be excluded.
    """
    if not preds:
        raise ValueError("match_star needs at least one predicate")
    out = None
    for i, p in enumerate(preds):
        branch = edges.where(F.col(label) == p).select(
            F.col(src).alias("a"), F.col(dst).alias(f"o{i + 1}")
        )
        out = branch if out is None else out.join(branch, "a")
    return out


def degree_assortativity(
    edges: DataFrame, src: str = "subj_key", dst: str = "obj_key"
) -> DataFrame:
    """Degree assortativity of the undirected canonical graph — the
    one-row graph-health metric (hub-to-hub vs hub-to-leaf wiring) that
    flags extraction drift between crawl waves.

    The symmetric edge view contributes each unordered edge in both
    directions, so Σdeg(u) over pairs equals Σdeg(v) and Pearson's r
    needs only three moments — all kept EXACT: int64 degree sums,
    decimal(38,0) products (int64 would overflow once m·Σxy passes ~9.2e18,
    i.e. a few hundred million edges), and the final ratio as integer
    micro-units ``(m·Σxy − Σx²)·1e6 DIV (m·Σxx − Σx²)`` — no float seam.
    Two equi-joins tag the pair list with endpoint degrees (keyed u then v,
    node-table sized), one scalar aggregate; nothing corpus-global shuffles
    twice. Degenerate regular graphs (zero variance) yield NULL r.
    """
    loop_free = edges.where(F.col(src) != F.col(dst))
    sym = (
        loop_free.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(loop_free.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    pairs = (
        sym.join(deg, "u")
        .withColumnRenamed("d", "du")
        .join(deg.select(F.col("u").alias("v"), F.col("d").alias("dv")), "v")
    )
    stats = pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("du").cast("bigint").alias("sum_deg"),
        F.sum(F.col("du").cast("decimal(38,0)") * F.col("du")).alias("sxx"),
        F.sum(F.col("du").cast("decimal(38,0)") * F.col("dv")).alias("sxy"),
    )
    return stats.select(
        "m",
        "sum_deg",
        F.col("sxx").cast("bigint").alias("sum_deg_sq"),
        F.col("sxy").cast("bigint").alias("sum_deg_prod"),
        F.expr(
            "CASE WHEN CAST(m AS decimal(38,0)) * sxx - "
            "CAST(sum_deg AS decimal(38,0)) * sum_deg = 0 THEN NULL ELSE "
            "CAST((CAST(m AS decimal(38,0)) * sxy - "
            "CAST(sum_deg AS decimal(38,0)) * sum_deg) * 1000000 DIV "
            "(CAST(m AS decimal(38,0)) * sxx - "
            "CAST(sum_deg AS decimal(38,0)) * sum_deg) AS bigint) END"
        ).alias("r_e6"),
    )


def predicate_reciprocity(
    edges: DataFrame,
    src: str = "subj_key",
    dst: str = "obj_key",
    label: str = "pred_key",
) -> DataFrame:
    """Per-predicate reciprocity — how often (s)-[p]->(o) coexists with
    (o)-[p]->(s). High reciprocity flags symmetric relations the schema
    should model undirected; near-zero flags functional/hierarchical ones
    (the same directionality signal ``inverse_predicates`` mines ACROSS
    predicates, measured here WITHIN one).

    One left-semi self-join on the reversed key triple — the probe side
    shuffles on (pred, subj, obj) exactly once and semi output never
    widens; self-loops are excluded from the reciprocated set (they are
    trivially symmetric) but stay in the denominator. Integer-ppm share.
    """
    base = edges.select(
        F.col(label).alias("pred"), F.col(src).alias("s"), F.col(dst).alias("o")
    )
    rev = base.select("pred", F.col("o").alias("s"), F.col("s").alias("o"))
    recip = (
        base.where(F.col("s") != F.col("o"))
        .join(rev, ["pred", "s", "o"], "left_semi")
        .groupBy("pred")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_reciprocated"))
    )
    totals = base.groupBy("pred").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_edges")
    )
    return (
        totals.join(recip, "pred", "left")
        .select(
            "pred",
            "n_edges",
            F.coalesce("n_reciprocated", F.lit(0)).cast("bigint").alias("n_reciprocated"),
            F.expr(
                "coalesce(n_reciprocated, 0) * 1000000 DIV n_edges"
            ).cast("bigint").alias("reciprocity_ppm"),
        )
    )

