"""Regenerate PLANS.md: physical plans of the headline queries.

Run after operator changes: `PYTHONPATH=/root/repo python3 tools/dump_plans.py`.
The plan-shape *assertions* live in tests/test_plans.py; this file is the
human-readable audit trail showing filters reach scans, small sides
broadcast, Python stages stay fused, and aggregates keep partial phases.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

HEADER = """# PLANS — physical plans of the headline queries (auto-generated)

`python3 tools/dump_plans.py` regenerates this file. Things to look for,
per the scale-design rules (enforced by tests/test_plans.py):

- `PushedFilters` / narrow `ReadSchema` on every parquet scan
- `BroadcastHashJoin` wherever a known-small side exists (alias table,
  category map, id map, query set)
- exactly one `MapInPandas` in the fused extraction chain, and no
  `Exchange` before the first aggregation
- partial aggregation (`partial_…` functions) before every exchange
- `WholeStageCodegen` spans around the relational stages
"""


def _validate_plan(spark, triples):
    from text_to_graph_spark.operators import graphq as GQ
    from text_to_graph_spark.operators.canonicalize import (
        triples_to_canonical_edges,
    )
    from text_to_graph_spark.pipeline import vocab_category_table

    allowed = spark.createDataFrame(
        [("join", "data", "data")],
        "pred string, subj_type string, obj_type string",
    )
    return GQ.validate_edge_types(
        triples_to_canonical_edges(triples), vocab_category_table(spark),
        allowed,
    )


def _dead_links_plan(spark, sf):
    from text_to_graph_spark.operators import weblinks as WL
    from text_to_graph_spark.sources.weblinks import synthesize_linked_pages

    pages = synthesize_linked_pages(spark, sf)
    return WL.dead_links(WL.extract_links(pages), pages)


def _attribution_plan(spark, sf):
    from text_to_graph_spark.operators.events import first_touch_attribution

    return first_touch_attribution(spark.read.parquet(f"{sf}/events.parquet"))


def _hll_plan(spark, sf):
    from text_to_graph_spark.operators.events import hll_distinct

    return hll_distinct(spark.read.parquet(f"{sf}/events.parquet"))


def _covisitation_plan(spark, sf):
    from text_to_graph_spark.operators.events import covisitation

    return covisitation(spark.read.parquet(f"{sf}/events.parquet"))


def _zorder_plan(spark, pages):
    from text_to_graph_spark.operators.layout import zorder_file_stats

    return zorder_file_stats(pages)


def _schema_induction_plan(spark, triples):
    from text_to_graph_spark.operators import graphq as GQ
    from text_to_graph_spark.operators.canonicalize import (
        triples_to_canonical_edges,
    )
    from text_to_graph_spark.pipeline import vocab_category_table

    return GQ.induce_predicate_schema(
        triples_to_canonical_edges(triples), vocab_category_table(spark)
    )


def _skew_join_plan(spark):
    from pyspark.sql import functions as F

    from text_to_graph_spark.operators.canonicalize import skew_salted_join
    from text_to_graph_spark.sources.pages import synthesize_skewed_triples

    t = synthesize_skewed_triples(spark, 5000, n_keys=100)
    dim = (
        t.select(F.col("subj"))
        .distinct()
        .withColumn("vid", F.pmod(F.xxhash64("subj"), F.lit(10**6)))
    )
    return skew_salted_join(t, dim, on="subj", salt_from="url")


def _rules_plan(spark, triples):
    from pyspark.sql import functions as F

    from text_to_graph_spark.operators.rules import mine_path_rules

    return mine_path_rules(
        triples.select("subj", "pred", "obj").distinct(), max_mid_degree=4096
    )


def _salience_plan(pages):
    from text_to_graph_spark.operators.extraction import entity_salience, extract_text

    return entity_salience(extract_text(pages))


def _ranking_eval_plan(spark):
    from text_to_graph_spark.operators.graphalgo import ranking_eval

    preds = spark.createDataFrame(
        [("g", "b", 900, True)],
        "node_a string, node_b string, jaccard_ppm long, is_linked boolean",
    )
    return ranking_eval(preds)


def _bpe_round_plan(spark, pages):
    # one training round's shuffle shape: the pair-count partial agg runs
    # over the piece VOCABULARY (not the corpus); the corpus-sized
    # exchange happens exactly once, in piece_frequencies.
    from text_to_graph_spark.operators.extraction import extract_text
    from text_to_graph_spark.operators.tokenizer import (
        _pair_counts,
        piece_frequencies,
    )

    return _pair_counts(piece_frequencies(extract_text(pages)))


def _scc_plan(spark, triples):
    from text_to_graph_spark.operators.components import (
        strongly_connected_components,
    )

    return strongly_connected_components(
        triples.select("subj", "obj"), src="subj", dst="obj"
    )


def main() -> int:
    from pyspark.sql import functions as F

    from text_to_graph_spark.operators import curation as CUR
    from text_to_graph_spark.operators import dedup as D
    from text_to_graph_spark.operators import graphq as GQ
    from text_to_graph_spark.operators import graphalgo as GA
    from text_to_graph_spark.operators import textstats as TS
    from text_to_graph_spark.operators import linking as L
    from text_to_graph_spark.operators import similarity as SIM
    from text_to_graph_spark.operators import pii as PII
    from text_to_graph_spark.operators.canonicalize import (
        join_skew_profile,
        triples_to_canonical_edges,
    )
    from text_to_graph_spark.operators.components import bipartite_components
    from text_to_graph_spark.operators.chunking import chunk_pages
    from text_to_graph_spark.operators.extraction import extract_triples_from_pages
    from text_to_graph_spark.operators import olap as OL6
    from text_to_graph_spark.operators.events import countmin_registers
    from text_to_graph_spark.operators.graphq import property_table
    from text_to_graph_spark.operators.temporal import fact_validity_intervals
    from text_to_graph_spark.operators.weblinks import resolve_redirects
    from text_to_graph_spark.plans.introspect import plan_str
    from text_to_graph_spark.session import get_spark
    from text_to_graph_spark.sources.pages import synthesize_pages

    spark = get_spark(master="local[8]")
    sf = "/root/testdata/sf0.001"
    pages = synthesize_pages(spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")

    triples = extract_triples_from_pages(pages)
    mentions = spark.createDataFrame(
        [("u", "row")], "url string, mention string"
    )

    plans = {
        "fused extraction (pages -> triples, one Python stage)": triples,
        "canonical edges (single agg exchange, partial phases)": (
            triples_to_canonical_edges(triples)
        ),
        "pruned+pushed scan (filter + 2-column projection)": (
            docs.where(F.col("lang") == "en").select("doc_id", "lang")
        ),
        "alias linking (broadcast join, no shuffle of mentions)": (
            L.link_mentions(mentions, L.alias_table(spark))
        ),
        "minhash signatures (shingle explode, partial min per band)": (
            D.minhash_signatures(docs)
        ),
        "ANN brute-force top-k (broadcast queries, windowed top-k)": (
            SIM.topk_bruteforce(emb, emb.where("vec_id < 2"), k=3)
        ),
        "IVF assignment (pure projection, zero shuffle)": (
            SIM.ivf_assign(emb, emb.where("vec_id < 3"))
        ),
        "embedding near-dup LSH (bucket equi-join, NO CartesianProduct)": (
            D.embedding_neardup_pairs_lsh(emb, threshold=0.3)
        ),
        "k-means assignment (inlined centroids, zero-shuffle projection)": (
            SIM._assign_micro(
                emb.select(
                    F.col("vec_id").alias("id"),
                    SIM.micro_vec_expr("embedding").alias("mic"),
                ),
                [(0, [0] * 64), (1, [1_000_000] * 64)],
            )
        ),
        "benchmark decontamination (corpus probe side never shuffles; bench broadcast)": (
            CUR.benchmark_contamination(
                docs.where("doc_id % 50 != 0"), docs.where("doc_id % 50 = 0"), n=4
            )
        ),
        "stratified hash sample (pure narrow filter, zero shuffle)": (
            CUR.stratified_sample(docs, {"en": 500000, "de": 250000})
        ),
        "link prediction (wedge equi-join + degree cap, NO CartesianProduct)": (
            GA.common_neighbors(
                triples.select(
                    F.col("subj").alias("subj"),
                    F.col("pred").alias("pred"),
                    F.col("obj").alias("obj"),
                ),
                min_common=2,
                max_neighbor_degree=32,
            )
        ),
        "inverted index (UDF-free posting-list build, partial agg phases)": (
            TS.inverted_index(docs, min_df=2)
        ),
        "site stats (split-key projection, one partial-agg rollup)": (
            CUR.site_stats(pages)
        ),
        "balanced mixture (small count agg broadcast back, one rank window)": (
            CUR.balanced_mixture(docs, {"en": 500000, "de": 500000})
        ),
        "dead links (bloom-negative rows bypass the anti-join exchange)": (
            _dead_links_plan(spark, sf)
        ),
        "BGP 2-hop match (predicate filters ahead of the equi-join)": (
            GQ.match_2hop(
                triples_to_canonical_edges(triples), "join", "scan"
            )
        ),
        "edge-ontology validation (both dims broadcast, one rollup exchange)": (
            _validate_plan(spark, triples)
        ),
        "int8 quantization codes (inlined params, zero-shuffle projection)": (
            SIM.quantized_vectors(emb)
        ),
        "session co-visitation (session-key equi-join, broadcast marginals)": (
            _covisitation_plan(spark, sf)
        ),
        "dense vocab ids (bucketed windows + broadcast offsets, no global sort)": (
            GA.dense_ids(
                triples.select(F.col("subj").alias("node")), "node"
            )
        ),
        "Z-order layout stats (zero-shuffle Morton keys, rollup exchanges only)": (
            _zorder_plan(spark, pages)
        ),
        "edge confidence (broadcast node-df table, no cartesian)": (
            GQ.edge_confidence(
                triples.select("url", "subj", "pred", "obj")
            )
        ),
        "schema induction (profile window over the aggregate, not the edges)": (
            _schema_induction_plan(spark, triples)
        ),
        "source overlap (in-plan pair expansion, no shingle self-join)": (
            D.source_overlap(docs)
        ),
        "incremental near-dup probe (wave x corpus band equi-join only)": (
            D.incremental_neardup_probe(
                docs.where("doc_id % 2 = 1"), docs.where("doc_id % 2 = 0")
            )
        ),
        "HLL registers (one partial-agg max per (group, bucket))": (
            _hll_plan(spark, sf)
        ),
        "inverse predicates (reversed-key self-equi-join, broadcast totals)": (
            GQ.inverse_predicates(
                triples_to_canonical_edges(triples)
            )
        ),
        "simhash band pairs (band equi-join candidates, no all-pairs)": (
            D.simhash_neardup_pairs(docs)
        ),
        "first-touch attribution (one session window, min_by firsts)": (
            _attribution_plan(spark, sf)
        ),
        "walk training pairs (pair rollup + broadcast vid lookups)": (
            GA.walk_training_pairs(
                GA.random_walks(
                    triples_to_canonical_edges(triples)
                    .select(
                        F.col("subj_key").alias("subj"),
                        F.col("obj_key").alias("obj"),
                    ),
                    src="subj",
                    dst="obj",
                    n_walks=1,
                    walk_len=2,
                ),
                triples.select(F.col("subj").alias("node")),
                k=1,
            )
        ),
        "skew-salted remap join (hot key spread over salt buckets)": (
            _skew_join_plan(spark)
        ),
        "BPE-pretoken chunking (shuffle-free mapInPandas packer)": (
            chunk_pages(pages.select("url", "text"), token_counter="pretoken")
        ),
        "AMIE rule mining (hub-capped body equi-join, broadcast head counts)": (
            _rules_plan(spark, triples)
        ),
        "entity salience (pure-Catalyst positional scan, one partial agg)": (
            _salience_plan(pages)
        ),
        "entity pair lift (nested-transform pairs, broadcast df table)": (
            GQ.entity_pair_lift(mentions, min_pair_docs=1)
        ),
        "ranking eval (per-query-node window, single-row rollup)": (
            _ranking_eval_plan(spark)
        ),
        "containment dedup (blocked shingle equi-join, no pair nested loop)": (
            D.containment_pairs(docs, group_col="source", threshold=0.05)
        ),
        "keep-best fuzzy dedup (cluster-partitioned quality argmax window)": (
            D.neardup_keep_best(docs.limit(50))
        ),
        "PII stats (pure projection, zero exchanges)": PII.pii_stats(docs),
        "classifier inference (expression-only dot product, doc-id spine)": (
            CUR.classifier_scores(docs)
        ),
        "skew profile (TakeOrdered top-k, scalar totals)": (
            join_skew_profile(docs.select("source"), "source", top_k=5)
        ),
        "per-source percentile gate (source-partitioned rank window)": (
            CUR.quality_percentile_gate(docs, keep_pct=50)
        ),
        "node2vec walks (sorted-adjacency rollup, per-step prev-neighbor join)": (
            GA.node2vec_walks(
                triples_to_canonical_edges(triples).select(
                    F.col("subj_key").alias("subj"),
                    F.col("obj_key").alias("obj"),
                ),
                src="subj",
                dst="obj",
                n_walks=1,
                walk_len=3,
            )
        ),
        "resource allocation (degree rides the wedge rows, no post-agg join)": (
            GA.resource_allocation(
                triples.select("subj", "obj"), max_neighbor_degree=32
            )
        ),
        "edge triangle support (wedge equi-join + left_semi closure test)": (
            GA.edge_triangle_support(triples.select("subj", "obj"))
        ),
        "bounded closure (per-hop frontier equi-join + left_anti dedup)": (
            GA.bounded_closure(triples.select("subj", "obj"), max_hops=2)
        ),
        "directed SCC (FW-BW min-label peeling; constraint-free leaf)": (
            _scc_plan(spark, triples)
        ),
        "BPE training round (vocab-sized pair-count partial agg)": (
            _bpe_round_plan(spark, pages)
        ),
        "fact validity intervals (one fact-key window exchange, two frames)": (
            fact_validity_intervals(
                triples.select("url", "subj", "pred", "obj"), pages
            )
        ),
        "property table (static-schema pivot, one partial-agg'd groupBy)": (
            property_table(
                triples.select("subj", "pred", "obj"), ("join", "scan")
            )
        ),
        "neighbor sampling (parent-partitioned rank windows, equi-joins)": (
            GA.sampled_neighborhood(triples.select("subj", "obj"))
        ),
        "triad motif census (wedge equi-join + closure semi-probes)": (
            GA.triad_motifs(triples.select("subj", "obj"))
        ),
        "count-min registers (bounded d*w partial-agg shuffle)": (
            countmin_registers(
                docs.select(F.col("doc_id").alias("user_id")), key="user_id"
            )
        ),
        "Q6 forecast revenue (whole predicate pushed, no groupBy)": (
            OL6.forecast_revenue(
                spark.read.parquet(f"{sf}/lineitem.parquet")
            )
        ),
        "Q14 promo revenue (broadcast part dim, one conditional agg)": (
            OL6.promo_revenue(
                spark.read.parquet(f"{sf}/lineitem.parquet"),
                spark.read.parquet(f"{sf}/part.parquet"),
            )
        ),
        "RAKE keyphrases (doc-partitioned window + (doc_id, term) equi-join)": (
            TS.rake_keyphrases(docs)
        ),
        "1-WL refinement round (neighbor-key join + sort-collect agg)": (
            GA.wl_refinement(
                triples_to_canonical_edges(triples).selectExpr(
                    "subj_key AS subj", "obj_key AS obj"
                ),
                rounds=1,
            )
        ),
        "bipartite double cover (CC fixpoint on lifted edges)": (
            bipartite_components(triples.selectExpr("subj AS src", "obj AS dst"))
        ),
        "predicate reciprocity (reversed-triple LeftSemi probe)": (
            GQ.predicate_reciprocity(triples_to_canonical_edges(triples))
        ),
        "star BGP match (single-key co-partitioned branch equi-joins)": (
            GQ.match_star(triples_to_canonical_edges(triples), ("join", "scan", "sort"))
        ),
        "degree assortativity (two node-keyed joins, exact decimal scalar agg)": (
            GQ.degree_assortativity(triples_to_canonical_edges(triples))
        ),
        "Gopher/C4 rule battery (zero-shuffle projection, composed gates)": (
            TS.gopher_rules(docs)
        ),
        "maximal-run ExactSubstr trim (anchor islands -> threshold -> excision)": (
            D.span_trim_maximal(docs, min_run=20)
        ),
        # the epoch operator localCheckpoints its result (lineage cut per
        # epoch), so its returned plan is a checkpoint scan; the eval's
        # scoring join has the identical (rows x dim) equi-join shape and
        # is what the audit should show
        "TransE scoring joins (h/r/candidate equi-joins + per-query rollup)": (
            (lambda e: GA.transe_rank_eval(e, GA.transe_init(e, dim=4), "init"))(
                triples_to_canonical_edges(triples).selectExpr(
                    "subj_key AS subj", "pred_key AS pred", "obj_key AS obj"
                )
            )
        ),
        "DSIR importance gate (bucket partial-agg + broadcast ratio table)": (
            CUR.dsir_gate(docs)
        ),
        "redirect resolution (log-round pointer-doubling equi-joins)": (
            resolve_redirects(
                triples.select(
                    F.col("subj").alias("src_url"), F.col("obj").alias("dst_url")
                ),
                lineage_cuts=False,  # explain deadlocks on lazy checkpoints
            )
        ),
    }

    out = [HEADER]
    for title, df in plans.items():
        out.append(f"\n## {title}\n\n```\n{plan_str(df, 'formatted').strip()}\n```\n")
    with open("/root/repo/PLANS.md", "w", encoding="utf-8") as f:
        f.write("".join(out))
    print("wrote PLANS.md")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
