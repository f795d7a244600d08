"""Knowledge fusion / truth discovery over multi-source triples.

The reference extracts triples per document and merges them purely by count
(``graph_extractor/src/graph_utils.py`` canonical merge — every assertion is
trusted equally). At web scale the same (subj, pred) is asserted with
*conflicting* objects by sources of very different quality, so a
KG-construction engine needs the knowledge-fusion step on top: vote per
fact, score each source by how often it agrees with the consensus, then
re-vote with reliability weights (the classic TruthFinder / Knowledge-Vault
one-step fixpoint — public literature: Yin et al. KDD'07, Dong et al.
KDD'14).

Everything is exact-integer (counts and ppm weights) so the DuckDB oracle
is bit-identical; deterministic tie-breaks use the repo's min(printf) key
convention (count desc, obj asc).

Scale shape (100 TB):
- ``source_claims``: one distinct-shuffle on (source, subj, pred, obj) —
  claim-level dedup is exactly the exact-dedup move, partial-agg'd.
- ``vote_facts``: groupBy (subj, pred, obj) then groupBy (subj, pred) —
  both partial-aggregated; cardinality bounded by the distinct-fact count.
- ``source_reliability``: claims ⋈ winners is an equi-join on (subj, pred)
  (both sides already hash-partitioned by the previous stage under AQE);
  the final rollup keys on source — a low-cardinality partial agg.
- ``fused_facts``: the reliability table is |sources| rows (hosts ≪ facts)
  — broadcast it; the weighted re-vote is then the same two partial aggs
  with zero extra shuffle on the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 18-digit zero-padded descending-count key: bigint-safe (< 1e18) and
# lexicographically orderable; obj appended after '|' gives the asc
# tie-break. Shared by the vote and the weighted re-vote.
_KEY_MAX = 999_999_999_999_999_999


def _argmax_key(count_col, label_col) -> F.Column:
    return F.format_string(
        "%018d|%s", F.lit(_KEY_MAX) - count_col.cast("long"), label_col
    )


def source_claims(
    triples: DataFrame,
    source_expr: F.Column | None = None,
) -> DataFrame:
    """(source, subj, pred, obj) — one row per source-level claim.

    A source asserting the same triple in many pages/chunks still casts ONE
    vote (otherwise boilerplate navigation text dominates the election).
    ``source_expr`` defaults to the host-path segment of the page url
    (``example.test/<source>/page/...`` for the synthesized corpus; swap in
    ``weblinks.host_of`` for real crawl urls).
    """
    if source_expr is None:
        source_expr = F.regexp_extract(F.col("url"), r"example\.test/([^/]+)/", 1)
    return triples.select(
        source_expr.alias("source"), "subj", "pred", "obj"
    ).distinct()


def vote_facts(claims: DataFrame) -> DataFrame:
    """Per (subj, pred): the majority obj by distinct-source votes.

    (subj, pred, obj, n_src) where obj is the winner — ties broken by obj
    asc (deterministic under replay, mirrors the LPA argmax convention).
    """
    votes = claims.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).cast("long").alias("n_src")
    )
    winners = votes.groupBy("subj", "pred").agg(
        F.min(_argmax_key(F.col("n_src"), F.col("obj"))).alias("k")
    )
    return (
        votes.join(winners, ["subj", "pred"])
        .where(F.col("obj") == F.substring("k", 20, 1 << 20))
        .select("subj", "pred", "obj", "n_src")
    )


def source_reliability(claims: DataFrame, winners: DataFrame) -> DataFrame:
    """(source, n_claims, n_agree, reliability_ppm) — how often each source
    agrees with the per-fact majority. ppm = floor(1e6 * agree / claims),
    exact in both engines (non-negative operands)."""
    w = winners.select("subj", "pred", F.col("obj").alias("obj_win"))
    joined = claims.join(w, ["subj", "pred"])
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_claims"),
            F.sum(
                F.when(F.col("obj") == F.col("obj_win"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_agree"),
        )
        .withColumn(
            "reliability_ppm", F.expr("n_agree * 1000000L DIV n_claims")
        )
    )


def fused_facts(claims: DataFrame, reliability: DataFrame) -> DataFrame:
    """Reliability-weighted re-vote: per (subj, pred) pick the obj with the
    highest summed source reliability (ppm), tie-break obj asc.

    (subj, pred, obj, support_e6, n_sources). support_e6 <= |sources| * 1e6
    — safely inside bigint for any real host count (guarded by the 18-digit
    key). The reliability table is broadcast: |sources| rows.
    """
    rel = F.broadcast(reliability.select("source", "reliability_ppm"))
    support = (
        claims.join(rel, "source")
        .groupBy("subj", "pred", "obj")
        .agg(
            F.sum("reliability_ppm").cast("long").alias("support_e6"),
            F.count(F.lit(1)).cast("long").alias("n_sources"),
        )
    )
    winners = support.groupBy("subj", "pred").agg(
        F.min(_argmax_key(F.col("support_e6"), F.col("obj"))).alias("k")
    )
    return (
        support.join(winners, ["subj", "pred"])
        .where(F.col("obj") == F.substring("k", 20, 1 << 20))
        .select("subj", "pred", "obj", "support_e6", "n_sources")
    )


def predicate_functionality(facts: DataFrame) -> DataFrame:
    """Constraint mining: how functional is each predicate?

    ``facts`` is the distinct (subj, pred, obj) table. Per predicate:
    n_subjects, n_functional (subjects with exactly one object),
    functionality_ppm = floor(1e6 * n_functional / n_subjects), and
    max_objs (the worst fan-out). A predicate near 1e6 is a key-like
    relation ("born_in"); conflicts under it are extraction errors or
    genuine disputes — the input signal for :func:`functional_conflicts`
    and for the fusion re-vote. Two partial-agg'd groupBys, cardinality
    |preds| at the end — no joins, no skew risk.
    """
    per_subj = facts.groupBy("pred", "subj").agg(
        F.count_distinct("obj").cast("long").alias("n_objs")
    )
    return per_subj.groupBy("pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.sum(F.when(F.col("n_objs") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_functional"),
        F.expr(
            "sum(CASE WHEN n_objs = 1 THEN 1 ELSE 0 END) * 1000000L"
            " DIV count(1)"
        ).alias("functionality_ppm"),
        F.max("n_objs").cast("long").alias("max_objs"),
    )


def functional_conflicts(facts: DataFrame) -> DataFrame:
    """(pred, subj, n_objs, objs) for every subject asserting >= 2 objects
    — the conflict worklist a fusion/curation pass consumes, with the
    predicate's functionality_ppm attached so consumers can rank by how
    anomalous the conflict is. ``objs`` is the '|'-joined sorted object
    list (scalar at the contract boundary; the reference's own export
    convention, graph_utils.py:68). The per-pred stats table is tiny —
    broadcast — so the only shuffle on the big side is the (pred, subj)
    rollup."""
    per_subj = (
        facts.groupBy("pred", "subj")
        .agg(
            F.count_distinct("obj").cast("long").alias("n_objs"),
            F.concat_ws("|", F.array_sort(F.collect_set("obj"))).alias("objs"),
        )
        .where(F.col("n_objs") >= 2)
    )
    stats = F.broadcast(
        predicate_functionality(facts).select("pred", "functionality_ppm")
    )
    return per_subj.join(stats, "pred").select(
        "pred", "subj", "n_objs", "objs", "functionality_ppm"
    )
