"""AMIE-style path-rule mining over the fact table.

Mines 2-hop horn rules ``p1(x,y) ∧ p2(y,z) ⇒ p3(x,z)`` with exact-integer
quality metrics (AMIE: Galárraga et al., WWW'13 — public literature):

- ``n_body``     — distinct (x, z) groundings of the body path
- ``n_support``  — body groundings where the head fact p3(x, z) also holds
- ``confidence_ppm``    — floor(1e6 · support / body): standard confidence
- ``head_coverage_ppm`` — floor(1e6 · support / |p3 facts|): how much of
  the head relation the rule explains

The rule table is the schema-level product a KG-construction pipeline uses
to densify the graph (apply high-confidence rules to materialize implied
edges) and to audit extraction (a high-coverage rule that suddenly drops is
a drift alarm).

Scale shape (100 TB): the body join is an equi-join of the fact list with
itself on the shared variable y — the only quadratic risk is hub mid-nodes,
so ``max_mid_degree`` drops high-degree y BEFORE the join (same web-scale
hub bound as graphalgo.common_neighbors; the oracle mirrors it). Body
dedup, the head probe (equi-join on (x, z)), and all rollups are
partial-agg'd; the per-head-relation count is a |preds|-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mine_path_rules(
    facts: DataFrame,
    max_mid_degree: int | None = None,
    min_support: int = 1,
) -> DataFrame:
    """(p1, p2, p3, n_body, n_support, confidence_ppm, head_coverage_ppm)
    for every rule with ``n_support >= min_support``.

    ``facts`` is the distinct (subj, pred, obj) table (deduped defensively
    here). Mid-node degree = total incidences (subject + object slots) in
    the fact list; x != z keeps the body irreflexive so a rule can never be
    supported by its own premise edge pair folding onto one node.
    """
    f = facts.select("subj", "pred", "obj").distinct()

    e1 = f.select(
        F.col("subj").alias("x"), F.col("pred").alias("p1"), F.col("obj").alias("y")
    )
    e2 = f.select(
        F.col("subj").alias("y"), F.col("pred").alias("p2"), F.col("obj").alias("z")
    )
    if max_mid_degree is not None:
        deg = (
            f.select(F.col("subj").alias("node"))
            .unionByName(f.select(F.col("obj").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        mids = deg.where(F.col("d") <= max_mid_degree).select(
            F.col("node").alias("y")
        )
        e1 = e1.join(mids, "y", "left_semi")
        e2 = e2.join(mids, "y", "left_semi")

    bodies = (
        e1.join(e2, "y")
        .where(F.col("x") != F.col("z"))
        .select("p1", "p2", "x", "z")
        .distinct()
    )
    # |preds|²-row rollup — broadcast so the support join never shuffles
    n_body = F.broadcast(
        bodies.groupBy("p1", "p2").agg(
            F.count(F.lit(1)).cast("long").alias("n_body")
        )
    )

    heads = f.select(
        F.col("subj").alias("x"), F.col("pred").alias("p3"), F.col("obj").alias("z")
    )
    support = (
        bodies.join(heads, ["x", "z"])
        .groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).cast("long").alias("n_support"))
        .where(F.col("n_support") >= min_support)
    )
    n_head = F.broadcast(
        heads.groupBy("p3").agg(F.count(F.lit(1)).cast("long").alias("n_p3"))
    )
    return (
        support.join(n_body, ["p1", "p2"])
        .join(n_head, "p3")
        .select(
            "p1",
            "p2",
            "p3",
            "n_body",
            "n_support",
            F.expr("n_support * 1000000L DIV n_body").alias("confidence_ppm"),
            F.expr("n_support * 1000000L DIV n_p3").alias("head_coverage_ppm"),
        )
    )


def apply_rules(
    facts: DataFrame,
    rules: DataFrame,
    min_confidence_ppm: int = 500_000,
    max_mid_degree: int | None = None,
) -> DataFrame:
    """Densification: materialize the facts that high-confidence rules
    imply but the graph does not yet assert.

    For every rule with ``confidence_ppm >= min_confidence_ppm``, ground
    its body and emit the implied head (x, p3, z) if absent from ``facts``.
    Output (subj, pred, obj, n_rules, max_confidence_ppm): how many
    distinct rules derive the fact and the strongest one — the ranking a
    human-in-the-loop or a downstream acceptance threshold consumes.

    Scale shape: the accepted-rule table is tiny (|preds|³ bound) —
    broadcast; body grounding reuses the hub-capped 2-hop equi-join of
    :func:`mine_path_rules`; the novelty check is one left_anti equi-join
    on the full fact key. Nothing quadratic beyond the capped body join.
    """
    f = facts.select("subj", "pred", "obj").distinct()
    accepted = F.broadcast(
        rules.where(F.col("confidence_ppm") >= min_confidence_ppm).select(
            "p1", "p2", "p3", "confidence_ppm"
        )
    )
    e1 = f.select(
        F.col("subj").alias("x"), F.col("pred").alias("p1"), F.col("obj").alias("y")
    )
    e2 = f.select(
        F.col("subj").alias("y"), F.col("pred").alias("p2"), F.col("obj").alias("z")
    )
    if max_mid_degree is not None:
        deg = (
            f.select(F.col("subj").alias("node"))
            .unionByName(f.select(F.col("obj").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        mids = deg.where(F.col("d") <= max_mid_degree).select(
            F.col("node").alias("y")
        )
        e1 = e1.join(mids, "y", "left_semi")
        e2 = e2.join(mids, "y", "left_semi")
    bodies = (
        e1.join(e2, "y")
        .where(F.col("x") != F.col("z"))
        .select("p1", "p2", "x", "z")
        .distinct()
    )
    implied = bodies.join(accepted, ["p1", "p2"]).select(
        F.col("x").alias("subj"),
        F.col("p3").alias("pred"),
        F.col("z").alias("obj"),
        "p1",
        "p2",
        "confidence_ppm",
    )
    novel = implied.join(f, ["subj", "pred", "obj"], "left_anti")
    return novel.groupBy("subj", "pred", "obj").agg(
        F.count(F.lit(1)).cast("long").alias("n_rules"),
        F.max("confidence_ppm").cast("long").alias("max_confidence_ppm"),
    )
