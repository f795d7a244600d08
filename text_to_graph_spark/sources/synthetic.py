"""Deterministic synthetic graph generator for scale stress runs.

``synthesize_powerlaw_edges`` produces an n-edge directed multigraph with a
Zipf-like degree distribution entirely as a zero-shuffle projection over
``spark.range`` — no data files, no ``rand()`` (md5 of the row id is the
uniform source, so the graph is bit-identical across runs, engines, and
cluster sizes). Node ids are drawn log-uniformly: node = floor(exp(u *
ln(n_nodes))), which gives P(node = k) ∝ 1/k — the web-graph-shaped skew
(the hub node collects ~ln(2)/ln(n_nodes) of all endpoints, ~5% at 1M
nodes) that makes this an ADVERSARIAL fixture for the fixpoint family
(connected components / PageRank / SCC): a giant component, a massive hub,
and a long tail of leaves. Used by the ``graph_stress`` bench entry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _log_uniform_node(salt: str, n_nodes: int):
    # uniform in [0,1): first 12 hex digits of md5 / 2^48 — exact dyadic
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), F.col("id").cast("string"))), 1, 12),
        16,
        10,
    ).cast("double") / F.lit(float(1 << 48))
    # log-uniform over [1, n_nodes): P(node=k) ~ 1/k (Zipf exponent 1)
    import math

    return F.floor(F.exp(u * F.lit(math.log(float(n_nodes))))).cast("bigint")


def synthesize_powerlaw_edges(
    spark: SparkSession,
    n_edges: int,
    n_nodes: int | None = None,
    seed: str = "t2g-pl",
    partitions: int | None = None,
) -> DataFrame:
    """(src, dst) edge table, ``n_edges`` rows before the self-loop filter.

    Pure projection over ``spark.range(n_edges)`` — parallel generation with
    no shuffle and no input files, so a 10M/100M-edge stress graph costs
    only the downstream algorithm, never the fixture. ``n_nodes`` defaults
    to ``n_edges // 10`` (average degree ~10, web-graph-ish).
    """
    if n_nodes is None:
        n_nodes = max(n_edges // 10, 2)
    rng = spark.range(n_edges) if partitions is None else spark.range(
        0, n_edges, 1, partitions
    )
    return (
        rng.select(
            _log_uniform_node(f"{seed}#s#", n_nodes).alias("src"),
            _log_uniform_node(f"{seed}#d#", n_nodes).alias("dst"),
        )
        .where(F.col("src") != F.col("dst"))
    )
