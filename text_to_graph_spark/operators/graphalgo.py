"""Whole-graph analytics over the canonical KG edge list: PageRank and
triangle counting.

The reference's viewer computes only local metrics (degrees, BFS depths —
``data_renderer.js``); these close the gap to the whole-graph statistics a
corpus-scale KG needs for entity importance ranking and community density.

Determinism is a design constraint: results must be bit-identical across
engines, partitionings, and cluster sizes, so PageRank runs in FIXED-POINT
integer arithmetic (rank scaled by 1e9, all division integer division) —
float summation order under shuffle would make the classic formulation
irreproducible. The SQL-oracle twin unrolls the same recurrence.

Scale shapes:
- ``pagerank``: per-iteration cost is one equi-join (edges x ranks, both
  partitioned by the join key) + one partial-aggregated shuffle; the edge
  list with out-degrees is ``localCheckpoint``-ed once and reused, so no
  upstream recompute per round (same pattern as connected_components).
- ``triangle_count``: the classic two-join enumeration over the
  id-ordered undirected edge list (a<b) — every join is an equi-join,
  each triangle is produced exactly once as a<b<c. (At extreme skew the
  degree-ordered variant bounds the first join's fan-out; id-ordering
  keeps the oracle exactly mirrorable and is the common first cut.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank", "triangle_count", "weighted_sssp"]

RANK_SCALE = 10**9


def pagerank(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    iterations: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank, exact bigint arithmetic.

    rank0(v) = SCALE // N;  rank_{i+1}(v) = (100-d)%*SCALE // (100*N)
    + d% * sum_{u->v}(rank_i(u) // out_deg(u)) // 100. Dangling-node mass
    is not redistributed (documented variant: totals decay slightly, the
    ranking is unaffected). Returns (node, rank_e9).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    e_deg = e.join(deg, "u").localCheckpoint(eager=True)

    init = RANK_SCALE // n
    base = (100 - damping_pct) * RANK_SCALE // (100 * n)
    rank = nodes.select("node", F.lit(init).cast("bigint").alias("rank_e9"))
    for _ in range(iterations):
        inc = (
            e_deg.join(rank.withColumnRenamed("node", "u"), "u")
            .select("v", F.expr("rank_e9 DIV d").alias("contrib"))
            .groupBy("v")
            .agg(F.sum("contrib").alias("inc"))
            .withColumnRenamed("v", "node")
        )
        rank = nodes.join(inc, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"{damping_pct} * coalesce(inc, 0) DIV 100")
            ).cast("bigint").alias("rank_e9"),
        )
        rank = rank.localCheckpoint(eager=True)
    return rank


def weighted_sssp(
    edges: DataFrame,
    roots: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    weight: str = "n_occurrences",
    max_rounds: int = 8,
) -> DataFrame:
    """Bounded-hop weighted single-source shortest paths (Bellman-Ford
    min-plus), exact bigint arithmetic.

    dist_0 = 0 on the root set; dist_{i+1}(v) = min(dist_i(v),
    min over edges u->v of dist_i(u) + w(u,v)). After ``max_rounds`` rounds
    the result is exactly "cheapest cost reachable within max_rounds hops" —
    a well-defined (and at corpus scale the standard) bounded-propagation
    semantics; integer ``min``/``+`` make every round order-independent, so
    the fixed-round recurrence is bit-identical across engines and
    partitionings (the SQL-oracle twin unrolls the same K rounds).

    Scale shape: per round one equi-join (edges x frontier dists, both
    hashed on the join key) + one partial-aggregated min shuffle; the
    weighted edge list is ``localCheckpoint``-ed once, per-round results cut
    lineage the same way (the connected_components pattern). Early exit when
    a round improves nothing — the fixpoint equals the remaining rounds'
    output, so the exit never changes the result. Returns (node, dist) for
    reachable nodes only.
    """
    e = (
        edges.select(
            F.col(src).alias("u"),
            F.col(dst).alias("v"),
            F.col(weight).cast("bigint").alias("w"),
        )
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .groupBy("u", "v")
        .agg(F.min("w").alias("w"))  # parallel edges: keep the cheapest
        .localCheckpoint(eager=True)
    )
    dist = roots.select(
        F.col(roots.columns[0]).alias("node"), F.lit(0).cast("bigint").alias("dist")
    ).distinct()
    for _ in range(max_rounds):
        relaxed = (
            e.join(dist.withColumnRenamed("node", "u"), "u")
            .select(F.col("v").alias("node"), (F.col("dist") + F.col("w")).alias("dist"))
        )
        nxt = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
        # converged iff no node improved and no new node appeared; a pure
        # count comparison needs no join because dists only ever decrease
        if (
            nxt.count() == dist.count()
            and nxt.agg(F.sum("dist")).first()[0] == dist.agg(F.sum("dist")).first()[0]
        ):
            return nxt
        dist = nxt
    return dist


def triangle_count(
    edges: DataFrame, src: str = "subj", dst: str = "obj"
) -> DataFrame:
    """Per-node triangle membership counts. Returns (node, n_triangles)
    for every node of the undirected simple graph (0 for triangle-free
    nodes). Each triangle {a,b,c} with a<b<c is enumerated exactly once."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # wedges a<b<c: (a,b) joined to (b,c); closing edge (a,c) must exist
    x, y, z = und.alias("x"), und.alias("y"), und.alias("z")
    wedge = (
        x.join(y, F.col("x.b") == F.col("y.a"))
        .select(
            F.col("x.a").alias("a"), F.col("x.b").alias("b"),
            F.col("y.b").alias("c"),
        )
        .alias("w")
    )
    tri = wedge.join(
        z,
        (F.col("w.a") == F.col("z.a")) & (F.col("w.c") == F.col("z.b")),
        "left_semi",
    )
    member = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b").alias("node")))
        .unionByName(tri.select(F.col("c").alias("node")))
    )
    per_node = member.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    all_nodes = (
        und.select(F.col("a").alias("node"))
        .unionByName(und.select(F.col("b").alias("node")))
        .distinct()
    )
    return all_nodes.join(per_node, "node", "left").select(
        "node", F.coalesce("n_triangles", F.lit(0)).alias("n_triangles")
    )
