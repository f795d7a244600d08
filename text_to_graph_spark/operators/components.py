"""Iterative graph algorithms: connected components + BFS.

``connected_components``: alternating large-star/small-star over a DataFrame
edge list (Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — public algorithm). Used to merge coreferent entity nodes after
near-duplicate blocking (the beyond-exact-label linking mode). Converges in
O(log n) rounds; each round is two self-joins + an aggregation, with
``localCheckpoint`` per round to cut lineage (no Catalyst fixpoint exists).

``bfs_distances``: multi-source BFS as an iterative frontier join — the
distributed analog of the viewer's ``calculateRootDistances``
(``webpages/standalone_graph_viewer/template/dev/data_renderer.js:487-554``),
with ``direction`` in {"out", "in", "both"} matching the viewer's modes.

Both return DataFrames; both are driver-loop fixpoints over pure DataFrame
ops (no RDDs, no collect of the data itself — only the convergence counter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 50,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` must have two long/string columns; ids are compared with <, so
    any orderable type works. Undirected semantics.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    )
    # parent(x) starts as min(x, min neighbor)
    sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    # materialize the adjacency ONCE — every iteration joins against it, and
    # without this the whole upstream DAG (extraction, canonicalization, …)
    # re-executes per iteration (measured 67s -> ~10s for the CC benchmark)
    sym = sym.localCheckpoint(eager=True)
    parent = sym.groupBy("u").agg(F.min("v").alias("mv"))
    parent = parent.select(
        F.col("u").alias("node"), F.least(F.col("u"), F.col("mv")).alias("comp")
    )
    parent = parent.localCheckpoint(eager=True)

    for _ in range(max_iterations):
        # propagate: comp(node) <- min(comp(node), min over neighbors comp(nb))
        nb = (
            sym.join(parent.withColumnRenamed("node", "v"), "v")
            .groupBy("u")
            .agg(F.min("comp").alias("nb_comp"))
            .withColumnRenamed("u", "node")
        )
        new_parent = (
            parent.join(nb, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nb_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        # pointer-jump: comp(node) <- comp(comp(node)) — the star shrink
        jumped = (
            new_parent.alias("a")
            .join(
                new_parent.select(
                    F.col("node").alias("comp"), F.col("comp").alias("comp2")
                ).alias("b"),
                "comp",
                "left",
            )
            .select(
                F.col("node"),
                F.coalesce(F.col("comp2"), F.col("comp")).alias("comp"),
            )
        )
        jumped = jumped.localCheckpoint(eager=True)
        changed = (
            jumped.alias("n")
            .join(parent.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        parent = jumped
        if changed == 0:
            break
    return parent.select(F.col("node"), F.col("comp").alias("component"))


def bfs_distances(
    edges: DataFrame,
    roots: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    direction: str = "both",
    max_hops: int = 20,
) -> DataFrame:
    """Multi-source BFS. ``roots`` has one column ``node_col``.

    Returns (node, distance) for every reachable node (roots at 0). Frontier
    expansion is one hash join per hop; visited set grows by union +
    dedup. ``direction``: "out" follows src->dst, "in" follows dst->src,
    "both" follows both (viewer parity, data_renderer.js:497-513).
    """
    if direction == "out":
        adj = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    elif direction == "in":
        adj = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    else:
        adj = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
    # materialized once: reused by every hop's frontier join
    adj = adj.distinct().localCheckpoint(eager=True)

    visited = roots.select(
        F.col(node_col).alias("node"), F.lit(0).alias("distance")
    ).distinct()
    frontier = visited
    for hop in range(1, max_hops + 1):
        next_frontier = (
            frontier.join(adj, frontier["node"] == adj["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("distance", F.lit(hop))
        )
        next_frontier = next_frontier.localCheckpoint(eager=True)
        if next_frontier.limit(1).count() == 0:
            break
        visited = visited.unionByName(next_frontier)
        frontier = next_frontier
    return visited


def pairwise_shortest_paths(
    edges: DataFrame,
    roots: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    direction: str = "both",
    max_hops: int = 6,
) -> DataFrame:
    """Viewer G4 semantics (``data_renderer.js:560-666``): shortest paths
    between every ordered pair of selected root nodes.

    Multi-source BFS carrying a path column; ties broken by the
    lexicographically smallest path (the viewer's predecessor order is
    insertion-dependent and therefore unspecified — we make it total).
    Returns (src_root, dst_root, distance, path) with path a '>'-joined node
    sequence; only pairs reachable within ``max_hops`` appear, src != dst.

    Each hop is one hash join frontier-expansion + a (root, node) min_by
    aggregation; per-hop ``localCheckpoint`` cuts the lineage. Root sets are
    viewer-selection sized (a handful), so state is |roots| x |nodes| at
    worst — this is a read-path query over the canonical entity graph, whose
    node count is vocabulary-bounded, not corpus-bounded.
    """
    if direction == "out":
        adj = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    elif direction == "in":
        adj = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    else:
        adj = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
    # materialized once: reused by every hop's frontier join
    adj = adj.where(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=True)

    best = roots.select(
        F.col(node_col).alias("root"),
        F.col(node_col).alias("node"),
        F.lit(0).alias("distance"),
        F.array(F.col(node_col)).alias("path"),
    ).distinct()
    frontier = best
    for hop in range(1, max_hops + 1):
        expanded = (
            frontier.join(adj, frontier["node"] == adj["u"])
            .select(
                "root",
                F.col("v").alias("node"),
                F.lit(hop).alias("distance"),
                F.concat("path", F.array(F.col("v"))).alias("path"),
            )
            .join(best.select("root", "node"), ["root", "node"], "left_anti")
        )
        # one survivor per (root, node): the lexicographically smallest path
        frontier = expanded.groupBy("root", "node").agg(
            F.min("distance").alias("distance"), F.min("path").alias("path")
        )
        frontier = frontier.localCheckpoint(eager=True)
        if frontier.limit(1).count() == 0:
            break
        best = best.unionByName(frontier)
    root_set = roots.select(F.col(node_col).alias("node")).distinct()
    return (
        best.join(root_set, "node", "left_semi")
        .where(F.col("root") != F.col("node"))
        .select(
            F.col("root").alias("src_root"),
            F.col("node").alias("dst_root"),
            "distance",
            F.concat_ws(">", "path").alias("path"),
        )
    )


def k_hop_subgraph(
    edges: DataFrame,
    roots: DataFrame,
    k: int,
    src: str = "src",
    dst: str = "dst",
    direction: str = "both",
) -> tuple[DataFrame, DataFrame]:
    """Viewer G3 semantics (``data_renderer.js:668-790``): nodes with
    root-distance <= k, edges whose both endpoints are included."""
    dist = bfs_distances(edges, roots, src, dst, direction=direction, max_hops=k)
    nodes = dist.where(F.col("distance") <= k)
    kept = nodes.select("node")
    sub_edges = (
        edges.join(kept.withColumnRenamed("node", src), src, "left_semi")
        .join(kept.withColumnRenamed("node", dst), dst, "left_semi")
    )
    return nodes, sub_edges


def merge_component_assignments(a: DataFrame, b: DataFrame) -> DataFrame:
    """Incremental connected components: merge two per-slice (node,
    component) assignments into the assignment the full edge set would
    produce.

    Each slice's assignment is a spanning star graph of that slice's
    connectivity (component = min reachable node id), so running CC over the
    UNION OF STARS — a graph no larger than the node count, independent of
    how many occurrence edges the slices contained — reconnects exactly the
    components that share a node across slices, and min-label propagation
    re-derives the global minima. The classic incremental-CC shape: a new
    crawl slice costs one CC over its own edges plus one CC over star
    graphs, never a recompute over the historical corpus's edges.
    """
    stars = a.unionByName(b).select(
        F.col("node").alias("u"), F.col("component").alias("v")
    )
    return connected_components(stars, "u", "v")


def landmark_distances(
    edges: DataFrame,
    landmarks: DataFrame,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    max_hops: int = 4,
) -> DataFrame:
    """Per-landmark BFS (undirected): (root, node, distance) for every
    node within ``max_hops`` of each landmark — the Eppstein-Wang landmark
    scheme (public: Eppstein & Wang, SODA'01) that makes closeness-style
    centrality tractable at scale: exact all-pairs BFS is O(|V|·|E|),
    landmarks cost K frontier-join rounds with state bounded by K·|V|.

    Unlike :func:`bfs_distances` (min over ALL roots), the root id rides
    along, so each landmark's distance field stays separate. Each hop is
    one equi-join frontier⋈adjacency plus a two-column left_anti against
    the visited set; ``localCheckpoint`` per hop cuts lineage.
    """
    adj = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    visited = (
        landmarks.select(F.col(node_col).alias("root"))
        .distinct()
        .select("root", F.col("root").alias("node"), F.lit(0).alias("distance"))
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        next_frontier = (
            frontier.join(adj, frontier["node"] == adj["u"])
            .select("root", F.col("v").alias("node"))
            .distinct()
            .join(visited.select("root", "node"), ["root", "node"], "left_anti")
            .withColumn("distance", F.lit(hop))
            .localCheckpoint(eager=True)
        )
        if next_frontier.limit(1).count() == 0:
            break
        visited = visited.unionByName(next_frontier)
        frontier = next_frontier
    return visited


def harmonic_closeness(dists: DataFrame) -> DataFrame:
    """Harmonic-centrality estimate from landmark distances: per node,
    sum of 1e6 // distance over landmarks at distance >= 1 (the landmark
    itself contributes nothing to its own score), plus the landmark-reach
    count. Exact integer micro-units — floor division matches any ANSI
    engine bit-for-bit; one partial-agg'd groupBy on node."""
    return (
        dists.where(F.col("distance") > 0)
        .groupBy("node")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_landmarks"),
            F.sum(F.expr("1000000L DIV distance")).cast("long").alias("harmonic_e6"),
        )
    )
