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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "pagerank",
    "hits",
    "triangle_count",
    "weighted_sssp",
    "label_propagation",
    "common_neighbors",
    "k_core",
    "dense_ids",
    "negative_samples",
    "walk_training_pairs",
]

RANK_SCALE = 10**9


def _sym_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Undirected deduplicated adjacency (u, v) with self-loops dropped."""
    d = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col(src).isNotNull() & F.col(dst).isNotNull()
    )
    return (
        d.unionByName(d.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def label_propagation(
    edges: DataFrame, src: str = "subj", dst: str = "obj", rounds: int = 4
) -> DataFrame:
    """Deterministic synchronous label propagation (community detection).

    label_0(v) = v; label_{i+1}(v) = the neighbor label with the highest
    multiplicity, ties broken by label ascending. The argmax is made
    engine-portable by min() over the composite string key
    ``printf('%09d|%s', 999999999 - cnt, label)`` — no window function, no
    engine-specific arg_max, so the SQL-oracle twin unrolls the identical
    recurrence and matches bit-for-bit. Classic LPA iterates to a (seed-
    and order-dependent) fixpoint; the fixed-round synchronous variant is
    the reproducible formulation, and the one that maps to Spark: each
    round is ONE equi-join (adjacency x labels, both hashed on the join
    key) + one two-level partial-aggregated shuffle. Adjacency is
    ``localCheckpoint``-ed once; per-round labels cut lineage the same way
    (the connected_components pattern). Returns (node, community) for
    every non-isolated node.
    """
    sym = _sym_edges(edges, src, dst).localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("community"))
    )
    for _ in range(rounds):
        votes = (
            sym.join(labels.withColumnRenamed("node", "v"), "v")
            .groupBy(F.col("u").alias("node"), F.col("community"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        key = F.format_string(
            "%09d|%s", F.lit(999999999) - F.col("cnt"), F.col("community")
        )
        labels = (
            votes.groupBy("node")
            .agg(F.min(key).alias("k"))
            .select("node", F.expr("substr(k, 11)").alias("community"))
            .localCheckpoint(eager=True)
        )
    return labels


def common_neighbors(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    min_common: int = 2,
    max_neighbor_degree: int | None = None,
) -> DataFrame:
    """Link prediction by common-neighbor counting + neighbor-set Jaccard.

    For every unordered node pair (a < b) sharing >= ``min_common``
    neighbors: n_common, n_union = deg(a) + deg(b) - n_common, the Jaccard
    coefficient in exact parts-per-million integer arithmetic, and whether
    the pair is already directly linked (unlinked high-Jaccard pairs are
    the predicted links).

    Scale shape: the wedge self-join of the adjacency list on the shared-
    neighbor key is the one expensive step — cost sum(deg(w)^2) over
    wedge centers w, so hub nodes dominate. ``max_neighbor_degree``
    degree-caps the wedge CENTERS (drop rows whose shared neighbor has
    degree > cap before the join) — the standard web-scale bound; full
    degrees still feed n_union, so reported Jaccard stays exact for every
    emitted pair. The oracle mirrors the cap exactly.
    """
    sym = _sym_edges(edges, src, dst).localCheckpoint(eager=True)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    wedge_src = sym
    if max_neighbor_degree is not None:
        center_deg = deg.withColumnRenamed("u", "v").withColumnRenamed("d", "dv")
        wedge_src = (
            sym.join(center_deg, "v")
            .where(F.col("dv") <= max_neighbor_degree)
            .select("u", "v")
        )
    s1, s2 = wedge_src.alias("s1"), wedge_src.alias("s2")
    pairs = (
        s1.join(
            s2,
            (F.col("s1.v") == F.col("s2.v")) & (F.col("s1.u") < F.col("s2.u")),
        )
        .groupBy(
            F.col("s1.u").alias("node_a"), F.col("s2.u").alias("node_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
        .where(F.col("n_common") >= min_common)
    )
    da = deg.select(F.col("u").alias("node_a"), F.col("d").alias("deg_a"))
    db = deg.select(F.col("u").alias("node_b"), F.col("d").alias("deg_b"))
    und = sym.where(F.col("u") < F.col("v")).select(
        F.col("u").alias("node_a"), F.col("v").alias("node_b"),
        F.lit(True).alias("is_linked"),
    )
    return (
        pairs.join(da, "node_a")
        .join(db, "node_b")
        .join(und, ["node_a", "node_b"], "left")
        .select(
            "node_a",
            "node_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            (F.col("deg_a") + F.col("deg_b") - F.col("n_common"))
            .cast("bigint")
            .alias("n_union"),
            F.expr(
                "CAST(1000000 * n_common AS bigint)"
                " DIV (deg_a + deg_b - n_common)"
            ).alias("jaccard_ppm"),
            F.coalesce(F.col("is_linked"), F.lit(False)).alias("is_linked"),
        )
    )


def pagerank(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    iterations: int = 5,
    damping_pct: int = 85,
    prior: DataFrame | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank, exact bigint arithmetic.

    rank0(v) = SCALE // N;  rank_{i+1}(v) = (100-d)%*SCALE // (100*N)
    + d% * sum_{u->v}(rank_i(u) // out_deg(u)) // 100. Dangling-node mass
    is not redistributed (documented variant: totals decay slightly, the
    ranking is unaffected). Returns (node, rank_e9).

    ``prior``: optional (node, rank_e9) scores from a previous run — the
    incremental warm start for the daily-crawl-delta shape: after a small
    graph delta, a couple of warm iterations re-converge where a cold
    start needs the full count; nodes absent from the prior (newly crawled)
    start at the uniform init. Same exact-integer recurrence either way,
    so warm results are a pure function of (edges, prior, iterations) —
    bit-identical across engines and partitionings.
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
    if prior is not None:
        rank = nodes.join(
            prior.select("node", F.col("rank_e9").alias("_p")), "node", "left"
        ).select(
            "node",
            F.coalesce(F.col("_p"), F.lit(init)).cast("bigint").alias("rank_e9"),
        )
    else:
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


HITS_SCALE = 10**6


def hits(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    iterations: int = 4,
) -> DataFrame:
    """Fixed-iteration HITS (hubs & authorities), exact bigint arithmetic.

    Kleinberg's mutual-reinforcement recurrence on the directed link graph
    (the web-native complement to PageRank: a good *hub* links to good
    *authorities* and vice versa — reference's viewer ranks nodes only by
    degree, ``data_renderer.js``):

        hub_0(u)  = SCALE
        raw_a(v)  = sum over u->v of hub_i(u)
        auth_i(v) = raw_a(v) * SCALE // sum(raw_a)       (L1 normalize)
        raw_h(u)  = sum over u->v of auth_i(v)
        hub_i(u)  = raw_h(u) * SCALE // sum(raw_h)

    Float HITS is irreproducible under shuffle (summation order); the
    fixed-point integer form is bit-identical across engines and
    partitionings, so the SQL-oracle twin unrolls the same recurrence.
    SCALE is 1e6 (not PageRank's 1e9) for overflow headroom: a raw score
    is at most max_degree * SCALE, and the normalize multiplies by SCALE
    again — max_degree * SCALE^2 must stay under 2^63, which holds to
    max_degree ~ 9e6 (far beyond any host graph's degree after the
    n_links>=1 host rollup).

    Scale shape: per half-round one equi-join (edges x scores, both hashed
    on the join key) + one partial-aggregated sum shuffle + one scalar agg
    for the normalizer; the edge list is ``localCheckpoint``-ed once and
    per-round scores cut lineage (the pagerank pattern). Returns
    (node, auth_e6, hub_e6) for every node in the edge list.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    hub = nodes.select(
        "node", F.lit(HITS_SCALE).cast("bigint").alias("score")
    )
    auth = hub

    def _half(scores: DataFrame, join_on: str, group_to: str) -> DataFrame:
        raw = (
            e.join(scores.withColumnRenamed("node", join_on), join_on)
            .groupBy(group_to)
            .agg(F.sum("score").alias("raw"))
            .withColumnRenamed(group_to, "node")
        )
        total = raw.agg(F.sum("raw")).first()[0] or 1
        return nodes.join(raw, "node", "left").select(
            "node",
            F.expr(
                f"coalesce(raw, 0) * {HITS_SCALE} DIV {total}"
            ).cast("bigint").alias("score"),
        ).localCheckpoint(eager=True)

    for _ in range(iterations):
        auth = _half(hub, "u", "v")
        hub = _half(auth, "v", "u")
    return (
        auth.withColumnRenamed("score", "auth_e6")
        .join(hub.withColumnRenamed("score", "hub_e6"), "node")
        .select("node", "auth_e6", "hub_e6")
    )


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


def k_core(
    edges: DataFrame,
    k: int = 3,
    src: str = "subj",
    dst: str = "obj",
    max_rounds: int = 8,
) -> DataFrame:
    """Bounded-round k-core: iteratively peel nodes of degree < k from the
    undirected simple graph; after ``max_rounds`` rounds the survivors are
    exactly "the k-core up to ``max_rounds`` peels" — the same fixed-round
    bounded semantics as ``weighted_sssp`` (deterministic, engine-portable,
    and at corpus scale peeling converges in a handful of rounds anyway;
    early exit on a stable edge count never changes the result). Returns
    (node, degree) for surviving nodes with their in-core degree.

    Scale shape per round: one partial-aggregated degree count + two
    left_semi equi-joins against the (node-cardinality-sized) survivor
    set; the edge list is ``localCheckpoint``-ed per round to cut lineage.
    """
    active = _sym_edges(edges, src, dst).localCheckpoint(eager=True)
    n_edges = active.count()
    for _ in range(max_rounds):
        keep = (
            active.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= k)
            .select("u")
        )
        nxt = active.join(keep, "u", "left_semi").join(
            keep.withColumnRenamed("u", "v"), "v", "left_semi"
        ).select("u", "v").localCheckpoint(eager=True)
        n_nxt = nxt.count()
        active = nxt
        if n_nxt == n_edges:
            break  # stable: further peels are the identity
        n_edges = n_nxt
    return active.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )


def random_walks(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    n_walks: int = 2,
    walk_len: int = 3,
) -> DataFrame:
    """Deterministic DeepWalk-style random walks — graph-embedding prep.

    (start, walk_id, path) with ``n_walks`` walks of up to ``walk_len``
    steps from every node that has out-edges; the skip-gram training corpus
    for node embeddings. The "random" neighbor choice is a 48-bit md5 of
    (start, walk_id, step, current) mod out-degree over the *sorted*
    neighbor list — bit-identical across engines, partitionings and reruns
    (no rand(), which would break both resumability and the oracle).

    Plan: the adjacency (node → sorted neighbor array) is built once with
    one partial-agg shuffle and reused by every step; each step is one
    equi-join of the walk frontier against it (hub skew absorbed by AQE).
    Walks that hit a sink terminate early (path stays short). ``walk_len``
    joins total — the classic bounded-iteration frontier shape, same as
    ``weighted_sssp``.
    """
    adj = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
        .groupBy("node")
        .agg(F.array_sort(F.collect_set("nbr")).alias("nbrs"))
        .localCheckpoint(eager=False)
    )
    walks = (
        adj.select("node")
        .withColumn(
            "walk_id", F.explode(F.sequence(F.lit(0), F.lit(n_walks - 1)))
        )
        .select(
            F.col("node").alias("start"),
            F.col("walk_id").cast("int").alias("walk_id"),
            F.col("node").alias("cur"),
            F.array(F.col("node")).alias("path"),
        )
    )
    for step in range(walk_len):
        j = walks.join(
            adj.select(F.col("node").alias("cur"), "nbrs"), "cur", "left"
        )
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("start"),
                        F.col("walk_id").cast("string"),
                        F.lit(str(step)),
                        F.col("cur"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        nxt = F.when(
            F.col("nbrs").isNotNull(),
            F.element_at(
                "nbrs", (F.pmod(h, F.size("nbrs")) + F.lit(1)).cast("int")
            ),
        )
        walks = j.select(
            "start",
            "walk_id",
            nxt.alias("cur"),
            F.when(nxt.isNotNull(), F.concat("path", F.array(nxt)))
            .otherwise(F.col("path"))
            .alias("path"),
        )
    return walks.select("start", "walk_id", "path")


def dense_ids(df: DataFrame, col: str = "node", buckets: int = 64) -> DataFrame:
    """Scalable deterministic dense ids 0..N-1 for a key column.

    Two-level composition — the distributed alternative to a global
    ``row_number`` (whose single-partition sort is the export-only
    ``with_dense_export_ids`` shape and a bottleneck on a large vocabulary):

    1. bucket by a portable 48-bit md5 of the key (``buckets`` hash cells);
    2. ``row_number`` per bucket, ordered by key — ``buckets`` independent
       parallel window partitions, never one;
    3. bucket offsets by prefix-summing the tiny per-bucket counts (a
       ``buckets``-row window, driver-scale) and broadcast-joining them back.

    Ids are dense and deterministic (ordered by (bucket, key) — a fixed
    total order, just not the global lexicographic one). Returns
    (``col``, vid).
    """
    b = F.pmod(
        F.conv(F.substring(F.md5(F.col(col)), 1, 12), 16, 10).cast("bigint"),
        F.lit(buckets),
    ).cast("int")
    keyed = df.select(F.col(col)).distinct().withColumn("b", b)
    rn = F.row_number().over(Window.partitionBy("b").orderBy(col))
    counts = keyed.groupBy("b").agg(F.count(F.lit(1)).alias("n"))
    offsets = counts.select(
        "b",
        F.coalesce(
            F.sum("n").over(
                Window.orderBy("b").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("off"),
    )
    return (
        keyed.withColumn("rn", rn)
        .join(F.broadcast(offsets), "b")
        .select(col, (F.col("off") + F.col("rn") - 1).cast("bigint").alias("vid"))
    )


def negative_samples(
    edges: DataFrame,
    src: str = "subj",
    pred: str = "pred",
    dst: str = "obj",
    k: int = 2,
    buckets: int = 64,
) -> DataFrame:
    """Deterministic filtered negative sampling for KG-embedding training.

    For every positive triple, ``k`` corrupted-object negatives (the
    TransE/DistMult training-pair recipe): replacement = the node whose
    :func:`dense_ids` index is the 48-bit md5 of (subj|pred|obj|i) mod
    vocabulary size, shifted to the next index (mod N) when the draw
    collides with the true object ("filtered" sampling — a negative equal
    to the positive would corrupt the loss). No ``rand()``: hash-derived
    draws are bit-identical across engines, partitionings and reruns, so
    the oracle twin replays them exactly and resumed jobs emit the same
    pairs.

    Scale shape: the candidate table is a constant-factor (``k``×)
    projection of the edge list — no shuffle; the two vocab lookups (draw
    and collision-shift) are equi-joins against the (label, vid) table,
    broadcast when the vocabulary is small. Returns
    (subj, pred, obj, sample_idx, neg_obj).
    """
    e = edges.select(
        F.col(src).alias("subj"),
        F.col(pred).alias("pred"),
        F.col(dst).alias("obj"),
    ).distinct()
    vocab = dense_ids(
        e.select(F.col("subj").alias("node"))
        .unionByName(e.select(F.col("obj").alias("node"))),
        "node",
        buckets,
    ).localCheckpoint(eager=True)
    n = vocab.count()
    cand = e.withColumn(
        "sample_idx", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    ).withColumn("sample_idx", F.col("sample_idx").cast("int"))
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", "subj", "pred", "obj", "sample_idx")), 1, 12
        ),
        16,
        10,
    ).cast("bigint")
    cand = cand.withColumn("cid", F.pmod(h, F.lit(n))).withColumn(
        "cid2", F.pmod(F.col("cid") + 1, F.lit(n))
    )
    v1 = vocab.select(F.col("vid").alias("cid"), F.col("node").alias("draw"))
    v2 = vocab.select(F.col("vid").alias("cid2"), F.col("node").alias("shifted"))
    return (
        cand.join(v1, "cid")
        .join(v2, "cid2")
        .select(
            "subj",
            "pred",
            "obj",
            "sample_idx",
            F.when(F.col("draw") == F.col("obj"), F.col("shifted"))
            .otherwise(F.col("draw"))
            .alias("neg_obj"),
        )
    )


def walk_skipgram_pairs(
    walks: DataFrame, window: int = 2
) -> DataFrame:
    """Skip-gram (center, context) pairs from walk paths — the actual
    node-embedding training table.

    (center, context, n_pairs) aggregated over all walks: each path is
    posexploded once and pairs are formed by a positional self-join within
    ``window`` hops (|i-j| ≤ window, i ≠ j). The join key is
    (start, walk_id) — walk-local, so pair formation never crosses walks
    and the per-row cost is walk_len × window, a constant; the only
    data-sized exchange is the final (center, context) count rollup.
    """
    pos = walks.select(
        "start", "walk_id", F.posexplode("path").alias("i", "center")
    )
    ctx = walks.select(
        "start", "walk_id", F.posexplode("path").alias("j", "context")
    )
    return (
        pos.join(ctx, ["start", "walk_id"])
        .where(
            (F.col("i") != F.col("j"))
            & (F.abs(F.col("i") - F.col("j")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def community_quotient(
    edges: DataFrame,
    assignments: DataFrame,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """Quotient (super-node) graph: contract every node to its community
    and count the distinct underlying edges between community pairs — the
    graph-compression step that turns a billion-edge KG into a
    community-level map small enough to serve, and the standard
    coarsening move for multilevel layout/partitioning.

    (comm_src, comm_dst, n_edges) over the DISTINCT directed edge list;
    intra-community rows (comm_src == comm_dst) are kept — their share is
    the compression diagnostic (how much of the graph the contraction
    absorbs). Scale shape: two equi-joins of the edge list against the
    (node, community) map plus one partial-agg'd rollup whose cardinality
    is bounded by |communities|²; a hub community that dominates the map
    is the :func:`~text_to_graph_spark.operators.canonicalize.
    skew_salted_join` use case.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).distinct()
    cu = assignments.select(
        F.col("node").alias("u"), F.col("community").alias("comm_src")
    )
    cv = assignments.select(
        F.col("node").alias("v"), F.col("community").alias("comm_dst")
    )
    return (
        e.join(cu, "u")
        .join(cv, "v")
        .groupBy("comm_src", "comm_dst")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_edges"))
    )


def walk_training_pairs(
    walks: DataFrame,
    vocab_nodes: DataFrame,
    window: int = 2,
    k: int = 2,
    buckets: int = 64,
) -> DataFrame:
    """The complete DeepWalk dataloader output: every skip-gram
    (center, context) positive from :func:`walk_skipgram_pairs` joined
    with ``k`` deterministic filtered negative contexts — the exact table
    a skip-gram-with-negative-sampling trainer consumes per epoch.

    Negative draw mirrors :func:`negative_samples`: the node whose
    :func:`dense_ids` index is the 48-bit md5 of (center|context|i) mod
    vocabulary size, shifted one index (mod N) when the draw collides
    with the true context. No ``rand()`` — draws are bit-identical across
    engines, partitionings and reruns.

    Scale shape: zero extra shuffles beyond the two inputs — the positive
    table's rollup (inside walk_skipgram_pairs) and the vocabulary build
    (dense_ids); the k× negative expansion is a pure projection and the
    two vid lookups are equi-joins against the (node, vid) table,
    broadcast when the vocabulary is small. Returns
    (center, context, n_pairs, sample_idx, neg_context).
    """
    pairs = walk_skipgram_pairs(walks, window)
    vocab = dense_ids(vocab_nodes, "node", buckets).localCheckpoint(eager=True)
    n = vocab.count()
    cand = pairs.withColumn(
        "sample_idx", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    ).withColumn("sample_idx", F.col("sample_idx").cast("int"))
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", "center", "context", "sample_idx")), 1, 12
        ),
        16,
        10,
    ).cast("bigint")
    cand = cand.withColumn("cid", F.pmod(h, F.lit(n))).withColumn(
        "cid2", F.pmod(F.col("cid") + 1, F.lit(n))
    )
    v1 = vocab.select(F.col("vid").alias("cid"), F.col("node").alias("draw"))
    v2 = vocab.select(F.col("vid").alias("cid2"), F.col("node").alias("shifted"))
    return (
        cand.join(v1, "cid")
        .join(v2, "cid2")
        .select(
            "center",
            "context",
            "n_pairs",
            "sample_idx",
            F.when(F.col("draw") == F.col("context"), F.col("shifted"))
            .otherwise(F.col("draw"))
            .alias("neg_context"),
        )
    )


def csr_layout(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    buckets: int = 64,
    range_width: int = 1024,
) -> DataFrame:
    """CSR (compressed sparse row) serving layout for the canonical graph:
    every node with its dense id, sorted neighbor array, degree, and global
    row-pointer offset — the array-packed adjacency a low-latency graph
    service memory-maps.

    The offset column is the exclusive prefix sum of degrees in dense-id
    order, computed WITHOUT a global single-partition window (the same
    two-level trick as :func:`dense_ids`, but over contiguous vid ranges
    so the running order is the global id order): per-range window prefix
    sums + prefix-summed range totals broadcast back. Isolated targets
    (in-degree only) get degree 0 and a well-defined offset.

    Returns (vid, node, degree, csr_offset, nbrs).
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
    )
    ids = dense_ids(
        e.select(F.col("u").alias("node")).unionByName(
            e.select(F.col("v").alias("node"))
        ),
        "node",
        buckets,
    )
    adj = e.groupBy(F.col("u").alias("node")).agg(
        F.array_sort(F.collect_set("v")).alias("nbrs")
    )
    rows = (
        ids.join(adj, "node", "left")
        .select(
            "vid",
            "node",
            F.coalesce("nbrs", F.array().cast("array<string>")).alias("nbrs"),
        )
        .withColumn("degree", F.size("nbrs").cast("bigint"))
        .withColumn("rng", F.expr(f"vid DIV {range_width}").cast("bigint"))
    )
    in_range = F.coalesce(
        F.sum("degree").over(
            Window.partitionBy("rng")
            .orderBy("vid")
            .rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    totals = rows.groupBy("rng").agg(F.sum("degree").alias("t"))
    range_off = totals.select(
        "rng",
        F.coalesce(
            F.sum("t").over(
                Window.orderBy("rng").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ).alias("roff"),
    )
    return (
        rows.withColumn("in_rng", in_range)
        .join(F.broadcast(range_off), "rng")
        .select(
            "vid",
            "node",
            "degree",
            (F.col("roff") + F.col("in_rng")).cast("bigint").alias("csr_offset"),
            "nbrs",
        )
    )


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    iterations: int = 5,
    damping_pct: int = 85,
) -> DataFrame:
    """Personalized PageRank — random walk with restart to a SEED set, the
    workhorse of entity-centric recommendation and related-entity ranking
    ("important near these nodes", not globally).

    Same exact-bigint fixed-point recurrence as :func:`pagerank`, except
    the teleport mass lands only on the seeds:

        rank_0(v)    = SCALE // |S| if v in S else 0
        rank_{i+1}(v)= [v in S] * (100-d)% * SCALE // (100 * |S|)
                       + d% * sum_{u->v}(rank_i(u) // out_deg(u)) // 100

    Deterministic, bit-identical across engines/partitionings; the oracle
    unrolls the same recurrence. Per round: one equi-join + one partial-agg
    shuffle; the seed flag is a broadcast join. Returns (node, rank_e9).
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
    sd = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .join(nodes, "node")
        .localCheckpoint(eager=True)
    )
    s = sd.count()
    if s == 0:
        raise ValueError("personalized_pagerank: no seed is in the graph")
    deg = e.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    e_deg = e.join(deg, "u").localCheckpoint(eager=True)
    flagged = nodes.join(
        F.broadcast(sd.select("node", F.lit(1).alias("is_seed"))), "node", "left"
    ).localCheckpoint(eager=True)
    init = RANK_SCALE // s
    base = (100 - damping_pct) * RANK_SCALE // (100 * s)
    rank = flagged.select(
        "node",
        F.when(F.col("is_seed").isNotNull(), F.lit(init))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("rank_e9"),
    )
    for _ in range(iterations):
        inc = (
            e_deg.join(rank.withColumnRenamed("node", "u"), "u")
            .select("v", F.expr("rank_e9 DIV d").alias("contrib"))
            .groupBy("v")
            .agg(F.sum("contrib").alias("inc"))
            .withColumnRenamed("v", "node")
        )
        rank = flagged.join(inc, "node", "left").select(
            "node",
            (
                F.when(F.col("is_seed").isNotNull(), F.lit(base)).otherwise(F.lit(0))
                + F.expr(f"{damping_pct} * coalesce(inc, 0) DIV 100")
            ).cast("bigint").alias("rank_e9"),
        )
        rank = rank.localCheckpoint(eager=True)
    return rank


def node_equivalence_classes(
    edges: DataFrame, src: str = "subj", dst: str = "obj"
) -> DataFrame:
    """Structural-equivalence compression: nodes with IDENTICAL undirected
    neighbor sets collapse into one class — the supernode summarization
    that web boilerplate produces in bulk (every page of a template site
    links the same nav targets) and that shrinks downstream graph
    algorithms by the class multiplicity.

    The class key is the md5 of the sorted neighbor list (engine-portable;
    a collision is ~2^-128). One adjacency rollup + one class rollup, both
    partial-agg'd. Returns one row per class with >= 2 members:
    (class_key, n_members, members, degree).
    """
    sym = _sym_edges(edges, src, dst)
    adj = sym.groupBy(F.col("u").alias("node")).agg(
        F.array_sort(F.collect_set("v")).alias("nbrs")
    )
    keyed = adj.select(
        "node",
        F.md5(F.concat_ws("|", "nbrs")).alias("class_key"),
        F.size("nbrs").cast("bigint").alias("degree"),
    )
    return (
        keyed.groupBy("class_key", "degree")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.array_sort(F.collect_list("node")).alias("members"),
        )
        .where(F.col("n_members") >= 2)
        .select("class_key", "n_members", "members", "degree")
    )


def clustering_coefficient(
    edges: DataFrame, src: str = "subj", dst: str = "obj"
) -> DataFrame:
    """Local clustering coefficient per node in exact ppm — how close each
    node's neighborhood is to a clique (community cores vs star hubs;
    boilerplate hubs score ~0, tight entity clusters ~1e6).

    coeff_e6 = 2 * triangles(v) * 1e6 DIV (deg(v) * (deg(v) - 1)) over the
    undirected simple graph; degree-1 nodes report 0. Composes the existing
    :func:`triangle_count` (two equi-joins) with the degree rollup — no new
    heavy shape. Returns (node, degree, n_triangles, coeff_e6).
    """
    sym = _sym_edges(edges, src, dst)
    deg = sym.groupBy(F.col("u").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("degree")
    )
    tri = triangle_count(edges, src, dst)
    return (
        deg.join(tri, "node", "left")
        .select(
            "node",
            "degree",
            F.coalesce("n_triangles", F.lit(0)).cast("bigint").alias("n_triangles"),
            F.expr(
                "CASE WHEN degree >= 2 THEN "
                "2 * coalesce(n_triangles, 0) * 1000000 "
                "DIV (degree * (degree - 1)) ELSE 0 END"
            ).cast("bigint").alias("coeff_e6"),
        )
    )


def ranking_eval(
    preds: DataFrame,
    group_col: str = "node_a",
    item_col: str = "node_b",
    score_col: str = "jaccard_ppm",
    label_col: str = "is_linked",
) -> DataFrame:
    """KG-completion evaluation: filtered MRR / Hits@k of a scored
    candidate table against ground-truth labels — the standard link-
    prediction report card (Bordes et al., NeurIPS'13 eval protocol,
    public literature), here over ``common_neighbors`` output where
    ``is_linked`` marks pairs the graph already asserts.

    Per group (query node), candidates rank by (score DESC, item ASC — the
    deterministic tiebreak); every positive contributes its reciprocal
    rank in exact ppm (1e6 DIV rank). One summary row:

        n_queries, n_positives, mrr_ppm = sum(1e6 DIV rank) DIV n_pos,
        hits1 / hits3 / hits10 (positives ranked <= k),
        hits10_ppm = 1e6 * hits10 DIV n_positives.

    Scale shape (100 TB): the rank window partitions by the query node —
    per-group candidate lists are fan-out-bounded (the predictor already
    degree-caps wedge centers), so no single-reducer window; the final
    rollup is one partial-agg'd global aggregate to a single row. Exact
    integer math end to end.
    """
    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(
            F.col(score_col).desc(), F.col(item_col).asc()
        )
    )
    ranked = preds.select(
        F.col(group_col).alias("grp"),
        F.coalesce(F.col(label_col), F.lit(False)).alias("pos"),
        rn.alias("rank"),
    )
    return ranked.agg(
        F.count_distinct(F.when(F.col("pos"), F.col("grp"))).cast("long").alias(
            "n_queries"
        ),
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("long").alias("n_positives"),
        F.expr(
            "sum(CASE WHEN pos THEN 1000000L DIV rank ELSE 0L END)"
            " DIV sum(CASE WHEN pos THEN 1L ELSE 0L END)"
        ).alias("mrr_ppm"),
        F.sum(F.when(F.col("pos") & (F.col("rank") <= 1), 1).otherwise(0))
        .cast("long")
        .alias("hits1"),
        F.sum(F.when(F.col("pos") & (F.col("rank") <= 3), 1).otherwise(0))
        .cast("long")
        .alias("hits3"),
        F.sum(F.when(F.col("pos") & (F.col("rank") <= 10), 1).otherwise(0))
        .cast("long")
        .alias("hits10"),
        F.expr(
            "1000000L * sum(CASE WHEN pos AND rank <= 10 THEN 1L ELSE 0L END)"
            " DIV sum(CASE WHEN pos THEN 1L ELSE 0L END)"
        ).alias("hits10_ppm"),
    )


def node2vec_walks(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    n_walks: int = 2,
    walk_len: int = 3,
    w_return: int = 1,
    w_common: int = 4,
    w_far: int = 2,
) -> DataFrame:
    """Deterministic node2vec second-order biased walks (Grover & Leskovec,
    KDD'16) — the BFS/DFS-interpolating upgrade of :func:`random_walks`.

    Candidate weights are INTEGERS (defaults encode p=4, q=2 scaled by 4:
    return=1, distance-1-from-prev=4, distance-2=2), and the "random" pick
    is a weighted wheel: h = 48-bit md5 of (start|walk_id|step|prev|cur)
    mod the total candidate weight, then a left fold over the sorted
    neighbor list subtracts weights until the wheel lands — bit-identical
    across engines, partitionings and reruns (no rand(), no float probs).
    Step 0 has no prev, so every candidate carries ``w_far`` and the pick
    is uniform. Sinks terminate early exactly like :func:`random_walks`.

    Plan: the sorted adjacency is built once (one partial-agg shuffle) and
    probed twice per step — cur's neighbors AND prev's (the second-order
    state) — both label equi-joins; the wheel fold is a pure array
    expression (zero Python, no per-step window/explode shuffle).
    """
    adj = (
        edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .distinct()
        .groupBy("node")
        .agg(F.array_sort(F.collect_set("nbr")).alias("nbrs"))
        .localCheckpoint(eager=False)
    )
    walks = (
        adj.select("node")
        .withColumn("walk_id", F.explode(F.sequence(F.lit(0), F.lit(n_walks - 1))))
        .select(
            F.col("node").alias("start"),
            F.col("walk_id").cast("int").alias("walk_id"),
            F.lit(None).cast("string").alias("prev"),
            F.col("node").alias("cur"),
            F.array(F.col("node")).alias("path"),
        )
    )
    for step in range(walk_len):
        j = walks.join(
            adj.select(F.col("node").alias("cur"), "nbrs"), "cur", "left"
        ).join(
            adj.select(F.col("node").alias("prev"), F.col("nbrs").alias("pnbrs")),
            "prev",
            "left",
        )
        ws = F.transform(
            "nbrs",
            lambda n: F.when(n == F.col("prev"), F.lit(w_return))
            .when(
                F.col("pnbrs").isNotNull() & F.array_contains("pnbrs", n),
                F.lit(w_common),
            )
            .otherwise(F.lit(w_far))
            .cast("long"),
        )
        total = F.aggregate(ws, F.lit(0).cast("bigint"), lambda a, x: a + x)
        h = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("start"),
                        F.col("walk_id").cast("string"),
                        F.lit(str(step)),
                        F.coalesce(F.col("prev"), F.lit("")),
                        F.col("cur"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("bigint")
        items = F.zip_with(
            "nbrs", ws, lambda n, w: F.struct(w.alias("a"), n.alias("b"))
        )
        init = F.struct(
            F.pmod(h, total).alias("a"), F.lit(None).cast("string").alias("b")
        )
        nxt = F.when(
            F.col("nbrs").isNotNull(),
            F.aggregate(
                items,
                init,
                lambda acc, x: F.when(acc["b"].isNotNull(), acc)
                .when(
                    acc["a"] < x["a"],
                    F.struct(acc["a"].alias("a"), x["b"].alias("b")),
                )
                .otherwise(
                    F.struct((acc["a"] - x["a"]).alias("a"), acc["b"].alias("b"))
                ),
                lambda acc: acc["b"],
            ),
        )
        # evaluate the fold ONCE per row, then reference the attribute: a
        # projection that repeats a nested-lambda aggregate tree 4x trips
        # Spark's lambda-variable reuse (observed: two copies of the same
        # expression disagreeing in one row) — the single-alias stage embeds
        # one copy; the downstream refs are plain attributes
        stepped = j.select("start", "walk_id", "cur", "path", nxt.alias("nxt"))
        walks = stepped.select(
            "start",
            "walk_id",
            F.when(F.col("nxt").isNotNull(), F.col("cur")).alias("prev"),
            F.col("nxt").alias("cur"),
            F.when(F.col("nxt").isNotNull(), F.concat("path", F.array("nxt")))
            .otherwise(F.col("path"))
            .alias("path"),
        )
    return walks.select("start", "walk_id", "path")


def resource_allocation(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    min_common: int = 1,
    max_neighbor_degree: int | None = None,
) -> DataFrame:
    """Resource-allocation link prediction — the hub-discounted upgrade of
    :func:`common_neighbors`: each shared neighbor z contributes 1/deg(z)
    instead of 1, so a pair bridged only by a boilerplate mega-hub (every
    page's "Home" entity) scores near zero while a pair sharing three
    specific low-degree entities scores high. On web-extracted KGs this is
    the difference between predicting real links and predicting the hub's
    star.

    Exact integer arithmetic: ra_ppm = sum_z (1_000_000 DIV deg(z)) —
    bit-identical across engines and shuffle orders (no float sums). The
    reference computes no link prediction; this extends its viewer's
    degree/BFS metrics (data_renderer.js) to corpus-scale inference.

    Scale shape: identical to common_neighbors — the wedge self-join on
    the shared-neighbor key is the one expensive step, and the center's
    degree rides the wedge rows as a column (no extra join after the
    groupBy). ``max_neighbor_degree`` drops mega-hub centers BEFORE the
    join; since those centers contribute <= 1e6/cap ppm each, the cap is
    both the cost bound and an explicit score floor cut, mirrored exactly
    by the oracle. Returns (node_a, node_b, n_common, ra_ppm, is_linked).
    """
    sym = _sym_edges(edges, src, dst).localCheckpoint(eager=True)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    # wedge rows keyed by center v, carrying the center's degree
    center_deg = deg.select(F.col("u").alias("v"), F.col("d").alias("dv"))
    wedge_src = sym.join(center_deg, "v")
    if max_neighbor_degree is not None:
        wedge_src = wedge_src.where(F.col("dv") <= max_neighbor_degree)
    s1 = wedge_src.alias("s1")
    s2 = wedge_src.select("u", "v").alias("s2")
    pairs = (
        s1.join(
            s2,
            (F.col("s1.v") == F.col("s2.v")) & (F.col("s1.u") < F.col("s2.u")),
        )
        .groupBy(F.col("s1.u").alias("node_a"), F.col("s2.u").alias("node_b"))
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.expr("1000000 DIV dv")).alias("ra_ppm"),
        )
        .where(F.col("n_common") >= min_common)
    )
    und = sym.where(F.col("u") < F.col("v")).select(
        F.col("u").alias("node_a"), F.col("v").alias("node_b"),
        F.lit(True).alias("is_linked"),
    )
    return pairs.join(und, ["node_a", "node_b"], "left").select(
        "node_a",
        "node_b",
        F.col("n_common").cast("bigint").alias("n_common"),
        F.col("ra_ppm").cast("bigint").alias("ra_ppm"),
        F.coalesce(F.col("is_linked"), F.lit(False)).alias("is_linked"),
    )


def edge_triangle_support(
    edges: DataFrame, src: str = "subj", dst: str = "obj"
) -> DataFrame:
    """Per-EDGE triangle support: for every undirected edge (a < b), the
    number of triangles it participates in (= |N(a) ∩ N(b)|). The edge-level
    twin of :func:`triangle_count` and the building block of k-truss
    peeling: an edge with zero support is a bridge / star spoke, an edge
    with high support sits inside a dense community.

    Shape: one wedge equi-join of the symmetric adjacency against itself
    (common-neighbor enumeration), restricted to pairs that ARE edges via a
    pre-join semi filter — so the expensive join only runs on (edge,
    neighbor-of-endpoint) rows, not all pairs. Returns
    (node_a, node_b, support) with support >= 0 for every edge.
    """
    sym = _sym_edges(edges, src, dst).localCheckpoint(eager=True)
    und = sym.where(F.col("u") < F.col("v")).select(
        F.col("u").alias("node_a"), F.col("v").alias("node_b")
    )
    # neighbors of node_a, keyed so the second join can test node_b adjacency
    na = sym.select(F.col("u").alias("node_a"), F.col("v").alias("w"))
    nb = sym.select(F.col("u").alias("node_b"), F.col("v").alias("w"))
    support = (
        und.join(na, "node_a")
        .join(nb, ["node_b", "w"], "left_semi")
        .groupBy("node_a", "node_b")
        .agg(F.count(F.lit(1)).alias("support"))
    )
    return und.join(support, ["node_a", "node_b"], "left").select(
        "node_a",
        "node_b",
        F.coalesce("support", F.lit(0)).cast("bigint").alias("support"),
    )


def k_truss(
    edges: DataFrame,
    k: int = 3,
    src: str = "subj",
    dst: str = "obj",
    max_rounds: int = 3,
) -> DataFrame:
    """k-truss cohesive-subgraph mining: iteratively delete every edge whose
    triangle support is below k-2 until no edge is deleted (or
    ``max_rounds`` peels ran — the bounded-propagation convention shared
    with :func:`weighted_sssp`: web-scale graphs converge in a few peels
    and a fixed bound keeps the oracle an exact unroll). The k-truss is
    the standard community-core definition one notch stronger than
    k-core: every surviving edge closes >= k-2 triangles INSIDE the
    surviving subgraph.

    Per round: one :func:`edge_triangle_support` pass over the surviving
    edge list (two equi-joins + one partial-agg shuffle) and a filter;
    survivors are ``localCheckpoint``-ed so each peel reads a materialized
    edge list instead of replaying the whole peel history. Early exit on
    fixpoint is safe for oracle parity: extra unrolled rounds are no-ops
    once no edge is deleted. Returns the surviving edges with their final
    in-subgraph support: (node_a, node_b, support).
    """
    if k < 2:
        raise ValueError("k_truss: k must be >= 2")
    cur = (
        _sym_edges(edges, src, dst)
        .where(F.col("u") < F.col("v"))
        .select(F.col("u").alias("node_a"), F.col("v").alias("node_b"))
        .localCheckpoint(eager=True)
    )
    need = k - 2
    for _ in range(max_rounds):
        sup = edge_triangle_support(cur, src="node_a", dst="node_b")
        kept = sup.where(F.col("support") >= need).localCheckpoint(eager=True)
        if kept.count() == cur.count():
            return kept
        cur = kept.select("node_a", "node_b").localCheckpoint(eager=True)
    return edge_triangle_support(cur, src="node_a", dst="node_b")


def bounded_closure(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    max_hops: int = 3,
) -> DataFrame:
    """Bounded transitive closure with min-hop distances: every DIRECTED
    reachable pair within ``max_hops`` and the length of the shortest
    directed path. The taxonomy materialization — run over the KG's
    "is-a"/"part-of" predicate slice it turns chains into ancestor tables
    so type queries become one equi-join instead of a per-query traversal.

    The bound is the point at corpus scale: full closure of a web KG is
    quadratic blow-up; hop-bounded closure grows one frontier join per
    round and real type hierarchies are shallow. Per round: one equi-join
    (frontier x edges) + one min partial-agg shuffle; per-round
    ``localCheckpoint`` lineage cuts. The min() re-aggregation ensures each
    pair appears once with its true min-hop count (a pair reachable at
    hops 2 and 3 reports 2). Returns (src_node, dst_node, hops),
    self-pairs excluded.
    """
    if max_hops < 1:
        raise ValueError("bounded_closure: max_hops must be >= 1")
    e = (
        edges.select(F.col(src).alias("src_node"), F.col(dst).alias("dst_node"))
        .where(F.col(src).isNotNull() & F.col(dst).isNotNull())
        .where(F.col(src) != F.col(dst))
        .distinct()
        .localCheckpoint(eager=True)
    )
    closure = e.select("src_node", "dst_node", F.lit(1).alias("hops"))
    frontier = closure
    for h in range(2, max_hops + 1):
        step = (
            frontier.join(
                e.select(
                    F.col("src_node").alias("dst_node"),
                    F.col("dst_node").alias("next_node"),
                ),
                "dst_node",
            )
            .where(F.col("src_node") != F.col("next_node"))
            .select(
                "src_node",
                F.col("next_node").alias("dst_node"),
                F.lit(h).alias("hops"),
            )
            .distinct()
        )
        # keep only pairs not already reached at a lower hop count
        frontier = step.join(
            closure.select("src_node", "dst_node"),
            ["src_node", "dst_node"],
            "left_anti",
        ).localCheckpoint(eager=True)
        closure = closure.unionByName(frontier).localCheckpoint(eager=True)
    return closure.select(
        "src_node", "dst_node", F.col("hops").cast("bigint").alias("hops")
    )


def sampled_neighborhood(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    fanout: tuple[int, int] = (4, 2),
) -> DataFrame:
    """GraphSAGE-style bounded neighborhood sampling: per root node, keep
    at most ``fanout[0]`` hop-1 out-neighbors, then at most ``fanout[1]``
    hop-2 out-neighbors PER sampled hop-1 node — the mini-batch frontier a
    GNN dataloader materializes over the KG. The reference's viewer walks
    full neighborhoods (data_renderer.js BFS); at 100-TB graph scale the
    unbounded frontier of a hub node explodes (celebrity problem), and a
    fan-out cap is the standard fix.

    Sampling is DETERMINISTIC: neighbors rank by ``md5(parent|child)`` —
    a uniform pseudo-random order that is reproducible across engines,
    partitionings, and cluster sizes (no rand(), which reshuffles per
    run). Each window partitions by the parent key, so rank state never
    crosses nodes and the cap bounds every partition's output.

    Scale shape: two equi-joins on the node key, two windows whose
    partitions are the (already capped) per-node neighbor lists; output
    size is at most n_roots * f1 * (1 + f2) regardless of hub degree.

    Returns distinct (root, hop, node) rows.
    """
    f1, f2 = fanout
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .where(F.col(src) != F.col(dst))
        .distinct()
    )
    w1 = Window.partitionBy("s").orderBy(F.md5(F.concat_ws("|", "s", "d")))
    hop1 = (
        e.withColumn("rn", F.row_number().over(w1))
        .where(F.col("rn") <= f1)
        .select(F.col("s").alias("root"), F.col("d").alias("n1"))
    )
    e2 = e.select(F.col("s").alias("n1"), F.col("d").alias("n2"))
    w2 = Window.partitionBy("root", "n1").orderBy(
        F.md5(F.concat_ws("|", "n1", "n2"))
    )
    hop2 = (
        hop1.join(e2, "n1")
        .withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= f2)
        .select("root", F.col("n2").alias("node"))
    )
    return (
        hop1.select("root", F.lit(1).alias("hop"), F.col("n1").alias("node"))
        .unionByName(hop2.select("root", F.lit(2).alias("hop"), "node"))
        .distinct()
    )


def triad_motifs(
    edges: DataFrame, src: str = "subj", dst: str = "obj"
) -> DataFrame:
    """Directed 3-node motif census over the distinct edge list: counts of
    reciprocal pairs, feed-forward loops (a->b->c with shortcut a->c), and
    directed 3-cycles (a->b->c->a). The motif profile is the classic
    graph-structure fingerprint (Milo et al. 2002) — for a KG it separates
    hierarchy-like predicates (feed-forward heavy) from mutual-reference
    structure (cycle/reciprocal heavy).

    Counting conventions (mirrored exactly by the SQL oracle):
    - ``reciprocal``: unordered pairs {a,b} with both a->b and b->a.
    - ``feedforward``: ordered (a,b,c) paths a->b->c, nodes distinct,
      with a->c present — one count per (a,b,c), so a triangle with two
      shortcut middles counts twice (instance census, not triangle set).
    - ``cycle``: directed triangles a->b->c->a counted once (the 3
      rotations are collapsed by dividing the path-join count by 3).

    Scale shape: the same two-equi-join enumeration as triangle_count —
    path join on the shared middle node, closure probe join on the
    (first, last) pair; every join is an equi-join (no cartesian), and
    counts partial-aggregate. Degree-ordered orientation would bound the
    middle join's fan-out under extreme hub skew; the KG edge list is
    entity-keyed and orders of magnitude smaller than the corpus.
    """
    e = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .where(F.col(src) != F.col(dst))
        .distinct()
        .localCheckpoint(eager=False)
    )
    rev = e.select(F.col("b").alias("a"), F.col("a").alias("b"))
    recip = (
        e.join(rev, ["a", "b"])
        .where(F.col("a") < F.col("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("reciprocal").alias("motif"), "n")
    )
    paths = e.join(
        e.select(F.col("a").alias("b"), F.col("b").alias("c")), "b"
    ).where(F.col("a") != F.col("c"))
    ffl = (
        paths.join(
            e.select(F.col("a"), F.col("b").alias("c")), ["a", "c"], "left_semi"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.lit("feedforward").alias("motif"), "n")
    )
    cyc = (
        paths.join(
            e.select(F.col("a").alias("c"), F.col("b").alias("a")),
            ["c", "a"],
            "left_semi",
        )
        .agg((F.count(F.lit(1)) / 3).cast("long").alias("n"))
        .select(F.lit("cycle").alias("motif"), "n")
    )
    return recip.unionByName(ffl).unionByName(cyc)


def maximal_independent_set(
    edges: DataFrame,
    src: str = "subj",
    dst: str = "obj",
    max_rounds: int = 4,
) -> DataFrame:
    """Deterministic Luby-style maximal independent set over the
    undirected graph: per round, every undecided node whose
    ``md5(node)`` priority beats ALL its undecided neighbors' joins the
    MIS; its neighbors become covered; repeat. MIS is the classic
    symmetry-breaking primitive (Luby 1986) behind conflict-free parallel
    scheduling — e.g. picking a set of canonicalization merges or crawl
    targets no two of which interfere. md5 priorities replace Luby's
    coin flips: the same uniform tie-free order on every engine,
    partitioning, and retry.

    Runs EXACTLY ``max_rounds`` rounds (fixed plan, no data-dependent
    control flow — the oracle unrolls the same recurrence); nodes still
    undecided after the budget are emitted as ``status='undecided'``
    rather than silently dropped. Greedy-by-hash decides a dense corpus
    graph in a handful of rounds; each round is two node-key equi-joins +
    one partial-agg'd min shuffle + two anti-joins, with a
    ``localCheckpoint`` lineage cut per round.

    Returns (node, status, round): status in {'mis','covered','undecided'},
    round = decision round (0 for undecided).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col(src) != F.col(dst))
        .distinct()
    )
    sym = (
        sym.unionByName(sym.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    und = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("pri", F.md5("node"))
    )
    decided = None
    for rnd in range(1, max_rounds + 1):
        und = und.localCheckpoint(eager=True)
        nbr = (
            sym.join(und.select(F.col("node").alias("u")), "u")
            .join(
                und.select(F.col("node").alias("v"), F.col("pri").alias("pv")),
                "v",
            )
        )
        nbr_min = nbr.groupBy("u").agg(F.min("pv").alias("min_nbr"))
        mis = (
            und.join(nbr_min, und["node"] == nbr_min["u"], "left")
            .where(F.col("min_nbr").isNull() | (F.col("pri") < F.col("min_nbr")))
            .select("node")
        )
        covered = (
            nbr.join(mis.select(F.col("node").alias("u")), "u", "left_semi")
            .select(F.col("v").alias("node"))
            .distinct()
        )
        out_r = mis.select(
            "node", F.lit("mis").alias("status"), F.lit(rnd).cast("long").alias("round")
        ).unionByName(
            covered.select(
                "node",
                F.lit("covered").alias("status"),
                F.lit(rnd).cast("long").alias("round"),
            )
        )
        decided = out_r if decided is None else decided.unionByName(out_r)
        und = und.join(
            mis.unionByName(covered.select("node")), "node", "left_anti"
        )
    leftover = und.select(
        "node", F.lit("undecided").alias("status"), F.lit(0).cast("long").alias("round")
    )
    return decided.unionByName(leftover)


def wl_refinement(
    edges: DataFrame,
    rounds: int = 2,
    src: str = "subj",
    dst: str = "obj",
) -> DataFrame:
    """1-dimensional Weisfeiler-Lehman color refinement — the structural
    node signature behind graph-isomorphism screening and GNN
    expressiveness (1-WL): color_0(v) = md5(degree), then each round
    rehashes a node's color with a fingerprint of its neighbors' color
    MULTISET. Nodes sharing a final color are 1-WL-indistinguishable —
    the per-wave structural fingerprint that spots template/boilerplate
    subgraphs and drift in extraction shape between crawls.

    The multiset fingerprint is the EXACT decimal(38,0) SUM of each
    neighbor color's 60-bit md5-prefix integer — order-free, so it
    partial-aggregates map-side and a 10^8-in-degree hub costs the same
    shuffle bytes as a leaf (the textbook sorted-concat encoding would
    materialize a giant per-hub string — the skew OOM a web graph
    guarantees). Deterministic and engine-portable: md5 colors, exact
    integer sums (hugeint on the DuckDB side), '|' separator before the
    rehash — no RNG, no floats. Fixed ``rounds`` (no data-dependent
    control flow; the oracle unrolls the identical recurrence with
    AS MATERIALIZED CTEs). Each round is one neighbor-key equi-join +
    one partial-agg'd sum shuffle on the node key, with an eager
    ``localCheckpoint`` lineage cut (the colors table is referenced
    twice per round). Isolated nodes never enter (the symmetric pair
    list comes from edges).

    Returns (node, wl_color, n_class): the final color and its
    equivalence-class size.
    """
    loop_free = edges.where(F.col(src) != F.col(dst))
    sym = (
        loop_free.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            loop_free.select(F.col(dst).alias("u"), F.col(src).alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    colors = deg.select(
        F.col("u").alias("node"), F.md5(F.col("d").cast("string")).alias("color")
    )
    for _ in range(rounds):
        colors = colors.localCheckpoint(eager=True)
        # 60-bit md5-prefix of the neighbor color, summed exactly: an
        # order-free multiset fingerprint with map-side partial agg
        nint = F.conv(F.substring("ncolor", 1, 15), 16, 10).cast("decimal(38,0)")
        nbrs = (
            sym.join(
                colors.select(
                    F.col("node").alias("v"), F.col("color").alias("ncolor")
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.sum(nint).alias("nsum"))
        )
        colors = colors.join(
            nbrs.select(F.col("u").alias("node"), "nsum"), "node"
        ).select(
            "node",
            F.md5(
                F.concat_ws("|", "color", F.col("nsum").cast("string"))
            ).alias("color"),
        )
    cls = Window.partitionBy("color")
    return colors.select(
        "node",
        F.col("color").alias("wl_color"),
        F.count(F.lit(1)).over(cls).cast("bigint").alias("n_class"),
    )


def transe_init(
    edges: DataFrame,
    dim: int = 8,
    init_scale: int = 100,
) -> DataFrame:
    """Deterministic integer initialization for TransE embeddings: one
    row per (kind, name, dim) with val = 48-bit md5(name|kind|dim) mapped
    to [-init_scale, init_scale] micro-units. Entities come from the
    union of subject/object labels, relations from the predicate
    vocabulary. No rand(): the init — like every other model parameter in
    this repo — is bit-identical across engines, partitionings, and
    reruns, which is what makes the trainer oracle-checkable.

    Output: (kind 'e'|'r', name, dim, val)."""
    e = edges.select("subj", "pred", "obj").distinct()
    ents = (
        e.select(F.col("subj").alias("name"))
        .unionByName(e.select(F.col("obj").alias("name")))
        .distinct()
        .withColumn("kind", F.lit("e"))
    )
    rels = (
        e.select(F.col("pred").alias("name"))
        .distinct()
        .withColumn("kind", F.lit("r"))
    )
    span = 2 * init_scale + 1
    both = ents.unionByName(rels).select(
        "kind", "name", F.explode(F.sequence(F.lit(0), F.lit(dim - 1))).alias("dim")
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", "name", "kind", F.col("dim").cast("string"))),
            1,
            12,
        ),
        16,
        10,
    ).cast("bigint")
    return both.select(
        "kind",
        "name",
        F.col("dim").cast("int").alias("dim"),
        (F.pmod(h, F.lit(span)) - F.lit(init_scale)).cast("long").alias("val"),
    )


def transe_epoch(
    edges: DataFrame,
    dim: int = 8,
    margin: int = 50,
    step: int = 5,
    epochs: int = 1,
    init_scale: int = 100,
) -> DataFrame:
    """TransE training (Bordes et al., NeurIPS 2013) as a BATCH epoch in
    exact integer micro-units — the trainer the walk/skip-gram/negative
    dataloader tables feed. L1 scoring makes every gradient a sign
    (∂|x|/∂x ∈ {-1,0,1}), so with integer embeddings, an integer margin,
    and an integer step the whole epoch stays in int64 and the learned
    parameters are bit-identical across shuffle orders, retries, and
    engines — the same batch-update trick as the perceptron trainer
    (``curation.train_linear_classifier``): score everything against the
    CURRENT parameters, aggregate all violated-pair gradients
    per (parameter, dim) in one partial-agg'd shuffle, apply once.

    Per epoch, for every positive (h, r, t) and its deterministic
    corrupted negative (h, r, t') (:func:`negative_samples`, k=1):
    violation iff d(h+r,t) + margin > d(h+r,t') under L1; for violated
    pairs, with s_d = sign(h+r-t)_d and s'_d = sign(h+r-t')_d, gradient
    descent contributes step*(s'_d - s_d) to h_d and r_d, +step*s_d to
    t_d, and -step*s'_d to t'_d. Batch aggregation makes the update a
    pure sum — order-independent by construction.

    Scale shape: the training join is (pairs × dim) rows — four equi-
    joins against the parameter tables (hash-partitioned on name at
    corpus scale; a 1e9-entity model shards naturally since no step needs
    a global view); the per-pair distance is a bounded window (dim rows
    per pair); the update is one (kind, name, dim)-keyed partial agg.
    Epoch count is the only driver loop, with a localCheckpoint lineage
    cut per epoch.

    Output: (kind 'e'|'r', name, dim, val) — the trained parameters.
    """
    e = edges.select("subj", "pred", "obj").distinct()
    pairs = (
        negative_samples(e, k=1)
        .select("subj", "pred", "obj", "neg_obj")
        .localCheckpoint(eager=True)
    )
    emb = transe_init(edges, dim, init_scale).localCheckpoint(eager=True)
    pw = Window.partitionBy("subj", "pred", "obj", "neg_obj")
    for _ in range(epochs):
        ent = emb.where(F.col("kind") == "e")
        rel = emb.where(F.col("kind") == "r")
        x = (
            pairs.join(
                ent.select(
                    F.col("name").alias("subj"), "dim", F.col("val").alias("h")
                ),
                "subj",
            )
            .join(
                rel.select(
                    F.col("name").alias("pred"), "dim", F.col("val").alias("r")
                ),
                ["pred", "dim"],
            )
            .join(
                ent.select(
                    F.col("name").alias("obj"), "dim", F.col("val").alias("t")
                ),
                ["obj", "dim"],
            )
            .join(
                ent.select(
                    F.col("name").alias("neg_obj"),
                    "dim",
                    F.col("val").alias("t2"),
                ),
                ["neg_obj", "dim"],
            )
            .withColumn("dp", F.col("h") + F.col("r") - F.col("t"))
            .withColumn("dn", F.col("h") + F.col("r") - F.col("t2"))
            .withColumn("dpos", F.sum(F.abs("dp")).over(pw))
            .withColumn("dneg", F.sum(F.abs("dn")).over(pw))
            .where(F.col("dpos") + F.lit(margin) > F.col("dneg"))
            .withColumn("s", F.signum("dp").cast("long"))
            .withColumn("s2", F.signum("dn").cast("long"))
        )
        contrib = x.select(
            "dim",
            F.explode(
                F.array(
                    F.struct(
                        F.lit("e").alias("kind"),
                        F.col("subj").alias("name"),
                        (F.lit(step) * (F.col("s2") - F.col("s"))).alias("d"),
                    ),
                    F.struct(
                        F.lit("e").alias("kind"),
                        F.col("obj").alias("name"),
                        (F.lit(step) * F.col("s")).alias("d"),
                    ),
                    F.struct(
                        F.lit("e").alias("kind"),
                        F.col("neg_obj").alias("name"),
                        (-F.lit(step) * F.col("s2")).alias("d"),
                    ),
                    F.struct(
                        F.lit("r").alias("kind"),
                        F.col("pred").alias("name"),
                        (F.lit(step) * (F.col("s2") - F.col("s"))).alias("d"),
                    ),
                )
            ).alias("c"),
        ).select("dim", "c.kind", "c.name", "c.d")
        delta = contrib.groupBy("kind", "name", "dim").agg(
            F.sum("d").cast("long").alias("delta")
        )
        emb = (
            emb.join(delta, ["kind", "name", "dim"], "left")
            .select(
                "kind",
                "name",
                "dim",
                (F.col("val") + F.coalesce(F.col("delta"), F.lit(0)))
                .cast("long")
                .alias("val"),
            )
            .localCheckpoint(eager=True)
        )
    return emb


def transe_rank_eval(
    edges: DataFrame,
    emb: DataFrame,
    model: str,
) -> DataFrame:
    """Link-prediction report card for a TransE parameter table: for every
    distinct (subj, pred) query, rank ALL entities by ascending L1
    distance ||h + r - c|| (deterministic tiebreak by candidate label)
    and feed the ranked candidates — positives marked where the graph
    asserts (subj, pred, c) — through :func:`ranking_eval`. Output is the
    one-row MRR/Hits summary tagged with ``model``, so a trained table
    and its init can be unioned and compared directly.

    Scale shape: candidate generation is query × entity — at corpus scale
    the candidate set comes from a blocked ANN probe instead, but the
    rank-window (per query) and the single-row rollup are the same; exact
    integer distances end to end.
    """
    e = edges.select("subj", "pred", "obj").distinct()
    ent = emb.where(F.col("kind") == "e")
    rel = emb.where(F.col("kind") == "r")
    queries = e.select("subj", "pred").distinct()
    cands = queries.crossJoin(
        ent.select("name").distinct().select(F.col("name").alias("cand"))
    )
    scored = (
        cands.join(
            ent.select(
                F.col("name").alias("subj"), "dim", F.col("val").alias("h")
            ),
            "subj",
        )
        .join(
            rel.select(
                F.col("name").alias("pred"), "dim", F.col("val").alias("r")
            ),
            ["pred", "dim"],
        )
        .join(
            ent.select(
                F.col("name").alias("cand"), "dim", F.col("val").alias("c")
            ),
            ["cand", "dim"],
        )
        .groupBy("subj", "pred", "cand")
        .agg(
            (-F.sum(F.abs(F.col("h") + F.col("r") - F.col("c"))))
            .cast("long")
            .alias("neg_dist")
        )
    )
    labeled = scored.join(
        e.select("subj", "pred", F.col("obj").alias("cand")).withColumn(
            "is_linked", F.lit(True)
        ),
        ["subj", "pred", "cand"],
        "left",
    ).select(
        F.concat_ws("|", "subj", "pred").alias("qid"),
        "cand",
        "neg_dist",
        F.coalesce("is_linked", F.lit(False)).alias("is_linked"),
    )
    return ranking_eval(
        labeled,
        group_col="qid",
        item_col="cand",
        score_col="neg_dist",
        label_col="is_linked",
    ).select(F.lit(model).alias("model"), "*")


def transe_hard_negatives(
    edges: DataFrame,
    emb: DataFrame,
    k: int = 3,
) -> DataFrame:
    """Model-based HARD negative mining — the feedback loop that closes
    the trainer story (standard KG-embedding practice: after a few
    epochs, uniform corruptions are trivially easy; the informative
    negatives are the ones the CURRENT model scores best): for every
    positive (subj, pred, obj), rank all corrupted objects by ascending
    L1 distance ||h + r - c|| under the supplied parameter table and emit
    the ``k`` hardest (closest) candidates that are NOT the true object
    and not asserted by the graph elsewhere under the same (subj, pred)
    — the "filtered" rule, same as the uniform sampler.

    Deterministic end to end: integer distances, ties broken by candidate
    label. Scale shape: the scoring join is the same (candidates × dim)
    equi-join chain as :func:`transe_rank_eval` (at corpus scale the
    candidate set comes from an ANN probe over the entity table instead
    of the full cross join — same downstream rank window either way); the
    per-(subj, pred, obj) top-k is a bounded window.

    Output: (subj, pred, obj, neg_obj, neg_rank, neg_dist).
    """
    e = edges.select("subj", "pred", "obj").distinct()
    ent = emb.where(F.col("kind") == "e")
    rel = emb.where(F.col("kind") == "r")
    queries = e.select("subj", "pred").distinct()
    cands = queries.crossJoin(
        ent.select("name").distinct().select(F.col("name").alias("cand"))
    )
    scored = (
        cands.join(
            ent.select(
                F.col("name").alias("subj"), "dim", F.col("val").alias("h")
            ),
            "subj",
        )
        .join(
            rel.select(
                F.col("name").alias("pred"), "dim", F.col("val").alias("r")
            ),
            ["pred", "dim"],
        )
        .join(
            ent.select(
                F.col("name").alias("cand"), "dim", F.col("val").alias("c")
            ),
            ["cand", "dim"],
        )
        .groupBy("subj", "pred", "cand")
        .agg(
            F.sum(F.abs(F.col("h") + F.col("r") - F.col("c")))
            .cast("long")
            .alias("neg_dist")
        )
    )
    # filtered: drop candidates the graph asserts under this (subj, pred)
    open_cands = scored.join(
        e.select("subj", "pred", F.col("obj").alias("cand")),
        ["subj", "pred", "cand"],
        "left_anti",
    )
    ranked = open_cands.withColumn(
        "neg_rank",
        F.row_number().over(
            Window.partitionBy("subj", "pred").orderBy(
                F.col("neg_dist").asc(), F.col("cand").asc()
            )
        ),
    ).where(F.col("neg_rank") <= k)
    return e.join(ranked, ["subj", "pred"]).select(
        "subj",
        "pred",
        "obj",
        F.col("cand").alias("neg_obj"),
        F.col("neg_rank").cast("int").alias("neg_rank"),
        "neg_dist",
    )
