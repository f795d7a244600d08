"""Iterative graph operators vs exact single-process oracles.

connected_components vs union-find; bfs_distances vs Python BFS in all three
direction modes (viewer parity, data_renderer.js:487-554); k_hop_subgraph
endpoint closure."""

from __future__ import annotations

from collections import deque

import pytest

from text_to_graph_spark.operators.components import (
    bfs_distances,
    connected_components,
    k_hop_subgraph,
    pairwise_shortest_paths,
)

# deterministic sparse graph: 3 components + isolated-ish chains
EDGES = (
    [(i, i + 1) for i in range(0, 20)]          # chain 0..20
    + [(100 + i, 100 + (i * 7) % 23) for i in range(23)]  # tangle 100..122
    + [(200, 201), (202, 201), (203, 202), (204, 204)]    # small + self-loop
)


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def _bfs_oracle(edges, roots, direction, max_hops=20):
    adj = {}
    for u, v in edges:
        if direction in ("out", "both"):
            adj.setdefault(u, set()).add(v)
        if direction in ("in", "both"):
            adj.setdefault(v, set()).add(u)
    dist = {r: 0 for r in roots}
    q = deque(roots)
    while q:
        n = q.popleft()
        if dist[n] >= max_hops:
            continue
        for m in adj.get(n, ()):
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    return dist


def test_connected_components_vs_union_find(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, "src", "dst").collect()
    }
    exp = _uf_components(EDGES)
    assert got == exp
    # sanity: chain, tangle (minus isolated 100), small comp, 2 self-loop isolates
    comps = {}
    for n, c in got.items():
        comps.setdefault(c, set()).add(n)
    assert len(comps) == 5


@pytest.mark.parametrize("direction", ["out", "in", "both"])
def test_bfs_all_directions(spark, direction):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    roots = spark.createDataFrame([(0,), (100,)], "node long")
    got = {
        r["node"]: r["distance"]
        for r in bfs_distances(edges, roots, direction=direction).collect()
    }
    assert got == _bfs_oracle(EDGES, [0, 100], direction)


def test_k_hop_subgraph_closure(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    roots = spark.createDataFrame([(5,)], "node long")
    nodes, sub_edges = k_hop_subgraph(edges, roots, k=2)
    kept = {r["node"] for r in nodes.collect()}
    assert kept == {3, 4, 5, 6, 7}
    for r in sub_edges.collect():
        assert r["src"] in kept and r["dst"] in kept
    # every edge fully inside the ball is present
    exp_edges = {(u, v) for u, v in EDGES if u in kept and v in kept}
    assert {(r["src"], r["dst"]) for r in sub_edges.collect()} == exp_edges


def test_cc_empty_and_null_edges(spark):
    edges = spark.createDataFrame(
        [(1, None), (None, 2)], "src long, dst long"
    )
    assert connected_components(edges, "src", "dst").count() == 0


def test_connected_components_long_path_converges(spark):
    # a 300-node path is the adversarial case for pure min-propagation
    # (O(n) rounds); pointer jumping must converge in O(log n) — well inside
    # the 50-iteration bound — with every node labeled by the path head
    n = 300
    edges = [(i, i + 1) for i in range(n)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df, max_iterations=50).collect()
    }
    assert len(got) == n + 1
    assert set(got.values()) == {0}


def test_connected_components_many_small_components(spark):
    # 100 disjoint triangles: component label = min member of each
    edges = []
    for c in range(100):
        base = c * 10
        edges += [(base, base + 1), (base + 1, base + 2), (base + 2, base)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["component"]
        for r in connected_components(df).collect()
    }
    for c in range(100):
        base = c * 10
        assert got[base] == got[base + 1] == got[base + 2] == base


def test_bfs_distances_scale_fixture_binary_tree(spark):
    """Scale evidence for the read path (VERDICT item 7): a 10k-node binary
    tree. Distances are analytic (depth = floor(log2(i+1))), the frontier
    doubles each hop, and the whole traversal must finish in the ~13 joins
    the depth implies — a frontier-explosion or visited-set regression shows
    up as a blown wall-clock here long before it shows at 100 TB."""
    import math
    import time

    n = 10_000
    edges = [(i, c) for i in range(n) for c in (2 * i + 1, 2 * i + 2) if c < n]
    df = spark.createDataFrame(edges, "src long, dst long").repartition(8)
    roots = spark.createDataFrame([(0,)], "node long")
    depth = int(math.floor(math.log2(n)))  # 13

    t0 = time.monotonic()
    got = {
        r["node"]: r["distance"]
        for r in bfs_distances(
            df, roots, direction="out", max_hops=depth + 1
        ).collect()
    }
    wall = time.monotonic() - t0
    assert len(got) == n
    for i in (0, 1, 2, 5, 100, 4095, 4096, n - 1):
        assert got[i] == int(math.floor(math.log2(i + 1)))
    # loose sandbox bound: ~13 sequential hash joins on local[*]
    assert wall < 120, f"BFS over 10k-node tree took {wall:.1f}s"


def test_pairwise_paths_scale_fixture_grid(spark):
    """G4 at a 1k-node scale: a 32x32 grid graph, roots at two corners.
    Shortest distance is Manhattan (62 hops is too deep for the hop cap, so
    use corner->center roots at distance 31); path length must match and the
    lexicographic tiebreak keeps the result deterministic."""
    side = 32
    edges = []
    for r in range(side):
        for c in range(side):
            u = r * side + c
            if c + 1 < side:
                edges.append((u, u + 1))
            if r + 1 < side:
                edges.append((u, u + side))
    df = spark.createDataFrame(edges, "src long, dst long")
    corner, mid = 0, 31  # top-left -> top-right corner: distance 31
    roots = spark.createDataFrame([(corner,), (mid,)], "node long")
    out = pairwise_shortest_paths(
        df, roots, direction="both", max_hops=31
    ).collect()
    by_pair = {(r["src_root"], r["dst_root"]): r for r in out}
    assert by_pair[(0, 31)]["distance"] == 31
    # lexicographic-min tiebreak over equal-length paths: straight top row
    assert by_pair[(0, 31)]["path"] == ">".join(str(i) for i in range(32))


def test_merge_component_assignments_bridges_slices(spark):
    from text_to_graph_spark.operators.components import (
        connected_components,
        merge_component_assignments,
    )

    a_edges = spark.createDataFrame([("1", "2")], "src string, dst string")
    b_edges = spark.createDataFrame(
        [("2", "3"), ("4", "5")], "src string, dst string"
    )
    a = connected_components(a_edges)
    b = connected_components(b_edges)
    got = {
        r.node: r.component
        for r in merge_component_assignments(a, b).collect()
    }
    # node 2 bridges the slices: {1,2,3} unify under min label "1"
    assert got == {"1": "1", "2": "1", "3": "1", "4": "4", "5": "4"}


class TestLandmarkHarmonic:
    # path a-b-c-d-e (directed as written; BFS symmetrizes)
    PATH = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]

    def _harmonic(self, spark, edges, landmarks, max_hops=4):
        from text_to_graph_spark.operators.components import (
            harmonic_closeness,
            landmark_distances,
        )

        e = spark.createDataFrame(edges, "src string, dst string")
        lm = spark.createDataFrame([(x,) for x in landmarks], "node string")
        d = landmark_distances(e, lm, max_hops=max_hops)
        return {
            r.node: (r.n_landmarks, r.harmonic_e6)
            for r in harmonic_closeness(d).collect()
        }

    def test_path_endpoint_landmarks(self, spark):
        got = self._harmonic(spark, self.PATH, ["a", "e"])
        assert got == {
            "a": (1, 250_000),        # e at 4
            "b": (2, 1_333_333),      # a:1, e:3
            "c": (2, 1_000_000),      # 2 + 2
            "d": (2, 1_333_333),
            "e": (1, 250_000),
        }

    def test_hop_bound_truncates(self, spark):
        got = self._harmonic(spark, self.PATH, ["a", "e"], max_hops=2)
        assert got == {
            "b": (1, 1_000_000),
            "c": (2, 1_000_000),
            "d": (1, 1_000_000),
        }

    def test_landmark_excluded_from_own_score(self, spark):
        # single landmark: its own row (distance 0) must not appear
        got = self._harmonic(spark, self.PATH, ["c"])
        assert "c" not in got and got["a"] == (1, 500_000)


class TestStronglyConnectedComponents:
    """FW-BW min-label SCC vs an exact iterative-Tarjan oracle."""

    # bow-tie-ish directed graph: core cycle {b,c,d}, IN chain a->b,
    # OUT chain d->e->f, a separate 2-cycle {g,h}, a tendril h->i,
    # a self-loop-only node j, and an isolated sink k (via e->k)
    DIRECTED = [
        ("a", "b"), ("b", "c"), ("c", "d"), ("d", "b"),
        ("d", "e"), ("e", "f"), ("e", "k"),
        ("g", "h"), ("h", "g"), ("h", "i"),
        ("j", "j"),
    ]

    @staticmethod
    def _tarjan(edges):
        adj = {}
        nodes = set()
        for u, v in edges:
            nodes.update((u, v))
            if u != v:
                adj.setdefault(u, []).append(v)
        index = {}
        low = {}
        on_stack = set()
        stack = []
        sccs = {}
        counter = [0]

        def strongconnect(v0):
            # iterative Tarjan (explicit work stack)
            work = [(v0, 0)]
            while work:
                v, pi = work.pop()
                if pi == 0:
                    index[v] = low[v] = counter[0]
                    counter[0] += 1
                    stack.append(v)
                    on_stack.add(v)
                recurse = False
                nbrs = adj.get(v, [])
                for i in range(pi, len(nbrs)):
                    w = nbrs[i]
                    if w not in index:
                        work.append((v, i + 1))
                        work.append((w, 0))
                        recurse = True
                        break
                    elif w in on_stack:
                        low[v] = min(low[v], index[w])
                if not recurse:
                    for w in nbrs:
                        if w in low and w in on_stack and index[w] > index[v]:
                            low[v] = min(low[v], low[w])
                    if low[v] == index[v]:
                        comp = []
                        while True:
                            w = stack.pop()
                            on_stack.discard(w)
                            comp.append(w)
                            if w == v:
                                break
                        rep = min(comp)
                        for w in comp:
                            sccs[w] = rep

        for n in sorted(nodes):
            if n not in index:
                strongconnect(n)
        return sccs

    def _spark_scc(self, spark, edges):
        from text_to_graph_spark.operators.components import (
            strongly_connected_components,
        )

        df = spark.createDataFrame(edges, ["src", "dst"])
        return {
            r["node"]: r["scc"]
            for r in strongly_connected_components(df).collect()
        }

    def test_bowtie_fixture_matches_tarjan(self, spark):
        assert self._spark_scc(spark, self.DIRECTED) == self._tarjan(
            self.DIRECTED
        )

    def test_pure_cycle_is_one_scc(self, spark):
        cyc = [(str(i), str((i + 1) % 7)) for i in range(7)]
        got = self._spark_scc(spark, cyc)
        assert set(got.values()) == {"0"} and len(got) == 7

    def test_dag_is_all_singletons(self, spark):
        dag = [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d")]
        got = self._spark_scc(spark, dag)
        assert got == {n: n for n in "abcd"}

    def test_random_graph_matches_tarjan(self, spark):
        # deterministic pseudo-random digraph (hash-derived, no RNG state)
        import hashlib

        edges = []
        for i in range(160):
            h = hashlib.md5(f"scc{i}".encode()).hexdigest()
            u = int(h[:4], 16) % 40
            v = int(h[4:8], 16) % 40
            edges.append((f"n{u:02d}", f"n{v:02d}"))
        assert self._spark_scc(spark, edges) == self._tarjan(edges)


class TestBowtieRegions:
    def test_broder_regions(self, spark):
        from text_to_graph_spark.operators.components import bowtie_regions

        edges = TestStronglyConnectedComponents.DIRECTED
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {r["node"]: r["region"] for r in bowtie_regions(df).collect()}
        # largest SCC is {b,c,d} (size 3 beats {g,h} size 2)
        assert got == {
            "a": "in",
            "b": "core", "c": "core", "d": "core",
            "e": "out", "f": "out", "k": "out",
            "g": "other", "h": "other", "i": "other", "j": "other",
        }


class TestBipartiteComponents:
    def test_even_cycle_and_odd_cycle(self, spark):
        from text_to_graph_spark.operators.components import bipartite_components

        edges = spark.createDataFrame(
            [
                # 4-cycle a-b-c-d-a: bipartite
                ("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
                # triangle x-y-z: odd cycle
                ("x", "y"), ("y", "z"), ("z", "x"),
                # lone edge p-q (+ self-loop dropped): bipartite
                ("p", "q"), ("p", "p"),
            ],
            "src string, dst string",
        )
        got = {
            r.component: (r.n_nodes, r.is_bipartite)
            for r in bipartite_components(edges).collect()
        }
        assert got == {
            "a": (4, True),
            "x": (3, False),
            "p": (2, True),
        }

    def test_path_is_bipartite(self, spark):
        from text_to_graph_spark.operators.components import bipartite_components

        edges = spark.createDataFrame(
            [("1", "2"), ("2", "3"), ("3", "4")], "src string, dst string"
        )
        rows = bipartite_components(edges).collect()
        assert len(rows) == 1 and rows[0].is_bipartite and rows[0].n_nodes == 4


class TestDistanceHistogram:
    def test_path_graph_cumulative_ppm(self, spark):
        from text_to_graph_spark.operators.components import (
            distance_histogram,
            landmark_distances,
        )

        edges = spark.createDataFrame(
            [("1", "2"), ("2", "3"), ("3", "4")], "src string, dst string"
        )
        roots = spark.createDataFrame([("1",)], "node string")
        d = landmark_distances(edges, roots, max_hops=4)
        got = {
            r.distance: (r.n_pairs, r.cum_ppm)
            for r in distance_histogram(d).collect()
        }
        assert got == {
            1: (1, 333_333),
            2: (1, 666_666),
            3: (1, 1_000_000),
        }


class TestPowerlawStressFixture:
    def test_generator_deterministic_and_bounded(self, spark):
        from text_to_graph_spark.sources.synthetic import (
            synthesize_powerlaw_edges,
        )

        a = synthesize_powerlaw_edges(spark, 20000, n_nodes=2000)
        b = synthesize_powerlaw_edges(spark, 20000, n_nodes=2000)
        ra, rb = a.collect(), b.collect()
        assert ra == rb  # md5-seeded: bit-identical across runs
        assert all(1 <= r["src"] < 2000 and 1 <= r["dst"] < 2000 for r in ra)
        assert all(r["src"] != r["dst"] for r in ra)
        # Zipf skew: node 1 is the hub with ~ln(2)/ln(2000) ~ 9% of endpoints
        hub = sum(1 for r in ra if r["src"] == 1)
        assert 0.05 * len(ra) < hub < 0.2 * len(ra)

    def test_cc_giant_component_on_powerlaw(self, spark):
        from text_to_graph_spark.operators.components import (
            connected_components,
        )
        from text_to_graph_spark.sources.synthetic import (
            synthesize_powerlaw_edges,
        )

        e = synthesize_powerlaw_edges(spark, 20000, n_nodes=2000)
        cc = connected_components(e, "src", "dst").collect()
        sizes = {}
        for r in cc:
            sizes[r["component"]] = sizes.get(r["component"], 0) + 1
        # the hub glues nearly everything into one giant component
        assert max(sizes.values()) > 0.95 * len(cc)
