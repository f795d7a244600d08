"""PageRank / triangle counting: exact parity with a pure-Python mirror of
the fixed-point recurrence, plus known-graph triangle fixtures."""

from __future__ import annotations

from text_to_graph_spark.operators.graphalgo import (
    HITS_SCALE,
    RANK_SCALE,
    hits,
    pagerank,
    triangle_count,
    weighted_sssp,
)


def _pagerank_py(edges, iterations=5, damping_pct=85):
    """Driver-side mirror of the exact integer recurrence."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    n = len(nodes)
    deg = {}
    for u, _ in e:
        deg[u] = deg.get(u, 0) + 1
    rank = {x: RANK_SCALE // n for x in nodes}
    base = (100 - damping_pct) * RANK_SCALE // (100 * n)
    for _ in range(iterations):
        inc = {x: 0 for x in nodes}
        for u, v in e:
            inc[v] += rank[u] // deg[u]
        rank = {x: base + damping_pct * inc[x] // 100 for x in nodes}
    return rank


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"), ("c", "d"),
    ("e", "a"),  # e is dangling-source only as a target of nothing
]


def _edge_df(spark, edges):
    return spark.createDataFrame(edges, "subj string, obj string")


class TestPagerank:
    def test_exact_integer_parity_with_python_mirror(self, spark):
        got = {
            r.node: r.rank_e9
            for r in pagerank(_edge_df(spark, EDGES)).collect()
        }
        assert got == _pagerank_py(EDGES)

    def test_hub_outranks_leaf(self, spark):
        got = {
            r.node: r.rank_e9
            for r in pagerank(_edge_df(spark, EDGES)).collect()
        }
        # c has 3 in-edges, e has none
        assert got["c"] > got["e"]

    def test_duplicate_edges_do_not_change_result(self, spark):
        got = {
            r.node: r.rank_e9
            for r in pagerank(_edge_df(spark, EDGES + EDGES)).collect()
        }
        assert got == _pagerank_py(EDGES)

    def test_warm_start_semantics(self, spark):
        """prior=uniform must equal the cold start (seeding identity);
        a converged prior on an unchanged symmetric graph is a literal
        integer fixpoint, so one warm iteration reproduces it."""
        e = _edge_df(spark, EDGES)
        cold = pagerank(e, iterations=3).collect()
        uniform = spark.createDataFrame(
            [(r.node, 10**9 // len(cold)) for r in cold],
            "node string, rank_e9 long",
        )
        warm = {
            r.node: r.rank_e9
            for r in pagerank(e, iterations=3, prior=uniform).collect()
        }
        assert warm == {r.node: r.rank_e9 for r in cold}

        cyc = _edge_df(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        fixed = pagerank(cyc, iterations=8)
        again = {
            r.node: r.rank_e9
            for r in pagerank(cyc, iterations=1, prior=fixed).collect()
        }
        assert again == {r.node: r.rank_e9 for r in fixed.collect()}

    def test_warm_start_new_nodes_get_uniform_init(self, spark):
        """A delta adding a brand-new node: the new node seeds at the NEW
        graph's uniform init, old nodes keep their prior."""
        old = _edge_df(spark, EDGES)
        prior = pagerank(old, iterations=5)
        new_edges = EDGES + [("e", "zz")]
        got = pagerank(
            _edge_df(spark, new_edges), iterations=2, prior=prior
        ).collect()
        assert {r.node for r in got} == (
            {u for u, _ in new_edges} | {v for _, v in new_edges}
        )


def _hits_py(edges, iterations=4):
    """Driver-side mirror of the exact integer HITS recurrence."""
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    hub = {x: HITS_SCALE for x in nodes}

    def half(scores, outgoing):
        raw = {x: 0 for x in nodes}
        for u, v in e:
            if outgoing:
                raw[v] += scores[u]
            else:
                raw[u] += scores[v]
        total = sum(raw.values()) or 1
        return {x: raw[x] * HITS_SCALE // total for x in nodes}

    auth = dict(hub)
    for _ in range(iterations):
        auth = half(hub, outgoing=True)
        hub = half(auth, outgoing=False)
    return {x: (auth[x], hub[x]) for x in nodes}


class TestHits:
    def test_exact_integer_parity_with_python_mirror(self, spark):
        got = {
            r.node: (r.auth_e6, r.hub_e6)
            for r in hits(_edge_df(spark, EDGES)).collect()
        }
        assert got == _hits_py(EDGES)

    def test_hub_and_authority_separate(self, spark):
        # star: h links to a1..a3 — h is the hub, targets are authorities
        star = [("h", "a1"), ("h", "a2"), ("h", "a3"), ("a1", "x")]
        got = {
            r.node: (r.auth_e6, r.hub_e6)
            for r in hits(_edge_df(spark, star)).collect()
        }
        assert got["h"][1] > got["a2"][1]  # h the better hub
        assert got["a2"][0] > got["h"][0]  # a2 the better authority
        assert got["h"][0] == 0  # nothing links to h

    def test_duplicate_edges_do_not_change_result(self, spark):
        got = {
            r.node: (r.auth_e6, r.hub_e6)
            for r in hits(_edge_df(spark, EDGES + EDGES)).collect()
        }
        assert got == _hits_py(EDGES)


class TestTriangleCount:
    def _counts(self, spark, edges):
        return {
            r.node: r.n_triangles
            for r in triangle_count(_edge_df(spark, edges)).collect()
        }

    def test_k4_every_node_in_three_triangles(self, spark):
        k4 = [
            (a, b)
            for i, a in enumerate("pqrs")
            for b in "pqrs"[i + 1:]
        ]
        assert self._counts(spark, k4) == {c: 3 for c in "pqrs"}

    def test_path_graph_has_none(self, spark):
        path = [("a", "b"), ("b", "c"), ("c", "d")]
        assert self._counts(spark, path) == {c: 0 for c in "abcd"}

    def test_direction_and_duplicates_ignored(self, spark):
        tri = [("a", "b"), ("c", "b"), ("a", "c"), ("b", "a"), ("a", "a")]
        assert self._counts(spark, tri) == {"a": 1, "b": 1, "c": 1}


class TestWeightedSSSP:
    # cheapest a->d goes the long way round (1+1+1=3) beating the direct
    # heavy edge (10); e unreachable from a (edge points the wrong way)
    WEDGES = [
        ("a", "d", 10),
        ("a", "b", 1), ("b", "c", 1), ("c", "d", 1),
        ("e", "a", 1),
    ]

    def _dists(self, spark, edges, roots=("a",), max_rounds=8):
        e = spark.createDataFrame(edges, "subj string, obj string, w long")
        r = spark.createDataFrame([(x,) for x in roots], "node string")
        return {
            row.node: row.dist
            for row in weighted_sssp(
                e, r, weight="w", max_rounds=max_rounds
            ).collect()
        }

    def test_multi_hop_beats_heavy_direct_edge(self, spark):
        assert self._dists(spark, self.WEDGES) == {
            "a": 0, "b": 1, "c": 2, "d": 3,
        }

    def test_bounded_hops_semantics(self, spark):
        # with only 1 relaxation round the 3-hop path is not yet found:
        # d costs 10 via the direct edge
        assert self._dists(spark, self.WEDGES, max_rounds=1) == {
            "a": 0, "b": 1, "d": 10,
        }

    def test_parallel_edges_keep_cheapest(self, spark):
        edges = self.WEDGES + [("a", "b", 7), ("a", "d", 2)]
        assert self._dists(spark, edges)["d"] == 2

    def test_multi_root_min(self, spark):
        got = self._dists(spark, self.WEDGES, roots=("a", "e"))
        assert got["e"] == 0 and got["a"] == 0 and got["d"] == 3


class TestLabelPropagation:
    # two triangles joined by one bridge: a-b-c and x-y-z, bridge c-x
    CLUSTERED = [
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("x", "y"), ("y", "z"), ("z", "x"),
        ("c", "x"),
    ]

    def _run(self, spark, edges, rounds=4):
        from text_to_graph_spark.operators.graphalgo import label_propagation

        df = label_propagation(_edge_df(spark, edges), rounds=rounds)
        return {r.node: r.community for r in df.collect()}

    def _lpa_py(self, edges, rounds=4):
        """Driver-side mirror: argmax neighbor label by (count desc, label
        asc), synchronous rounds."""
        adj: dict[str, set[str]] = {}
        for u, v in edges:
            if u != v:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
        lab = {n: n for n in adj}
        for _ in range(rounds):
            nxt = {}
            for n, nbrs in adj.items():
                cnt: dict[str, int] = {}
                for m in nbrs:
                    cnt[lab[m]] = cnt.get(lab[m], 0) + 1
                nxt[n] = min(cnt, key=lambda c: (-cnt[c], c))
            lab = nxt
        return lab

    def test_parity_with_python_mirror(self, spark):
        assert self._run(spark, self.CLUSTERED) == self._lpa_py(self.CLUSTERED)

    def test_parity_on_directed_multi_edges(self, spark):
        edges = EDGES + [("a", "b"), ("b", "a")]  # dup + reverse collapse
        assert self._run(spark, edges) == self._lpa_py(edges)

    def test_every_non_isolated_node_labeled(self, spark):
        got = self._run(spark, self.CLUSTERED)
        assert set(got) == {"a", "b", "c", "x", "y", "z"}


class TestCommunityQuotient:
    # two triangles a-b-c / x-y-z joined by bridge c->x (directed edges as
    # listed in TestLabelPropagation.CLUSTERED)
    EDGES = TestLabelPropagation.CLUSTERED

    def _run(self, spark, assignments):
        from text_to_graph_spark.operators.graphalgo import community_quotient

        e = _edge_df(spark, self.EDGES)
        a = spark.createDataFrame(assignments, "node string, community string")
        return {
            (r.comm_src, r.comm_dst): r.n_edges
            for r in community_quotient(e, a).collect()
        }

    TWO_COMMS = [
        ("a", "A"), ("b", "A"), ("c", "A"),
        ("x", "X"), ("y", "X"), ("z", "X"),
    ]

    def test_contract_two_triangles(self, spark):
        # 3 intra edges each side + the single bridge; direction preserved
        assert self._run(spark, self.TWO_COMMS) == {
            ("A", "A"): 3, ("X", "X"): 3, ("A", "X"): 1,
        }

    def test_duplicate_edges_counted_once(self, spark):
        from text_to_graph_spark.operators.graphalgo import community_quotient

        e = _edge_df(spark, self.EDGES + [("c", "x"), ("c", "x")])
        a = spark.createDataFrame(
            self.TWO_COMMS, "node string, community string"
        )
        got = {
            (r.comm_src, r.comm_dst): r.n_edges
            for r in community_quotient(e, a).collect()
        }
        assert got[("A", "X")] == 1  # DISTINCT underlying edges

    def test_singleton_communities_identity(self, spark):
        # every node its own community: quotient == distinct edge list
        singletons = [(n, n) for n in "abcxyz"]
        got = self._run(spark, singletons)
        assert got == {(u, v): 1 for u, v in self.EDGES}


class TestCommonNeighbors:
    # square a-b-d-c-a: the two diagonals (a,d) and (b,c) each share both
    # opposite corners; every adjacent pair shares 0 common neighbors
    SQUARE = [("a", "b"), ("b", "d"), ("d", "c"), ("c", "a")]

    def _run(self, spark, edges, **kw):
        from text_to_graph_spark.operators.graphalgo import common_neighbors

        df = common_neighbors(_edge_df(spark, edges), **kw)
        return {(r.node_a, r.node_b): r for r in df.collect()}

    def test_square_diagonals(self, spark):
        got = self._run(spark, self.SQUARE, min_common=2)
        assert set(got) == {("a", "d"), ("b", "c")}
        r = got[("a", "d")]
        # neighbors(a)={b,c}, neighbors(d)={b,c}: jaccard 2/2
        assert (r.n_common, r.n_union, r.jaccard_ppm, r.is_linked) == (
            2, 2, 1000000, False,
        )

    def test_linked_flag_and_partial_overlap(self, spark):
        # triangle a-b-c plus pendant d on c: (a,b) linked, share c
        edges = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")]
        got = self._run(spark, edges, min_common=1)
        r = got[("a", "b")]
        # neighbors(a)={b,c}, neighbors(b)={a,c}: common={c}, union 3
        assert (r.n_common, r.n_union, r.is_linked) == (1, 3, True)
        assert r.jaccard_ppm == 1000000 // 3
    def test_degree_cap_drops_hub_wedges(self, spark):
        # star center s connects x1..x4: every leaf pair shares only s
        star = [("s", f"x{i}") for i in range(4)]
        uncapped = self._run(spark, star, min_common=1)
        assert len(uncapped) == 6  # C(4,2) leaf pairs
        capped = self._run(spark, star, min_common=1, max_neighbor_degree=3)
        assert capped == {}  # s has degree 4 > cap, no wedges survive


class TestKCore:
    def test_k4_plus_tail_peels_to_k4(self, spark):
        from text_to_graph_spark.operators.graphalgo import k_core

        # K4 on a,b,c,d plus a pendant path d-e-f: the 3-core is exactly K4
        k4 = [(x, y) for x in "abcd" for y in "abcd" if x < y]
        edges = k4 + [("d", "e"), ("e", "f")]
        got = {
            r.node: r.degree
            for r in k_core(_edge_df(spark, edges), k=3).collect()
        }
        assert got == {"a": 3, "b": 3, "c": 3, "d": 3}

    def test_peeling_cascades(self, spark):
        from text_to_graph_spark.operators.graphalgo import k_core

        # path graph: removing the ends cascades until nothing is left
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
        assert k_core(_edge_df(spark, edges), k=2).count() == 0
        # cycle: every node sits in the 2-core with degree 2
        cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
        got = {
            r.node: r.degree for r in k_core(_edge_df(spark, cyc), k=2).collect()
        }
        assert got == {x: 2 for x in "abcd"}

    def test_direction_and_duplicates_ignored(self, spark):
        from text_to_graph_spark.operators.graphalgo import k_core

        cyc = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "d"), ("d", "a"),
               ("a", "b"), ("d", "a")]
        got = {
            r.node: r.degree for r in k_core(_edge_df(spark, cyc), k=2).collect()
        }
        assert got == {x: 2 for x in "abcd"}


def test_match_2hop_and_pred_cooccurrence(spark):
    from text_to_graph_spark.operators import graphq as G

    edges = spark.createDataFrame(
        [
            ("a", "p", "b"), ("b", "q", "c"), ("b", "q", "d"),
            ("x", "p", "b"), ("a", "q", "z"), ("c", "r", "a"),
        ],
        "subj_key string, pred_key string, obj_key string",
    )
    got = sorted(map(tuple, G.match_2hop(edges, "p", "q").collect()))
    # (a)-[p]->(b)-[q]->{c,d} and (x)-[p]->(b)-[q]->{c,d}
    assert got == [("a", "b", "c"), ("a", "b", "d"),
                   ("x", "b", "c"), ("x", "b", "d")]
    co = {(r.pred_a, r.pred_b): r.n_subjects
          for r in G.predicate_cooccurrence(edges).collect()}
    # subjects a {p,q} and b {q} and x {p} and c {r} -> only a pairs p with q
    assert co == {("p", "q"): 1}


def test_validate_edge_types_flags_only_allowed_combos(spark):
    from text_to_graph_spark.operators import graphq as G

    edges = spark.createDataFrame(
        [("t1", "p", "t2"), ("t1", "p", "x"), ("t2", "p", "t1")],
        "subj_key string, pred_key string, obj_key string",
    )
    cats = spark.createDataFrame(
        [("t1", "A"), ("t2", "B")], "key string, type string"
    )
    allowed = spark.createDataFrame(
        [("p", "A", "B")], "pred string, subj_type string, obj_type string"
    )
    rows = {
        (r.pred, r.subj_type, r.obj_type): (r.n_edges, r.is_allowed)
        for r in G.validate_edge_types(edges, cats, allowed).collect()
    }
    assert rows == {
        ("p", "A", "B"): (1, True),       # t1->t2 permitted
        ("p", "A", "entity"): (1, False),  # unknown key falls back
        ("p", "B", "A"): (1, False),       # reversed direction not allowed
    }


class TestRandomWalks:
    EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("c", "d")]

    def _walks(self, spark):
        from text_to_graph_spark.operators.graphalgo import random_walks

        df = random_walks(
            _edge_df(spark, self.EDGES), n_walks=2, walk_len=3
        )
        return sorted((r.start, r.walk_id, tuple(r.path)) for r in df.collect())

    def test_paths_are_real_walks(self, spark):
        eset = set(self.EDGES)
        got = self._walks(spark)
        # 2 walks per node with out-edges (a, b, c; d is a sink)
        assert len(got) == 6
        for start, _wid, path in got:
            assert path[0] == start and len(path) <= 4
            for u, v in zip(path, path[1:]):
                assert (u, v) in eset, (path, u, v)

    def test_bit_identical_across_runs_and_seeded_by_walk_id(self, spark):
        a, b = self._walks(spark), self._walks(spark)
        assert a == b  # deterministic: no rand(), pure hash seeding
        by_start = {}
        for start, wid, path in a:
            by_start.setdefault(start, set()).add(path)
        # at least one node's two walks diverge (walk_id enters the hash)
        assert any(len(p) > 1 for p in by_start.values())


def test_walk_skipgram_pairs_window_semantics(spark):
    from text_to_graph_spark.operators.graphalgo import walk_skipgram_pairs

    walks = spark.createDataFrame(
        [("a", 0, ["a", "b", "c", "d"])],
        "start string, walk_id int, path array<string>",
    )
    got = {
        (r.center, r.context): r.n_pairs
        for r in walk_skipgram_pairs(walks, window=1).collect()
    }
    # window=1: only adjacent pairs, both directions, once each
    assert got == {
        ("a", "b"): 1, ("b", "a"): 1, ("b", "c"): 1,
        ("c", "b"): 1, ("c", "d"): 1, ("d", "c"): 1,
    }


class TestDenseIds:
    def test_ids_are_dense_and_deterministic(self, spark):
        from text_to_graph_spark.operators.graphalgo import dense_ids

        labels = [f"node_{i}" for i in range(137)]
        df = spark.createDataFrame([(x,) for x in labels], "node string")
        got = dense_ids(df, "node").collect()
        assert sorted(r.vid for r in got) == list(range(137))
        # repartitioning must not change the assignment
        again = {
            r.node: r.vid
            for r in dense_ids(df.repartition(7), "node").collect()
        }
        assert again == {r.node: r.vid for r in got}

    def test_duplicates_collapse(self, spark):
        from text_to_graph_spark.operators.graphalgo import dense_ids

        df = spark.createDataFrame(
            [("a",), ("b",), ("a",), ("b",)], "node string"
        )
        got = dense_ids(df, "node").collect()
        assert sorted(r.vid for r in got) == [0, 1]


class TestNegativeSamples:
    def test_negatives_never_equal_positive(self, spark):
        from text_to_graph_spark.operators.graphalgo import negative_samples

        got = negative_samples(_edge_df_pred(spark, EDGES), k=3).collect()
        assert len(got) == 3 * len(set(EDGES))
        vocab = {u for u, _ in EDGES} | {v for _, v in EDGES}
        for r in got:
            assert r.neg_obj != r.obj
            assert r.neg_obj in vocab

    def test_deterministic_across_partitionings(self, spark):
        from text_to_graph_spark.operators.graphalgo import negative_samples

        e = _edge_df_pred(spark, EDGES)
        a = {
            (r.subj, r.pred, r.obj, r.sample_idx): r.neg_obj
            for r in negative_samples(e, k=2).collect()
        }
        b = {
            (r.subj, r.pred, r.obj, r.sample_idx): r.neg_obj
            for r in negative_samples(e.repartition(13), k=2).collect()
        }
        assert a == b


def _edge_df_pred(spark, edges):
    return spark.createDataFrame(
        [(u, "links_to", v) for u, v in edges],
        "subj string, pred string, obj string",
    )


class TestWalkTrainingPairs:
    def _inputs(self, spark):
        walks = spark.createDataFrame(
            [("a", 0, ["a", "b", "c", "d"]), ("b", 0, ["b", "c", "a"])],
            "start string, walk_id int, path array<string>",
        )
        vocab = spark.createDataFrame(
            [(x,) for x in "abcdef"], "node string"
        )
        return walks, vocab

    def test_k_negatives_per_positive_and_filtered(self, spark):
        from text_to_graph_spark.operators.graphalgo import (
            walk_skipgram_pairs,
            walk_training_pairs,
        )

        walks, vocab = self._inputs(spark)
        n_pos = walk_skipgram_pairs(walks, window=2).count()
        got = walk_training_pairs(walks, vocab, window=2, k=2).collect()
        assert len(got) == 2 * n_pos
        vset = set("abcdef")
        for r in got:
            assert r.neg_context != r.context  # filtered sampling
            assert r.neg_context in vset

    def test_deterministic_across_partitionings(self, spark):
        from text_to_graph_spark.operators.graphalgo import walk_training_pairs

        walks, vocab = self._inputs(spark)
        key = lambda r: (r.center, r.context, r.sample_idx)  # noqa: E731
        a = {key(r): r.neg_context
             for r in walk_training_pairs(walks, vocab, k=2).collect()}
        b = {key(r): r.neg_context
             for r in walk_training_pairs(
                 walks.repartition(5), vocab.repartition(3), k=2
             ).collect()}
        assert a == b


class TestEdgeConfidence:
    def test_lift_math_and_counts(self, spark):
        from text_to_graph_spark.operators.graphq import edge_confidence

        # 4 docs; (a,likes,b) in 2 of them; a in 3 docs, b in 2 docs
        t = spark.createDataFrame(
            [
                ("d1", "a", "likes", "b"),
                ("d2", "a", "likes", "b"),
                ("d3", "a", "likes", "c"),
                ("d4", "c", "likes", "b"),
            ],
            "url string, subj string, pred string, obj string",
        )
        got = {
            (r.subj, r.pred, r.obj): (r.n_docs, r.df_subj, r.df_obj, r.lift_e6)
            for r in edge_confidence(t).collect()
        }
        # N=4; df(a)=3 (d1,d2,d3), df(b)=3 (d1,d2,d4), df(c)=2 (d3,d4)
        assert got[("a", "likes", "b")] == (2, 3, 3, 2 * 4 * 1000000 // 9)
        assert got[("a", "likes", "c")] == (1, 3, 2, 4000000 // 6)
        assert got[("c", "likes", "b")] == (1, 2, 3, 4000000 // 6)

    def test_duplicate_rows_collapse(self, spark):
        from text_to_graph_spark.operators.graphq import edge_confidence

        t = spark.createDataFrame(
            [("d1", "a", "p", "b")] * 3,
            "url string, subj string, pred string, obj string",
        )
        got = edge_confidence(t).collect()
        assert len(got) == 1 and got[0].n_docs == 1


class TestColumnProfile:
    def test_single_scan_profile(self, spark):
        from text_to_graph_spark.operators.profile import column_profile

        df = spark.createDataFrame(
            [(1, "x"), (2, None), (3, "x"), (None, "y")],
            "a long, b string",
        )
        got = {r.col_name: r for r in column_profile(df).collect()}
        assert got["a"].n_rows == 4 and got["a"].n_nulls == 1
        assert got["a"].n_distinct == 3
        assert (got["a"].min_value, got["a"].max_value) == ("1", "3")
        assert got["b"].n_nulls == 1 and got["b"].n_distinct == 2
        assert (got["b"].min_value, got["b"].max_value) == ("x", "y")


class TestSchemaInduction:
    def test_shares_and_dominant_flag(self, spark):
        from text_to_graph_spark.operators.graphq import induce_predicate_schema

        edges = spark.createDataFrame(
            [("p1", "a", "x")] * 3 + [("p1", "b", "x")] + [("p2", "a", "y")],
            "pred_key string, subj_key string, obj_key string",
        )
        cats = spark.createDataFrame(
            [("a", "person"), ("b", "org"), ("x", "place"), ("y", "person")],
            "key string, type string",
        )
        got = {
            (r.pred, r.subj_type, r.obj_type): (
                r.n_edges, r.frac_e6, r.is_dominant
            )
            for r in induce_predicate_schema(edges, cats).collect()
        }
        assert got[("p1", "person", "place")] == (3, 750000, True)
        assert got[("p1", "org", "place")] == (1, 250000, False)
        assert got[("p2", "person", "person")] == (1, 1000000, True)

    def test_unknown_keys_fall_back_to_entity(self, spark):
        from text_to_graph_spark.operators.graphq import induce_predicate_schema

        edges = spark.createDataFrame(
            [("p", "mystery", "riddle")],
            "pred_key string, subj_key string, obj_key string",
        )
        cats = spark.createDataFrame([("a", "person")], "key string, type string")
        r = induce_predicate_schema(edges, cats).collect()[0]
        assert (r.subj_type, r.obj_type, r.is_dominant) == (
            "entity", "entity", True,
        )


class TestCsrLayout:
    def test_offsets_are_exclusive_degree_prefix_in_vid_order(self, spark):
        from text_to_graph_spark.operators.graphalgo import csr_layout

        edges = [(f"n{i}", f"n{(i * 7 + 1) % 50}") for i in range(200)]
        df = spark.createDataFrame(edges, "subj string, obj string")
        rows = sorted(csr_layout(df, range_width=8).collect(), key=lambda r: r.vid)
        assert [r.vid for r in rows] == list(range(len(rows)))
        running = 0
        for r in rows:
            assert r.csr_offset == running
            assert r.degree == len(r.nbrs)
            assert list(r.nbrs) == sorted(set(r.nbrs))
            running += r.degree
        assert running == len({(u, v) for u, v in edges})

    def test_isolated_targets_have_zero_degree(self, spark):
        from text_to_graph_spark.operators.graphalgo import csr_layout

        df = spark.createDataFrame([("a", "b")], "subj string, obj string")
        got = {r.node: (r.degree, list(r.nbrs)) for r in csr_layout(df).collect()}
        assert got["a"] == (1, ["b"]) and got["b"] == (0, [])


class TestEventTransitions:
    def test_matrix_and_row_shares(self, spark):
        import datetime as dt

        from text_to_graph_spark.operators.events import event_transitions

        base = dt.datetime(2024, 1, 1)
        rows = [
            # user 1, one session: a -> b -> a
            (1, base, 1, "a"), (2, base + dt.timedelta(seconds=10), 1, "b"),
            (3, base + dt.timedelta(seconds=20), 1, "a"),
            # user 1, second session (gap > 1800): a -> b
            (4, base + dt.timedelta(seconds=9999), 1, "a"),
            (5, base + dt.timedelta(seconds=10009), 1, "b"),
        ]
        ev = spark.createDataFrame(
            [(i, ts, u, t, 1.0, "{}") for i, ts, u, t in rows],
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )
        got = {
            (r.cur, r.nxt): (r.n_transitions, r.frac_e6)
            for r in event_transitions(ev).collect()
        }
        # a->b twice, b->a once; session boundary contributes NO transition
        assert got == {("a", "b"): (2, 1000000), ("b", "a"): (1, 1000000)}

    def test_same_second_ties_are_deterministic(self, spark):
        import datetime as dt

        from text_to_graph_spark.operators.events import event_transitions

        base = dt.datetime(2024, 1, 1)
        ev = spark.createDataFrame(
            [
                (10, base, 1, "x", 1.0, "{}"),
                (11, base, 1, "y", 1.0, "{}"),  # same sec: event_id breaks tie
                (12, base, 1, "z", 1.0, "{}"),
            ],
            "event_id long, ts timestamp_ntz, user_id long, "
            "event_type string, value double, props string",
        )
        got = {(r.cur, r.nxt) for r in event_transitions(ev).collect()}
        assert got == {("x", "y"), ("y", "z")}


def _ppr_py(edges, seeds, iterations=5, damping_pct=85):
    e = sorted(set(edges))
    nodes = sorted({u for u, _ in e} | {v for _, v in e})
    s = [x for x in seeds if x in nodes]
    deg = {}
    for u, _ in e:
        deg[u] = deg.get(u, 0) + 1
    init = RANK_SCALE // len(s)
    base = (100 - damping_pct) * RANK_SCALE // (100 * len(s))
    rank = {x: (init if x in s else 0) for x in nodes}
    for _ in range(iterations):
        inc = {x: 0 for x in nodes}
        for u, v in e:
            inc[v] += rank[u] // deg[u]
        rank = {
            x: (base if x in s else 0) + damping_pct * inc[x] // 100
            for x in nodes
        }
    return rank


class TestPersonalizedPagerank:
    def test_parity_with_python_mirror(self, spark):
        from text_to_graph_spark.operators.graphalgo import personalized_pagerank

        seeds = spark.createDataFrame([("a",), ("d",)], "node string")
        got = {
            r.node: r.rank_e9
            for r in personalized_pagerank(
                _edge_df(spark, EDGES), seeds
            ).collect()
        }
        assert got == _ppr_py(EDGES, ["a", "d"])

    def test_mass_concentrates_near_seeds(self, spark):
        from text_to_graph_spark.operators.graphalgo import personalized_pagerank

        # two disconnected triangles; seed only in the first
        tri2 = [
            ("a", "b"), ("b", "c"), ("c", "a"),
            ("x", "y"), ("y", "z"), ("z", "x"),
        ]
        seeds = spark.createDataFrame([("a",)], "node string")
        got = {
            r.node: r.rank_e9
            for r in personalized_pagerank(_edge_df(spark, tri2), seeds).collect()
        }
        assert got["a"] > got["x"] and got["b"] > got["y"]
        assert got["x"] == 0  # no path from the seed component

    def test_seed_outside_graph_raises(self, spark):
        import pytest

        from text_to_graph_spark.operators.graphalgo import personalized_pagerank

        seeds = spark.createDataFrame([("nope",)], "node string")
        with pytest.raises(ValueError):
            personalized_pagerank(_edge_df(spark, EDGES), seeds)


class TestNodeEquivalence:
    def test_identical_neighbor_sets_collapse(self, spark):
        from text_to_graph_spark.operators.graphalgo import (
            node_equivalence_classes,
        )

        # p1, p2, p3 all link exactly {nav, home}; q links {nav} only
        edges = [
            ("p1", "nav"), ("p1", "home"),
            ("p2", "nav"), ("p2", "home"),
            ("p3", "nav"), ("p3", "home"),
            ("q", "nav"),
        ]
        got = node_equivalence_classes(
            _edge_df(spark, edges)
        ).collect()
        assert len(got) == 1
        r = got[0]
        assert sorted(r.members) == ["p1", "p2", "p3"]
        assert r.n_members == 3 and r.degree == 2

    def test_no_false_merges(self, spark):
        from text_to_graph_spark.operators.graphalgo import (
            node_equivalence_classes,
        )

        edges = [("a", "x"), ("b", "y")]  # distinct neighborhoods
        assert node_equivalence_classes(_edge_df(spark, edges)).count() == 0


class TestClusteringCoefficient:
    def test_triangle_and_star(self, spark):
        from text_to_graph_spark.operators.graphalgo import (
            clustering_coefficient,
        )

        # triangle abc (coeff 1.0) + star hub h->{a,b,s} where a-b linked
        edges = [
            ("a", "b"), ("b", "c"), ("c", "a"),
            ("h", "a"), ("h", "b"), ("h", "s"),
        ]
        got = {
            r.node: (r.degree, r.n_triangles, r.coeff_e6)
            for r in clustering_coefficient(_edge_df(spark, edges)).collect()
        }
        assert got["c"] == (2, 1, 1000000)          # perfect triangle corner
        # h: neighbors {a,b,s}, 3 possible pairs, 1 present (a-b)
        assert got["h"] == (3, 1, 2 * 1 * 1000000 // 6)
        assert got["s"] == (1, 0, 0)                # degree-1 -> 0


class TestPredicateSynonyms:
    def test_jaccard_exact_and_blocking(self, spark):
        from text_to_graph_spark.operators.graphq import predicate_synonyms

        rows = [
            # p and q share 2 of 3 pairs; r shares none
            ("a", "p", "b"), ("c", "p", "d"), ("e", "p", "f"),
            ("a", "q", "b"), ("c", "q", "d"),
            ("x", "r", "y"),
        ]
        e = spark.createDataFrame(rows, "subj string, pred string, obj string")
        got = {
            (r.pred_a, r.pred_b): r
            for r in predicate_synonyms(
                e, src="subj", dst="obj", label="pred"
            ).collect()
        }
        assert set(got) == {("p", "q")}  # r never meets anyone (blocking)
        r = got[("p", "q")]
        assert (r.n_shared, r.n_a, r.n_b) == (2, 3, 2)
        assert r.jaccard_e6 == 2 * 10**6 // 3  # |∩|=2, |∪|=3

    def test_duplicate_edges_do_not_inflate(self, spark):
        from text_to_graph_spark.operators.graphq import predicate_synonyms

        rows = [("a", "p", "b")] * 3 + [("a", "q", "b")] * 2
        e = spark.createDataFrame(rows, "subj string, pred string, obj string")
        got = predicate_synonyms(
            e, src="subj", dst="obj", label="pred", min_shared=1
        ).collect()
        assert len(got) == 1 and got[0].n_shared == 1  # distinct pair sets


class TestNode2vecWalks:
    @staticmethod
    def _ref(edge_list, n_walks, walk_len, wr=1, wc=4, wf=2):
        import hashlib

        adj = {}
        for s, d in edge_list:
            adj.setdefault(s, set()).add(d)
        adj = {k: sorted(v) for k, v in adj.items()}
        out = []
        for start in sorted(adj):
            for wid in range(n_walks):
                prev, cur, path = None, start, [start]
                for step in range(walk_len):
                    nbrs = adj.get(cur)
                    if nbrs is None:
                        break
                    pn = set(adj.get(prev, [])) if prev is not None else set()
                    ws = [
                        wr if (prev is not None and n == prev)
                        else wc if (prev is not None and n in pn)
                        else wf
                        for n in nbrs
                    ]
                    key = f"{start}|{wid}|{step}|{prev if prev is not None else ''}|{cur}"
                    pick = int(hashlib.md5(key.encode()).hexdigest()[:12], 16) % sum(ws)
                    for n, w in zip(nbrs, ws):
                        if pick < w:
                            nxt = n
                            break
                        pick -= w
                    path.append(nxt)
                    prev, cur = cur, nxt
                out.append((start, wid, tuple(path)))
        return sorted(out)

    def test_matches_python_reference_exactly(self, spark):
        from text_to_graph_spark.operators.graphalgo import node2vec_walks

        edge_list = [
            ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("c", "d"),
            ("d", "b"), ("a", "c"), ("d", "a"),
        ]
        df = spark.createDataFrame(edge_list, "subj string, obj string")
        got = sorted(
            (r["start"], r["walk_id"], tuple(r["path"]))
            for r in node2vec_walks(df, n_walks=2, walk_len=4).collect()
        )
        assert got == self._ref(edge_list, n_walks=2, walk_len=4)

    def test_sink_terminates_walk_early(self, spark):
        from text_to_graph_spark.operators.graphalgo import node2vec_walks

        df = spark.createDataFrame([("a", "z")], "subj string, obj string")
        rows = node2vec_walks(df, n_walks=1, walk_len=3).collect()
        assert [tuple(r["path"]) for r in rows] == [("a", "z")]

    def test_second_order_bias_changes_walks_vs_deepwalk(self, spark):
        # on a graph with backtrack-vs-triangle choices, the biased walk
        # must diverge from the first-order DeepWalk somewhere
        from text_to_graph_spark.operators.graphalgo import (
            node2vec_walks,
            random_walks,
        )

        edge_list = [(f"n{i}", f"n{(i*7+j) % 12}") for i in range(12) for j in (1, 2, 3)]
        df = spark.createDataFrame(edge_list, "subj string, obj string")
        n2v = {(r["start"], r["walk_id"]): tuple(r["path"])
               for r in node2vec_walks(df, n_walks=2, walk_len=4).collect()}
        dw = {(r["start"], r["walk_id"]): tuple(r["path"])
              for r in random_walks(df, n_walks=2, walk_len=4).collect()}
        assert set(n2v) == set(dw)
        assert any(n2v[k] != dw[k] for k in n2v)


class TestResourceAllocation:
    @staticmethod
    def _ref(edge_list, cap=None):
        # brute-force: undirected simple graph, ra_ppm = sum 1e6 // deg(z)
        adj = {}
        for s, d in edge_list:
            if s == d:
                continue
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
        deg = {n: len(v) for n, v in adj.items()}
        out = {}
        nodes = sorted(adj)
        for i, a in enumerate(nodes):
            for b in nodes[i + 1:]:
                common = [
                    z for z in adj[a] & adj[b]
                    if cap is None or deg[z] <= cap
                ]
                if not common:
                    continue
                out[(a, b)] = (
                    len(common),
                    sum(1_000_000 // deg[z] for z in common),
                    b in adj[a],
                )
        return out

    def test_matches_bruteforce(self, spark):
        from text_to_graph_spark.operators.graphalgo import resource_allocation

        edge_list = [
            ("a", "b"), ("a", "c"), ("b", "c"), ("c", "d"), ("b", "d"),
            ("d", "e"), ("e", "a"), ("e", "c"),
        ]
        df = spark.createDataFrame(edge_list, "subj string, obj string")
        got = {
            (r["node_a"], r["node_b"]): (r["n_common"], r["ra_ppm"], r["is_linked"])
            for r in resource_allocation(df, min_common=1).collect()
        }
        assert got == self._ref(edge_list)

    def test_hub_discount(self, spark):
        from text_to_graph_spark.operators.graphalgo import resource_allocation

        # x and y share one hub (degree 6) and nothing else: ra = 1e6 // 6
        edge_list = [("hub", n) for n in ["x", "y", "p", "q", "r", "s"]]
        df = spark.createDataFrame(edge_list, "subj string, obj string")
        rows = resource_allocation(df, min_common=1).collect()
        assert all(r["ra_ppm"] == 1_000_000 // 6 for r in rows)

    def test_center_degree_cap(self, spark):
        from text_to_graph_spark.operators.graphalgo import resource_allocation

        # hub degree 6 > cap 3 -> the hub contributes no wedges; the
        # surviving pairs go through the low-degree centers only:
        # (x, y) via m (deg 2), and (hub, m) via x and y (deg 2 each)
        edge_list = [("hub", n) for n in ["x", "y", "p", "q", "r", "s"]]
        edge_list += [("x", "m"), ("y", "m")]
        df = spark.createDataFrame(edge_list, "subj string, obj string")
        got = {
            (r["node_a"], r["node_b"]): r["ra_ppm"]
            for r in resource_allocation(
                df, min_common=1, max_neighbor_degree=3
            ).collect()
        }
        assert got == {("x", "y"): 500_000, ("hub", "m"): 1_000_000}


class TestEdgeTriangleSupport:
    def test_triangle_plus_pendant(self, spark):
        from text_to_graph_spark.operators.graphalgo import edge_triangle_support

        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
            "subj string, obj string",
        )
        got = {
            (r["node_a"], r["node_b"]): r["support"]
            for r in edge_triangle_support(df).collect()
        }
        assert got == {
            ("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 1, ("c", "d"): 0,
        }

    def test_shared_edge_counts_both_triangles(self, spark):
        from text_to_graph_spark.operators.graphalgo import edge_triangle_support

        # triangles abc and abd share edge (a, b)
        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("b", "d"), ("d", "a")],
            "subj string, obj string",
        )
        got = {
            (r["node_a"], r["node_b"]): r["support"]
            for r in edge_triangle_support(df).collect()
        }
        assert got[("a", "b")] == 2
        assert got[("b", "c")] == 1 and got[("a", "d")] == 1

    def test_direction_and_duplicates_ignored(self, spark):
        from text_to_graph_spark.operators.graphalgo import edge_triangle_support

        df = spark.createDataFrame(
            [("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"), ("a", "c")],
            "subj string, obj string",
        )
        got = {
            (r["node_a"], r["node_b"]): r["support"]
            for r in edge_triangle_support(df).collect()
        }
        assert got == {("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 1}


class TestKTruss:
    def test_pendant_peeled_triangle_survives(self, spark):
        from text_to_graph_spark.operators.graphalgo import k_truss

        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d")],
            "subj string, obj string",
        )
        got = {
            (r["node_a"], r["node_b"]): r["support"]
            for r in k_truss(df, k=3).collect()
        }
        assert got == {("a", "b"): 1, ("b", "c"): 1, ("a", "c"): 1}

    def test_cascade_peel(self, spark):
        from text_to_graph_spark.operators.graphalgo import k_truss

        # K4 minus one edge: edges (a,d),(b,d) close only 1 triangle each
        # once (c,d) is gone; k=4 (need 2) peels everything except... K4
        # minus an edge has supports: (a,b)=2, others=1 -> round 1 keeps
        # only (a,b); round 2 drops it too (support 0) -> empty
        df = spark.createDataFrame(
            [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")],
            "subj string, obj string",
        )
        assert k_truss(df, k=4).count() == 0

    def test_k4_survives_4truss(self, spark):
        from text_to_graph_spark.operators.graphalgo import k_truss

        nodes = ["a", "b", "c", "d"]
        df = spark.createDataFrame(
            [(x, y) for x in nodes for y in nodes if x < y],
            "subj string, obj string",
        )
        got = {
            (r["node_a"], r["node_b"]): r["support"]
            for r in k_truss(df, k=4).collect()
        }
        assert len(got) == 6 and all(v == 2 for v in got.values())

    def test_bounded_equals_longer_run_at_fixpoint(self, spark):
        from text_to_graph_spark.operators.graphalgo import k_truss

        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")],
            "subj string, obj string",
        )
        a = sorted(map(tuple, k_truss(df, k=3, max_rounds=3).collect()))
        b = sorted(map(tuple, k_truss(df, k=3, max_rounds=6).collect()))
        assert a == b

    def test_k_below_2_rejected(self, spark):
        from text_to_graph_spark.operators.graphalgo import k_truss
        import pytest as _pytest

        df = spark.createDataFrame([("a", "b")], "subj string, obj string")
        with _pytest.raises(ValueError):
            k_truss(df, k=1)


class TestBoundedClosure:
    def test_chain_min_hops(self, spark):
        from text_to_graph_spark.operators.graphalgo import bounded_closure

        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")],
            "subj string, obj string",
        )
        got = {
            (r["src_node"], r["dst_node"]): r["hops"]
            for r in bounded_closure(df, max_hops=3).collect()
        }
        assert got == {
            ("a", "b"): 1, ("b", "c"): 1, ("c", "d"): 1, ("d", "e"): 1,
            ("a", "c"): 2, ("b", "d"): 2, ("c", "e"): 2,
            ("a", "d"): 3, ("b", "e"): 3,
        }

    def test_shortcut_wins(self, spark):
        from text_to_graph_spark.operators.graphalgo import bounded_closure

        df = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("a", "c")], "subj string, obj string"
        )
        got = {
            (r["src_node"], r["dst_node"]): r["hops"]
            for r in bounded_closure(df, max_hops=3).collect()
        }
        assert got[("a", "c")] == 1

    def test_cycle_excludes_self_pairs(self, spark):
        from text_to_graph_spark.operators.graphalgo import bounded_closure

        df = spark.createDataFrame(
            [("a", "b"), ("b", "a")], "subj string, obj string"
        )
        got = {
            (r["src_node"], r["dst_node"]): r["hops"]
            for r in bounded_closure(df, max_hops=3).collect()
        }
        assert got == {("a", "b"): 1, ("b", "a"): 1}

    def test_directedness(self, spark):
        from text_to_graph_spark.operators.graphalgo import bounded_closure

        df = spark.createDataFrame(
            [("a", "b"), ("c", "b")], "subj string, obj string"
        )
        got = {(r["src_node"], r["dst_node"]) for r in
               bounded_closure(df, max_hops=2).collect()}
        assert got == {("a", "b"), ("c", "b")}


class TestSampledNeighborhood:
    def test_fanout_caps_and_determinism(self, spark):
        import hashlib

        from text_to_graph_spark.operators.graphalgo import sampled_neighborhood

        # root r has 6 out-neighbors n0..n5; each ni has 3 out-neighbors
        edges = [("r", f"n{i}") for i in range(6)]
        edges += [(f"n{i}", f"m{i}{j}") for i in range(6) for j in range(3)]
        df = spark.createDataFrame(edges, "subj string, obj string")
        out = sampled_neighborhood(df, fanout=(4, 2)).collect()
        by_root = [r for r in out if r.root == "r"]
        hop1 = sorted(r.node for r in by_root if r.hop == 1)
        # exactly the 4 smallest md5("r|ni") neighbors survive
        want = sorted(
            (f"n{i}" for i in range(6)),
            key=lambda n: hashlib.md5(f"r|{n}".encode()).hexdigest(),
        )[:4]
        assert hop1 == sorted(want)
        # hop-2: at most 2 per sampled parent -> exactly 8 (all distinct)
        hop2 = [r.node for r in by_root if r.hop == 2]
        assert len(hop2) == 8 and len(set(hop2)) == 8
        # deterministic across runs
        again = sampled_neighborhood(df, fanout=(4, 2)).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, again))

    def test_no_cartesian(self, spark):
        from text_to_graph_spark.operators.graphalgo import sampled_neighborhood
        from text_to_graph_spark.plans.introspect import plan_str

        df = spark.createDataFrame([("a", "b")], "subj string, obj string")
        assert "CartesianProduct" not in plan_str(sampled_neighborhood(df))


class TestTriadMotifs:
    def test_hand_counted_census(self, spark):
        from text_to_graph_spark.operators.graphalgo import triad_motifs

        # reciprocal {a,b}; feed-forward a->b->c/a->c AND b->a->c/b->c;
        # one directed 3-cycle d->e->f->d
        edges = [
            ("a", "b"), ("b", "a"), ("b", "c"), ("a", "c"),
            ("d", "e"), ("e", "f"), ("f", "d"),
        ]
        df = spark.createDataFrame(edges, "subj string, obj string")
        got = {r.motif: r.n for r in triad_motifs(df).collect()}
        assert got == {"reciprocal": 1, "feedforward": 2, "cycle": 1}

    def test_self_loops_and_duplicates_ignored(self, spark):
        from text_to_graph_spark.operators.graphalgo import triad_motifs

        edges = [("a", "a"), ("a", "b"), ("a", "b"), ("b", "a")]
        df = spark.createDataFrame(edges, "subj string, obj string")
        got = {r.motif: r.n for r in triad_motifs(df).collect()}
        assert got == {"reciprocal": 1, "feedforward": 0, "cycle": 0}


class TestMaximalIndependentSet:
    def _check_mis(self, edges, rows):
        adj = set()
        for s, d in edges:
            if s != d:
                adj.add((s, d)); adj.add((d, s))
        mis = {r.node for r in rows if r.status == "mis"}
        covered = {r.node for r in rows if r.status == "covered"}
        nodes = {x for e in adj for x in e}
        # partition of the node set
        assert mis | covered == nodes and not (mis & covered)
        # independence: no two MIS nodes adjacent
        assert not any((a, b) in adj for a in mis for b in mis if a != b)
        # maximality: every covered node has an MIS neighbor
        for c in covered:
            assert any((c, m) in adj for m in mis)

    def test_path_graph_properties(self, spark):
        from text_to_graph_spark.operators.graphalgo import (
            maximal_independent_set,
        )

        edges = [(f"v{i}", f"v{i+1}") for i in range(9)]
        df = spark.createDataFrame(edges, "subj string, obj string")
        rows = maximal_independent_set(df, max_rounds=6).collect()
        assert not [r for r in rows if r.status == "undecided"]
        self._check_mis(edges, rows)
        # deterministic across runs
        again = maximal_independent_set(df, max_rounds=6).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    def test_star_graph_single_round(self, spark):
        from text_to_graph_spark.operators.graphalgo import (
            maximal_independent_set,
        )

        edges = [("hub", f"leaf{i}") for i in range(5)]
        df = spark.createDataFrame(edges, "subj string, obj string")
        rows = maximal_independent_set(df, max_rounds=3).collect()
        self._check_mis(edges, rows)
        mis = {r.node for r in rows if r.status == "mis"}
        # a star's MIS is the hub alone or all five leaves
        assert mis == {"hub"} or mis == {f"leaf{i}" for i in range(5)}


def test_match_star_cross_product_of_fanouts(spark):
    from text_to_graph_spark.operators import graphq as G

    edges = spark.createDataFrame(
        [
            ("s", "p", "x1"), ("s", "p", "x2"),
            ("s", "q", "y1"),
            ("t", "p", "x3"),  # t has no q branch -> excluded
        ],
        "subj_key string, pred_key string, obj_key string",
    )
    rows = G.match_star(edges, ("p", "q")).collect()
    assert sorted((r.a, r.o1, r.o2) for r in rows) == [
        ("s", "x1", "y1"),
        ("s", "x2", "y1"),
    ]
    import pytest

    with pytest.raises(ValueError):
        G.match_star(edges, ())


def test_degree_assortativity_star_is_minus_one(spark):
    from text_to_graph_spark.operators import graphq as G

    edges = spark.createDataFrame(
        [("s", "p", "a"), ("s", "p", "b"), ("s", "q", "c"), ("s", "p", "s")],
        "subj_key string, pred_key string, obj_key string",
    )  # self-loop dropped; star graph -> r = -1 exactly
    row = G.degree_assortativity(edges).collect()[0]
    assert (row.m, row.sum_deg, row.sum_deg_sq, row.sum_deg_prod) == (6, 12, 30, 18)
    assert row.r_e6 == -1_000_000


def test_degree_assortativity_regular_graph_null_r(spark):
    from text_to_graph_spark.operators import graphq as G

    edges = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a")],
        "subj_key string, pred_key string, obj_key string",
    )  # 3-cycle: every degree 2 -> zero variance -> NULL
    row = G.degree_assortativity(edges).collect()[0]
    assert row.r_e6 is None and row.m == 6


def test_predicate_reciprocity_ppm_and_self_loops(spark):
    from text_to_graph_spark.operators import graphq as G

    edges = spark.createDataFrame(
        [
            ("a", "p", "b"), ("b", "p", "a"),  # reciprocated pair
            ("a", "p", "c"),                    # one-way
            ("x", "p", "x"),                    # self-loop: denominator only
            ("a", "q", "b"),                    # q never reciprocated
        ],
        "subj_key string, pred_key string, obj_key string",
    )
    got = {
        r.pred: (r.n_edges, r.n_reciprocated, r.reciprocity_ppm)
        for r in G.predicate_reciprocity(edges).collect()
    }
    assert got == {"p": (4, 2, 500_000), "q": (1, 0, 0)}


def test_wl_refinement_distinguishes_path_ends_from_center(spark):
    from text_to_graph_spark.operators.graphalgo import wl_refinement

    edges = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c")], "subj string, pred string, obj string"
    )  # path a-b-c: ends are 1-WL-equivalent, the center is not
    rows = {r.node: (r.wl_color, r.n_class) for r in wl_refinement(edges, rounds=2).collect()}
    assert rows["a"] == rows["c"]
    assert rows["a"][0] != rows["b"][0]
    assert rows["a"][1] == 2 and rows["b"][1] == 1


def test_wl_refinement_regular_graph_single_class(spark):
    from text_to_graph_spark.operators.graphalgo import wl_refinement

    edges = spark.createDataFrame(
        [("a", "p", "b"), ("b", "p", "c"), ("c", "p", "a")],
        "subj string, pred string, obj string",
    )  # triangle: vertex-transitive -> one color class of 3
    rows = wl_refinement(edges, rounds=3).collect()
    assert len({r.wl_color for r in rows}) == 1
    assert all(r.n_class == 3 for r in rows)


class TestTransE:
    def test_epoch_is_shuffle_order_invariant_and_improves_mrr(self, spark):
        """Batch semantics: the trained table must be bit-identical no
        matter how the edge list is partitioned, and training must beat
        the random init on filtered MRR (the whole point of the epoch)."""
        from text_to_graph_spark.operators.graphalgo import (
            transe_epoch,
            transe_init,
            transe_rank_eval,
        )

        rows = [
            ("a", "likes", "b"), ("b", "likes", "c"), ("c", "likes", "d"),
            ("d", "knows", "a"), ("a", "knows", "c"), ("b", "knows", "d"),
            ("e", "likes", "a"), ("e", "knows", "b"), ("c", "knows", "e"),
            ("d", "likes", "e"),
        ]
        edges = spark.createDataFrame(rows, "subj string, pred string, obj string")
        t1 = {
            (r.kind, r.name, r.dim): r.val
            for r in transe_epoch(edges, dim=8, epochs=2).collect()
        }
        t2 = {
            (r.kind, r.name, r.dim): r.val
            for r in transe_epoch(
                edges.repartition(7, "obj"), dim=8, epochs=2
            ).collect()
        }
        assert t1 == t2
        init_mrr = transe_rank_eval(
            edges, transe_init(edges, dim=8), "init"
        ).collect()[0].mrr_ppm
        trained_mrr = transe_rank_eval(
            edges, transe_epoch(edges, dim=8, epochs=8), "trained"
        ).collect()[0].mrr_ppm
        assert trained_mrr > init_mrr

    def test_epoch_matches_python_mirror(self, spark):
        """One epoch on a two-triple graph vs an independent python
        replay of the recurrence (same init hash, same negative draw,
        same sign-gradient batch update) — value-exact."""
        import hashlib

        from text_to_graph_spark.operators.graphalgo import (
            negative_samples,
            transe_epoch,
        )

        rows = [("a", "p", "b"), ("b", "p", "c")]
        edges = spark.createDataFrame(rows, "subj string, pred string, obj string")
        dim, margin, step, scale = 4, 50, 5, 100

        def h48(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)

        ents = sorted({r[0] for r in rows} | {r[2] for r in rows})
        emb = {
            ("e", n, d): h48(f"{n}|e|{d}") % (2 * scale + 1) - scale
            for n in ents
            for d in range(dim)
        }
        emb.update(
            {
                ("r", p, d): h48(f"{p}|r|{d}") % (2 * scale + 1) - scale
                for p in {r[1] for r in rows}
                for d in range(dim)
            }
        )
        negs = {
            (r.subj, r.pred, r.obj): r.neg_obj
            for r in negative_samples(edges, k=1).collect()
        }
        delta: dict = {}
        for s_, p_, o_ in rows:
            n_ = negs[(s_, p_, o_)]
            dp = [emb[("e", s_, d)] + emb[("r", p_, d)] - emb[("e", o_, d)] for d in range(dim)]
            dn = [emb[("e", s_, d)] + emb[("r", p_, d)] - emb[("e", n_, d)] for d in range(dim)]
            if sum(map(abs, dp)) + margin > sum(map(abs, dn)):
                sg = lambda v: (v > 0) - (v < 0)
                for d in range(dim):
                    s, s2 = sg(dp[d]), sg(dn[d])
                    delta[("e", s_, d)] = delta.get(("e", s_, d), 0) + step * (s2 - s)
                    delta[("e", o_, d)] = delta.get(("e", o_, d), 0) + step * s
                    delta[("e", n_, d)] = delta.get(("e", n_, d), 0) - step * s2
                    delta[("r", p_, d)] = delta.get(("r", p_, d), 0) + step * (s2 - s)
        want = {k: v + delta.get(k, 0) for k, v in emb.items()}
        got = {
            (r.kind, r.name, r.dim): r.val
            for r in transe_epoch(
                edges, dim=dim, margin=margin, step=step, epochs=1
            ).collect()
        }
        assert got == want


def test_transe_hard_negatives_are_filtered_and_hardest(spark):
    """Mined negatives must (a) never be graph-asserted under their
    (subj, pred), (b) rank by ascending model distance with label ties,
    and (c) be HARDER (closer) than the uniform sampler's draw on
    average for a trained model."""
    from text_to_graph_spark.operators.graphalgo import (
        transe_epoch,
        transe_hard_negatives,
    )

    rows = [
        ("a", "likes", "b"), ("b", "likes", "c"), ("c", "likes", "d"),
        ("d", "knows", "a"), ("a", "knows", "c"), ("b", "knows", "d"),
        ("e", "likes", "a"), ("e", "knows", "b"), ("c", "knows", "e"),
    ]
    edges = spark.createDataFrame(rows, "subj string, pred string, obj string")
    trained = transe_epoch(edges, dim=8, epochs=4)
    mined = transe_hard_negatives(edges, trained, k=2).collect()
    asserted = {(s, p, o) for s, p, o in rows}
    by_query: dict = {}
    for r in mined:
        assert (r.subj, r.pred, r.neg_obj) not in asserted
        by_query.setdefault((r.subj, r.pred), {})[r.neg_rank] = r.neg_dist
    for ranks in by_query.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert ranks[1] <= ranks[max(ranks)]  # rank 1 is closest
