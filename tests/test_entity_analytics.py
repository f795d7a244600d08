"""Entity-analytics operators on hand-computed fixtures:

- graphalgo.ranking_eval      (MRR / Hits@k link-prediction report card)
- extraction.entity_salience  (per-doc positional salience)
- graphq.entity_pair_lift     (doc-level co-mention PMI lift)
"""

import pytest

from text_to_graph_spark.operators.extraction import entity_salience
from text_to_graph_spark.operators.graphalgo import ranking_eval
from text_to_graph_spark.operators.graphq import entity_pair_lift

pytestmark = pytest.mark.usefixtures("spark")


class TestRankingEval:
    SCHEMA = "node_a string, node_b string, jaccard_ppm long, is_linked boolean"

    def test_mrr_and_hits(self, spark):
        # g1 ranks: b1(900,pos)=1, b2(800,neg)=2, b3(800,pos)=3 (tie -> item asc)
        # g2 ranks: c1(500,neg)=1, c2(400,pos)=2; g3 has no positive
        preds = spark.createDataFrame(
            [
                ("g1", "b1", 900, True),
                ("g1", "b2", 800, False),
                ("g1", "b3", 800, True),
                ("g2", "c1", 500, False),
                ("g2", "c2", 400, True),
                ("g3", "d1", 100, False),
            ],
            self.SCHEMA,
        )
        row = ranking_eval(preds).collect()[0]
        assert row.n_queries == 2
        assert row.n_positives == 3
        # rr: 1e6/1 + 1e6//3 + 1e6/2 = 1_833_333 -> //3
        assert row.mrr_ppm == 611_111
        assert (row.hits1, row.hits3, row.hits10) == (1, 3, 3)
        assert row.hits10_ppm == 1_000_000

    def test_null_label_counts_as_negative(self, spark):
        preds = spark.createDataFrame(
            [("g1", "b1", 900, None), ("g1", "b2", 100, True)], self.SCHEMA
        )
        row = ranking_eval(preds).collect()[0]
        assert row.n_positives == 1
        assert row.mrr_ppm == 500_000


class TestEntitySalience:
    def test_positions_and_ppm_components(self, spark):
        # vocab entities present: customer (pos 0, 3), spark (pos 2)
        ext = spark.createDataFrame(
            [("u1", "customer likes spark customer")], "url string, text string"
        )
        got = {r.mention: r for r in entity_salience(ext).collect()}
        assert set(got) == {"customer", "spark"}
        c = got["customer"]
        assert (c.n_mentions, c.first_pos, c.spread) == (2, 0, 3)
        assert (c.freq_ppm, c.earliness_ppm, c.salience_ppm) == (
            500_000,
            1_000_000,
            750_000,
        )
        s = got["spark"]
        assert (s.n_mentions, s.first_pos, s.spread) == (1, 2, 0)
        assert (s.freq_ppm, s.earliness_ppm, s.salience_ppm) == (
            250_000,
            500_000,
            375_000,
        )

    def test_no_mentions_yields_no_rows(self, spark):
        ext = spark.createDataFrame(
            [("u1", "nothing relevant here")], "url string, text string"
        )
        assert entity_salience(ext).count() == 0


class TestEntityPairLift:
    SCHEMA = "url string, mention string"
    ROWS = [
        ("d1", "customer"), ("d1", "spark"),
        ("d2", "customer"), ("d2", "spark"),
        ("d3", "customer"), ("d3", "table"),
        ("d4", "spark"),
    ]

    def test_lift_exact_ppm(self, spark):
        m = spark.createDataFrame(self.ROWS, self.SCHEMA)
        got = {
            (r.mention_a, r.mention_b): (r.n_docs, r.df_a, r.df_b, r.lift_e6)
            for r in entity_pair_lift(m, min_pair_docs=2).collect()
        }
        # N=4 docs; df customer=3, spark=3; lift = 2*4*1e6 // 9
        assert got == {("customer", "spark"): (2, 3, 3, 888_888)}

    def test_min_pair_docs_one_emits_rare_pair(self, spark):
        m = spark.createDataFrame(self.ROWS, self.SCHEMA)
        got = {
            (r.mention_a, r.mention_b): r.lift_e6
            for r in entity_pair_lift(m, min_pair_docs=1).collect()
        }
        assert got[("customer", "table")] == 1_333_333  # 1*4e6 // 3
        assert set(got) == {("customer", "spark"), ("customer", "table")}

    def test_duplicate_mention_rows_do_not_inflate(self, spark):
        m = spark.createDataFrame(self.ROWS + self.ROWS, self.SCHEMA)
        got = {
            (r.mention_a, r.mention_b): r.n_docs
            for r in entity_pair_lift(m, min_pair_docs=2).collect()
        }
        assert got == {("customer", "spark"): 2}


class TestEntityCards:
    def test_card_fields_on_hand_graph(self, spark):
        from text_to_graph_spark.operators.graphq import entity_cards

        nodes = spark.createDataFrame(
            [("a", "entity", 3), ("b", "entity", 2), ("c", "entity", 1),
             ("z", "entity", 1)],
            "label string, node_type string, n_docs long",
        )
        # a->b twice (via p, q), a->c once, c->a once; z isolated
        edges = spark.createDataFrame(
            [("a", "p", "b", 2, 2), ("a", "q", "b", 1, 1),
             ("a", "p", "c", 1, 1), ("c", "r", "a", 1, 1)],
            "subj string, pred string, obj string, n_docs long, n_occurrences long",
        )
        cards = {r["label"]: r for r in entity_cards(nodes, edges).collect()}
        a = cards["a"]
        assert (a.out_degree, a.in_degree, a.degree) == (3, 1, 4)
        assert a.top_predicate == "p"      # p: 2 edges > q: 1
        assert a.top_neighbor == "b"       # b: 2 mentions > c: 2? no — b=2, c=2
        # tie c vs b at 2 each -> asc tiebreak picks 'b'
        z = cards["z"]
        assert (z.out_degree, z.in_degree, z.degree) == (0, 0, 0)
        assert z.top_predicate == "" and z.top_neighbor == ""
        b = cards["b"]
        assert b.top_predicate == ""       # no outgoing edges
        assert b.top_neighbor == "a"

    def test_every_node_gets_exactly_one_card(self, spark):
        from text_to_graph_spark.operators.graphq import entity_cards

        nodes = spark.createDataFrame(
            [("a", "t", 1), ("b", "t", 1)], "label string, node_type string, n_docs long"
        )
        edges = spark.createDataFrame(
            [("a", "p", "b", 1, 1)],
            "subj string, pred string, obj string, n_docs long, n_occurrences long",
        )
        out = entity_cards(nodes, edges)
        assert out.count() == 2
        assert out.select("label").distinct().count() == 2


class TestPropertyTable:
    def test_pivot_min_policy_and_density(self, spark):
        from text_to_graph_spark.operators.graphq import property_table

        edges = spark.createDataFrame(
            [
                ("a", "join", "z"),
                ("a", "join", "x"),   # min policy -> "x"
                ("a", "scan", "y"),
                ("b", "merge", "m"),
            ],
            "subj string, pred string, obj string",
        )
        rows = {
            r.entity: r
            for r in property_table(edges, ("join", "scan", "merge")).collect()
        }
        a, b = rows["a"], rows["b"]
        assert (a.p_join, a.p_scan, a.p_merge, a.n_facts) == ("x", "y", "", 3)
        assert (b.p_join, b.p_scan, b.p_merge, b.n_facts) == ("", "", "m", 1)
