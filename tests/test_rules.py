"""AMIE path-rule mining (operators/rules.py) on hand-computed fixtures."""

import pytest

from text_to_graph_spark.operators.rules import mine_path_rules

pytestmark = pytest.mark.usefixtures("spark")


def _facts(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


def _mine(spark, rows, **kw):
    return {
        (r.p1, r.p2, r.p3): (
            r.n_body, r.n_support, r.confidence_ppm, r.head_coverage_ppm
        )
        for r in mine_path_rules(_facts(spark, rows), **kw).collect()
    }


FIX = [
    ("a", "r", "m"), ("m", "s", "b"), ("a", "t", "b"),   # supported body
    ("c", "r", "m2"), ("m2", "s", "d"),                   # unsupported body
]


class TestRuleMining:
    def test_confidence_and_head_coverage(self, spark):
        got = _mine(spark, FIX)
        # bodies of (r,s): (a,b) via m and (c,d) via m2; head t(a,b) holds
        assert got == {("r", "s", "t"): (2, 1, 500_000, 1_000_000)}

    def test_mid_degree_cap_drops_hub_bodies(self, spark):
        # fatten m2 into a hub (4 incidences); m keeps 2
        rows = FIX + [("e", "r", "m2"), ("f", "r", "m2")]
        uncapped = _mine(spark, rows)
        assert uncapped[("r", "s", "t")] == (4, 1, 250_000, 1_000_000)
        capped = _mine(spark, rows, max_mid_degree=3)
        # only the m-mediated body survives -> confidence back to 1.0
        assert capped[("r", "s", "t")] == (1, 1, 1_000_000, 1_000_000)

    def test_reflexive_body_excluded(self, spark):
        got = _mine(spark, [("a", "r", "m"), ("m", "s", "a")])
        assert got == {}

    def test_min_support_filters(self, spark):
        got = _mine(spark, FIX, min_support=2)
        assert got == {}

    def test_duplicate_facts_do_not_inflate_counts(self, spark):
        got = _mine(spark, FIX + FIX)
        assert got == {("r", "s", "t"): (2, 1, 500_000, 1_000_000)}


class TestRuleApplication:
    def _apply(self, spark, rows, **kw):
        from text_to_graph_spark.operators.rules import apply_rules

        facts = _facts(spark, rows)
        rules = mine_path_rules(facts)
        return {
            (r.subj, r.pred, r.obj): (r.n_rules, r.max_confidence_ppm)
            for r in apply_rules(facts, rules, **kw).collect()
        }

    def test_infers_only_novel_facts(self, spark):
        got = self._apply(spark, FIX, min_confidence_ppm=500_000)
        # body (a,b) already has t(a,b); only (c,d) is new
        assert got == {("c", "t", "d"): (1, 500_000)}

    def test_threshold_gates_rules(self, spark):
        got = self._apply(spark, FIX, min_confidence_ppm=600_000)
        assert got == {}

    def test_multiple_rules_same_fact_counted(self, spark):
        rows = FIX + [
            # a second 50%-confidence rule (r2,s2 => t) also deriving (c,d)
            ("c", "r2", "m3"), ("m3", "s2", "d"),
            ("x1", "r2", "m4"), ("m4", "s2", "y1"), ("x1", "t", "y1"),
        ]
        got = self._apply(spark, rows, min_confidence_ppm=500_000)
        assert got[("c", "t", "d")] == (2, 500_000)
