"""Truth-discovery operators (operators/fusion.py) against hand-computed
fixtures: one-source-one-vote dedup, majority vote with deterministic
tie-break, agreement ppm, and the reliability-weighted re-vote."""

import pytest

from text_to_graph_spark.operators.fusion import (
    fused_facts,
    source_claims,
    source_reliability,
    vote_facts,
)

pytestmark = pytest.mark.usefixtures("spark")


def _triples(spark, rows):
    # rows: (source, page, subj, pred, obj) -> synthesized-corpus url shape
    return spark.createDataFrame(
        [
            (f"https://example.test/{s}/page/{pg}/0", su, p, o)
            for s, pg, su, p, o in rows
        ],
        "url string, subj string, pred string, obj string",
    )


FIX = [
    # (a,p): s1,s2 say x; s3 says y  -> winner x
    ("s1", 1, "a", "p", "x"),
    ("s1", 2, "a", "p", "x"),  # same source twice: ONE vote
    ("s2", 1, "a", "p", "x"),
    ("s3", 1, "a", "p", "y"),
    # (b,p): s1,s3 say u -> winner u
    ("s1", 3, "b", "p", "u"),
    ("s3", 2, "b", "p", "u"),
    # (c,p): only s3 says w -> winner w
    ("s3", 3, "c", "p", "w"),
]


class TestVoting:
    def test_one_source_one_vote(self, spark):
        claims = source_claims(_triples(spark, FIX))
        assert claims.count() == 6  # the duplicate s1 (a,p,x) collapsed

    def test_majority_winners(self, spark):
        claims = source_claims(_triples(spark, FIX))
        got = {
            (r.subj, r.pred): (r.obj, r.n_src)
            for r in vote_facts(claims).collect()
        }
        assert got == {
            ("a", "p"): ("x", 2),
            ("b", "p"): ("u", 2),
            ("c", "p"): ("w", 1),
        }

    def test_tie_breaks_to_smaller_obj(self, spark):
        rows = [("s1", 1, "a", "p", "zz"), ("s2", 1, "a", "p", "aa")]
        claims = source_claims(_triples(spark, rows))
        [w] = vote_facts(claims).collect()
        assert (w.obj, w.n_src) == ("aa", 1)


class TestReliability:
    def test_agreement_ppm(self, spark):
        claims = source_claims(_triples(spark, FIX))
        rel = {
            r.source: (r.n_claims, r.n_agree, r.reliability_ppm)
            for r in source_reliability(claims, vote_facts(claims)).collect()
        }
        assert rel == {
            "s1": (2, 2, 1_000_000),
            "s2": (1, 1, 1_000_000),
            "s3": (3, 2, 666_666),  # y lost the (a,p) vote
        }


class TestFusedFacts:
    def test_weighted_revote(self, spark):
        claims = source_claims(_triples(spark, FIX))
        rel = source_reliability(claims, vote_facts(claims))
        got = {
            (r.subj, r.pred): (r.obj, r.support_e6, r.n_sources)
            for r in fused_facts(claims, rel).collect()
        }
        assert got == {
            ("a", "p"): ("x", 2_000_000, 2),  # s1+s2 beat s3's 666k for y
            ("b", "p"): ("u", 1_666_666, 2),
            ("c", "p"): ("w", 666_666, 1),
        }

    def test_reliability_flips_raw_majority(self, spark):
        # two low-quality sources (each wrong on a settled fact) vote z;
        # one perfect source votes q: raw majority says z, weighted says q
        rows = [
            # two settled facts where the g-quorum outvotes b1/b2
            ("g1", 1, "k", "p", "v"),
            ("g2", 1, "k", "p", "v"),
            ("g3", 1, "k", "p", "v"),
            ("b1", 1, "k", "p", "zz"),
            ("b2", 1, "k", "p", "zz"),
            ("g1", 3, "k2", "p", "v2"),
            ("g2", 3, "k2", "p", "v2"),
            ("g3", 3, "k2", "p", "v2"),
            ("b1", 3, "k2", "p", "zz"),
            ("b2", 3, "k2", "p", "zz"),
            # an uncontested extra correct claim boosting g1
            ("g1", 4, "k3", "p", "v3"),
            # the contested fact
            ("b1", 2, "t", "p", "z"),
            ("b2", 2, "t", "p", "z"),
            ("g1", 2, "t", "p", "q"),
        ]
        claims = source_claims(_triples(spark, rows))
        raw = {
            (r.subj, r.pred): r.obj for r in vote_facts(claims).collect()
        }
        assert raw[("t", "p")] == "z"  # raw majority: 2 votes vs 1
        rel = source_reliability(claims, vote_facts(claims))
        fused = {
            (r.subj, r.pred): r.obj
            for r in fused_facts(claims, rel).collect()
        }
        # b1/b2: 1 of 3 claims agree -> 333333 each, z support 666666;
        # g1: 3 of 4 agree -> 750000, q support 750000 -> q wins strictly
        assert fused[("t", "p")] == "q"


class TestConstraintMining:
    FACTS = [
        ("a", "p1", "x"), ("b", "p1", "y"), ("c", "p1", "u"), ("c", "p1", "v"),
        ("a", "p2", "x"), ("a", "p2", "y"), ("a", "p2", "z"),
    ]

    def _facts(self, spark):
        return spark.createDataFrame(
            self.FACTS, "subj string, pred string, obj string"
        )

    def test_functionality_ppm(self, spark):
        from text_to_graph_spark.operators.fusion import predicate_functionality

        got = {
            r.pred: (r.n_subjects, r.n_functional, r.functionality_ppm, r.max_objs)
            for r in predicate_functionality(self._facts(spark)).collect()
        }
        assert got == {
            "p1": (3, 2, 666_666, 2),
            "p2": (1, 0, 0, 3),
        }

    def test_conflict_worklist(self, spark):
        from text_to_graph_spark.operators.fusion import functional_conflicts

        got = {
            (r.pred, r.subj): (r.n_objs, r.objs, r.functionality_ppm)
            for r in functional_conflicts(self._facts(spark)).collect()
        }
        assert got == {
            ("p1", "c"): (2, "u|v", 666_666),
            ("p2", "a"): (3, "x|y|z", 0),
        }
