"""Wire-format response source, orphan prune, and the L1->L2 bridge."""

from __future__ import annotations

from pyspark.sql import functions as F

from text_to_graph_spark.operators.canonicalize import remove_orphans
from text_to_graph_spark.operators.extraction import (
    chunk_mention_lists,
    restrict_triples_to_mentions,
)
from text_to_graph_spark.sources.responses import parse_responses, render_response

GOOD = render_response(
    nodes=[(0, "Alpha", "person"), (1, "Beta", "place"), (2, "Orphan", "thing")],
    edges=[(0, 1, "visits")],
)
DUP_IDS = "id,entity,category\n0,A,x\n0,B,y\nsource,target,relationship\n0,0,loop"
BAD_HEADER = "foo,bar\n1,2"


class TestParseResponses:
    def test_parse_prune_and_reject(self, spark):
        blobs = spark.createDataFrame(
            [("u1", 0, GOOD), ("u1", 1, DUP_IDS), ("u2", 0, BAD_HEADER)],
            "url string, chunk_index int, response_text string",
        )
        nodes, edges = parse_responses(blobs)
        n = nodes.collect()
        e = edges.collect()
        # duplicate-node-id and bad-header blobs rejected wholesale
        assert {(r["url"], r["chunk_index"]) for r in n} == {("u1", 0)}
        # orphan node pruned, survivors densely reindexed 0..N-1
        assert {(r["node_id"], r["label"]) for r in n} == {(0, "Alpha"), (1, "Beta")}
        assert [(r["source"], r["target"], r["label"]) for r in e] == [(0, 1, "visits")]

    def test_round_trip_via_reference_fixture_style(self, spark):
        # quoting: labels with commas/quotes survive the CSV round trip
        blob = render_response(
            nodes=[(0, 'Multi RS "Solar"', "product"), (1, "a, b", "list")],
            edges=[(0, 1, "includes")],
        )
        blobs = spark.createDataFrame(
            [("u", 0, blob)], "url string, chunk_index int, response_text string"
        )
        nodes, edges = parse_responses(blobs)
        labels = {r["label"] for r in nodes.collect()}
        assert labels == {'Multi RS "Solar"', "a, b"}
        assert edges.count() == 1


class TestRemoveOrphans:
    def test_semi_join_prune(self, spark):
        nodes = spark.createDataFrame(
            [("a",), ("b",), ("c",)], "key string"
        )
        edges = spark.createDataFrame(
            [("a", "b")], "subj_key string, obj_key string"
        )
        kept = {r["key"] for r in remove_orphans(nodes, edges).collect()}
        assert kept == {"a", "b"}


class TestL2Bridge:
    def test_mention_lists_and_restriction(self, spark):
        mentions = spark.createDataFrame(
            [("u", 0, "x"), ("u", 0, "y"), ("u", 0, "x"), ("u", 1, "z")],
            "url string, chunk_index int, mention string",
        )
        lists = {
            (r["url"], r["chunk_index"]): r["mentions"]
            for r in chunk_mention_lists(mentions).collect()
        }
        assert lists == {("u", 0): ["x", "y"], ("u", 1): ["z"]}

        triples = spark.createDataFrame(
            [
                ("u", 0, 0, "x", "p", "y"),   # both in list -> kept
                ("u", 0, 1, "x", "p", "q"),   # obj not a mention -> dropped
                ("u", 2, 0, "x", "p", "y"),   # chunk with no L1 -> dropped
            ],
            "url string, chunk_index int, pos int, subj string, pred string, obj string",
        )
        got = restrict_triples_to_mentions(
            triples, chunk_mention_lists(mentions)
        ).collect()
        assert [(r["url"], r["chunk_index"], r["subj"], r["obj"]) for r in got] == [
            ("u", 0, "x", "y")
        ]
