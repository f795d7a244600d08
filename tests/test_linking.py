"""Entity linking, coref blocking, edge mappings, paths, viewer sink.

Each operator is checked against an exact single-process oracle on small
deterministic inputs (brute-force Jaccard, BFS path enumeration, round-trip
decode of the viewer payload)."""

from __future__ import annotations

import itertools
from collections import deque

import pytest
from pyspark.sql import functions as F

from text_to_graph_spark.functions.edge_mappings import (
    EDGE_MAPPINGS,
    apply_edge_mappings,
    edge_mapping_table,
    extract_edge_labels,
)
from text_to_graph_spark.operators.components import pairwise_shortest_paths
from text_to_graph_spark.operators.linking import (
    ALIASES,
    alias_table,
    coref_candidate_pairs,
    coref_components,
    link_mentions,
    linked_mention_counts,
    merge_coreferent_nodes,
)

LABELS = [
    "part",
    "partition",
    "agg",
    "aggregate",
    "customer",
    "spark",
    "dup",
    "duplicate",
]


def _grams(s: str, n: int = 3) -> set[str]:
    s = s.lower().strip()
    if len(s) <= n:
        return {s[:n]} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def _jaccard(a: str, b: str) -> float:
    ga, gb = _grams(a), _grams(b)
    inter = len(ga & gb)
    return round(inter / (len(ga) + len(gb) - inter), 4)


class TestLinkMentions:
    def test_alias_resolution_and_identity_fallback(self, spark):
        mentions = spark.createDataFrame(
            [("u1", "row"), ("u1", "agg"), ("u2", "customer"), ("u2", " Part ")],
            "url string, mention string",
        )
        out = link_mentions(mentions, alias_table(spark)).collect()
        resolved = {(r["mention"], r["canonical_label"], r["linked"]) for r in out}
        assert ("row", "record", True) in resolved
        assert ("agg", "aggregate", True) in resolved
        assert ("customer", "customer", False) in resolved
        # key is lower(trim(mention))
        assert (" Part ", "partition", True) in resolved

    def test_salted_equals_unsalted(self, spark):
        mentions = spark.createDataFrame(
            [(f"u{i % 7}", m) for i, m in enumerate(LABELS * 13)],
            "url string, mention string",
        )
        plain = {
            (r["canonical_label"], r["n_occurrences"], r["n_docs"])
            for r in linked_mention_counts(mentions, alias_table(spark)).collect()
        }
        salted = {
            (r["canonical_label"], r["n_occurrences"], r["n_docs"])
            for r in linked_mention_counts(
                mentions, alias_table(spark), salted=True, buckets=4
            ).collect()
        }
        assert plain == salted


class TestCorefBlocking:
    def test_pairs_subset_of_bruteforce_with_exact_scores(self, spark):
        labels = spark.createDataFrame([(l,) for l in LABELS], "label string")
        got = {
            (r["label_a"], r["label_b"]): r["jaccard"]
            for r in coref_candidate_pairs(labels, threshold=0.12).collect()
        }
        brute = {
            tuple(sorted((a, b))): _jaccard(a, b)
            for a, b in itertools.combinations(LABELS, 2)
            if _jaccard(a, b) >= 0.12
        }
        # LSH blocking may miss pairs (bounded recall) but never invents any,
        # and every surfaced score is the exact Jaccard
        assert set(got).issubset(set(brute))
        for pair, j in got.items():
            assert j == pytest.approx(brute[pair])
        # pairs whose shared gram wins a minhash band are surfaced; with this
        # md5 family the alias variants below are (deterministically) found,
        # while e.g. part/partition is a known bounded-recall miss
        assert ("agg", "aggregate") in got
        assert ("dup", "duplicate") in got

    def test_components_cluster_variants(self, spark):
        labels = spark.createDataFrame([(l,) for l in LABELS], "label string")
        comp = {
            r["label"]: r["canonical"]
            for r in coref_components(labels, threshold=0.12).collect()
        }
        assert set(comp) == set(LABELS)  # every label is mapped
        # singletons map to themselves
        assert comp["customer"] == "customer"
        # variants land in one cluster whenever the pair was surfaced
        pairs = {
            (r["label_a"], r["label_b"])
            for r in coref_candidate_pairs(labels, threshold=0.12).collect()
        }
        for a, b in pairs:
            assert comp[a] == comp[b]

    def test_merge_coreferent_nodes(self, spark):
        nodes = spark.createDataFrame(
            [
                ("part", "part", ["storage"], ["u1"]),
                ("partition", "Partition", ["storage"], ["u2", "u3"]),
                ("customer", "Customer", ["actor"], ["u1"]),
            ],
            "key string, label string, types array<string>, doc_ids array<string>",
        )
        coref = spark.createDataFrame(
            [("part", "part"), ("partition", "part"), ("customer", "customer")],
            "label string, canonical string",
        )
        out = {r["key"]: r for r in merge_coreferent_nodes(nodes, coref).collect()}
        assert set(out) == {"part", "customer"}
        assert out["part"]["doc_ids"] == ["u1", "u2", "u3"]
        assert out["part"]["n_docs"] == 3
        assert out["part"]["types"] == ["storage"]


class TestEdgeMappings:
    def test_remap_merges_collisions(self, spark):
        edges = spark.createDataFrame(
            [
                ("a", "scan", "b", ["u1"], 3),
                ("a", "read", "b", ["u2"], 2),  # collides with mapped scan
                ("a", "sort", "b", ["u1"], 1),  # unmapped passes through
            ],
            "subj_key string, pred_key string, obj_key string, "
            "doc_ids array<string>, n_occurrences long",
        )
        out = {
            (r["subj_key"], r["pred_key"], r["obj_key"]): r
            for r in apply_edge_mappings(edges, edge_mapping_table(spark)).collect()
        }
        assert set(out) == {("a", "read", "b"), ("a", "sort", "b")}
        merged = out[("a", "read", "b")]
        assert merged["n_occurrences"] == 5
        assert merged["doc_ids"] == ["u1", "u2"]
        assert merged["n_docs"] == 2

    def test_extract_edge_labels(self, spark):
        edges = spark.createDataFrame(
            [("a", "scan", "b"), ("b", "scan", "c"), ("a", "sort", "c")],
            "subj_key string, pred_key string, obj_key string",
        )
        labels = {r["label"] for r in extract_edge_labels(edges).collect()}
        assert labels == {"scan", "sort"}

    def test_mapping_values_are_not_mapped_keys(self):
        # a one-pass remap requires the mapping to be idempotent
        assert not (set(EDGE_MAPPINGS.values()) & set(EDGE_MAPPINGS))
        assert not (set(ALIASES.values()) & set(ALIASES))


def _path_oracle(edges, roots, max_hops):
    """Exact lexicographically-smallest-shortest-path via BFS DP."""
    adj = {}
    for u, v in edges:
        if u != v:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
    out = {}
    for root in roots:
        best = {root: (0, (root,))}
        frontier = {root: (root,)}
        for hop in range(1, max_hops + 1):
            nxt = {}
            for node, path in frontier.items():
                for nb in adj.get(node, ()):
                    if nb in best:
                        continue
                    cand = path + (nb,)
                    if nb not in nxt or cand < nxt[nb]:
                        nxt[nb] = cand
            if not nxt:
                break
            for nb, path in nxt.items():
                best[nb] = (hop, path)
            frontier = nxt
        for dst in roots:
            if dst != root and dst in best:
                d, p = best[dst]
                out[(root, dst)] = (d, ">".join(p))
    return out


class TestPairwisePaths:
    def test_matches_exact_oracle(self, spark):
        edges = [
            ("a", "b"), ("b", "c"), ("c", "d"), ("a", "e"), ("e", "d"),
            ("x", "y"), ("d", "d"), ("b", "e"),
        ]
        roots = ["a", "d", "x", "y", "zz"]
        edf = spark.createDataFrame(edges, "src string, dst string")
        rdf = spark.createDataFrame([(r,) for r in roots], "node string")
        got = {
            (r["src_root"], r["dst_root"]): (r["distance"], r["path"])
            for r in pairwise_shortest_paths(edf, rdf, max_hops=6).collect()
        }
        assert got == _path_oracle(edges, roots, 6)

    def test_directed_mode(self, spark):
        edf = spark.createDataFrame(
            [("a", "b"), ("b", "c")], "src string, dst string"
        )
        rdf = spark.createDataFrame([("a",), ("c",)], "node string")
        out_mode = {
            (r["src_root"], r["dst_root"]): r["distance"]
            for r in pairwise_shortest_paths(
                edf, rdf, direction="out", max_hops=4
            ).collect()
        }
        assert out_mode == {("a", "c"): 2}


class TestViewerSink:
    def test_payload_round_trip_and_csv_contract(self, spark, tmp_path):
        from text_to_graph_spark.sinks.viewer import (
            build_viewer_html,
            decode_payload,
        )

        nodes = spark.createDataFrame(
            [
                ("alpha", "Alpha", ["actor", "x|y"], ["u1"]),
                ("beta", "Beta", ["system"], ["u1", "u2"]),
            ],
            "key string, label string, types array<string>, doc_ids array<string>",
        )
        edges = spark.createDataFrame(
            [("alpha", "works_with", "beta", "works_with")],
            "subj_key string, pred_key string, obj_key string, pred_label string",
        )
        html = build_viewer_html(nodes, edges, metadata='{"k": 1}')
        import re

        payloads = re.findall(r"`([A-Za-z0-9+/=]+)`", html)
        assert len(payloads) == 3
        nodes_csv, edges_csv, meta = (decode_payload(p) for p in payloads)
        assert nodes_csv.splitlines()[0] == "id,label,type"
        assert edges_csv.splitlines()[0] == "source,target,label"
        # dense ids 0..N-1 in key order; type set '|'-joined
        assert nodes_csv.splitlines()[1].startswith("0,Alpha,")
        assert "works_with" in edges_csv
        assert meta == '{"k": 1}'

    def test_provenance_round_trip_matches_pandas_oracle(self, spark):
        """Composite-graph export: decode the HTML payload, split the
        ``label|docIdx...`` suffix back (the viewer's utils.js:62-78 decode)
        and compare doc sets against a pandas oracle of graph_utils.py's
        merge_all_document_graphs provenance semantics (220-221,236-245)."""
        import io
        import json
        import re

        import pandas as pd

        from text_to_graph_spark.sinks.viewer import (
            build_viewer_html,
            decode_payload,
        )

        node_rows = [
            ("alpha", "Alpha", ["actor"], ["doc_b", "doc_a"]),
            ("beta", "Beta", ["system"], ["doc_c"]),
            ("gamma", "Gamma", ["data"], ["doc_a", "doc_c", "doc_b"]),
        ]
        nodes = spark.createDataFrame(
            node_rows,
            "key string, label string, types array<string>, doc_ids array<string>",
        )
        edge_rows = [
            ("alpha", "works_with", "beta", "works_with", ["doc_c", "doc_a"]),
            ("beta", "feeds", "gamma", "feeds", ["doc_b"]),
        ]
        edges = spark.createDataFrame(
            edge_rows,
            "subj_key string, pred_key string, obj_key string, "
            "pred_label string, doc_ids array<string>",
        )
        html = build_viewer_html(nodes, edges, provenance=True)
        payloads = re.findall(r"`([A-Za-z0-9+/=]+)`", html)
        nodes_csv, edges_csv, meta = (decode_payload(p) for p in payloads)

        # pandas oracle: sorted distinct docs -> dense index; suffix =
        # '|'.join(str(i) for sorted doc indices) (graph_utils.py:220,238)
        all_docs = sorted(
            {d for r in node_rows for d in r[3]}
            | {d for r in edge_rows for d in r[4]}
        )
        idx = {d: i for i, d in enumerate(all_docs)}

        assert json.loads(meta) == [
            {"index": i, "doc": d} for i, d in enumerate(all_docs)
        ]

        npdf = pd.read_csv(io.StringIO(nodes_csv))
        decoded = {}
        for _, row in npdf.iterrows():
            parts = str(row["label"]).split("|")  # utils.js decode
            decoded[parts[0]] = [int(x) for x in parts[1:] if x]
        for key, label, _types, docs in node_rows:
            assert decoded[label] == sorted(idx[d] for d in docs)

        epdf = pd.read_csv(io.StringIO(edges_csv))
        edge_decoded = {}
        for _, row in epdf.iterrows():
            parts = str(row["label"]).split("|")
            edge_decoded[parts[0]] = [int(x) for x in parts[1:] if x]
        for _s, _p, _o, plabel, docs in edge_rows:
            assert edge_decoded[plabel] == sorted(idx[d] for d in docs)

    def test_golden_html_bytes(self, spark):
        """End-to-end golden: the full viewer HTML for a fixed composite
        fixture (labels exercising quote/backtick/backslash/comma and the
        provenance suffixes) is pinned by sha256, so the escaping rules
        (create_graph_viewer.py:28-30), the CSV quoting, the zlib/base64
        payload encoding and the template can never silently drift. The
        decoded payloads are pinned too, so a hash break is diagnosable.
        """
        import hashlib
        import re

        from text_to_graph_spark.sinks.viewer import (
            build_viewer_html,
            decode_payload,
        )

        nodes = spark.createDataFrame(
            [
                ("alpha", 'Al"pha', ["actor", "x|y"], ["doc_b", "doc_a"]),
                ("beta", "Beta`tick", ["system"], ["doc_c"]),
                ("gamma", "Gamma\\slash", ["data"], ["doc_a", "doc_c", "doc_b"]),
            ],
            "key string, label string, types array<string>, doc_ids array<string>",
        )
        edges = spark.createDataFrame(
            [
                ("alpha", "works_with", "beta", "works,with", ["doc_c", "doc_a"]),
                ("beta", "feeds", "gamma", "feeds", ["doc_b"]),
            ],
            "subj_key string, pred_key string, obj_key string, "
            "pred_label string, doc_ids array<string>",
        )
        html = build_viewer_html(nodes, edges, provenance=True)
        assert (
            hashlib.sha256(html.encode("utf-8")).hexdigest()
            == "480c17795aabaae2f36bae57e4a5e42c180e714dc1e1a68093955e2f0378fbcc"
        )
        payloads = re.findall(r"`([A-Za-z0-9+/=]+)`", html)
        nodes_csv, edges_csv, meta = (decode_payload(p) for p in payloads)
        assert nodes_csv == (
            "id,label,type\n"
            '0,"Al""pha|0|1",actor|x|y\n'
            "1,Beta`tick|2,system\n"
            "2,Gamma\\slash|0|1|2,data\n"
        )
        assert edges_csv == (
            "source,target,label\n"
            '0,1,"works,with|0|2"\n'
            "1,2,feeds|1\n"
        )
        assert meta == (
            '[{"index": 0, "doc": "doc_a"}, {"index": 1, "doc": "doc_b"}, '
            '{"index": 2, "doc": "doc_c"}]'
        )

    def test_duplicate_node_labels_hard_error(self, spark):
        """P11's viewer abort (data_renderer.js:224-232) is enforced at
        export time."""
        import pytest

        from text_to_graph_spark.sinks.viewer import build_viewer_html

        nodes = spark.createDataFrame(
            [
                ("k1", "Same", ["actor"], ["d0"]),
                ("k2", "same", ["system"], ["d0"]),
            ],
            "key string, label string, types array<string>, doc_ids array<string>",
        )
        edges = spark.createDataFrame(
            [("k1", "p", "k2", "p", ["d0"])],
            "subj_key string, pred_key string, obj_key string, "
            "pred_label string, doc_ids array<string>",
        )
        with pytest.raises(ValueError, match="duplicate node labels"):
            build_viewer_html(nodes, edges, provenance=True)
