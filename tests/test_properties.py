"""Property-based tests (hypothesis) over the determinism kit.

The kit is the semantic core shared by Spark UDFs and the oracle — these
properties must hold for ANY text, not just fixtures:

- packing conserves tokens and respects the size envelope
- the parser round-trips rendered wire blobs losslessly
- sanitize is idempotent and never emits the reserved '|'
- the vocab model's triples are exactly the matching token trigrams
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from text_to_graph_spark.kit.chunker import pack_units
from text_to_graph_spark.kit.extract import (
    ENTITY_CATEGORIES,
    PREDICATES,
    VocabModel,
)
from text_to_graph_spark.kit.parser import parse_response_text
from text_to_graph_spark.kit.sanitize import sanitize
from text_to_graph_spark.kit.tokenize import count_tokens, text_units
from text_to_graph_spark.sources.responses import render_response

# words without whitespace/newlines; occasional punctuation to hit the
# sentence splitter
WORD = st.text(
    alphabet=st.sampled_from("abcdefgzXYZ.!?|,\"'"), min_size=1, max_size=8
).filter(lambda w: w.strip())
TEXT = st.lists(WORD, min_size=0, max_size=400).map(" ".join)


class TestPackingProperties:
    @settings(max_examples=150, deadline=None)
    @given(text=TEXT, target=st.integers(min_value=5, max_value=200))
    def test_token_conservation_and_envelope(self, text, target):
        chunks = pack_units(text, target)
        units = text_units(text)
        # conservation: every unit token lands in exactly one chunk
        assert sum(c["chunk_size"] for c in chunks) == sum(
            count_tokens(u) for u in units
        )
        # indices are dense 0..n-1 and offsets monotone
        assert [c["chunk_index"] for c in chunks] == list(range(len(chunks)))
        for a, b in zip(chunks, chunks[1:]):
            assert b["token_start"] == a["token_end"] + 1
        # envelope: every chunk except a merged-trailing or oversized-unit
        # case stays <= max; non-final chunks hold >= min unless forced by a
        # single oversized unit
        max_sz = int(target * 1.1)
        min_sz = int(target * 0.5)
        unit_sizes = [count_tokens(u) for u in units]
        any_oversize_unit = any(s > max_sz for s in unit_sizes)
        for i, c in enumerate(chunks):
            if not any_oversize_unit and i < len(chunks) - 1:
                assert c["chunk_size"] >= min_sz
        if len(chunks) > 1:
            assert chunks[-1]["chunk_size"] >= min_sz or any_oversize_unit

    @settings(max_examples=50, deadline=None)
    @given(text=TEXT, target=st.integers(min_value=5, max_value=100))
    def test_deterministic(self, text, target):
        assert pack_units(text, target) == pack_units(text, target)


LABEL = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc")),
    min_size=1,
    max_size=20,
).filter(lambda s: s.strip() == s and s.strip("\r\n") == s and s)


class TestParserRoundTrip:
    @settings(max_examples=100, deadline=None)
    @given(
        labels=st.lists(LABEL, min_size=2, max_size=6, unique=True),
        preds=st.lists(LABEL, min_size=1, max_size=4),
    )
    def test_render_parse_identity(self, labels, preds):
        nodes = [(i, lbl, "entity") for i, lbl in enumerate(labels)]
        edges = [
            (i % len(labels), (i + 1) % len(labels), p)
            for i, p in enumerate(preds)
            if i % len(labels) != (i + 1) % len(labels)
        ]
        if not edges:
            return
        blob = render_response(nodes, edges)
        pnodes, pedges = parse_response_text(blob)
        assert pnodes is not None and pedges is not None
        # orphan prune keeps exactly the referenced nodes, dense-reindexed;
        # labels survive CSV quoting byte-for-byte
        referenced = sorted(
            {e[0] for e in edges} | {e[1] for e in edges}
        )
        # reference parity: the parser inherits read_csv type inference
        # (numeric-looking labels parse as numbers); labels are forced to
        # str only at merge input (graph_utils.py:118-119) — compare there
        assert [str(x) for x in pnodes["label"]] == [
            labels[i] for i in referenced
        ]
        # edges map to the re-indexed ids with identical predicate labels
        remap = {old: new for new, old in enumerate(referenced)}
        # parser dedups on (source, target, label) in first-seen order
        seen, expect = set(), []
        for s, t, p in edges:
            k = (remap[s], remap[t], p)
            if k not in seen:
                seen.add(k)
                expect.append(k)
        got = [
            (s, t, str(p))
            for s, t, p in zip(pedges["source"], pedges["target"], pedges["label"])
        ]
        assert got == [(s, t, str(p)) for s, t, p in expect]


class TestSanitize:
    @settings(max_examples=200, deadline=None)
    @given(s=st.text(max_size=50))
    def test_idempotent_and_no_pipe(self, s):
        once = sanitize(s)
        assert sanitize(once) == once
        assert "|" not in once
        assert once == once.strip()


class TestVocabModelProperties:
    @settings(max_examples=100, deadline=None)
    @given(
        toks=st.lists(
            st.sampled_from(
                sorted(ENTITY_CATEGORIES) + list(PREDICATES) + ["the", "zz"]
            ),
            min_size=0,
            max_size=60,
        )
    )
    def test_triples_are_exactly_matching_trigrams(self, toks):
        text = " ".join(toks)
        got = VocabModel().triples(pd.Series([text]))
        expect = [
            (i, toks[i], toks[i + 1], toks[i + 2])
            for i in range(max(len(toks) - 2, 0))
            if toks[i] in ENTITY_CATEGORIES
            and toks[i + 1] in PREDICATES
            and toks[i + 2] in ENTITY_CATEGORIES
        ]
        assert list(zip(got["pos"], got["subj"], got["pred"], got["obj"])) == expect


# --- kit/bpe.py properties ---------------------------------------------------


@given(st.text(max_size=300))
@settings(max_examples=200, deadline=None)
def test_bpe_pretokenize_lossless_any_text(text):
    from text_to_graph_spark.kit.bpe import pretokenize

    assert "".join(pretokenize(text)) == text


@given(st.lists(st.text(min_size=1, max_size=60), min_size=1, max_size=8),
       st.text(max_size=120))
@settings(max_examples=100, deadline=None)
def test_bpe_roundtrip_and_bounds_any_text(corpus, text):
    from text_to_graph_spark.kit.bpe import BPE, count_pretokens, train_bpe

    enc = BPE(train_bpe(corpus, 16))
    toks = enc.encode(text)
    assert enc.decode(toks) == text  # byte-exact for arbitrary unicode
    assert count_pretokens(text) <= enc.count(text) <= len(text.encode("utf-8"))


@given(st.lists(st.text(min_size=1, max_size=40), min_size=1, max_size=6))
@settings(max_examples=60, deadline=None)
def test_bpe_training_order_invariant(corpus):
    from text_to_graph_spark.kit.bpe import train_bpe

    assert train_bpe(corpus, 8) == train_bpe(list(reversed(corpus)), 8)
