"""Pure-Python kit tests — no Spark. Case taxonomy inherited from the
reference's own module tests (SURVEY.md §5): csv_parser_tests.py,
graph_utils_test.py, the inline fixture texts of response_parser.py:210-665 —
assertions re-derived against *current* reference semantics."""

from __future__ import annotations

import pandas as pd
import pytest

from text_to_graph_spark.kit.chunker import pack_units
from text_to_graph_spark.kit.extract import ProseModel, VocabModel
from text_to_graph_spark.kit.htmlcodec import extract_text_from_html, wrap_text_as_html
from text_to_graph_spark.kit.parser import (
    parse_mention_list,
    parse_response_text,
    remove_orphan_nodes_and_reindex,
)
from text_to_graph_spark.kit.sanitize import sanitize
from text_to_graph_spark.kit.tokenize import count_tokens, text_units


# ---------------------------------------------------------------------------
# tokenize / units
# ---------------------------------------------------------------------------


def test_count_tokens_whitespace_fallback():
    assert count_tokens("a b  c\n d") == 4
    assert count_tokens("") == 0


def test_text_units_paragraph_sentence_line_order():
    text = "Para one. Sentence two!\nline three\n\nPara two?"
    # paragraph split first, then sentences, then lines, stripped, no empties
    assert text_units(text) == [
        "Para one.",
        "Sentence two!",
        "line three",
        "Para two?",
    ]


def test_text_units_drops_blank():
    assert text_units("\n\n  \n\n x ") == ["x"]


# ---------------------------------------------------------------------------
# chunker — reference packing semantics (chunk_utils.py:13-135)
# ---------------------------------------------------------------------------


def test_pack_single_small_doc_one_chunk():
    chunks = pack_units("one two three.", 10)
    assert len(chunks) == 1
    c = chunks[0]
    assert c["chunk_index"] == 0
    assert c["chunk_size"] == 3
    assert (c["token_start"], c["token_end"]) == (0, 3)
    assert c["text"] == "one two three."


def test_pack_respects_max_and_min():
    # units of 6 tokens each; target 10 -> max 11, min 5.
    unit = "u1 u2 u3 u4 u5 u6."
    text = " ".join([unit] * 4)  # one paragraph, 4 sentences
    chunks = pack_units(text, 10)
    # each chunk takes exactly one unit (6 tokens > min 5; two units = 12 > max 11)
    assert [c["chunk_size"] for c in chunks] == [6, 6, 6, 6]
    # token_start advances by size + 1 (reference bookkeeping, chunk_utils.py:50)
    assert [c["token_start"] for c in chunks] == [0, 7, 14, 21]


def test_pack_oversize_unit_packed_anyway():
    # a single 30-token sentence with target 10 must still be emitted whole
    big = " ".join(f"w{i}" for i in range(30)) + "."
    chunks = pack_units(big, 10)
    assert len(chunks) == 1
    assert chunks[0]["chunk_size"] == 30


def test_pack_trailing_small_chunk_merged():
    # 10-token unit then a 2-token unit: trailing chunk (2 < min 5) merges back
    text = " ".join(f"a{i}" for i in range(10)) + ". tiny tail."
    chunks = pack_units(text, 10)
    assert len(chunks) == 1
    assert chunks[0]["chunk_size"] == 12
    assert chunks[0]["text"].endswith("tiny tail.")


def test_pack_none_and_empty():
    assert pack_units(None, 10) == []
    assert pack_units("", 10) == []


# ---------------------------------------------------------------------------
# sanitize — '|' reserved (graph_utils.py:9-10)
# ---------------------------------------------------------------------------


def test_sanitize():
    assert sanitize(" A|B ") == "A_B"
    assert sanitize("||") == "__"
    assert sanitize("  plain  ") == "plain"


# ---------------------------------------------------------------------------
# htmlcodec — byte-exact round trip
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "text",
    [
        "plain words",
        "para one\n\npara two\n\nthree",
        "entities & <tags> and > signs &amp; pre-escaped",
        "",
        "unicode — åß∂ 中文 🙂",
        "trailing newline\n",
        "<p>fake markup</p>\n\n&lt;already&gt;",
    ],
)
def test_html_roundtrip_byte_exact(text):
    assert extract_text_from_html(wrap_text_as_html(text)) == text


def test_extract_rejects_foreign_html():
    assert extract_text_from_html(b"<div>nope</div>") is None
    assert extract_text_from_html(None) is None


def test_extract_survives_poisoned_bytes():
    # a crawl always contains mojibake / truncation — null, never a raise
    assert extract_text_from_html(b"\xff\xfe<html><body>") is None
    assert extract_text_from_html(b"<html><body><p>trunc") is None
    assert extract_text_from_html(b"") is None
    assert (
        extract_text_from_html("<html><body><p>caf\xe9</p></body></html>".encode("latin-1"))
        is None  # latin-1 bytes are not valid utf-8
    )


# ---------------------------------------------------------------------------
# deterministic models
# ---------------------------------------------------------------------------


def test_vocab_model_trigram_overlap():
    m = VocabModel()
    t = m.triples(pd.Series(["customer join table join row"]))
    # overlapping trigrams both count: (customer join table), (table join row)
    got = set(zip(t["subj"], t["pred"], t["obj"]))
    assert got == {("customer", "join", "table"), ("table", "join", "row")}
    assert list(t["pos"]) == [0, 2]


def test_vocab_model_stopwords_not_entities():
    m = VocabModel()
    t = m.triples(pd.Series(["the join table"]))
    assert t.empty
    ments = m.mentions(pd.Series(["the fast table a slow row"]))
    assert list(ments["mention"]) == ["table", "row"]


def test_vocab_model_batch_rows_independent():
    m = VocabModel()
    t = m.triples(pd.Series(["customer join", "join table"]))
    # no trigram may straddle the row boundary
    assert t.empty


def test_prose_model_mentions_strip_articles():
    m = ProseModel()
    got = m.mentions(pd.Series(["The Queen spoke to Snow White."]))
    assert list(got["mention"]) == ["Queen", "Snow White"]


def test_prose_model_triples_adjacent_in_sentence():
    m = ProseModel()
    t = m.triples(pd.Series(["Snow White escaped from the Queen. Hunter slept."]))
    assert list(zip(t["subj"], t["pred"], t["obj"])) == [
        ("Snow White", "escaped_from", "Queen")
    ]


def test_prose_model_no_cross_sentence_triples():
    m = ProseModel()
    t = m.triples(pd.Series(["Alice left. Bob arrived."]))
    assert t.empty


def test_prose_model_categories():
    m = ProseModel()
    assert m.category("NASA") == "acronym"
    assert m.category("Victron Inc") == "organization"
    assert m.category("Snow White") == "entity"


# ---------------------------------------------------------------------------
# CSV-contract parser — reference wire-format parity
# (response_parser.py:10-207; case taxonomy from csv_parser_tests.py)
# ---------------------------------------------------------------------------

VALID_RESPONSE = """\
id,entity,category
0,Snow White,person
1,Queen,person
2,Forest,location
3,Unreferenced,thing

source,target,relationship
0,1,fears
0,2,escaped_to
0,1,fears
"""


def test_parser_valid_response_orphan_pruned_and_deduped():
    nodes, edges = parse_response_text(VALID_RESPONSE)
    # node 3 is an orphan -> dropped; ids re-densified 0..2
    assert list(nodes.index) == [0, 1, 2]
    assert list(nodes["label"]) == ["Snow White", "Queen", "Forest"]
    # duplicate edge (0,1,fears) deduped
    assert len(edges) == 2
    assert set(zip(edges["source"], edges["target"], edges["label"])) == {
        (0, 1, "fears"),
        (0, 2, "escaped_to"),
    }


def test_parser_duplicate_node_id_rejects_response():
    bad = "id,entity,category\n0,A,x\n0,B,y\n\nsource,target,relationship\n0,0,r\n"
    nodes, edges = parse_response_text(bad)
    assert nodes is None and edges is None


def test_parser_malformed_rows_skipped():
    resp = (
        "id,entity,category\n0,A,x\n1,B\n2,C,z\n\n"  # row '1,B' short -> skipped
        "source,target,relationship\n0,2,r\nbroken row here\n"
    )
    nodes, edges = parse_response_text(resp)
    assert list(nodes["label"]) == ["A", "C"]
    assert len(edges) == 1


def test_parser_comment_and_fence_lines_skipped():
    resp = (
        "```csv\n# nodes below\nid,entity,category\n0,A,x\n1,B,y\n```\n"
        "source,target,relationship\n0,1,r\n"
    )
    nodes, edges = parse_response_text(resp)
    assert len(nodes) == 2 and len(edges) == 1


def test_parser_quoted_fields_with_commas():
    resp = (
        'id,entity,category\n0,"Doe, John",person\n1,Acme,org\n\n'
        'source,target,relationship\n0,1,"works, at"\n'
    )
    nodes, edges = parse_response_text(resp)
    assert list(nodes["label"]) == ["Doe, John", "Acme"]
    assert list(edges["label"]) == ["works, at"]


def test_parser_empty_input():
    nodes, edges = parse_response_text("")
    assert nodes is not None and edges is not None
    assert len(nodes) == 0 and len(edges) == 0


def test_orphan_reindex_remaps_edges():
    nodes = pd.DataFrame({"label": ["A", "B", "C"], "type": ["x", "y", "z"]},
                         index=pd.Index([5, 7, 9], name="id"))
    edges = pd.DataFrame({"source": [5, 9], "target": [9, 5], "label": ["r", "s"]})
    n2, e2 = remove_orphan_nodes_and_reindex(nodes, edges)
    assert list(n2.index) == [0, 1]
    assert list(n2["label"]) == ["A", "C"]
    assert set(zip(e2["source"], e2["target"])) == {(0, 1), (1, 0)}


def test_parse_mention_list():
    assert parse_mention_list('"Snow White", Queen , "Forest"') == [
        "Snow White",
        "Queen",
        "Forest",
    ]
    assert parse_mention_list("") is None
    assert parse_mention_list(None) is None
    assert parse_mention_list(" , ,") is None


# --- kit/bpe.py: deterministic byte-level BPE (C5 primary-path shape) ---

_BPE_CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox isn't lazy, it's fast",
    "pack 1000 tokens per chunk; don't overflow the max",
]


def test_pretokenize_is_lossless_and_counts_match():
    from text_to_graph_spark.kit.bpe import count_pretokens, pretokenize

    for t in _BPE_CORPUS:
        pieces = pretokenize(t)
        assert "".join(pieces) == t  # lossless split
        assert count_pretokens(t) == len(pieces)
    # contractions split into (word, 'suffix); multi-space runs are one piece
    assert pretokenize("isn't  it") == ["isn", "'t", "  ", "it"]
    assert pretokenize("isn't it") == ["isn", "'t", " it"]


def test_train_bpe_deterministic_and_golden():
    from text_to_graph_spark.kit.bpe import train_bpe

    a = train_bpe(_BPE_CORPUS, 8)
    b = train_bpe(list(reversed(_BPE_CORPUS)), 8)
    assert a == b  # multiset of texts, not order, defines the table
    # golden first merges on this corpus: most-frequent pair wins, byte
    # ascending tie-break (pinned so the trainer can never silently drift)
    assert a[0] == (b"h", b"e")
    assert a[1] == (b"t", b"he")
    assert len(a) == 8


def test_bpe_encode_roundtrip_and_count_monotone():
    from text_to_graph_spark.kit.bpe import BPE, count_pretokens, train_bpe

    merges = train_bpe(_BPE_CORPUS, 24)
    enc = BPE(merges)
    for t in _BPE_CORPUS:
        toks = enc.encode(t)
        assert enc.decode(toks) == t  # byte-exact roundtrip
        n_bytes = len(t.encode("utf-8"))
        # piece count <= merged count <= raw byte count
        assert count_pretokens(t) <= enc.count(t) <= n_bytes
    # a longer merge table never increases any count
    small, big = BPE(merges[:8]), BPE(merges)
    for t in _BPE_CORPUS:
        assert big.count(t) <= small.count(t)


def test_pack_units_with_bpe_counter_matches_counter_arithmetic():
    from text_to_graph_spark.kit.bpe import BPE, train_bpe
    from text_to_graph_spark.kit.chunker import pack_units

    merges = train_bpe(_BPE_CORPUS, 16)
    enc = BPE(merges)
    text = "\n\n".join(_BPE_CORPUS)  # three paragraphs -> three units
    chunks = pack_units(text, target_chunk_size=12, counter=enc.count)
    assert len(chunks) >= 2  # counter actually drives the boundaries
    for c in chunks[:-1]:
        assert c["chunk_size"] == enc.count(c["text"])


def test_gpt2_merges_txt_loader_wire_format(tmp_path):
    """The GPT-2 merges.txt adapter: byte-unicode alphabet decode, header
    skip, rank order, and end-to-end use through BPE.count."""
    import pytest

    from text_to_graph_spark.kit.bpe import (
        BPE,
        gpt2_bytes_to_unicode,
        load_merges_txt,
    )

    table = gpt2_bytes_to_unicode()
    assert len(set(table.values())) == 256  # reversible
    # 'Ġt h' style lines: space byte rides inside the token, GPT-2 style
    p = tmp_path / "merges.txt"
    p.write_text("#version: 0.2\nĠ t\nh e\nĠt he\n", encoding="utf-8")
    merges = load_merges_txt(str(p))
    assert merges == [(b" ", b"t"), (b"h", b"e"), (b" t", b"he")]
    bpe = BPE(merges)
    # ' the' pre-tokenizes to one piece; merges chain to a single token
    assert bpe.encode_piece(" the") == [b" the"]
    assert bpe.count("of the") == 3  # 'of' -> o,f unmerged; ' the' -> 1

    bad = tmp_path / "bad.txt"
    bad.write_text("Ġ t extra\n", encoding="utf-8")
    with pytest.raises(ValueError, match="expected"):
        load_merges_txt(str(bad))
    empty = tmp_path / "empty.txt"
    empty.write_text("#version: 0.2\n", encoding="utf-8")
    with pytest.raises(ValueError, match="no merges"):
        load_merges_txt(str(empty))


def test_gpt2_merges_txt_dump_load_roundtrip(tmp_path):
    """dump_merges_txt is the exact inverse of load_merges_txt — including
    tokens carrying space, newline, and non-ASCII bytes, which the
    byte-to-unicode alphabet keeps printable on one line."""
    from text_to_graph_spark.kit.bpe import (
        dump_merges_txt,
        load_merges_txt,
        train_bpe,
    )

    trained = train_bpe(
        ["the quick the quick brown", "the the thé naïve \n tab\there"] * 3,
        n_merges=12,
    )
    adversarial = [(b" \n", b"\xc3\xa9"), (b"\x00\xff", b" t")]
    for merges in (trained, adversarial):
        p = tmp_path / "m.txt"
        dump_merges_txt(merges, str(p))
        assert load_merges_txt(str(p)) == merges
        # wire format stays line-oriented: one header + one line per merge
        lines = p.read_text(encoding="utf-8").splitlines()
        assert len(lines) == 1 + len(merges)
