"""Distributed BPE training (operators/tokenizer.py) parity with the
driver-side trainer (kit/bpe.py train_bpe) — same merges, same order, same
stop rules, on the same corpus."""

from __future__ import annotations

from text_to_graph_spark.kit.bpe import train_bpe

CORPUS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "low lower lowest, the low low low",
    "don't stop the testing tests",
    "héllo héllo héllo world",  # multi-byte utf-8 pieces
]


def _hex_merges(merges):
    return [(a.hex(), b.hex()) for a, b in merges]


def test_train_bpe_merges_matches_driver_trainer(spark):
    from text_to_graph_spark.operators.tokenizer import train_bpe_merges

    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = train_bpe_merges(df, n_merges=12).orderBy("rank").collect()
    want = _hex_merges(train_bpe(CORPUS, 12))
    assert [(r["left_hex"], r["right_hex"]) for r in got] == want
    assert [r["rank"] for r in got] == list(range(1, len(want) + 1))
    assert all(r["freq"] >= 2 for r in got)


def test_train_bpe_merges_partitioning_invariant(spark):
    """The merge table is a pure function of the corpus multiset — the
    same corpus split across many partitions trains identically."""
    from text_to_graph_spark.operators.tokenizer import train_bpe_merges

    one = spark.createDataFrame([(t,) for t in CORPUS], "text string").coalesce(1)
    many = spark.createDataFrame(
        [(t,) for t in CORPUS], "text string"
    ).repartition(8)
    a = train_bpe_merges(one, n_merges=6).orderBy("rank").collect()
    b = train_bpe_merges(many, n_merges=6).orderBy("rank").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def _seq_apply_counts(text, merges_hex):
    """Reference implementation of the sequential rank-order apply spec
    (each rule once, globally, left-to-right non-overlapping)."""
    from text_to_graph_spark.kit.bpe import pretokenize

    n_pre = n_sub = 0
    for piece in pretokenize(text):
        sym = [format(b, "02x") for b in piece.encode("utf-8")]
        for a, b in merges_hex:
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        n_pre += 1
        n_sub += len(sym)
    return n_pre, n_sub


def test_subword_token_counts_match_reference_apply(spark):
    from text_to_graph_spark.operators.tokenizer import subword_token_counts

    merges = _hex_merges(train_bpe(CORPUS, 8))
    rows = [(f"u{i}", t) for i, t in enumerate(CORPUS)] + [("u-empty", "")]
    df = spark.createDataFrame(rows, "url string, text string")
    got = {
        r["url"]: (r["n_pretokens"], r["n_subwords"])
        for r in subword_token_counts(df, merges).collect()
    }
    want = {f"u{i}": _seq_apply_counts(t, merges) for i, t in enumerate(CORPUS)}
    want["u-empty"] = (0, 0)
    assert got == want
    # merges strictly reduce (or keep) the subword count vs raw bytes
    raw = {u: _seq_apply_counts(t, []) for u, t in dict(rows).items()}
    assert all(got[u][1] <= raw[u][1] for u in got)


def test_subword_token_counts_rejects_non_hex_merges(spark):
    import pytest

    from text_to_graph_spark.operators.tokenizer import subword_token_counts

    df = spark.createDataFrame([("u", "x")], "url string, text string")
    with pytest.raises(ValueError):
        subword_token_counts(df, [("61", "zz")])


def test_train_bpe_merges_early_stop(spark):
    """All adjacent pair frequencies are 1 -> the <2 stop rule fires on
    round one and the merge table is empty (mirrors kit.train_bpe)."""
    from text_to_graph_spark.operators.tokenizer import train_bpe_merges

    df = spark.createDataFrame([("ab cd ef",)], "text string")
    assert train_bpe_merges(df, n_merges=5).collect() == []
    assert train_bpe(["ab cd ef"], 5) == []


class TestWordPiece:
    def test_greedy_longest_match_and_continuation_marking(self, spark):
        from text_to_graph_spark.operators.tokenizer import (
            wordpiece_counts,
            wordpiece_vocab,
        )

        # 'customer' x3 and 'custom' x3 make 'custom' (and '##er' via the
        # er continuation twice... ) — craft explicitly: corpus where
        # 'abcd' appears 3x and 'ab' 3x: vocab gains 'ab','abcd',... greedy
        # on 'abcd' must take the LONGEST initial piece 'abcd', not 'ab'
        docs = spark.createDataFrame(
            [(1, "abcd abcd abcd ab ab ab"), (2, "xy")],
            "doc_id long, text string",
        )
        v = {r.piece for r in wordpiece_vocab(docs).collect()}
        assert {"ab", "abcd", "a", "##b", "##cd"} <= v
        got = {r.piece: r.n for r in wordpiece_counts(docs).collect()}
        # 'abcd' segments as the whole-word piece (longest match), 'ab'
        # as itself; 'xy' (freq 1) falls back to chars
        assert got["abcd"] == 3
        assert got["ab"] == 3
        assert got["x"] == 1 and got["##y"] == 1
        assert "##cd" not in got  # longest-match never splits abcd

    def test_single_char_fallback_never_fails(self, spark):
        from text_to_graph_spark.operators.tokenizer import wordpiece_counts

        docs = spark.createDataFrame(
            [(1, "zqjvw")], "doc_id long, text string"
        )
        got = {r.piece: r.n for r in wordpiece_counts(docs).collect()}
        # every rare word still segments, via single-char pieces
        assert got == {"z": 1, "##q": 1, "##j": 1, "##v": 1, "##w": 1}

    def test_deterministic_across_partitionings(self, spark):
        from text_to_graph_spark.operators.tokenizer import wordpiece_counts

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        a = sorted(map(tuple, wordpiece_counts(docs).collect()))
        b = sorted(
            map(tuple, wordpiece_counts(docs.repartition(7)).collect())
        )
        assert a == b and a


def test_wordpiece_matches_python_mirror_on_randomized_corpus(spark):
    """Seeded randomized corpus over a tiny alphabet (forces real
    frequency collisions): trainer + greedy tokenizer must equal an
    independent python mirror piece for piece, count for count."""
    import random
    from collections import Counter

    from text_to_graph_spark.operators.tokenizer import wordpiece_counts

    rng = random.Random(7)
    texts = [
        " ".join(
            "".join(rng.choice("abc") for _ in range(rng.randint(1, 9)))
            for _ in range(rng.randint(1, 12))
        )
        for _ in range(20)
    ]
    max_len, min_count = 6, 3

    words = Counter(w for t in texts for w in t.split(" ") if w)
    freq: Counter = Counter()
    for w, c in words.items():
        for i in range(len(w)):
            for l in range(1, min(max_len, len(w) - i) + 1):
                piece = w[i : i + l] if i == 0 else "##" + w[i : i + l]
                freq[piece] += c
    vocab = {
        p
        for p, f in freq.items()
        if f >= min_count
        or len(p[2:] if p.startswith("##") else p) == 1
    }
    want: Counter = Counter()
    for w, c in words.items():
        pos = 0
        while pos < len(w):
            for l in range(min(max_len, len(w) - pos), 0, -1):
                piece = w[pos : pos + l] if pos == 0 else "##" + w[pos : pos + l]
                if piece in vocab:
                    want[piece] += c
                    pos += l
                    break

    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.piece: r.n
        for r in wordpiece_counts(docs, max_len=max_len, min_count=min_count).collect()
    }
    assert got == dict(want)


def test_tokenizer_comparison_diverges_on_contractions(spark):
    from text_to_graph_spark.operators.tokenizer import tokenizer_comparison

    docs = spark.createDataFrame(
        [(1, "don't stop now now now")], "doc_id long, text string"
    )
    got = {
        r.tokenizer: (r.n_units, r.units_per_word_ppm)
        for r in tokenizer_comparison(docs).collect()
    }
    assert got["whitespace"] == (5, 1_000_000)
    # "don't" -> don + 't : the BPE pre-tokenizer sees 6 units
    assert got["bpe_pretoken"] == (6, 1_200_000)
    # wordpiece on this tiny corpus falls back to chars for rare words,
    # whole-piece for the 3x-repeated "now" -> strictly more units than
    # words, and the ppm is exactly units/words
    n_wp, ppm = got["wordpiece"]
    assert n_wp > 5 and ppm == n_wp * 1_000_000 // 5
