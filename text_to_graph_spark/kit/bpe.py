"""Deterministic byte-level BPE tokenization — the C5 "real tokenizer"
option.

The reference's primary token counter is tiktoken (``gpt.py:27-34``), with
``len(text.split())`` as its documented fallback; the repo pins the fallback
as the default so chunk boundaries are reproducible with zero native deps
(``kit/tokenize.py``). This module adds the primary-path *shape*: a GPT-2
style two-stage tokenizer — regex pre-tokenization, then learned byte-pair
merges applied within each piece — so chunk boundaries can be driven by a
real subword count. tiktoken's exact vocabulary cannot be vendored (its
50k-merge table is a binary artifact, not reproducible from public
knowledge in-repo), so the merge table is TRAINED deterministically
(Sennrich et al. 2016, arXiv:1508.07909) from a caller-supplied corpus with
total-order tie-breaking — bit-identical across runs, machines, and
partitionings.

Pre-tokenizer spec (deliberate, documented deviations from GPT-2's pattern
so the SAME regex runs identically in Python ``re``, Java (Spark), and RE2
(DuckDB), none of which agree on ``\\p{L}`` / lookahead support):

- ASCII classes only (``[A-Za-z]`` / ``[0-9]``); non-ASCII letters group
  with the punctuation bucket.
- no trailing-whitespace lookahead (``\\s+(?!\\S)``): a whitespace run
  groups as one piece, with a single space allowed to lead the following
  word piece — counts differ from GPT-2 only on multi-space runs.

Merge-counting invariant: merges only ever combine bytes *within* one
pre-token piece, so ``count_pretokens`` is an upper bound of
``BPE.count`` and both are monotone under merge-table growth.
"""

from __future__ import annotations

import re

# shared spec: identical semantics in Python re, Java regex, and RE2.
PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[A-Za-z]+"
    r"| ?[0-9]+"
    r"| ?[^A-Za-z0-9\s]+"
    r"|\s+"
)

_PRETOKEN_RE = re.compile(PRETOKEN_PATTERN)


def pretokenize(text: str) -> list[str]:
    """Split text into BPE pre-token pieces (lossless: pieces concatenate
    back to the input)."""
    return _PRETOKEN_RE.findall(text)


def count_pretokens(text: str) -> int:
    """Piece count under the pre-tokenizer — the vectorizable fast-path
    token counter (expressible as ``regexp_extract_all`` length in both
    Spark SQL and DuckDB)."""
    return len(_PRETOKEN_RE.findall(text))


def train_bpe(texts: list[str], n_merges: int) -> list[tuple[bytes, bytes]]:
    """Learn ``n_merges`` byte-pair merges from a corpus, deterministically.

    Classic BPE training over utf-8 byte sequences of the pre-token pieces:
    each round merges the globally most frequent adjacent symbol pair.
    Ties break by the pair's byte values ascending — a total order, so the
    merge table is a pure function of (texts as a multiset, n_merges).
    Training is driver-side and O(corpus); intended for a bounded sample
    (the merge table is the model — at 100 TB you train once on a sample
    and broadcast the table, exactly like any other model artifact).
    """
    piece_freq: dict[tuple[bytes, ...], int] = {}
    for t in texts:
        for piece in pretokenize(t):
            key = tuple(bytes([b]) for b in piece.encode("utf-8"))
            if key:
                piece_freq[key] = piece_freq.get(key, 0) + 1

    merges: list[tuple[bytes, bytes]] = []
    for _ in range(n_merges):
        pair_freq: dict[tuple[bytes, bytes], int] = {}
        for sym, f in piece_freq.items():
            for a, b in zip(sym, sym[1:]):
                pair_freq[(a, b)] = pair_freq.get((a, b), 0) + f
        if not pair_freq:
            break
        best = min(pair_freq.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_freq[best] < 2:
            break  # nothing left worth merging; table stays shorter
        merges.append(best)
        merged = best[0] + best[1]
        nxt: dict[tuple[bytes, ...], int] = {}
        for sym, f in piece_freq.items():
            out: list[bytes] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            nxt[key] = nxt.get(key, 0) + f
        piece_freq = nxt
    return merges


class BPE:
    """Apply a trained merge table: encode / count.

    ``merges`` is the ranked list from :func:`train_bpe`; lower rank wins
    first (the standard BPE apply order, so encoding is independent of
    scan order and deterministic).
    """

    def __init__(self, merges: list[tuple[bytes, bytes]]):
        self.merges = list(merges)
        self._rank = {pair: i for i, pair in enumerate(self.merges)}

    def encode_piece(self, piece: str) -> list[bytes]:
        sym = [bytes([b]) for b in piece.encode("utf-8")]
        while len(sym) > 1:
            best_i, best_r = -1, None
            for i in range(len(sym) - 1):
                r = self._rank.get((sym[i], sym[i + 1]))
                if r is not None and (best_r is None or r < best_r):
                    best_i, best_r = i, r
            if best_r is None:
                break
            sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
        return sym

    def encode(self, text: str) -> list[bytes]:
        out: list[bytes] = []
        for piece in pretokenize(text):
            out.extend(self.encode_piece(piece))
        return out

    def count(self, text: str) -> int:
        return sum(len(self.encode_piece(p)) for p in pretokenize(text))

    def decode(self, tokens: list[bytes]) -> str:
        return b"".join(tokens).decode("utf-8")


def gpt2_bytes_to_unicode() -> dict[int, str]:
    """GPT-2's reversible byte -> printable-unicode mapping (the public
    algorithm from the GPT-2 encoder: printable latin bytes map to
    themselves, the rest shift into 256+). Needed to parse the wire format
    of the public ``merges.txt`` artifact, whose tokens are written in this
    alphabet (e.g. ``Ġ`` is the space byte)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def dump_merges_txt(merges: list[tuple[bytes, bytes]], path: str) -> None:
    """Write a ranked merge list in the public GPT-2 ``merges.txt`` wire
    format — the exact inverse of :func:`load_merges_txt` (``#version``
    header, one ``left right`` pair per line in the byte-to-unicode
    alphabet, rank = line order). The alphabet maps every byte — including
    space and newline — to a printable codepoint, so any byte sequence
    round-trips losslessly through the line-oriented format."""
    enc = gpt2_bytes_to_unicode()

    def tok(b: bytes) -> str:
        return "".join(enc[x] for x in b)

    with open(path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{tok(a)} {tok(b)}\n")


def load_merges_txt(path: str) -> list[tuple[bytes, bytes]]:
    """Parse a GPT-2-format ``merges.txt`` into the ranked merge list
    :class:`BPE` consumes — the adapter that makes the reference's primary
    tokenizer path (tiktoken, ``gpt.py:27-34``) a file-drop away.

    The pinned public artifact (50k merges) cannot be vendored from this
    sandbox (no network; it is not reproducible from memory), so this ships
    the exact WIRE-FORMAT decoder instead: optional ``#version`` header,
    one ``left right`` pair per line in the byte-to-unicode alphabet,
    rank = line order. Dropping in the public file yields the real GPT-2
    merge table byte-for-byte; tests exercise the format with a synthetic
    table.
    """
    inv = {c: b for b, c in gpt2_bytes_to_unicode().items()}

    def tok(s: str) -> bytes:
        try:
            return bytes(inv[ch] for ch in s)
        except KeyError as e:
            raise ValueError(f"{path}: token {s!r} outside the GPT-2 alphabet") from e

    merges: list[tuple[bytes, bytes]] = []
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line or (ln == 1 and line.startswith("#")):
                continue
            parts = line.split(" ")
            if len(parts) != 2:
                raise ValueError(f"{path}:{ln}: expected 'left right', got {line!r}")
            merges.append((tok(parts[0]), tok(parts[1])))
    if not merges:
        raise ValueError(f"{path}: no merges found")
    return merges
