"""Tokenization + text segmentation primitives.

Reproduces the reference's segmentation semantics exactly:
- token counting: the reference counts tiktoken tokens with a whitespace
  fallback (``graph_extractor/src/gpt.py:27-34``). We pin the *fallback*
  (``len(text.split())``) as the one true tokenizer so chunk boundaries are
  reproducible with zero native deps.
- paragraph split on ``"\\n\\n"`` (``chunk_utils.py:71``)
- sentence split on ``r'(?<=[.!?])\\s+'`` (``chunk_utils.py:73-74``)
- line split on ``"\\n"`` (``chunk_utils.py:76-77``)
- unit iteration order paragraph -> sentence -> line (``chunk_utils.py:79-86``)
"""

from __future__ import annotations

import re

_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+")


def count_tokens(text: str) -> int:
    """Whitespace token count — the reference's deterministic fallback
    (``gpt.py:32-34``)."""
    return len(text.split())


def split_paragraphs(text: str) -> list[str]:
    return [p.strip() for p in text.split("\n\n") if p.strip()]


def split_sentences(text: str) -> list[str]:
    return _SENTENCE_RE.split(text.strip())


def split_lines(text: str) -> list[str]:
    return text.strip().split("\n")


def text_units(text: str) -> list[str]:
    """Paragraph -> sentence -> line decomposition, stripped, empties dropped
    (``chunk_utils.py:79-86``)."""
    units: list[str] = []
    for paragraph in split_paragraphs(text):
        for sentence in split_sentences(paragraph):
            for line in split_lines(sentence):
                line = line.strip()
                if line:
                    units.append(line)
    return units
