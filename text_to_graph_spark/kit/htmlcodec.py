"""Deterministic HTML <-> text codec for the Common-Crawl-style pages table.

The input contract is an Iceberg table ``(url, warc_ts, html:binary, text,
lang)`` where ``html`` wraps ``text``. ``wrap_text_as_html`` is the synthesis
direction (used to build fixture corpora); ``extract_text_from_html`` is the
pipeline's first stage and must recover ``text`` **byte-identically per url**
(the build contract's per-row invariant — the analog of the reference's
extractor stage, ``graph_extractor/src/pdf_extractor.py:6-27``, whose pages
are joined by ``'\\n'``; ours are paragraphs joined by ``'\\n\\n'``).

Both directions are pure Python string ops (no parser library): the wrap
format is fixed, so extraction is exact slicing, safe to run vectorized in a
pandas UDF and trivially versionable.
"""

from __future__ import annotations

_HEAD = "<html><body>"
_TAIL = "</body></html>"
_P_OPEN = "<p>"
_P_CLOSE = "</p>"

# HTML-entity escaping for the three characters that would break the fixed
# wrap format; everything else passes through untouched so the round-trip is
# byte-exact for arbitrary document text.
_ESC = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]


def _escape(s: str) -> str:
    for raw, ent in _ESC:
        s = s.replace(raw, ent)
    return s


def _unescape(s: str) -> str:
    for raw, ent in reversed(_ESC):
        s = s.replace(ent, raw)
    return s


def wrap_text_as_html(text: str) -> bytes:
    paragraphs = text.split("\n\n")
    body = "".join(f"{_P_OPEN}{_escape(p)}{_P_CLOSE}" for p in paragraphs)
    return (_HEAD + body + _TAIL).encode("utf-8")


def extract_text_from_html(html: bytes | bytearray | None) -> str | None:
    if html is None:
        return None
    try:
        s = bytes(html).decode("utf-8")
    except UnicodeDecodeError:
        # a crawl always contains mojibake; a poisoned row must yield null,
        # not kill the executor task (and with it the whole stage)
        return None
    if not (s.startswith(_HEAD) and s.endswith(_TAIL)):
        return None
    body = s[len(_HEAD) : len(s) - len(_TAIL)]
    if not body:
        return ""
    if not (body.startswith(_P_OPEN) and body.endswith(_P_CLOSE)):
        return None
    inner = body[len(_P_OPEN) : len(body) - len(_P_CLOSE)]
    paragraphs = inner.split(_P_CLOSE + _P_OPEN)
    return "\n\n".join(_unescape(p) for p in paragraphs)
