"""Charset sniffing for crawl ingest — pure stdlib, deterministic.

Real web crawls are not utf-8: a Common-Crawl-style corpus carries utf-16
pages (BOM'd), windows-1252 legacy pages, and BOM-prefixed utf-8. The
input contract (``input_hint``: ``html:binary``) says bytes, so ingest
must sniff before it can extract. Detection order (each step decidable
from the bytes alone, no statistical guessing — so the verdict is
reproducible anywhere):

1. utf-16 LE / BE byte-order marks
2. utf-8 BOM (decoded as ``utf-8-sig``, reported as utf-8)
3. strict utf-8 decode succeeds -> utf-8
4. windows-1252, falling back to latin-1 only for the five code points
   cp1252 leaves undefined (0x81 0x8D 0x8F 0x90 0x9D) — the WHATWG
   "treat them as C1 controls" behavior

Reference anchor: the reference reads local already-decoded documents
(`doc_utils.py:64`); charset handling is the additive ingest-hardening
stage a crawl corpus needs before its html->text step.
"""

from __future__ import annotations

_BOM_UTF16_LE = b"\xff\xfe"
_BOM_UTF16_BE = b"\xfe\xff"
_BOM_UTF8 = b"\xef\xbb\xbf"


def detect_decode(data: bytes) -> tuple[str, str]:
    """Sniff ``data``'s encoding and decode it. Returns
    ``(encoding_label, text)``; never raises on real-world bytes (every
    byte string is valid latin-1, the terminal fallback)."""
    if data.startswith(_BOM_UTF16_LE):
        return "utf-16-le", data[2:].decode("utf-16-le")
    if data.startswith(_BOM_UTF16_BE):
        return "utf-16-be", data[2:].decode("utf-16-be")
    if data.startswith(_BOM_UTF8):
        return "utf-8", data[3:].decode("utf-8")
    try:
        return "utf-8", data.decode("utf-8")
    except UnicodeDecodeError:
        pass
    try:
        return "windows-1252", data.decode("cp1252")
    except UnicodeDecodeError:
        return "windows-1252", data.decode("latin-1")
