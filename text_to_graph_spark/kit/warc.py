"""WARC/1.0 codec — the Common-Crawl wire format, pure stdlib.

Common Crawl ships ``.warc.gz`` files where EVERY record is its own gzip
member; members concatenate, so a reader can split a segment at member
boundaries and parse records independently without decompressing the whole
file. This codec reproduces that convention deterministically:

- :func:`encode_record`: one response record -> one gzip member
  (``mtime=0`` and fixed compression level, so bytes are reproducible).
- :func:`decode_segment`: split concatenated gzip members
  (``zlib.decompressobj(wbits=31)`` + ``unused_data``), parse each record's
  header block strictly (version line, header fields, mandatory
  ``Content-Length``, CRLF-CRLF trailer) and yield
  ``(url, epoch_seconds, payload)``.

Reference anchor: the reference crawls live pages one at a time
(``crawler.py``); at corpus scale the same pages arrive as Common Crawl
WARC segments, which is why the engine carries a real reader for the
format. Validation is strict — a malformed record raises ``ValueError``
rather than yielding partial rows, matching the codec policy of
``kit/png.py`` and ``kit/wav.py``.
"""

from __future__ import annotations

import calendar
import gzip
import time
import zlib

_VERSION = b"WARC/1.0"
_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"


def _iso(epoch: int) -> str:
    return time.strftime(_DATE_FMT, time.gmtime(epoch))


def _epoch(iso: str) -> int:
    return calendar.timegm(time.strptime(iso, _DATE_FMT))


def encode_record(url: str, epoch: int, payload: bytes) -> bytes:
    """One WARC response record as a standalone gzip member (deterministic:
    ``mtime=0``, fixed level — same inputs give identical bytes)."""
    headers = (
        _VERSION
        + b"\r\n"
        + b"WARC-Type: response\r\n"
        + b"WARC-Target-URI: "
        + url.encode("utf-8")
        + b"\r\n"
        + b"WARC-Date: "
        + _iso(int(epoch)).encode("ascii")
        + b"\r\n"
        + b"Content-Length: "
        + str(len(payload)).encode("ascii")
        + b"\r\n\r\n"
    )
    return gzip.compress(headers + payload + b"\r\n\r\n", compresslevel=6, mtime=0)


def _parse_record(raw: bytes) -> tuple[str, int, bytes]:
    head_end = raw.find(b"\r\n\r\n")
    if head_end < 0:
        raise ValueError("WARC record: no header terminator")
    lines = raw[:head_end].split(b"\r\n")
    if lines[0] != _VERSION:
        raise ValueError(f"WARC record: bad version line {lines[0]!r}")
    fields: dict[bytes, bytes] = {}
    for ln in lines[1:]:
        k, sep, v = ln.partition(b": ")
        if not sep:
            raise ValueError(f"WARC record: malformed header line {ln!r}")
        fields[k] = v
    try:
        n = int(fields[b"Content-Length"])
        url = fields[b"WARC-Target-URI"].decode("utf-8")
        epoch = _epoch(fields[b"WARC-Date"].decode("ascii"))
    except KeyError as e:
        raise ValueError(f"WARC record: missing header {e}") from e
    body = raw[head_end + 4 :]
    if len(body) != n + 4 or body[n:] != b"\r\n\r\n":
        raise ValueError(
            f"WARC record: Content-Length {n} does not tile the body "
            f"({len(body)} bytes)"
        )
    return url, epoch, body[:n]


def decode_segment(segment: bytes) -> list[tuple[str, int, bytes]]:
    """Split a ``.warc.gz`` segment at gzip-member boundaries and parse
    every record. Raises ``ValueError`` on trailing garbage, a truncated
    member, or any malformed record."""
    out: list[tuple[str, int, bytes]] = []
    buf = segment
    while buf:
        d = zlib.decompressobj(wbits=31)
        try:
            raw = d.decompress(buf)
        except zlib.error as e:
            raise ValueError(f"WARC segment: bad gzip member: {e}") from e
        if not d.eof:
            raise ValueError("WARC segment: truncated gzip member")
        out.append(_parse_record(raw))
        buf = d.unused_data
    return out
