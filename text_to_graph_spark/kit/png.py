"""Minimal real PNG codec — pure stdlib (zlib + struct), grayscale 8-bit.

This is the REAL decoder behind the multimodal metadata operator: signature
check, chunk walk with CRC32 verification, IHDR parse, IDAT concatenation,
zlib inflate, and scanline unfiltering (all five PNG filter types). It exists
so the engine's image-metadata path decodes genuine bytes instead of a fake
(no reference parity — the reference pipeline is text-only; this is the
training-data-pipeline ask). Production swaps it for PIL/ffmpeg behind the
same mapInPandas contract; color PNGs and 16-bit depths are intentionally
out of scope (ValueError), grayscale 8-bit is fully supported.
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_gray8(width: int, height: int, pixels: bytes) -> bytes:
    """Encode a grayscale 8-bit PNG. ``pixels`` is row-major, len = w*h.

    Scanline r uses filter type r % 3 (None/Sub/Up), so a decoder that skips
    unfiltering produces wrong pixel values — round-trip tests therefore
    prove the decode path is real, not a header sniff.
    """
    if len(pixels) != width * height:
        raise ValueError(f"need {width * height} pixels, got {len(pixels)}")
    out = []
    prev = bytes(width)
    for r in range(height):
        row = pixels[r * width : (r + 1) * width]
        f = r % 3
        if f == 0:
            filt = row
        elif f == 1:  # Sub: x - left
            filt = bytes((row[i] - (row[i - 1] if i else 0)) & 0xFF for i in range(width))
        else:  # Up: x - above
            filt = bytes((row[i] - prev[i]) & 0xFF for i in range(width))
        out.append(bytes([f]) + filt)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    return (
        SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"".join(out), 6))
        + _chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_gray8(data: bytes) -> tuple[int, int, int, int, bytes]:
    """Decode a grayscale 8-bit PNG -> (width, height, bit_depth, color_type,
    pixels row-major). Verifies the signature and every chunk CRC, inflates
    the concatenated IDAT stream, and unfilters all five filter types."""
    if data[:8] != SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = bit_depth = color_type = -1
    idat = []
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            width, height, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
            if (bit_depth, color_type) != (8, 0):
                raise ValueError(
                    f"only grayscale 8-bit supported, got depth={bit_depth} "
                    f"color_type={color_type}"
                )
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width < 0:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != height * (width + 1):
        raise ValueError(f"IDAT size {len(raw)} != {height} x ({width}+1)")
    pixels = bytearray(width * height)
    prev = bytes(width)
    for r in range(height):
        f = raw[r * (width + 1)]
        line = raw[r * (width + 1) + 1 : (r + 1) * (width + 1)]
        row = bytearray(width)
        if f == 0:
            row[:] = line
        elif f == 1:  # Sub
            acc = 0
            for i in range(width):
                acc = (line[i] + acc) & 0xFF
                row[i] = acc
        elif f == 2:  # Up
            for i in range(width):
                row[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(width):
                a = row[i - 1] if i else 0
                row[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(width):
                a = row[i - 1] if i else 0
                c = prev[i - 1] if i else 0
                row[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        else:
            raise ValueError(f"bad filter type {f} on row {r}")
        pixels[r * width : (r + 1) * width] = row
        prev = bytes(row)
    return width, height, bit_depth, color_type, bytes(pixels)
