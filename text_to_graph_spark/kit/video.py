"""Minimal real video container — "T2GV": an indexed sequence of PNG frames.

The video twin of ``kit/png.py``/``kit/wav.py``. Real video needs ffmpeg
(not in this container), so the frame-sampling operator exercises a toy but
REAL container format instead of byte slices: magic + frame count + an
offset/length index + concatenated grayscale PNG frames. The decoder
validates the magic, the index bounds, and that regions tile the payload
exactly; each extracted frame is then a genuine PNG decoded by
``kit.png.decode_gray8``. Production swaps this for an MP4/ffmpeg demuxer
behind the same mapInPandas contract — the Spark-side shape (per-row 1->N
frame expansion, stride sampling, per-frame decode) is exactly what a real
pipeline runs.

Layout: b"T2GV" | u32 n_frames | n_frames x (u32 offset, u32 length) |
frame bytes. All integers big-endian; offsets are absolute.
"""

from __future__ import annotations

import struct

MAGIC = b"T2GV"


def encode_container(frames: list[bytes]) -> bytes:
    header_len = 8 + 8 * len(frames)
    out = [MAGIC, struct.pack(">I", len(frames))]
    pos = header_len
    for f in frames:
        out.append(struct.pack(">II", pos, len(f)))
        pos += len(f)
    out.extend(frames)
    return b"".join(out)


def decode_container(data: bytes) -> list[bytes]:
    """-> ordered frame byte-strings. Validates magic, index bounds, and
    that the indexed regions exactly tile the payload (no gaps/overlaps) —
    a sliced-up parser cannot fake its way past a wrong index."""
    if data[:4] != MAGIC:
        raise ValueError("not a T2GV container: bad magic")
    (n,) = struct.unpack(">I", data[4:8])
    header_len = 8 + 8 * n
    if len(data) < header_len:
        raise ValueError("truncated container index")
    frames = []
    expect = header_len
    for i in range(n):
        off, length = struct.unpack(">II", data[8 + 8 * i : 16 + 8 * i])
        if off != expect:
            raise ValueError(f"frame {i}: offset {off} leaves a gap/overlap")
        if off + length > len(data):
            raise ValueError(f"frame {i}: region past end of container")
        frames.append(data[off : off + length])
        expect = off + length
    if expect != len(data):
        raise ValueError(f"trailing {len(data) - expect} bytes after last frame")
    return frames
