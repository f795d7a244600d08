"""Minimal real WAV (RIFF PCM16) codec — pure stdlib (struct).

The audio twin of ``kit/png.py``: the multimodal audio-metadata operator
decodes GENUINE bytes — RIFF/WAVE signature, chunk walk with size
validation, fmt parse (PCM only), int16 sample decode — instead of a fake.
Production swaps it for ffmpeg behind the same mapInPandas contract;
compressed codecs and multi-channel layouts are intentionally out of scope
(ValueError), mono PCM16 is fully supported.
"""

from __future__ import annotations

import struct


def encode_wav_pcm16(sample_rate: int, samples: list[int]) -> bytes:
    """Encode mono 16-bit PCM. ``samples`` are ints in [-32768, 32767]."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav_pcm16(data: bytes) -> tuple[int, int, int, int, bytes]:
    """Decode mono PCM16 WAV -> (sample_rate, n_channels, bits_per_sample,
    n_samples, raw sample bytes little-endian int16). Validates the RIFF
    envelope size, walks chunks (skipping unknown ones, as real parsers
    must), and cross-checks fmt against the data chunk length."""
    if data[:4] != b"RIFF":
        raise ValueError("not a RIFF file")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size != len(data) - 8:
        raise ValueError(f"RIFF size {riff_size} != payload {len(data) - 8}")
    if data[8:12] != b"WAVE":
        raise ValueError("not a WAVE form")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            audio_format, n_channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
            if audio_format != 1:
                raise ValueError(f"only PCM supported, got format {audio_format}")
            if (n_channels, bits) != (1, 16):
                raise ValueError(
                    f"only mono 16-bit supported, got {n_channels}ch/{bits}bit"
                )
            fmt = (rate, n_channels, bits)
        elif cid == b"data":
            raw = body
        pos += 8 + clen + (clen % 2)  # RIFF chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt or data chunk")
    if len(raw) % 2:
        raise ValueError("odd data-chunk length for 16-bit samples")
    return fmt[0], fmt[1], fmt[2], len(raw) // 2, raw
