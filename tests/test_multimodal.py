"""Multimodal plumbing + the real PNG codec (kit/png.py).

The codec tests run driver-side (pure Python); the Spark tests prove the
mapInPandas decode path recovers exactly what the encoder embedded.
"""

import hashlib
import struct
import zlib

import pytest

from tests.conftest import SF_SMOKE
from text_to_graph_spark.kit.png import SIGNATURE, decode_gray8, encode_gray8


def _pixels(doc_id: int, w: int, h: int) -> bytes:
    return bytes(
        (doc_id * 31 + r * 7 + c * 13) % 256 for r in range(h) for c in range(w)
    )


def test_png_roundtrip_all_encoder_filters():
    # height 9 exercises filter types 0, 1, 2 (r % 3) three times each
    px = _pixels(42, 13, 9)
    blob = encode_gray8(13, 9, px)
    assert blob[:8] == SIGNATURE
    w, h, depth, ctype, got = decode_gray8(blob)
    assert (w, h, depth, ctype) == (13, 9, 8, 0)
    assert got == px


def test_png_decoder_handles_average_and_paeth():
    # hand-build a 3x2 image with filter types 3 (Average) and 4 (Paeth),
    # which the encoder never emits — the decoder must still unfilter them
    rows = [bytes([10, 20, 30]), bytes([15, 25, 35])]
    raw = bytearray()
    # row 0: Average with prev=0: filt[i] = x - (left + 0)//2
    prev = bytes(3)
    filt0 = bytearray([3])
    for i in range(3):
        a = rows[0][i - 1] if i else 0
        filt0.append((rows[0][i] - (a + prev[i]) // 2) & 0xFF)
    raw += filt0
    # row 1: Paeth
    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    filt1 = bytearray([4])
    for i in range(3):
        a = rows[1][i - 1] if i else 0
        c = rows[0][i - 1] if i else 0
        filt1.append((rows[1][i] - paeth(a, rows[0][i], c)) & 0xFF)
    raw += filt1

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    blob = (
        SIGNATURE
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    w, h, _, _, got = decode_gray8(blob)
    assert (w, h) == (3, 2)
    assert got == rows[0] + rows[1]


def test_png_crc_corruption_raises():
    blob = bytearray(encode_gray8(4, 4, bytes(16)))
    # flip a byte inside the IDAT body (after sig+IHDR chunk: 8 + 25 = 33,
    # IDAT starts there; body begins at +8)
    blob[33 + 10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_gray8(bytes(blob))


def test_png_bad_signature_and_unsupported_color():
    with pytest.raises(ValueError, match="signature"):
        decode_gray8(b"not a png at all")
    # RGB color type must be rejected, not silently misparsed
    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    rgb = SIGNATURE + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
    with pytest.raises(ValueError, match="grayscale"):
        decode_gray8(rgb)


def test_attach_and_decode_png_roundtrip_spark(spark):
    from text_to_graph_spark.operators.multimodal import (
        attach_png_payload,
        decode_png_metadata,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(40)
    meta = {
        r["doc_id"]: r
        for r in decode_png_metadata(attach_png_payload(docs)).collect()
    }
    for d in docs.collect():
        r = meta[d["doc_id"]]
        w = 8 + len(d["text"].encode("utf-8")) % 24
        h = 8 + d["doc_id"] % 16
        assert (r["width"], r["height"]) == (w, h)
        assert (r["bit_depth"], r["color_type"]) == (8, 0)
        assert r["n_raw"] == h * (w + 1)
        assert r["pixel_sum"] == sum(_pixels(d["doc_id"], w, h))


def test_demux_frame_headers_real_container(spark):
    """Demux must parse the T2GV index and read each REAL frame's IHDR:
    dimensions follow the generation rule for every frame, and a corrupt
    frame is reported (is_png=false), not decoded or crashed on."""
    from text_to_graph_spark.kit.video import encode_container
    from text_to_graph_spark.operators.multimodal import (
        attach_video_payload,
        demux_frame_headers,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(10)
    rows = demux_frame_headers(attach_video_payload(docs)).collect()
    assert len(rows) == 40  # 4 frames per doc
    for r in rows:
        assert r["is_png"]
        assert r["width"] == 8 + r["doc_id"] % 8
        assert r["height"] == 8 + (r["doc_id"] // 3) % 8
    bad = spark.createDataFrame(
        [(99, bytearray(encode_container([b"not-a-png-frame"])))],
        "doc_id long, payload binary",
    )
    got = demux_frame_headers(bad).collect()
    assert len(got) == 1
    assert not got[0]["is_png"] and got[0]["width"] == 0


def test_pixel_histogram_is_over_decoded_pixels(spark):
    """The feature histogram must come from the DECODED pixel lattice:
    totals equal width*height (not payload byte counts), and per-bucket
    counts match the generation rule replayed in python."""
    from text_to_graph_spark.operators.multimodal import (
        attach_png_payload,
        pixel_histogram_features,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(10)
    feats = pixel_histogram_features(attach_png_payload(docs)).collect()
    texts = {d["doc_id"]: d["text"] for d in docs.collect()}
    per_doc: dict = {}
    got: dict = {}
    for r in feats:
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n"]
        got[(r["doc_id"], r["bucket"])] = r["n"]
    for doc_id, text in texts.items():
        w = 8 + len(text.encode("utf-8")) % 24
        h = 8 + doc_id % 16
        assert per_doc[doc_id] == w * h
        want: dict = {}
        for rr in range(h):
            for cc in range(w):
                b = (doc_id * 31 + rr * 7 + cc * 13) % 256 % 16
                want[b] = want.get(b, 0) + 1
        for b, n in want.items():
            assert got[(doc_id, b)] == n


def test_wav_roundtrip_and_validation():
    from text_to_graph_spark.kit.wav import decode_wav_pcm16, encode_wav_pcm16

    samples = [((42 * 13 + i * 7) % 2048) - 1024 for i in range(100)]
    blob = encode_wav_pcm16(8000, samples)
    rate, ch, bits, n, raw = decode_wav_pcm16(blob)
    assert (rate, ch, bits, n) == (8000, 1, 16, 100)
    got = list(struct.unpack("<100h", raw))
    assert got == samples
    # corrupted envelope size must be rejected
    with pytest.raises(ValueError, match="RIFF size"):
        decode_wav_pcm16(blob + b"x")
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav_pcm16(b"nope" + blob[4:])
    # unknown chunks are skipped (real parsers must): splice a junk chunk
    # between fmt and data
    head, data_at = blob[:12], blob.index(b"data")
    spliced = (
        blob[:data_at]
        + b"LIST" + struct.pack("<I", 4) + b"junk"
        + blob[data_at:]
    )
    spliced = b"RIFF" + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    assert decode_wav_pcm16(spliced)[3] == 100


def test_attach_and_decode_wav_roundtrip_spark(spark):
    from text_to_graph_spark.operators.multimodal import (
        attach_wav_payload,
        decode_wav_metadata,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(30)
    meta = {
        r["doc_id"]: r
        for r in decode_wav_metadata(attach_wav_payload(docs)).collect()
    }
    for d in docs.collect():
        r = meta[d["doc_id"]]
        n = 64 + d["doc_id"] % 256
        assert (r["sample_rate"], r["n_channels"], r["bits"]) == (8000, 1, 16)
        assert r["n_samples"] == n
        assert r["duration_us"] == n * 1_000_000 // 8000
        assert r["abs_sum"] == sum(
            abs(((d["doc_id"] * 13 + i * 7) % 2048) - 1024) for i in range(n)
        )


def test_t2gv_container_roundtrip_and_validation():
    from text_to_graph_spark.kit.video import (
        decode_container,
        encode_container,
    )

    frames = [b"frame-zero", b"", b"frame-two-longer"]
    blob = encode_container(frames)
    assert decode_container(blob) == frames
    with pytest.raises(ValueError, match="magic"):
        decode_container(b"XXXX" + blob[4:])
    with pytest.raises(ValueError, match="trailing"):
        decode_container(blob + b"junk")
    # corrupt the first frame's offset in the index -> gap detected
    bad = bytearray(blob)
    bad[8 + 3] ^= 0x01
    with pytest.raises(ValueError, match="gap|region|truncated"):
        decode_container(bytes(bad))


def test_attach_and_sample_video_frames_spark(spark):
    from text_to_graph_spark.operators.multimodal import (
        attach_video_payload,
        sample_video_frames,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(20)
    got = sample_video_frames(
        attach_video_payload(docs, n_frames=4), stride=2
    ).collect()
    by_key = {(r["doc_id"], r["frame_index"]): r for r in got}
    for d in docs.collect():
        did = d["doc_id"]
        w, h = 8 + did % 8, 8 + (did // 3) % 8
        for f in (0, 2):  # stride 2 over 4 frames
            r = by_key[(did, f)]
            assert (r["width"], r["height"]) == (w, h)
            exp = sum(
                (did * 31 + f * 17 + rr * 7 + cc * 13) % 256
                for rr in range(h)
                for cc in range(w)
            )
            assert r["pixel_sum"] == exp
        assert (did, 1) not in by_key and (did, 3) not in by_key


def test_resize_thumbs_match_numpy_reference(spark):
    import numpy as np

    from text_to_graph_spark.operators.multimodal import (
        attach_png_payload,
        resize_gray8_thumbs,
    )

    docs = spark.createDataFrame(
        [(i, "x" * (i * 3 % 40 + 1)) for i in range(24)], "doc_id long, text string"
    )
    out = {
        r.doc_id: r
        for r in resize_gray8_thumbs(attach_png_payload(docs), 8, 8).collect()
    }
    assert len(out) == 24
    for i in range(24):
        text = "x" * (i * 3 % 40 + 1)
        w = 8 + len(text.encode()) % 24
        h = 8 + i % 16
        img = (
            i * 31
            + 7 * np.arange(h, dtype=np.int64)[:, None]
            + 13 * np.arange(w, dtype=np.int64)[None, :]
        ) % 256
        rr = (np.arange(8, dtype=np.int64) * h) // 8
        cc = (np.arange(8, dtype=np.int64) * w) // 8
        thumb = img[rr][:, cc]
        r = out[i]
        assert (r.width, r.height, r.thumb_w, r.thumb_h) == (w, h, 8, 8)
        # the sum is over genuinely decoded-and-resampled pixels
        assert r.thumb_sum == int(thumb.sum())
        # re-encoded thumbnail PNG decodes back byte-identically
        assert r.reencode_ok


def test_resize_identity_when_already_target_size(spark):
    from text_to_graph_spark.operators.multimodal import (
        attach_png_payload,
        decode_png_metadata,
        resize_gray8_thumbs,
    )

    # width = 8 + len(text) % 24 = 8 and height = 8 + doc_id % 16 = 8:
    # an 8x8 source resized to 8x8 must keep the exact pixel sum
    docs = spark.createDataFrame([(0, "y" * 24)], "doc_id long, text string")
    media = attach_png_payload(docs)
    meta = decode_png_metadata(media).collect()[0]
    thumb = resize_gray8_thumbs(media, 8, 8).collect()[0]
    assert (meta.width, meta.height) == (8, 8)
    assert thumb.thumb_sum == meta.pixel_sum


def test_wav_energy_matches_direct_sample_math(spark):
    """Energy/peak/RMS computed from the DECODED stream must equal the
    values computed directly from the generation rule (only a real RIFF
    parse + int16 decode can agree)."""
    import math

    from text_to_graph_spark.operators.multimodal import (
        attach_wav_payload,
        wav_energy,
    )

    docs = spark.createDataFrame(
        [(i, "x") for i in (0, 1, 7, 255)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_samples, r.sum_sq, r.peak_abs, r.rms_e3)
        for r in wav_energy(attach_wav_payload(docs)).collect()
    }
    for d in (0, 1, 7, 255):
        n = 64 + d % 256
        s = [((d * 13 + i * 7) % 2048) - 1024 for i in range(n)]
        sum_sq = sum(v * v for v in s)
        want = (
            n,
            sum_sq,
            max(abs(v) for v in s),
            int(math.floor(math.sqrt(sum_sq / n) * 1000)),
        )
        assert got[d] == want, d


def test_dhash_brightness_invariant_and_discriminative(spark):
    """dHash must be invariant to a uniform brightness shift (neighbor
    ORDER is unchanged — the property byte hashing lacks) while
    distinguishing genuinely different patterns, and the group counts
    must reflect the hash buckets exactly."""
    from text_to_graph_spark.kit.png import encode_gray8
    from text_to_graph_spark.operators.multimodal import dhash_dedup_groups

    def png(fn, w=16, h=12):
        px = bytes(fn(r, c) % 256 for r in range(h) for c in range(w))
        return encode_gray8(w, h, px)

    base = lambda r, c: (r * 3 + c * 5) % 200
    media = spark.createDataFrame(
        [
            (1, bytearray(png(base)), "image/png"),
            (2, bytearray(png(lambda r, c: base(r, c) + 20)), "image/png"),
            (3, bytearray(png(lambda r, c: (r * 31) ^ (c * 17))), "image/png"),
        ],
        "doc_id long, payload binary, media_type string",
    )
    got = {
        r.doc_id: (r.dhash, r.n_sharing)
        for r in dhash_dedup_groups(media).collect()
    }
    assert got[1][0] == got[2][0]          # brightness shift: same hash
    assert got[1][0] != got[3][0]          # different pattern: different
    assert got[1][1] == 2 and got[3][1] == 1


def test_audio_fingerprint_gain_invariant_and_discriminative(spark):
    """Doubling every sample (a gain change) must keep the fingerprint
    identical — energies scale uniformly, comparisons survive — while a
    reordered energy profile produces a different code."""
    from text_to_graph_spark.kit.wav import encode_wav_pcm16
    from text_to_graph_spark.operators.multimodal import audio_dedup_groups

    base = [((i * 37) % 997) - 498 for i in range(160)]
    louder = [v * 2 for v in base]
    different = list(reversed(base))
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_wav_pcm16(8000, base)), "audio/wav"),
            (2, bytearray(encode_wav_pcm16(8000, louder)), "audio/wav"),
            (3, bytearray(encode_wav_pcm16(8000, different)), "audio/wav"),
        ],
        "doc_id long, payload binary, media_type string",
    )
    got = {
        r.doc_id: (r.fingerprint, r.n_sharing)
        for r in audio_dedup_groups(media).collect()
    }
    assert got[1][0] == got[2][0]   # gain change: same code
    assert got[1][0] != got[3][0]   # reversed profile: different code
    assert got[1][1] == 2 and got[3][1] == 1


def test_video_fingerprint_majority_survives_one_corrupted_frame(spark):
    """A clip with one frame replaced by noise keeps its majority code
    (3 of 4 frames agree) — the robustness the per-bit majority buys."""
    from text_to_graph_spark.kit.png import encode_gray8
    from text_to_graph_spark.kit.video import encode_container
    from text_to_graph_spark.operators.multimodal import video_dedup_groups

    w, h = 12, 10

    def frame(fn):
        return encode_gray8(
            w, h, bytes(fn(r, c) % 256 for r in range(h) for c in range(w))
        )

    base = lambda r, c: (r * 5 + c * 11) % 240
    noise = lambda r, c: ((r * 31) ^ (c * 17)) * 7
    clean = [frame(base)] * 4
    dirty = [frame(base)] * 3 + [frame(noise)]
    media = spark.createDataFrame(
        [
            (1, bytearray(encode_container(clean)), "video/t2gv"),
            (2, bytearray(encode_container(dirty)), "video/t2gv"),
        ],
        "doc_id long, payload binary, media_type string",
    )
    got = {
        r.doc_id: (r.vhash, r.n_sharing)
        for r in video_dedup_groups(media).collect()
    }
    # strict majority (3-1 on every bit) keeps the code identical
    assert got[1][0] == got[2][0]
    assert got[1][1] == 2
