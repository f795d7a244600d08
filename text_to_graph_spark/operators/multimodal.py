"""Multimodal column plumbing — binary payloads with typed metadata.

Images/audio/video ride through the engine as opaque ``binary`` columns plus
a typed metadata struct, decoded inside Arrow-batched ``mapInPandas``.

The IMAGE path is REAL: ``attach_png_payload`` synthesizes a genuine
grayscale PNG per document (stdlib zlib/struct, see ``kit/png.py``) and
``decode_png_metadata`` fully decodes it — signature, per-chunk CRC32
verification, IHDR parse, zlib inflate, scanline unfiltering — before
emitting typed metadata including a checksum over the DECODED pixels. The
oracle recomputes width/height/pixel_sum from the generation rule, so a
decoder that skipped CRC, inflate, or unfiltering would mismatch.

The AUDIO and VIDEO paths are equally real: RIFF/WAVE PCM16 parsing
(``kit/wav.py``) and a T2GV container of genuine PNG frames
(``kit/video.py``) with demux (``demux_frame_headers``), stride-sampled
full decode (``sample_video_frames``), and per-modality near-dup
fingerprints. Compressed codecs (JPEG/MP3/H.264) need native libs not in
this container; each decoder's docstring marks the exact PIL/ffmpeg swap
point behind the same ``mapInPandas`` contract — the batch iteration,
schema, and plan shape are production-true as-is.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from text_to_graph_spark.kit.png import decode_gray8, encode_gray8

META_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, sha256 string, "
    "width int, height int"
)


def attach_png_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Synthesize a REAL grayscale PNG per document (deterministic, stdlib).

    width = 8 + (utf-8 byte length of text) % 24, height = 8 + doc_id % 16,
    pixel(r, c) = (doc_id*31 + r*7 + c*13) % 256 — a rule the DuckDB oracle
    can recompute arithmetically, while the Spark side must actually DECODE
    the bytes to recover it. Scanlines alternate PNG filter types 0/1/2
    (``kit/png.py``), so a header-sniffing fake decoder cannot pass.
    """
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                w = 8 + len(str(text).encode("utf-8")) % 24
                h = 8 + int(doc_id) % 16
                px = (
                    int(doc_id) * 31
                    + 7 * np.arange(h, dtype=np.int64)[:, None]
                    + 13 * np.arange(w, dtype=np.int64)[None, :]
                ) % 256
                payloads.append(encode_gray8(w, h, px.astype(np.uint8).tobytes()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "media_type": "image/png",
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        _batches, schema="doc_id long, payload binary, media_type string"
    )


PNG_META_SCHEMA = (
    "doc_id long, media_type string, width int, height int, bit_depth int, "
    "color_type int, n_raw bigint, pixel_sum bigint"
)


def decode_png_metadata(media: DataFrame) -> DataFrame:
    """(doc_id, payload, media_type) -> REAL decoded PNG metadata.

    Every output value is recovered from the bytes: width/height/bit_depth/
    color_type from IHDR (CRC-verified), n_raw = inflated scanline-stream
    length, pixel_sum = sum over the decoded (unfiltered) pixels. Production
    swaps :func:`~text_to_graph_spark.kit.png.decode_gray8` for PIL behind
    the same batch contract.
    """
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, mt in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                w, h, depth, ctype, px = decode_gray8(bytes(payload))
                rows.append(
                    (
                        doc_id,
                        mt,
                        w,
                        h,
                        depth,
                        ctype,
                        h * (w + 1),
                        int(np.frombuffer(px, dtype=np.uint8).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "width",
                    "height",
                    "bit_depth",
                    "color_type",
                    "n_raw",
                    "pixel_sum",
                ],
            )

    return media.mapInPandas(_batches, schema=PNG_META_SCHEMA)


def attach_wav_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Synthesize a REAL mono PCM16 WAV per document (deterministic,
    stdlib). sample_rate = 8000, n_samples = 64 + doc_id % 256,
    sample(i) = ((doc_id*13 + i*7) % 2048) - 1024 — a rule the oracle
    recomputes arithmetically while the Spark side must parse the RIFF
    envelope and decode the int16 stream to recover it."""
    import numpy as np

    from text_to_graph_spark.kit.wav import encode_wav_pcm16

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                n = 64 + int(doc_id) % 256
                s = (
                    (int(doc_id) * 13 + 7 * np.arange(n, dtype=np.int64)) % 2048
                ) - 1024
                payloads.append(encode_wav_pcm16(8000, s.tolist()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "media_type": "audio/wav",
                }
            )

    return docs.select(id_col).mapInPandas(
        _batches, schema="doc_id long, payload binary, media_type string"
    )


WAV_META_SCHEMA = (
    "doc_id long, media_type string, sample_rate int, n_channels int, "
    "bits int, n_samples bigint, duration_us bigint, abs_sum bigint"
)


def decode_wav_metadata(media: DataFrame) -> DataFrame:
    """(doc_id, payload, media_type) -> REAL decoded WAV metadata: format
    fields from the parsed fmt chunk, duration from the decoded sample
    count, abs_sum over the decoded int16 samples (numpy over the Arrow
    batch). Production swaps the stdlib parser for ffmpeg behind the same
    contract."""
    import numpy as np

    from text_to_graph_spark.kit.wav import decode_wav_pcm16

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload, mt in zip(
                pdf["doc_id"], pdf["payload"], pdf["media_type"]
            ):
                rate, ch, bits, n, raw = decode_wav_pcm16(bytes(payload))
                s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                rows.append(
                    (
                        doc_id,
                        mt,
                        rate,
                        ch,
                        bits,
                        n,
                        n * 1_000_000 // rate,
                        int(np.abs(s).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "media_type",
                    "sample_rate",
                    "n_channels",
                    "bits",
                    "n_samples",
                    "duration_us",
                    "abs_sum",
                ],
            )

    return media.mapInPandas(_batches, schema=WAV_META_SCHEMA)


def attach_video_payload(
    docs: DataFrame, id_col: str = "doc_id", n_frames: int = 4
) -> DataFrame:
    """Synthesize a REAL T2GV video container per document: ``n_frames``
    genuine grayscale PNG frames (w = 8 + doc_id % 8, h = 8 +
    (doc_id DIV 3) % 8, pixel(f, r, c) = (doc_id*31 + f*17 + r*7 + c*13)
    % 256) behind an offset index the decoder must validate."""
    import numpy as np

    from text_to_graph_spark.kit.video import encode_container

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for doc_id in pdf[id_col]:
                did = int(doc_id)
                w, h = 8 + did % 8, 8 + (did // 3) % 8
                frames = []
                for f in range(n_frames):
                    px = (
                        did * 31
                        + f * 17
                        + 7 * np.arange(h, dtype=np.int64)[:, None]
                        + 13 * np.arange(w, dtype=np.int64)[None, :]
                    ) % 256
                    frames.append(encode_gray8(w, h, px.astype(np.uint8).tobytes()))
                payloads.append(encode_container(frames))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "media_type": "video/t2gv",
                }
            )

    return docs.select(id_col).mapInPandas(
        _batches, schema="doc_id long, payload binary, media_type string"
    )


VIDEO_FRAME_SCHEMA = (
    "doc_id long, frame_index int, width int, height int, pixel_sum bigint"
)


def sample_video_frames(media: DataFrame, stride: int = 2) -> DataFrame:
    """Demux + stride-sample + decode: every ``stride``-th frame of each
    container is extracted (index-validated) and FULLY PNG-decoded; output
    rows carry per-frame dimensions and a checksum over the decoded pixels.
    The real-video shape: 1->N expansion inside one Arrow batch pass, the
    frame decode vectorized per payload — swap the T2GV demux + PNG decode
    for ffmpeg in production, the Spark contract is unchanged."""
    import numpy as np

    from text_to_graph_spark.kit.video import decode_container

    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_container(bytes(payload))
                for f in range(0, len(frames), stride):
                    w, h, _, _, px = decode_gray8(frames[f])
                    rows.append(
                        (
                            doc_id,
                            f,
                            w,
                            h,
                            int(np.frombuffer(px, dtype=np.uint8).sum()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_index", "width", "height", "pixel_sum"],
            )

    return media.mapInPandas(_batches, schema=VIDEO_FRAME_SCHEMA)


FEATURE_SCHEMA = "doc_id long, bucket int, n bigint"
N_BUCKETS = 16


def pixel_histogram_features(
    media: DataFrame, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """Bag-of-features over DECODED image pixels: full PNG decode
    (CRC verify + inflate + unfilter, ``kit/png.py``), then a value
    histogram (mod ``n_buckets``) of the actual pixel lattice, exploded
    to (doc_id, bucket, n) rows — the stand-in for a real embedding model
    (CLIP-style features) with the identical Spark shape: numpy over the
    Arrow batch (``frombuffer`` + ``bincount``, no per-pixel Python),
    then a 1->N expansion. Counts are integers so the contract is
    bit-exact; empty buckets are omitted (sparse form). A header-sniffing
    fake decoder cannot produce these counts — they exist only in the
    decoded pixels.
    """
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, buckets, counts = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _w, _h, _d, _ct, px = decode_gray8(bytes(payload))
                arr = np.frombuffer(px, dtype=np.uint8)
                if arr.size == 0:
                    continue
                hist = np.bincount(arr % n_buckets, minlength=n_buckets)
                nz = np.nonzero(hist)[0]
                ids.extend([doc_id] * len(nz))
                buckets.extend(nz.tolist())
                counts.extend(hist[nz].tolist())
            yield pd.DataFrame({"doc_id": ids, "bucket": buckets, "n": counts})

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)


DEMUX_SCHEMA = (
    "doc_id long, frame_index int, is_png boolean, width int, height int"
)


def demux_frame_headers(media: DataFrame) -> DataFrame:
    """Container DEMUX without full decode — the cheap first pass a video
    pipeline runs before deciding which frames to decode: parse the T2GV
    index (``kit/video.py``), slice each REAL frame payload out of the
    container, and validate only its header — PNG signature check plus a
    length-verified IHDR width/height read. 1->N ``mapInPandas``
    expansion, one output row per frame.

    Complements :func:`sample_video_frames` (which fully decodes a frame
    subset): demux touches every frame but only its first bytes, so at
    100 TB the two passes differ by the inflate cost — exactly the
    planner's frame-triage split. Output: (doc_id, frame_index, is_png,
    width, height); a corrupt or non-PNG frame reports is_png=false and
    zero dimensions rather than failing the batch.
    """
    import struct as _struct

    from text_to_graph_spark.kit.video import decode_container

    sig = b"\x89PNG\r\n\x1a\n"

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, frame in enumerate(decode_container(bytes(payload))):
                    ok = (
                        len(frame) >= 24
                        and frame[:8] == sig
                        and frame[12:16] == b"IHDR"
                    )
                    if ok:
                        w, h = _struct.unpack(">II", frame[16:24])
                        rows.append((doc_id, i, True, w, h))
                    else:
                        rows.append((doc_id, i, False, 0, 0))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_index", "is_png", "width", "height"],
            )

    return media.mapInPandas(_batches, schema=DEMUX_SCHEMA)


THUMB_SCHEMA = (
    "doc_id long, width int, height int, thumb_w int, thumb_h int, "
    "thumb_sum bigint, reencode_ok boolean"
)


def resize_gray8_thumbs(
    media: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """REAL nearest-neighbor thumbnailing over decoded PNG pixels — the
    resize stage of an image-curation pipeline (dedupe thumbs, train-time
    downsamples), batch-shaped like production: one Arrow batch in, one
    decoded-transform-reencoded batch out, no per-row Python boundary.

    Decode (CRC verify + inflate + unfilter, ``kit/png.py``), sample
    src_r = r*height DIV out_h, src_c = c*width DIV out_w (the standard
    floor-mapping nearest neighbor), re-encode the thumbnail as a real
    PNG and decode it back — ``reencode_ok`` pins the bytes-level
    roundtrip. ``thumb_sum`` sums the RESIZED pixels, so the oracle's
    arithmetic recomputation of the generation rule only matches an
    implementation that truly decoded and resampled (a header-sniffing
    fake has no access to the pixel lattice).

    Production swaps the codec for PIL/libvips behind the same
    ``mapInPandas`` contract; the plan shape (pure 1:1 projection,
    parallel by input split, zero shuffle) is unchanged at 100 TB.
    """
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _depth, _ctype, px = decode_gray8(bytes(payload))
                img = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                rr = (np.arange(out_h, dtype=np.int64) * h) // out_h
                cc = (np.arange(out_w, dtype=np.int64) * w) // out_w
                thumb = img[rr][:, cc]
                tbytes = thumb.astype(np.uint8).tobytes()
                enc = encode_gray8(out_w, out_h, tbytes)
                rw, rh, _, _, rpx = decode_gray8(enc)
                ok = rw == out_w and rh == out_h and rpx == tbytes
                rows.append(
                    (
                        int(doc_id),
                        w,
                        h,
                        out_w,
                        out_h,
                        int(thumb.sum(dtype=np.int64)),
                        bool(ok),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "width",
                    "height",
                    "thumb_w",
                    "thumb_h",
                    "thumb_sum",
                    "reencode_ok",
                ],
            )

    return media.mapInPandas(_batches, schema=THUMB_SCHEMA)


WAV_ENERGY_SCHEMA = (
    "doc_id long, n_samples bigint, sum_sq bigint, peak_abs bigint, "
    "rms_e3 bigint"
)


def wav_energy(media: DataFrame) -> DataFrame:
    """Loudness features over the REAL decoded PCM16 stream — the audio
    twin of the byte-histogram image features: exact integer sum of
    squares and peak amplitude, plus RMS in milli-units
    (``floor(sqrt(sum_sq / n) * 1000)`` — exact-integer inputs keep the
    double sqrt bit-identical across engines). The energy/peak pair is
    the standard clip-level filter a speech-data pipeline gates on
    (silence and clipping both surface here) before paying for
    transcription.

    Same Arrow batch shape as :func:`decode_wav_metadata`; production
    swaps the stdlib decoder for ffmpeg behind the identical contract.
    """
    import math

    import numpy as np

    from text_to_graph_spark.kit.wav import decode_wav_pcm16

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, _, n, raw = decode_wav_pcm16(bytes(payload))
                s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                sum_sq = int((s * s).sum())
                peak = int(np.abs(s).max()) if n else 0
                rms_e3 = (
                    int(math.floor(math.sqrt(sum_sq / n) * 1000)) if n else 0
                )
                rows.append((doc_id, n, sum_sq, peak, rms_e3))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id",
                    "n_samples",
                    "sum_sq",
                    "peak_abs",
                    "rms_e3",
                ],
            )

    return media.mapInPandas(_batches, schema=WAV_ENERGY_SCHEMA)


DHASH_SCHEMA = "doc_id long, width int, height int, dhash string"


def dhash_images(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) over the REAL decoded pixel
    lattice — the image near-duplicate fingerprint every multimodal
    dataset pipeline runs (resize-, brightness-, and compression-robust,
    unlike byte hashing): nearest-neighbor downsample to a 9x8 grid and
    emit one bit per horizontal neighbor pair (left < right), packed
    row-wise MSB-first into 16 hex chars.

    Same Arrow batch shape as :func:`resize_gray8_thumbs` (pure 1:1
    projection, zero shuffle); equal hashes then bucket images for the
    exact dedup groupBy, and Hamming-banded hashes slot into the SimHash
    banding machinery unchanged — dHash IS a 64-bit SimHash-style code,
    which is why it composes with the existing near-dup family.
    """
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, _depth, _ctype, px = decode_gray8(bytes(payload))
                img = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                rr = (np.arange(8, dtype=np.int64) * h) // 8
                cc = (np.arange(9, dtype=np.int64) * w) // 9
                t = img[rr][:, cc].astype(np.int64)
                bits = (t[:, :8] < t[:, 1:]).astype(np.int64)
                weights = 1 << (7 - np.arange(8, dtype=np.int64))
                row_bytes = (bits * weights).sum(axis=1)
                dhash = "".join(f"{int(b):02x}" for b in row_bytes)
                rows.append((int(doc_id), w, h, dhash))
            yield pd.DataFrame(
                rows, columns=["doc_id", "width", "height", "dhash"]
            )

    return media.mapInPandas(_batches, schema=DHASH_SCHEMA)


def dhash_dedup_groups(media: DataFrame) -> DataFrame:
    """(doc_id, width, height, dhash, n_sharing): each image's perceptual
    hash plus how many corpus images share it — the exact-bucket stage of
    image dedup (one partial-agg'd shuffle on the 8-byte hash; near-dup
    extends via the SimHash Hamming bands)."""
    hashed = dhash_images(media)
    counts = hashed.groupBy("dhash").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sharing")
    )
    return hashed.join(counts, "dhash").select(
        "doc_id", "width", "height", "dhash", "n_sharing"
    )


AUDIO_FP_SCHEMA = (
    "doc_id long, n_samples bigint, fingerprint string"
)


def audio_fingerprint(media: DataFrame, n_frames: int = 16) -> DataFrame:
    """Energy-delta audio fingerprint over the REAL decoded PCM16 stream —
    the audio member of the near-dup family (text: MinHash/SimHash; image:
    dHash): samples bucket into ``n_frames`` equal frames by
    ``frame(j) = j * n_frames DIV n``, each frame's exact integer energy
    (sum of squares) is compared to its successor, and the n_frames-1
    left<right bits pack MSB-first into a hex code. Gain-robust the same
    way dHash is brightness-robust: scaling every sample scales every
    frame energy, preserving strict comparisons.

    Equal codes bucket clips for exact dedup; the bit code slots into the
    SimHash Hamming bands for near-dup, identical to the image path.
    """
    import numpy as np

    from text_to_graph_spark.kit.wav import decode_wav_pcm16

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                _, _, _, n, raw = decode_wav_pcm16(bytes(payload))
                s = np.frombuffer(raw, dtype="<i2").astype(np.int64)
                frames = (np.arange(n, dtype=np.int64) * n_frames) // max(n, 1)
                energy = np.zeros(n_frames, dtype=np.int64)
                np.add.at(energy, frames, s * s)
                bits = (energy[:-1] < energy[1:]).astype(np.int64)
                code = 0
                for b in bits:
                    code = (code << 1) | int(b)
                width = (n_frames - 1 + 3) // 4
                rows.append((int(doc_id), n, format(code, f"0{width}x")))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_samples", "fingerprint"]
            )

    return media.mapInPandas(_batches, schema=AUDIO_FP_SCHEMA)


def audio_dedup_groups(media: DataFrame, n_frames: int = 16) -> DataFrame:
    """(doc_id, n_samples, fingerprint, n_sharing) — fingerprint plus the
    exact-bucket sharing count (one partial-agg'd shuffle on the code)."""
    fp = audio_fingerprint(media, n_frames)
    counts = fp.groupBy("fingerprint").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sharing")
    )
    return fp.join(counts, "fingerprint").select(
        "doc_id", "n_samples", "fingerprint", "n_sharing"
    )


VIDEO_FP_SCHEMA = "doc_id long, n_frames int, vhash string"


def video_fingerprint(media: DataFrame) -> DataFrame:
    """Clip-level video fingerprint — per-frame dHash bits reduced by
    per-bit STRICT MAJORITY across frames (ties to 0), the SimHash-style
    aggregation that makes the code robust to any single corrupted or
    resampled frame while staying 64 bits regardless of clip length.
    Completes the modality symmetry: MinHash/SimHash (text), dHash
    (image), energy-delta (audio), majority-dHash (video).

    Demux validates the container index (``kit/video.py``) and every
    frame is fully PNG-decoded — same honesty bar as the other mm paths.
    """
    import numpy as np

    from text_to_graph_spark.kit.video import decode_container

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = decode_container(bytes(payload))
                acc = np.zeros((8, 8), dtype=np.int64)
                for fb in frames:
                    w, h, _d, _t, px = decode_gray8(fb)
                    img = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                    rr = (np.arange(8, dtype=np.int64) * h) // 8
                    cc = (np.arange(9, dtype=np.int64) * w) // 9
                    t = img[rr][:, cc].astype(np.int64)
                    acc += (t[:, :8] < t[:, 1:]).astype(np.int64)
                maj = (acc * 2 > len(frames)).astype(np.int64)
                weights = 1 << (7 - np.arange(8, dtype=np.int64))
                row_bytes = (maj * weights).sum(axis=1)
                vhash = "".join(f"{int(b):02x}" for b in row_bytes)
                rows.append((int(doc_id), len(frames), vhash))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_frames", "vhash"]
            )

    return media.mapInPandas(_batches, schema=VIDEO_FP_SCHEMA)


def video_dedup_groups(media: DataFrame) -> DataFrame:
    """(doc_id, n_frames, vhash, n_sharing) — the exact-bucket stage of
    video dedup, one partial-agg'd shuffle on the 8-byte code."""
    fp = video_fingerprint(media)
    counts = fp.groupBy("vhash").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sharing")
    )
    return fp.join(counts, "vhash").select(
        "doc_id", "n_frames", "vhash", "n_sharing"
    )
