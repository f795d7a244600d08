"""Multimodal column plumbing — binary payloads with typed metadata.

Images/audio/video ride through the engine as opaque ``binary`` columns plus
a typed metadata struct. The real decode/feature-extract step needs native
libs not present in this container, so the decoder is a clearly-marked
deterministic STUB — but the Spark-side plumbing (schema, Arrow batch shape,
``mapInPandas`` signature, partition behavior) is real and tested:

- ``attach_payload``: synthesize a binary payload column (utf-8 bytes of the
  text — stand-in for e.g. a JPEG) + media_type.
- ``decode_metadata``: ``mapInPandas`` over (id, payload) -> typed metadata
  rows (n_bytes, sha256, fake width/height derived from the byte length).
  Swap ``_decode_stub`` for a real decoder (PIL/ffmpeg) in production; the
  batch iteration and schema stay identical.
- ``frame_sample``: UDTF-shaped expansion — k deterministic "frames" per
  payload (offset slices), showing the 1->N mapInPandas expansion pattern a
  video pipeline needs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, sha256 string, "
    "width int, height int"
)


def attach_payload(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _decode_stub(payload: bytes) -> tuple[int, str, int, int]:
    """Deterministic fake decoder. A real implementation would be:

        raise NotImplementedError("install pillow/ffmpeg and decode here")

    We return byte-length-derived fake dimensions instead so the plumbing is
    end-to-end testable without native deps.
    """
    n = len(payload)
    return n, hashlib.sha256(payload).hexdigest(), n % 640, n % 480


def decode_metadata(media: DataFrame) -> DataFrame:
    """(doc_id, payload, media_type) -> typed metadata via Arrow batches."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = pdf["payload"].map(_decode_stub)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": decoded.map(lambda t: t[0]),
                    "sha256": decoded.map(lambda t: t[1]),
                    "width": decoded.map(lambda t: t[2]),
                    "height": decoded.map(lambda t: t[3]),
                }
            )

    return media.mapInPandas(_batches, schema=META_SCHEMA)


FRAME_SCHEMA = "doc_id long, frame_index int, frame_sha256 string, n_bytes long"


def frame_sample(media: DataFrame, k: int = 3) -> DataFrame:
    """1->N expansion: k deterministic byte-slice 'frames' per payload."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                for i in range(k):
                    lo = (n * i) // k
                    hi = (n * (i + 1)) // k
                    frame = bytes(payload[lo:hi])
                    rows.append(
                        (doc_id, i, hashlib.sha256(frame).hexdigest(), hi - lo)
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_index", "frame_sha256", "n_bytes"]
            )

    return media.mapInPandas(_batches, schema=FRAME_SCHEMA)


FEATURE_SCHEMA = "doc_id long, bucket int, n bigint"
N_BUCKETS = 16


def byte_histogram_features(media: DataFrame, n_buckets: int = N_BUCKETS) -> DataFrame:
    """Vectorized payload feature extraction: byte-value histogram (mod
    ``n_buckets``) per payload, exploded to (doc_id, bucket, n) rows.

    Stand-in for a real embedding model (CLIP/whisper features) with the
    identical Spark shape: numpy over the Arrow batch — ``frombuffer`` +
    ``bincount``, no per-byte Python — then a 1->N expansion. Counts are
    integers so the contract is bit-exact across engines; empty buckets are
    omitted (sparse form, like a real bag-of-features).
    """
    import numpy as np

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, buckets, counts = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if arr.size == 0:
                    continue
                hist = np.bincount(arr % n_buckets, minlength=n_buckets)
                nz = np.nonzero(hist)[0]
                ids.extend([doc_id] * len(nz))
                buckets.extend(nz.tolist())
                counts.extend(hist[nz].tolist())
            yield pd.DataFrame({"doc_id": ids, "bucket": buckets, "n": counts})

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)
