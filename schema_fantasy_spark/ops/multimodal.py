"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas`` stages.

The container has no decode libraries (PIL/ffmpeg absent), so the decode
kernels are STUBS — clearly marked — behind real, tested Spark plumbing:
output schemas, batch iteration, partition-preserving mapInPandas
signatures, and a deterministic fake feature extractor so the pipeline is
runnable end-to-end today and swap-in-real-decoder later.

Real-decoder swap point: replace ``_decode_image_stub`` /
``_extract_audio_stub`` bodies; every other line stays.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("format", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("phash", T.LongType()),
])

IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.FloatType()), nullable=True),
])

FRAME_SAMPLE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.IntegerType()),
    T.StructField("frame_bytes", T.BinaryType()),
])


def _decode_image_stub(payload: bytes):
    """STUB: real implementation would decode via PIL/libvips and return
    (width, height, format). Deterministic fake from the payload hash so
    plumbing is testable without decode libraries."""
    h = hashlib.sha256(payload).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    fmt = ["jpeg", "png", "webp"][h[2] % 3]
    return width, height, fmt


def image_metadata(df: DataFrame, binary_col: str = "html", id_col: str = "id") -> DataFrame:
    """Decode metadata + perceptual hash per image, Arrow batch at a time.

    mapInPandas keeps partitioning (no shuffle); each batch is one Arrow
    RecordBatch — the decode loop is per-image by necessity (codec calls),
    the transport is vectorized.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widths, heights, fmts, sizes, phashes = [], [], [], [], [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    continue
                payload = bytes(payload)
                w, h, fmt = _decode_image_stub(payload)
                ids.append(i)
                widths.append(w)
                heights.append(h)
                fmts.append(fmt)
                sizes.append(len(payload))
                # STUB perceptual hash: stable 63-bit digest of the payload
                phashes.append(
                    int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") >> 1
                )
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "width": pd.Series(widths, dtype="int32"),
                "height": pd.Series(heights, dtype="int32"),
                "format": pd.Series(fmts, dtype="object"),
                "n_bytes": pd.Series(sizes, dtype="int64"),
                "phash": pd.Series(phashes, dtype="int64"),
            })

    return df.select(id_col, binary_col).mapInPandas(run, IMAGE_META_SCHEMA)


def image_features(
    df: DataFrame, binary_col: str = "html", id_col: str = "id", dim: int = 16
) -> DataFrame:
    """STUB feature extractor: deterministic pseudo-embedding from payload
    bytes (real impl: a vision encoder over decoded pixels). Demonstrates
    the array<float> feature contract + batch shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    ids.append(i)
                    feats.append(None)
                    continue
                digest = hashlib.sha256(bytes(payload)).digest()
                arr = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4],
                                    dtype=np.uint32).astype(np.float32)
                feats.append((arr / np.float32(2**32)).tolist())
                ids.append(i)
            yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                                "feature": pd.Series(feats, dtype="object")})

    return df.select(id_col, binary_col).mapInPandas(run, IMAGE_FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "id",
    every_n: int = 2,
    max_frames: int = 3,
) -> DataFrame:
    """STUB video frame sampler: real impl seeks keyframes via ffmpeg; the
    stub slices the payload into deterministic chunks. Shows the
    one-to-many (doc -> frames) mapInPandas shape."""
    if every_n <= 0:
        raise ValueError("every_n must be positive")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for i, payload in zip(pdf[id_col], pdf[binary_col]):
                if payload is None:
                    continue
                payload = bytes(payload)
                n = min(max_frames, max(len(payload) // (8 * every_n), 1))
                for f in range(n):
                    ids.append(i)
                    idxs.append(f * every_n)
                    start = f * every_n * 8
                    blobs.append(payload[start:start + 8])
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "frame_idx": pd.Series(idxs, dtype="int32"),
                "frame_bytes": pd.Series(blobs, dtype="object"),
            })

    return df.select(id_col, binary_col).mapInPandas(run, FRAME_SAMPLE_SCHEMA)
