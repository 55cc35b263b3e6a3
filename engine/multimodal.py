"""Multimodal (binary) column plumbing.

Images/audio/video are opaque ``binary`` columns plus a typed
metadata struct; the Spark-side plumbing — schema, partition-friendly
batch shapes, Arrow UDF signatures — is real and tested, while the
actual codec step is stubbed (no image/audio libraries in this
environment) behind a deterministic fake and a clearly marked
``NotImplementedError`` for the real path.
"""
from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

PAYLOAD_SCHEMA = (
    "doc_id long, payload binary, media_type string, n_bytes int"
)
FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, checksum long, feat array<double>"
)


def attach_payload(documents: DataFrame) -> DataFrame:
    """Model a multimodal table: a binary payload column (here the
    utf-8 encoded text standing in for image bytes) + typed metadata."""
    payload = F.encode("text", "utf-8")
    return documents.select(
        "doc_id",
        payload.alias("payload"),
        F.lit("application/octet-stream").alias("media_type"),
        F.octet_length(payload).alias("n_bytes"),
    )


def decode_real(payload: bytes):  # pragma: no cover - stub by design
    """Real media decode (PIL/librosa/ffmpeg) — unavailable in this
    environment; the Spark plumbing around it is exercised via
    :func:`extract_features`' deterministic fake."""
    raise NotImplementedError(
        "media codecs are not installed in this environment; "
        "use extract_features (deterministic fake) for plumbing tests")


FRAME_SCHEMA = (
    "doc_id long, frame_id int, off int, frame_bytes int, checksum long"
)


def sample_frames(df: DataFrame, frame_bytes: int = 48,
                  stride: int = 32) -> DataFrame:
    """Frame sampling over binary payloads (the video analogue: fixed
    windows at a stride, overlapping when stride < frame_bytes). Pure
    per-row work under mapInPandas — no shuffle; each payload emits
    ceil(n_bytes/stride) frames, the last one truncated. The frame
    content handed to a real decoder is the byte window itself; here
    the per-frame 'decode' is the deterministic byte-sum checksum."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                buf = np.frombuffer(bytes(row.payload), dtype=np.uint8)
                n = len(buf)
                nframes = 0 if n == 0 else (n - 1) // stride + 1
                for k in range(nframes):
                    fr = buf[k * stride:k * stride + frame_bytes]
                    rows.append((row.doc_id, k, k * stride, len(fr),
                                 int(fr.astype(np.int64).sum())))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "frame_id", "off", "frame_bytes",
                         "checksum"])

    return df.mapInPandas(fn, FRAME_SCHEMA)


POOL_SCHEMA = "doc_id long, bucket int, pooled long"


def resize_pool(df: DataFrame, buckets: int = 16) -> DataFrame:
    """The resize step of the multimodal pipeline, on the stubbed
    decode: pool each payload into a fixed number of buckets (the 1-D
    analogue of image downsampling — a real decoder would pool pixel
    blocks the same way). Bucket i covers bytes
    [i·n//B, (i+1)·n//B); the pooled value is the exact byte sum, so
    the operation is integer-deterministic. Narrow mapInPandas, no
    shuffle; payloads shorter than B bytes are skipped (no pixels to
    pool)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                buf = np.frombuffer(bytes(row.payload), dtype=np.uint8)
                n = len(buf)
                if n < buckets:
                    continue
                for i in range(buckets):
                    lo, hi = i * n // buckets, (i + 1) * n // buckets
                    rows.append((row.doc_id, i,
                                 int(buf[lo:hi].astype(np.int64).sum())))
            yield pd.DataFrame(rows, columns=["doc_id", "bucket", "pooled"])

    return df.mapInPandas(fn, POOL_SCHEMA)


def extract_features(df: DataFrame, dim: int = 8) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: Arrow
    batches in, numpy per batch, fixed-width feature vectors out —
    exactly the batch shape a real image decoder would use. The
    'features' are a deterministic fake (byte histogram moments)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                buf = np.frombuffer(bytes(row.payload), dtype=np.uint8)
                # deterministic fake of a decode→pool step
                checksum = int(buf.astype(np.int64).sum())
                feat = [
                    float(buf[k::dim].sum() % 997) for k in range(dim)
                ] if len(buf) else [0.0] * dim
                rows.append((row.doc_id, int(row.n_bytes), checksum, feat))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "checksum", "feat"])

    return df.mapInPandas(fn, FEATURE_SCHEMA)
