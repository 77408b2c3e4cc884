"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via mapInPandas (Arrow batches of bytes).

The decode kernels are STUBS behind `deterministic_fake=True` (the container
ships no image/audio libraries) — but the Spark-side contract is real and
tested: schemas, batch shapes, partitioning, and the UDF signatures match
what a production decode (PIL/torchaudio/ffmpeg) would slot into.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "doc_id long, width int, height int, channels int, format string, sha256 string"
)
IMAGE_FEATURE_SCHEMA = "doc_id long, feature array<float>, feat_dim int"


def decode_image_stub(data: bytes) -> tuple[int, int, int, str]:
    """STUB decode: returns deterministic fake (width,height,channels,format)
    derived from the bytes. Replace with PIL.Image.open in production."""
    if data is None or len(data) == 0:
        raise NotImplementedError("empty payload; real decoder not available")
    h = hashlib.sha256(data).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    return width, height, 3, "fake/deterministic"


def image_metadata(df: DataFrame, id_col: str = "doc_id", bin_col: str = "payload") -> DataFrame:
    """binary column -> typed metadata via mapInPandas (one Arrow batch of
    raw bytes per call; no per-row JVM crossings)."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for i, data in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(data) if data is not None else b""
                try:
                    w, h, c, fmt = decode_image_stub(b)
                except NotImplementedError:
                    w = h = c = 0
                    fmt = "undecodable"
                rows.append(
                    dict(doc_id=int(i), width=w, height=h, channels=c,
                         format=fmt, sha256=hashlib.sha256(b).hexdigest())
                )
            yield pd.DataFrame(rows)

    return df.select(id_col, bin_col).mapInPandas(gen, schema=IMAGE_META_SCHEMA)


def image_features(
    df: DataFrame, dim: int = 16, id_col: str = "doc_id", bin_col: str = "payload"
) -> DataFrame:
    """binary -> fixed-dim feature vector (deterministic fake embedding: the
    first `dim` sha256 bytes scaled to [0,1)). The production swap-in is a
    vision encoder over the same mapInPandas contract."""

    def gen(batches):
        for pdf in batches:
            ids, feats = [], []
            for i, data in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(data) if data is not None else b""
                digest = hashlib.sha256(b).digest()
                vec = np.frombuffer((digest * ((dim // 32) + 1))[:dim], dtype=np.uint8)
                ids.append(int(i))
                feats.append((vec.astype(np.float32) / 255.0).tolist())
            yield pd.DataFrame(
                {"doc_id": ids, "feature": feats, "feat_dim": [dim] * len(ids)}
            )

    return df.select(id_col, bin_col).mapInPandas(gen, schema=IMAGE_FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 30, id_col: str = "doc_id") -> DataFrame:
    """Video frame-sampling plumbing: emits (doc_id, frame_idx) rows for a
    deterministic fake frame count derived from payload size; the decode of
    each frame is the NotImplementedError stub boundary."""
    n_frames = (F.length(F.col("payload")) / 1000).cast("int") + 1
    return df.select(
        id_col,
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_frames - 1),
                lambda i: i,
            )
        ).alias("frame_idx"),
    ).filter(F.col("frame_idx") % every_n == 0)
