"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference operators (BASELINE.json north star). The Spark-side design
is fully real — schemas, partitioning, Arrow batch shapes, UDF signatures —
while the media **decode kernels are deterministic stubs**: the image/audio
libraries are not available in this container, so each kernel either raises
``NotImplementedError`` (default) or produces a clearly-marked deterministic
fake derived from the payload hash (``fake=True``), which keeps the whole
pipeline testable end-to-end.

Scale notes: media payloads are the widest column by orders of magnitude —
every transform here projects only the columns it needs (payload + id), runs
in ``mapInPandas`` so one Arrow batch holds a bounded number of rows
(``spark.sql.execution.arrow.maxRecordsPerBatch`` caps memory per task), and
returns compact features so the wide payload is dropped as early as possible.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType, LongType, StringType, StructField, StructType,
)

#: canonical multimodal record schema: payload + typed metadata
MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType(), False),
    StructField("payload", BinaryType(), True),
    StructField("media_type", StringType(), True),   # image|audio|video
    StructField("mime", StringType(), True),
    StructField("width", LongType(), True),
    StructField("height", LongType(), True),
    StructField("duration_ms", LongType(), True),
])

IMAGE_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, sha256 string, width long, height long, "
    "mean_luma double, embedding array<float>"
)

FRAME_SAMPLE_SCHEMA = (
    "media_id long, frame_index long, frame_ts_ms long, frame_sha256 string"
)


def _fake_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake embedding from the payload digest (stub kernel)."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4],
                        dtype=np.uint32)
    return (raw.astype(np.float64) / np.iinfo(np.uint32).max).astype(np.float32)


def extract_image_features(df: DataFrame, payload_col: str = "payload",
                           id_col: str = "media_id", *,
                           fake: bool = False) -> DataFrame:
    """Decode + feature-extract images via Arrow-batched ``mapInPandas``.

    With ``fake=False`` (default) the decode kernel raises
    ``NotImplementedError`` — the real kernel needs an image library not
    present in this container. ``fake=True`` substitutes a deterministic
    payload-hash-derived feature vector so the distributed plumbing (schema,
    batching, column pruning) is exercised for real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires an image library (e.g. Pillow); "
                    "run with fake=True for the deterministic stub kernel"
                )
            payloads = pdf[payload_col]
            out = pd.DataFrame({
                "media_id": pdf[id_col].astype("int64"),
                "n_bytes": payloads.map(lambda p: len(p or b"")).astype("int64"),
                "sha256": payloads.map(
                    lambda p: hashlib.sha256(p or b"").hexdigest()
                ),
                "width": pd.array([None] * len(pdf), dtype="Int64"),
                "height": pd.array([None] * len(pdf), dtype="Int64"),
                "mean_luma": payloads.map(
                    lambda p: float(np.mean(np.frombuffer(p or b"\x00", dtype=np.uint8)))
                ),
                "embedding": payloads.map(lambda p: _fake_features(p or b"")),
            })
            yield out

    return df.select(id_col, payload_col).mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "media_id long, n_bytes long, duration_ms long, rms double, "
    "zero_crossings long, mfcc_like array<float>"
)


def extract_audio_features(df: DataFrame, payload_col: str = "payload",
                           id_col: str = "media_id",
                           duration_col: str = "duration_ms", *,
                           fake: bool = False) -> DataFrame:
    """Decode + feature-extract audio via Arrow-batched ``mapInPandas``.

    Same stub contract as :func:`extract_image_features`: the real decode
    needs an audio library not present here (``fake=False`` raises
    ``NotImplementedError``); ``fake=True`` treats the payload bytes as a
    crude 8-bit waveform so RMS / zero-crossings / a deterministic
    MFCC-shaped vector exercise the distributed plumbing for real.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires an audio library (e.g. soundfile); "
                    "run with fake=True for the deterministic stub kernel"
                )
            rows = []
            for _, row in pdf.iterrows():
                payload = row[payload_col] or b"\x80"
                wave = (np.frombuffer(payload, dtype=np.uint8)
                        .astype(np.float64) - 128.0) / 128.0
                signs = np.sign(wave)
                rows.append({
                    "media_id": int(row[id_col]),
                    "n_bytes": len(payload),
                    "duration_ms": (int(row[duration_col])
                                    if pd.notna(row[duration_col]) else 0),
                    "rms": float(np.sqrt(np.mean(wave ** 2))),
                    "zero_crossings": int(np.sum(signs[:-1] * signs[1:] < 0)),
                    "mfcc_like": _fake_features(payload, dim=13),
                })
            yield pd.DataFrame(rows, columns=[
                "media_id", "n_bytes", "duration_ms", "rms",
                "zero_crossings", "mfcc_like",
            ])

    return df.select(id_col, payload_col, duration_col).mapInPandas(
        kernel, AUDIO_FEATURES_SCHEMA
    )


def sample_frames(df: DataFrame, every_ms: int = 1000,
                  payload_col: str = "payload", id_col: str = "media_id",
                  duration_col: str = "duration_ms", *,
                  fake: bool = False) -> DataFrame:
    """Sample video frames at a fixed cadence (stubbed decode).

    The row-explosion shape (one output row per sampled frame) and the
    pruned-projection input are the real distributed mechanics; frame bytes
    are stubbed as payload+index digests.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires a media library; run with fake=True"
                )
            rows = []
            for _, row in pdf.iterrows():
                duration = int(row[duration_col] or 0)
                payload = row[payload_col] or b""
                for i, ts in enumerate(range(0, max(duration, 1), every_ms)):
                    rows.append({
                        "media_id": int(row[id_col]),
                        "frame_index": i,
                        "frame_ts_ms": ts,
                        "frame_sha256": hashlib.sha256(
                            payload + str(i).encode()
                        ).hexdigest(),
                    })
            yield pd.DataFrame(rows, columns=[
                "media_id", "frame_index", "frame_ts_ms", "frame_sha256",
            ])

    return df.select(id_col, payload_col, duration_col).mapInPandas(
        kernel, FRAME_SAMPLE_SCHEMA
    )


def synthetic_media_df(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table matching MEDIA_SCHEMA (test aid)."""
    import random

    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        payload = bytes(rnd.getrandbits(8) for _ in range(64))
        mtype = ("image", "audio", "video")[i % 3]
        rows.append((
            i, payload, mtype, f"application/x-{mtype}",
            64 if mtype == "image" else None,
            48 if mtype == "image" else None,
            5000 if mtype != "image" else None,
        ))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
