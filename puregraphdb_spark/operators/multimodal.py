"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (driver brief). The Spark-side plumbing — schemas, Arrow batch
flow through mapInPandas, partitioning — is real and tested; the codec
kernels are deterministic fakes behind a clearly marked seam, because
no image/audio libraries exist in this container. A deployment replaces
``_decode_image_bytes`` etc. with Pillow/ffmpeg calls without touching
any Spark code.

Scale posture: decode/feature-extraction is a pure map — mapInPandas
streams Arrow batches through one Python worker per core with zero
shuffles; ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
per-batch memory for fat binary columns. Repartition upstream only to
even out file skew.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

#: Canonical multimodal asset schema: opaque payload + typed metadata.
ASSET_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("modality", StringType(), False),   # image | audio | video
    StructField("media_type", StringType(), True),  # e.g. image/png
    StructField("payload", BinaryType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("duration_ms", LongType(), True),
])

DECODED_IMAGE_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
    StructField("n_pixels", LongType(), True),
    StructField("features", ArrayType(FloatType()), True),
])

FRAME_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("frame_index", IntegerType(), False),
    StructField("ts_ms", LongType(), False),
    StructField("frame_payload", BinaryType(), True),
])


def _decode_image_bytes(payload: bytes, dim: int = 16) -> list[float]:
    """CODEC SEAM — deterministic fake feature vector derived from the
    payload digest. Replace with a real decoder (Pillow → pixel stats /
    model embedding) in deployments; the Spark plumbing around it is
    unchanged. Raises on None to mirror real decoder behavior."""
    if payload is None:
        raise NotImplementedError("no payload: nothing to decode")
    digest = hashlib.sha256(payload).digest()
    return [digest[i % len(digest)] / 255.0 for i in range(dim)]


def decode_images(assets: DataFrame, feature_dim: int = 16) -> DataFrame:
    """Decode image assets into feature vectors via mapInPandas (Arrow
    batches, one Python worker per task — the sanctioned slow path for
    work the JVM can't express)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_bytes(p, feature_dim) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "width": pdf["width"],
                "height": pdf["height"],
                "n_pixels": (
                    pdf["width"].astype("float64") * pdf["height"].astype("float64")
                ).astype("Int64"),
                "features": feats,
            })

    return (
        assets.filter(F.col("modality") == "image")
        .select("asset_id", "payload", "width", "height")
        .mapInPandas(decode, DECODED_IMAGE_SCHEMA)
    )


def sample_frames(assets: DataFrame, every_ms: int = 1000,
                  max_frames: int = 8) -> DataFrame:
    """Frame-sampling plan for video assets: one output row per sampled
    timestamp. Frame extraction itself is the codec seam (payload is
    a deterministic slice here); the explode/partitioning shape is the
    real pipeline's."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # vectorized explode: frames-per-row n, then a repeated row
            # index + per-row frame counter (arange minus each row's
            # offset) — no per-row Python iteration for the metadata.
            dur = pd.to_numeric(pdf["duration_ms"], errors="coerce") \
                .fillna(0).astype("int64").to_numpy()
            n = np.minimum(max_frames, np.maximum(dur // every_ms, 0))
            idx = np.repeat(np.arange(len(pdf)), n)
            fi = (
                np.arange(int(n.sum()), dtype="int64")
                - np.repeat(np.cumsum(n) - n, n)
            )
            # the byte slice is the codec seam (a real decoder replaces
            # it); binary payloads are Python objects, so this one
            # comprehension over OUTPUT rows is irreducible here.
            payloads = pdf["payload"].to_numpy(dtype=object)
            frame_payloads = [
                bytes(payloads[r][i: i + 16])
                if payloads[r] is not None else None
                for r, i in zip(idx.tolist(), fi.tolist())
            ]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"].to_numpy()[idx],
                "frame_index": fi.astype("int32"),
                "ts_ms": fi * every_ms,
                "frame_payload": frame_payloads,
            })

    return (
        assets.filter(F.col("modality") == "video")
        .select("asset_id", "payload", "duration_ms")
        .mapInPandas(sample, FRAME_SCHEMA)
    )


AUDIO_FEATURE_SCHEMA = StructType([
    StructField("asset_id", LongType(), False),
    StructField("n_samples", LongType(), True),
    StructField("rms_energy", FloatType(), True),
    StructField("zero_crossing_rate", FloatType(), True),
    StructField("features", ArrayType(FloatType()), True),
])


def extract_audio_features(assets: DataFrame, feature_dim: int = 16) -> DataFrame:
    """Audio feature extraction over opaque payloads via mapInPandas.

    The byte→sample interpretation (int8 PCM here) is the codec seam —
    a deployment swaps in a real decoder (ffmpeg/soundfile) and keeps
    the frame math. Per-asset features: RMS energy, zero-crossing
    rate, and a fixed-dim block-mean envelope — all numpy-vectorized
    per payload, no Python inner loops. Pure map, zero shuffles.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        def feats(payload):
            if payload is None or len(payload) == 0:
                return None, None, None, None
            # CODEC SEAM: real decoders produce float PCM; the fake
            # interprets raw bytes as int8 samples.
            x = np.frombuffer(payload, dtype=np.int8).astype(np.float32)
            n = x.size
            rms = float(np.sqrt(np.mean(x * x)))
            zcr = float(np.count_nonzero(np.diff(np.signbit(x))) / max(n - 1, 1))
            # block-mean envelope at fixed dim (pad to a multiple)
            pad = (-n) % feature_dim
            env = np.pad(np.abs(x), (0, pad)).reshape(feature_dim, -1).mean(axis=1)
            return n, rms, zcr, env.astype(np.float32).tolist()

        for pdf in batches:
            cols = [feats(p) for p in pdf["payload"]]
            yield pd.DataFrame({
                "asset_id": pdf["asset_id"],
                "n_samples": pd.array([c[0] for c in cols], dtype="Int64"),
                "rms_energy": [c[1] for c in cols],
                "zero_crossing_rate": [c[2] for c in cols],
                "features": [c[3] for c in cols],
            })

    return (
        assets.filter(F.col("modality") == "audio")
        .select("asset_id", "payload")
        .mapInPandas(extract, AUDIO_FEATURE_SCHEMA)
    )


def resize_images(assets: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plan: metadata math JVM-side; the pixel resample is the
    codec seam (payload passed through here)."""
    return (
        assets.filter(F.col("modality") == "image")
        .withColumn("target_width", F.lit(width))
        .withColumn("target_height", F.lit(height))
        .withColumn(
            "scale",
            F.round(F.least(
                F.lit(width) / F.greatest("width", F.lit(1)),
                F.lit(height) / F.greatest("height", F.lit(1)),
            ), 6),
        )
    )


def synthetic_assets(spark, n: int = 64) -> DataFrame:
    """Deterministic in-memory asset table for tests/demos (the
    container ships no media fixtures)."""
    rows = []
    for i in range(n):
        modality = ("image", "audio", "video")[i % 3]
        payload = bytes(hashlib.sha256(str(i).encode()).digest() * 4)
        rows.append((
            i, modality, f"{modality}/x-fake", payload,
            32 + i % 8 if modality == "image" else None,
            24 + i % 8 if modality == "image" else None,
            (i % 7) * 1500 if modality != "image" else None,
        ))
    return spark.createDataFrame(rows, ASSET_SCHEMA)
