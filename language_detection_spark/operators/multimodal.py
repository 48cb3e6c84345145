"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, plus the Spark-side plumbing (schema, partitioning, Arrow
batch shapes) for decode / feature-extract / resize / frame-sample.

The actual media codecs are NOT available in this environment, so the
decode step is stubbed: ``decode_media`` raises ``NotImplementedError``
unless ``fake=True``, in which case a clearly-marked deterministic fake
decoder (seeded from the payload bytes) produces stable pseudo-content.
Everything around the stub — column schemas, mapInPandas signatures,
batched numpy feature math, partition behavior — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),           # image | audio | video
        StructField("payload", BinaryType()),        # opaque encoded bytes
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("byte_mean", DoubleType()),
        StructField("byte_hist", ArrayType(LongType())),   # 8 buckets
        StructField("feature", ArrayType(DoubleType())),   # 16-dim embedding
    ]
)


def synth_media_df(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (payload = seeded pseudo-bytes)."""
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 13)
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                64 + (i % 8) * 16 if kind != "audio" else None,
                48 + (i % 8) * 16 if kind != "audio" else None,
                16000 if kind == "audio" else None,
                1 if kind == "image" else 25 * (1 + i % 5),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_media(payload: bytes, kind: str, fake: bool = False) -> np.ndarray:
    """Decode encoded media bytes → raw sample array.

    Real decoding needs PIL/ffmpeg/soundfile, none of which exist in this
    container — so the real branch is an explicit stub.  The ``fake=True``
    branch is a DETERMINISTIC FAKE: pseudo-samples seeded from the payload
    digest, stable across runs/machines, used to exercise the pipeline
    plumbing end-to-end.
    """
    if not fake:
        raise NotImplementedError(
            "media codecs are unavailable in this environment; "
            "pass fake=True for the deterministic test decoder"
        )
    digest = hashlib.sha256(bytes(payload)).digest()
    seed = int.from_bytes(digest[:8], "big")
    rng = np.random.Generator(np.random.Philox(key=seed))
    n = 256 if kind == "image" else 1024
    return rng.integers(0, 256, size=n, dtype=np.uint8)


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction: per Arrow batch, decode (stub/fake)
    and compute byte stats + a 16-dim pseudo-embedding.  One Python
    crossing; output schema is fixed (FEATURE_SCHEMA)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {
                "media_id": [], "kind": [], "n_bytes": [],
                "byte_mean": [], "byte_hist": [], "feature": [],
            }
            for mid, kind, payload in zip(
                batch["media_id"], batch["kind"], batch["payload"]
            ):
                raw = decode_media(payload, kind, fake=fake)
                hist = np.bincount(raw >> 5, minlength=8).astype(np.int64)
                feat = raw[: (raw.size // 16) * 16].reshape(-1, 16).mean(axis=0)
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["n_bytes"].append(len(payload))
                out["byte_mean"].append(float(raw.mean()))
                out["byte_hist"].append(hist.tolist())
                out["feature"].append((feat / 255.0).tolist())
            yield pd.DataFrame(out)

    return df.mapInPandas(_extract, FEATURE_SCHEMA)


def resize_image(payload: bytes, width: int, height: int) -> bytes:
    """STUB — requires an image codec; see decode_media."""
    raise NotImplementedError("image resize requires PIL/opencv (not in container)")


def sample_frames(payload: bytes, every_n: int) -> list[bytes]:
    """STUB — requires a video codec; see decode_media."""
    raise NotImplementedError("frame sampling requires ffmpeg (not in container)")
