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
    """STUB — requires an image codec; see decode_media.  The real resize
    MATH is `resize_nearest` below (codec-independent); this wrapper only
    lacks the encoded-bytes ↔ pixel-array conversion."""
    raise NotImplementedError("image resize requires PIL/opencv (not in container)")


def sample_frames(payload: bytes, every_n: int) -> list[bytes]:
    """STUB — requires a video codec; see decode_media.  The real sampling
    MATH is `sample_frame_indices` below (codec-independent)."""
    raise NotImplementedError("frame sampling requires ffmpeg (not in container)")


def resize_nearest(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize of an (H, W[, C]) array — the pure-array
    transform a codec-equipped deployment plugs between decode and
    feature extraction.  Vectorized index gather; no per-pixel Python."""
    in_h, in_w = pixels.shape[:2]
    if in_h == 0 or in_w == 0 or out_h <= 0 or out_w <= 0:
        raise ValueError("empty input or non-positive output size")
    rows = np.minimum((np.arange(out_h) * in_h) // out_h, in_h - 1)
    cols = np.minimum((np.arange(out_w) * in_w) // out_w, in_w - 1)
    return pixels[rows[:, None], cols[None, :]]


def sample_frame_indices(n_frames: int, every_n: int, max_frames: int | None = None
                         ) -> np.ndarray:
    """Deterministic frame-sampling schedule: every ``every_n``-th frame,
    optionally capped (uniformly re-thinned) at ``max_frames`` — the
    schedule a video pipeline applies before decoding only those frames."""
    if every_n <= 0:
        raise ValueError("every_n must be positive")
    idx = np.arange(0, n_frames, every_n)
    if max_frames is not None and idx.size > max_frames:
        keep = np.linspace(0, idx.size - 1, max_frames).astype(np.int64)
        idx = idx[keep]
    return idx


def resize_media(df: DataFrame, out_h: int = 32, out_w: int = 32,
                 fake: bool = False) -> DataFrame:
    """mapInPandas resize stage: decode (stub/fake) → reshape to the row's
    (height, width) → `resize_nearest` → flattened pixels + new dims.
    With ``fake=True`` the decode is the deterministic test decoder; the
    Spark plumbing (schema, Arrow batching, per-row dims) and the resize
    math are real either way."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("height", IntegerType()),
            StructField("width", IntegerType()),
            StructField("pixels", ArrayType(IntegerType())),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {"media_id": [], "kind": [], "height": [], "width": [],
                   "pixels": []}
            for mid, kind, payload, w, h in zip(
                batch["media_id"], batch["kind"], batch["payload"],
                batch["width"], batch["height"],
            ):
                if kind != "image" or pd.isna(w) or pd.isna(h):
                    continue
                raw = decode_media(payload, kind, fake=fake)
                # test decoder yields 256 pseudo-bytes; tile to the row's
                # declared dims so the resize runs on real (h, w) geometry
                need = int(h) * int(w)
                px = np.resize(raw, need).reshape(int(h), int(w))
                small = resize_nearest(px, out_h, out_w)
                out["media_id"].append(int(mid))
                out["kind"].append(kind)
                out["height"].append(out_h)
                out["width"].append(out_w)
                out["pixels"].append([int(x) for x in small.ravel()])
            yield pd.DataFrame(out)

    return df.mapInPandas(_resize, out_schema)
