"""Distributed media-decode benchmark (BENCH/media_codecs.json).

Measures the multimodal path's throughput shape on local[N]: genuine
encoded payloads (BMP / PNG cycling filter types / GIF / baseline JPEG /
WAV) flow through ``extract_features(fake=False)`` — the
mapInPandas + pure-numpy decode pipeline — and through the header-walk
``media_metadata`` probe.  Reported per format so the codec costs are
attributable.  (JPEG entropy decode is LUT-based over pre-split restart
segments since round 5, and since round 6 decodes all streams of an
Arrow batch in lockstep when the batch supplies enough lanes — see
``functions/jpeg.py::decode_jpeg_batch``; the IDCT is a batched BLAS
matmul chain.  libjpeg remains the production swap-in, the Spark
plumbing is unchanged either way.)

Usage: python bench/media_codecs.py [n_rows_per_format]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000

    from pyspark.sql import functions as F

    from language_detection_spark.config import get_spark
    from language_detection_spark.operators.multimodal import (
        extract_features,
        media_metadata,
        synth_real_media_df,
    )

    spark = get_spark("media-codecs-bench")
    # synth_real_media_df cycles 5 formats on i % 5 — n rows per format
    media = synth_real_media_df(spark, n=5 * n).persist()
    total = media.count()
    by_kind = {
        r["fmt"]: r["cnt"]
        for r in media.groupBy(
            (F.col("media_id") % 5).alias("m")
        ).agg(F.count(F.lit(1)).alias("cnt")).select(
            F.element_at(
                F.array(*[F.lit(x) for x in
                          ["bmp", "wav", "png", "gif", "jpeg"]]),
                F.col("m").cast("int") + 1,
            ).alias("fmt"),
            "cnt",
        ).collect()
    }
    legs = {}

    def timed(name, df):
        t0 = time.time()
        out = df.count()
        wall = time.time() - t0
        legs[name] = {
            "rows": out,
            "wall_sec": round(wall, 2),
            "rows_per_sec": round(out / wall, 1),
        }

    # whole-table decode + feature extraction (all five formats mixed)
    timed("decode_features_all", extract_features(media, fake=False))
    # per-format decode legs (cost attribution)
    for mod, fmt in [(0, "bmp"), (2, "png"), (3, "gif"), (4, "jpeg"),
                     (1, "wav")]:
        sub = media.filter(F.col("media_id") % 5 == mod)
        timed(f"decode_{fmt}", extract_features(sub, fake=False))
    # jpeg again with 100-TB-shaped Arrow batches: a real curation job
    # hands each task thousands of rows per batch, which is where the
    # lockstep SIMD-across-streams entropy decode engages (the 32-way
    # split of the small local table leaves ~60 rows/task — below its
    # profitable lane count, so the leg above measures the scalar path).
    # Same payloads x8, still one batch of ~500 rows per task core.
    jpeg8 = (
        media.filter(F.col("media_id") % 5 == 4)
        .withColumn("r", F.explode(F.array(*[F.lit(x) for x in range(8)])))
        .drop("r")
        .repartition(32)
    )
    timed("decode_jpeg_large_batch", extract_features(jpeg8, fake=False))
    # header-walk metadata probe (no pixel decode)
    timed("metadata_probe_all", media_metadata(media))
    media.unpersist()

    # video leg: MJPEG-AVI frame sampling + per-frame decode (decode
    # only every 2nd frame — the curation-pipeline access pattern)
    from language_detection_spark.operators.multimodal import (
        extract_frame_features,
        synth_video_df,
    )

    videos = synth_video_df(spark, n=min(n, 400)).persist()
    n_videos = videos.count()
    t0 = time.time()
    # exploded output: one row per sampled+decoded frame
    sampled = extract_frame_features(videos, every_n=2).count()
    wall = time.time() - t0
    legs["video_frame_sampling"] = {
        "rows": n_videos,
        "frames_decoded": int(sampled),
        "wall_sec": round(wall, 2),
        "rows_per_sec": round(n_videos / wall, 1),
        "frames_per_sec": round(sampled / wall, 1),
    }
    videos.unpersist()

    # single-core A/B on the biggest real photo fixture (skip if absent):
    # scalar loop vs one lockstep batch — the per-core entropy-decode
    # multiplier, free of Spark scheduling noise
    import glob as _glob

    fixtures = sorted(_glob.glob(
        "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/**/*.jpg",
        recursive=True,
    ))
    if fixtures:
        from language_detection_spark.functions.jpeg import (
            decode_jpeg,
            decode_jpeg_batch,
        )

        big = max((open(p, "rb").read() for p in fixtures), key=len)
        k = 256
        t0 = time.time()
        for _ in range(32):
            decode_jpeg(big)
        scalar_rate = 32 / (time.time() - t0)
        t0 = time.time()
        out_px = decode_jpeg_batch([big] * k)
        batch_rate = k / (time.time() - t0)
        assert (out_px[0] == decode_jpeg(big)).all()
        legs["photo_single_core"] = {
            "photo_bytes": len(big),
            "scalar_per_sec": round(scalar_rate, 1),
            "lockstep_batch256_per_sec": round(batch_rate, 1),
            "speedup": round(batch_rate / scalar_rate, 2),
        }

    out = {
        "n_rows": total,
        "rows_per_format": by_kind,
        "cores": int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count(),
        "legs": legs,
        "note": (
            "pure-Python/numpy codecs; JPEG entropy decode is LUT-based "
            "(round 5) and, at curation-job batch sizes, lockstep "
            "SIMD-across-streams over every segment of every image in "
            "the Arrow batch (round 6; IDCT is one BLAS matmul chain) — "
            "libjpeg remains the production swap-in, the mapInPandas "
            "plumbing is identical"
        ),
    }
    spark.stop()
    path = Path(__file__).resolve().parents[1] / "BENCH" / "media_codecs.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
