"""spark-submit entry point for the STREAMING near-dup dedup flow.

    spark-submit --master local[32] --py-files dist/pipeline.zip \
        jobs/run_dedup_stream.py --input '<docs parquet glob>' \
        --output <dir> [--checkpoint <dir>] [--id-col doc_id] \
        [--threshold 0.8] [--threshold-est 0.5] [--max-files-per-trigger N]

Each micro-batch is exact-deduped, in-batch near-deduped (MinHash-LSH),
and probed against the persisted cross-batch signature store; survivors
land in <output>/data/batch_id=*/ and their banded signatures in
<output>/store/.  availableNow-bounded (a backfill run); re-running with
the same --checkpoint resumes from the file-source offset log.  Prints a
one-line JSON summary.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="document parquet DIRECTORY or glob (Spark's "
                    "streaming file source rejects bare file paths)")
    ap.add_argument("--output", required=True,
                    help="output root (data/ + store/)")
    ap.add_argument("--checkpoint", default=None,
                    help="streaming checkpoint dir (default <output>/ckpt)")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--threshold", type=float, default=0.8,
                    help="in-batch exact-Jaccard near-dup threshold")
    ap.add_argument("--threshold-est", type=float, default=0.5,
                    help="store-probe signature-estimated Jaccard threshold")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--store-buckets", type=int, default=16,
                    help="band_hash-prefix partitions per band in the "
                    "signature store (file-pruned store probe); 0 keeps "
                    "the flat band-only layout")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("dedup-stream").getOrCreate()

    from language_detection_spark.streaming.dedup_stream import run_dedup_stream

    # the file source needs an explicit schema: take it from the input
    schema = spark.read.parquet(args.input).schema
    t0 = time.time()
    totals = run_dedup_stream(
        spark,
        args.input,
        schema,
        args.output,
        args.checkpoint or f"{args.output}/ckpt",
        id_col=args.id_col,
        text_col=args.text_col,
        threshold=args.threshold,
        threshold_est=args.threshold_est,
        max_files_per_trigger=args.max_files_per_trigger,
        store_buckets=args.store_buckets or None,
    )
    wall = round(time.time() - t0, 2)
    print(json.dumps({**totals, "wall_sec": wall,
                      "docs_per_sec": round(totals["rows_in"] / wall, 1)
                      if wall else None}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
