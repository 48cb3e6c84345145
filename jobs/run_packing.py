"""spark-submit entry point for training-sequence packing.

    spark-submit --master local[32] --py-files dist/pipeline.zip \
        jobs/run_packing.py --input <documents parquet> --output <dir> \
        [--mode chunk|ffd] [--seq-len 256] [--n-shards 8] \
        [--id-col doc_id] [--text-col text]

``--mode chunk`` (default) emits the GPT-style concat-and-chunk slice
table (``pack_sequences``); ``--mode ffd`` emits the no-split
first-fit-decreasing bin assignment (``pack_documents``).  Output is
written partitioned by shard — one directory per independent packing
stream, the unit a trainer shards on — plus a one-line JSON summary on
stdout (sequence/bin counts, fill factor, oversize count).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True)
    ap.add_argument("--mode", choices=("chunk", "ffd"), default="chunk")
    ap.add_argument("--seq-len", type=int, default=256)
    ap.add_argument("--n-shards", type=int, default=8)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName(f"packing-{args.mode}").getOrCreate()

    from language_detection_spark.operators.packing import (
        pack_documents,
        pack_sequences,
    )

    docs = spark.read.parquet(args.input)
    t0 = time.time()
    if args.mode == "chunk":
        out = pack_sequences(
            docs, seq_len=args.seq_len, n_shards=args.n_shards,
            id_col=args.id_col, text_col=args.text_col,
        )
        unit = "seq_id"
    else:
        out = pack_documents(
            docs, seq_len=args.seq_len, n_shards=args.n_shards,
            id_col=args.id_col, text_col=args.text_col,
        )
        unit = "bin_id"
    out.write.mode("overwrite").partitionBy("shard").parquet(args.output)

    written = spark.read.parquet(args.output)
    units = written.groupBy("shard", unit).agg(
        (
            F.sum(F.col("seq_end") - F.col("seq_start"))
            if args.mode == "chunk" else F.sum("n_tokens")
        ).alias("fill")
    )
    agg = units.agg(
        F.count(F.lit(1)).alias("n_units"),
        F.avg("fill").alias("avg_fill"),
    ).collect()[0]
    summary = {
        "mode": args.mode,
        "seq_len": args.seq_len,
        "n_shards": args.n_shards,
        "rows": written.count(),
        ("n_sequences" if args.mode == "chunk" else "n_bins"):
            int(agg.n_units),
        "avg_fill": round(float(agg.avg_fill), 2),
        "fill_factor": round(float(agg.avg_fill) / args.seq_len, 4),
        "secs": round(time.time() - t0, 2),
    }
    if args.mode == "ffd":
        summary["n_oversize"] = written.filter("oversize").count()
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    sys.exit(main())
