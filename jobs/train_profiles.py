"""Profile-training job — the Spark form of the reference's
``--genprofile-text`` / ``--genprofile`` pipelines (MainCommand.java:
145-243): corpus in → trimmed language-profile JSON out (reference
format, loadable by the reference engine unchanged).

    spark-submit --py-files dist/pipeline.zip jobs/train_profiles.py \
        --input <parquet|text> --format parquet --lang-col lang \
        --output profiles_out/ [--no-trim] [--merge-with DIR]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--format", choices=["parquet", "text"], default="parquet")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--lang-col", default="lang",
                    help="label column (parquet); for --format text use --lang")
    ap.add_argument("--lang", default=None, help="language name for text input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--no-trim", action="store_true")
    ap.add_argument("--merge-with", default=None,
                    help="directory of existing profiles to merge (the -u flow)")
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("langdetect-train").getOrCreate()

    from language_detection_spark.models.profile import LangProfile
    from language_detection_spark.models.trainer import merge_profiles, train_profiles

    if args.format == "text":
        if not args.lang:
            raise SystemExit("--lang required for text input")
        docs = spark.read.text(args.input).select(
            F.col("value").alias("text"), F.lit(args.lang).alias("lang")
        )
    else:
        docs = spark.read.parquet(args.input).select(
            F.col(args.text_col).alias("text"), F.col(args.lang_col).alias("lang")
        )

    profiles = train_profiles(spark, docs, "text", "lang", trim=False)
    if args.merge_with:
        base = pathlib.Path(args.merge_with)
        merged = []
        for p in profiles:
            existing = base / p.name
            if existing.is_file():
                p = merge_profiles(LangProfile.load(existing), p)
            merged.append(p)
        profiles = merged
    if not args.no_trim:
        for p in profiles:
            p.omit_less_freq()

    out = pathlib.Path(args.output)
    out.mkdir(parents=True, exist_ok=True)
    for p in profiles:
        p.save(out / p.name)
    print(json.dumps({
        "profiles": {p.name: {"grams": len(p.freq), "n_words": p.n_words}
                     for p in profiles},
        "output": str(out),
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
