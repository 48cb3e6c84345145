"""Batch-test evaluation job — the Spark form of the reference's
``--batchtest`` pipeline (MainCommand.java:322-411): tab-delimited
``lang\\ttext`` corpus → detector → per-language accuracy + confusion +
docs/sec.

    spark-submit [--master local[N]] --py-files dist/pipeline.zip \
        jobs/batchtest.py --input /root/reference/src/test/resources/europarl.18.test \
        [--limit 2000] [--profile-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="lang\\ttext file")
    ap.add_argument("--profile-dir", default=None)
    ap.add_argument("--limit", type=int, default=0)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("langdetect-batchtest").getOrCreate()

    from language_detection_spark.models.factory import load_default_model
    from language_detection_spark.operators.eval import (
        overall_accuracy,
        per_language_accuracy,
    )
    from language_detection_spark.operators.udfs import make_detect_udf

    model = load_default_model(args.profile_dir)
    corpus = (
        spark.read.option("sep", "\t")
        .schema("lang string, text string")
        .csv(args.input)
    )
    if args.limit:
        corpus = corpus.limit(args.limit)
    # the corpus is one small text file (one input split) — spread it over
    # the cluster before the detector stage
    corpus = corpus.repartition(spark.sparkContext.defaultParallelism)
    corpus = corpus.withColumn(
        "url", F.concat(F.lit("line://"), F.monotonically_increasing_id().cast("string"))
    )
    det = make_detect_udf(model, spark)("url", "text")
    pred = corpus.withColumn("_d", det).select(
        "lang", F.col("_d.lang").alias("pred")
    )
    t0 = time.time()
    pred = pred.cache()
    n = pred.count()
    wall = time.time() - t0
    per_lang = {
        r.lang: round(r.accuracy, 4)
        for r in per_language_accuracy(pred, "lang", "pred").collect()
    }
    overall = overall_accuracy(pred, "lang", "pred").first()
    out = {
        "n_docs": n,
        "seconds": round(wall, 2),
        "docs_per_sec": round(n / wall, 1),
        "overall_accuracy": round(overall.accuracy, 4),
        "per_language_accuracy": per_lang,
    }
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
