"""Whole-file text source (S6 in SURVEY.md §2.1).

Semantics source: the reference's --detectlang CLI reads each file as ONE
document and detects its language (MainCommand.java:288-307, one
Detector.append per file).  Spark form: ``spark.read.text(wholetext=True)``
— one row per file, the path attached via ``input_file_name()`` so results
key by file like the CLI output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_whole_files(spark: SparkSession, path: str) -> DataFrame:
    """(path, text) — one row per file under ``path`` (glob ok).

    At scale this is the right shape for many small files (each file is one
    task input split); giant single files should go through the line or
    pages sources instead — wholetext materializes a file per row.
    """
    return (
        spark.read.text(path, wholetext=True)
        .select(
            F.input_file_name().alias("path"),
            F.col("value").alias("text"),
        )
    )


def detect_files(spark: SparkSession, path: str, model=None) -> DataFrame:
    """The --detectlang CLI as a DataFrame job: one (path, lang, conf) row
    per file (MainCommand.java:288-307)."""
    from ..models.factory import load_default_model
    from ..operators.udfs import make_detect_udf

    model = model or load_default_model()
    files = read_whole_files(spark, path)
    det = make_detect_udf(model, spark)("path", "text")
    return files.withColumn("_d", det).select(
        "path",
        F.col("_d.lang").alias("lang"),
        F.col("_d.lang_conf").alias("lang_conf"),
    )
