"""Evaluation aggregations — the reference's only relational queries
(E1-E3 in SURVEY.md §2.6; MainCommand.java:322-411 --batchtest report).

Pure DataFrame aggregations: partial+final hash agg, one small shuffle.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def confusion_counts(df: DataFrame, true_col: str = "lang",
                     pred_col: str = "pred") -> DataFrame:
    """E1: counts per (true, predicted) pair (MainCommand.java:351-389)."""
    return (
        df.groupBy(F.col(true_col).alias("lang"), F.col(pred_col).alias("pred"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "pred")
    )


def confusion_matrix(df: DataFrame, true_col: str = "lang",
                     pred_col: str = "pred") -> DataFrame:
    """E1 pivoted to a wide matrix (small: n_langs × n_langs)."""
    return (
        df.groupBy(F.col(true_col).alias("lang"))
        .pivot(pred_col)
        .count()
        .na.fill(0)
        .orderBy("lang")
    )


def per_language_accuracy(df: DataFrame, true_col: str = "lang",
                          pred_col: str = "pred") -> DataFrame:
    """E2: per-language accuracy, ordered by language
    (MainCommand.java:368-403)."""
    return (
        df.groupBy(F.col(true_col).alias("lang"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg((F.col(true_col) == F.col(pred_col)).cast("double")).alias(
                "accuracy"
            ),
        )
        .orderBy("lang")
    )


def overall_accuracy(df: DataFrame, true_col: str = "lang",
                     pred_col: str = "pred") -> DataFrame:
    return df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg((F.col(true_col) == F.col(pred_col)).cast("double")).alias("accuracy"),
    )


def throughput(df: DataFrame, action=lambda d: d.count()) -> dict:
    """E3 harness shape (EvaluateQuality.java:14-38): rows + wall-clock →
    docs/sec around a real action."""
    t0 = time.time()
    n = action(df)
    dt = time.time() - t0
    return {"rows": n, "seconds": dt, "docs_per_sec": (n / dt if dt > 0 else None)}
