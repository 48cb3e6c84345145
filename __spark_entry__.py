"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship quality-filter pipeline on sf0.001;
``queries()``/``oracle_sql()`` expose the operator registry from
``language_detection_spark.queries``.  EVERY query carries a DuckDB
oracle: independently re-derived SQL where the semantics are
SQL-expressible, pinned VALUES snapshots (tools/gen_snapshots.py) for the
deterministic model-driven queries, and lazily-built literal-baked SQL
for data-dependent index structures (IVF centroids, LSH planes).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from language_detection_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: synthetic pages → langid + quality rules + scrub →
    per-rule keep/drop audit summary (one row, stable schema)."""
    return _q.queries()["pipeline_keep_drop"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
