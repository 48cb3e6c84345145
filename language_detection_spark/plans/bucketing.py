"""Bucketed (co-located) joins: pre-shuffle once at write time, join with
NO Exchange forever after.

At 100 TB the dominant cost of a key join is the shuffle.  If a table is
joined on the same key repeatedly (url joins between crawl snapshots,
doc_id joins between annotation passes), bucketing amortizes that shuffle
into the write: ``bucketBy(k, key)`` hash-partitions files on disk and
records the layout in the catalog, so SortMergeJoin of two tables with the
same bucketing needs no Exchange at all — `assert_no_exchange` in the test
proves it from the physical plan.

Spark requires the catalog (saveAsTable) for bucketed reads; plain
``.parquet(path)`` writes lose the bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 64,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.
    One shuffle now; zero shuffles for every future same-key join."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.format("parquet").saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key."""
    return spark.table(left_table).join(spark.table(right_table), key)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the executed plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "ReusedExchange" not in line
    )
