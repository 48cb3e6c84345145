"""Bucketed co-located join: zero Exchange in the physical plan."""

import pytest
from pyspark.sql import functions as F

from language_detection_spark.plans.bucketing import (
    bucketed_join,
    exchange_count,
    write_bucketed,
)


def test_bucketed_join_no_exchange(spark, tmp_path):
    # (warehouse dir is a static conf — the session default is used; the
    # managed tables are dropped below, which removes their files)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        docs = spark.range(0, 2000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("text "), F.col("id")).alias("text"),
        )
        anns = spark.range(0, 2000).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).alias("lang_idx"),
        )
        write_bucketed(docs, "b_docs", "doc_id", n_buckets=8)
        write_bucketed(anns, "b_anns", "doc_id", n_buckets=8)
        joined = bucketed_join(spark, "b_docs", "b_anns", "doc_id")
        assert joined.count() == 2000
        n_exchange = exchange_count(joined)
        assert n_exchange == 0, (
            f"bucketed join produced {n_exchange} shuffles:\n"
            + joined._jdf.queryExecution().executedPlan().toString()[:2000]
        )
        # control: the same join on plain (unbucketed) frames DOES shuffle
        control = docs.join(anns, "doc_id")
        assert exchange_count(control) > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_docs")
        spark.sql("DROP TABLE IF EXISTS b_anns")
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
