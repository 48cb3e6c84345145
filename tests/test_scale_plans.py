"""Scale-behavior tests: AQE skew-join splitting under the session config,
and scan widening that must be a no-op on already-wide inputs."""

from pyspark.sql import functions as F

from language_detection_spark.plans.repartition import parallelize_scan


def test_parallelize_scan_widens_narrow_and_skips_wide(spark, tmp_path):
    narrow_path = str(tmp_path / "narrow")
    spark.range(0, 1000).coalesce(1).write.parquet(narrow_path)
    narrow = spark.read.parquet(narrow_path)
    assert narrow.rdd.getNumPartitions() == 1
    widened = parallelize_scan(narrow)
    assert widened.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # already-wide input: no repartition node added (no extra shuffle)
    wide = spark.range(0, 1000).repartition(64)
    assert parallelize_scan(wide) is wide


def test_aqe_splits_skewed_join(spark):
    """The session config (AQE + skew join) actually splits a pathological
    key at runtime: one key holds ~all left rows; after execution the
    adaptive plan marks the sort-merge join as skew-handled."""
    prev = {}
    for k, v in {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }.items():
        prev[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 200_000).select(
            F.when(F.col("id") % 2 == 0, F.lit(7))
            .otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 5000).select(
            F.col("id").alias("k"), F.lit("r").alias("rv")
        )
        # keep the fat pad column THROUGH the join so the skewed key's
        # shuffle partition actually exceeds the skew threshold
        joined = left.join(right, "k").select("k", "pad")
        n = len(joined.collect())   # collect() finalizes THIS frame's
        assert n > 0                # adaptive plan (count() would re-plan)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
