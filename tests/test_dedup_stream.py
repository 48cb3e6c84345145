"""Streaming dedup with a cross-batch signature store: batch 2's
near-dup of a batch-1 survivor must be dropped via the STORE (no shared
in-memory state), and survivors must match the batch-mode rule."""

from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from language_detection_spark.streaming.dedup_stream import run_dedup_stream

SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to hide from all the hunters"
)
OTHER = (
    "completely different text about databases indexes transactions and "
    "write ahead logging in modern storage engines and systems"
)


def test_dedup_stream_cross_batch(spark, tmp_path):
    in_dir = tmp_path / "in"
    # two files -> two micro-batches with maxFilesPerTrigger=1
    spark.createDataFrame(
        [(0, BASE), (1, BASE), (2, OTHER)], SCHEMA
    ).coalesce(1).write.parquet(str(in_dir / "h1"))
    spark.createDataFrame(
        [(100, BASE.replace("green", "dark")),   # near-dup of stored 0
         (101, "entirely novel content mentioning oceans tides and moons "
               "with gravitational resonance effects in orbital dynamics")],
        SCHEMA,
    ).coalesce(1).write.parquet(str(in_dir / "h2"))

    totals = run_dedup_stream(
        spark,
        f"{in_dir}/*/",
        SCHEMA,
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        threshold=0.5,
        max_files_per_trigger=1,
    )
    assert totals["n_batches"] == 2
    assert totals["rows_in"] == 5

    data = spark.read.parquet(str(tmp_path / "out" / "data"))
    kept = sorted(r["doc_id"] for r in data.select("doc_id").collect())
    # 1 is an exact dup of 0 (in-batch); 100 near-dups stored 0 (store
    # probe); 2 and 101 are novel
    assert kept == [0, 2, 101]
    assert totals["rows_kept"] == 3

    # store contains exactly the survivors' signatures (4 bands each)
    store = spark.read.parquet(str(tmp_path / "out" / "store"))
    assert sorted(
        r["id"] for r in store.select("id").distinct().collect()
    ) == [0, 2, 101]
    assert store.count() == 3 * 4
    # batch lineage recorded on both outputs
    assert set(
        r["batch_id"] for r in data.select("batch_id").distinct().collect()
    ) == {0, 1}
