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


def test_dedup_stream_survives_store_compaction(spark, tmp_path):
    """Maintenance-window lifecycle: stream → compact the store
    (preserve_batches keeps the streaming layout) → resume the stream with
    new input.  The resumed stream must still drop near-dups of documents
    admitted BEFORE compaction — the probe reads the rewritten store."""
    from language_detection_spark.operators.dedup import compact_sig_store

    in_dir = tmp_path / "in"
    spark.createDataFrame(
        [(0, BASE), (1, OTHER)], SCHEMA
    ).coalesce(1).write.parquet(str(in_dir / "h1"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_dedup_stream(
        spark, f"{in_dir}/*/", SCHEMA, out, ckpt,
        threshold=0.5, max_files_per_trigger=1,
    )
    stats = compact_sig_store(
        spark, f"{out}/store", preserve_batches=True
    )
    assert stats["rows_after"] == 2 * 4
    # new crawl hour arrives; resume from the SAME checkpoint
    spark.createDataFrame(
        [(200, BASE.replace("green", "dark")),   # near-dup of compacted 0
         (201, "fresh content about volcanic islands and seabird colonies "
               "nesting on the cliffs above the cold northern ocean")],
        SCHEMA,
    ).coalesce(1).write.parquet(str(in_dir / "h2"))
    totals = run_dedup_stream(
        spark, f"{in_dir}/*/", SCHEMA, out, ckpt,
        threshold=0.5, max_files_per_trigger=1,
    )
    assert totals["rows_kept"] == 1  # 200 dropped via the compacted store
    data = spark.read.parquet(f"{out}/data")
    assert sorted(r["doc_id"] for r in data.select("doc_id").collect()) == [
        0, 1, 201,
    ]
    store = spark.read.parquet(f"{out}/store")
    assert sorted(
        r["id"] for r in store.select("id").distinct().collect()
    ) == [0, 1, 201]


def test_dedup_stream_rejects_compacted_store_layout(spark, tmp_path):
    """Compacting a live stream's store down to the flat band=<k> layout
    (preserve_batches=False) must make the resumed stream FAIL its batch
    instead of appending batch_id=<b>/band=<k> dirs next to band=<k> ones
    (which would corrupt the store for every future read)."""
    import pytest

    from language_detection_spark.operators.dedup import compact_sig_store

    in_dir = tmp_path / "in"
    spark.createDataFrame(
        [(0, BASE), (1, OTHER)], SCHEMA
    ).coalesce(1).write.parquet(str(in_dir / "h1"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_dedup_stream(
        spark, f"{in_dir}/*/", SCHEMA, out, ckpt,
        threshold=0.5, max_files_per_trigger=1,
    )
    compact_sig_store(spark, f"{out}/store", preserve_batches=False)
    spark.createDataFrame(
        [(300, "novel words about glaciers calving into arctic fjords")],
        SCHEMA,
    ).coalesce(1).write.parquet(str(in_dir / "h2"))
    with pytest.raises(Exception, match="preserve_batches=True"):
        run_dedup_stream(
            spark, f"{in_dir}/*/", SCHEMA, out, ckpt,
            threshold=0.5, max_files_per_trigger=1,
        )


def test_dedup_stream_rejects_bucket_count_mismatch(spark, tmp_path):
    """Resuming a stream with a different --store-buckets than the store
    was written with must FAIL the batch: the layout looks identical
    (bh_bucket present either way), but the wrong modulus prunes away
    matching store rows and silently admits near-duplicates.  The
    stamped _sig_store_meta.json turns that into a hard error."""
    import pytest

    in_dir = tmp_path / "in"
    spark.createDataFrame(
        [(0, BASE), (1, OTHER)], SCHEMA
    ).coalesce(1).write.parquet(str(in_dir / "h1"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_dedup_stream(
        spark, f"{in_dir}/*/", SCHEMA, out, ckpt,
        threshold=0.5, max_files_per_trigger=1, store_buckets=8,
    )
    # the near-dup that MUST be caught by the store probe on resume
    spark.createDataFrame(
        [(300, BASE.replace("green", "dark"))], SCHEMA
    ).coalesce(1).write.parquet(str(in_dir / "h2"))
    with pytest.raises(Exception, match="store_buckets"):
        run_dedup_stream(
            spark, f"{in_dir}/*/", SCHEMA, out, ckpt,
            threshold=0.5, max_files_per_trigger=1, store_buckets=4,
        )
    # correct modulus resumes cleanly and drops the near-dup
    totals = run_dedup_stream(
        spark, f"{in_dir}/*/", SCHEMA, out, ckpt,
        threshold=0.5, max_files_per_trigger=1, store_buckets=8,
    )
    assert totals["rows_kept"] == 0
