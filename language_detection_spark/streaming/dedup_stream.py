"""Streaming near-dup dedup with a cross-batch signature store.

The continuous-crawl flow: every micro-batch is (1) exact-deduped within
itself, (2) near-dup-deduped within itself (MinHash-LSH pairs, larger id
drops), (3) probed against the persisted signature STORE of everything
kept so far (`operators/dedup.py::incremental_near_dups` — only the new
batch is shingled/hashed), and (4) survivors are written out and their
banded signatures admitted to the store.

Idempotency under foreachBatch's at-least-once replay: both the data and
the store are partitioned by ``batch_id`` and written with per-write
dynamic partition overwrite, so a replayed batch overwrites exactly its
own partitions — the store never accumulates duplicate signature rows
from a retry.  (A replayed batch also re-probes the same store state
only if later batches haven't run; with availableNow + file-source
checkpointing the batch order is the offset-log order, same as a batch
backfill.)

At 10^12-doc scale every stage stays bounded: the store probe is a
(band, band_hash) equi-join against band-partitioned parquet, in-batch
LSH has bucket caps, and nothing collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    banded_rows,
    bh_bucket_col,
    check_sig_store_buckets,
    exact_dedup,
    incremental_near_dups,
    minhash_dedup_pairs,
    minhash_signatures,
    read_sig_store_meta,
    sig_store_layout,
    write_sig_store_meta,
)
from ..plans.caching import release_tracked_caches


def _hadoop_path_exists(spark: SparkSession, path: str) -> bool:
    """True iff ``path`` exists on the session's Hadoop filesystem (works
    for any scheme Spark can read, not just local paths)."""
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return bool(fs.exists(hpath))


def _dedup_batch(
    batch_df: DataFrame,
    store: DataFrame | None,
    id_col: str,
    text_col: str,
    threshold: float,
    threshold_est: float,
    store_buckets: int | None = None,
) -> DataFrame:
    """Survivors of one micro-batch: exact → in-batch near-dup → store
    probe."""
    ex = exact_dedup(batch_df, text_col=text_col, id_col=id_col).drop(
        "text_hash"
    )
    pairs = minhash_dedup_pairs(
        ex, text_col=text_col, id_col=id_col, threshold=threshold
    )
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    batch_kept = ex.join(losers, id_col, "left_anti")
    if store is not None:
        hits = incremental_near_dups(
            batch_kept,
            store,
            text_col=text_col,
            id_col=id_col,
            threshold_est=threshold_est,
            store_buckets=store_buckets,
        )
        dup_vs_store = hits.select(
            F.col("id_new").alias(id_col)
        ).distinct()
        batch_kept = batch_kept.join(dup_vs_store, id_col, "left_anti")
    return batch_kept


def run_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    threshold_est: float = 0.5,
    max_files_per_trigger: int | None = None,
    store_buckets: int | None = 16,
) -> dict:
    """availableNow streaming dedup; returns {n_batches, rows_in,
    rows_kept}.  Output layout: ``<out>/data/batch_id=<b>/`` survivors,
    ``<out>/store/batch_id=<b>/band=<k>/bh_bucket=<j>/`` their banded
    signatures (``store_buckets`` band_hash-prefix partitions per band,
    default 16, so each batch's store probe prunes files by hash range
    instead of scanning the whole store — the per-batch probe cost then
    tracks the batch's bucket coverage, not the store's age; None keeps
    the flat band-only layout)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(input_dir)
    store_path = f"{out_dir}/store"
    totals = {"n_batches": 0, "rows_in": 0, "rows_kept": 0}

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        # Only a MISSING store means "first batch"; any other read error
        # (transient IO, corrupt footer) must fail the batch so the
        # checkpoint retries it — silently skipping the cross-batch probe
        # would admit duplicates of already-kept documents.
        if _hadoop_path_exists(spark, store_path):
            store = spark.read.parquet(store_path).filter(
                F.col("batch_id") < batch_id
            )
            if not store.head(1):
                store = None
        else:
            store = None
        if store is not None and (store_buckets is not None) != (
            "bh_bucket" in store.columns
        ):
            raise RuntimeError(
                f"signature store {store_path} "
                + (
                    "lacks the bh_bucket partition this stream would "
                    "write; resume with store_buckets=None or rebuild "
                    "the store bucketed"
                    if store_buckets is not None
                    else "is bh_bucket-partitioned but this stream has "
                    "store_buckets=None; pass the store's bucket count"
                )
            )
        if store is not None and read_sig_store_meta(
            spark, store_path
        ) is not None:
            # column presence alone cannot catch a resume with a
            # DIFFERENT --store-buckets: same layout, wrong modulus,
            # matching store rows silently pruned → duplicates admitted.
            # The stamped metadata makes that a hard error.
            check_sig_store_buckets(spark, store_path, store_buckets)
        kept = _dedup_batch(
            batch_df, store, id_col, text_col, threshold, threshold_est,
            store_buckets,
        )
        (
            kept.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{out_dir}/data")
        )
        committed = spark.read.parquet(f"{out_dir}/data").filter(
            F.col("batch_id") == batch_id
        )
        # the store write below creates batch_id=<b>/band=<k> partitions;
        # appending that layout onto a store compacted down to band=<k>
        # would leave mixed partition depths that spark.read.parquet
        # rejects — fail loudly instead of corrupting the store
        # (compact with preserve_batches=True while a stream is live)
        if sig_store_layout(spark, store_path) == "batch":
            raise RuntimeError(
                f"signature store {store_path} has the compacted band=<k> "
                "layout; the streaming writer needs the batch_id=<b>/"
                "band=<k> layout (re-compact with preserve_batches=True)"
            )
        sig_rows = banded_rows(
            minhash_signatures(committed, text_col, id_col)
        ).withColumn("batch_id", F.lit(batch_id))
        part_cols = ["batch_id", "band"]
        if store_buckets is not None:
            # one file per (band, bh_bucket) dir per batch — see
            # build_sig_store on why the repartition is load-bearing
            sig_rows = sig_rows.withColumn(
                "bh_bucket", bh_bucket_col(store_buckets)
            ).repartition(F.col("band"), F.col("bh_bucket"))
            part_cols.append("bh_bucket")
        (
            sig_rows.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*part_cols)
            .parquet(store_path)
        )
        # stamp the construction params so any later resume/probe can
        # validate its --store-buckets against what is actually on disk
        write_sig_store_meta(
            spark, store_path, store_buckets=store_buckets,
            num_perm=16, bands=4, shingle_k=3,
        )
        totals["n_batches"] += 1
        totals["rows_in"] += batch_df.count()
        totals["rows_kept"] += committed.count()
        release_tracked_caches()

    q = (
        docs.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return totals
