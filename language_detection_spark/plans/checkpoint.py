"""Checkpoint/resume orchestration (Q8 in SURVEY.md §2.7).

Unit of commit = url-hash bucket (plans/repartition.bucket_col).  A bucket
is *committed* iff an audit row for it exists; data for uncommitted buckets
may be partial and is rewritten on resume (dynamic partition overwrite →
idempotent under partial failure).  Protocol per chunk of buckets:

  1. write annotated rows → ``<out>/data/bucket=k/`` (dynamic overwrite)
  2. re-read the written chunk (narrow columns), aggregate audit metrics
  3. append audit rows → ``<out>/audit/``   ← the commit point

Resume = read the audit table, skip its buckets.  This is the sandbox
stand-in for Iceberg snapshot commits: the audit append is the atomic
marker, data writes are idempotent.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .audit import audit_aggregation


def committed_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    try:
        audit = spark.read.parquet(f"{out_dir}/audit")
    except Exception:
        return set()
    return {r.bucket for r in audit.select("bucket").distinct().collect()}


def run_checkpointed(
    source: DataFrame,
    out_dir: str,
    n_buckets: int,
    chunk_size: int = 64,
    run_id: str | None = None,
    fail_after_chunks: int | None = None,
    annotate=None,
    bucket_src_col: str = "url",
    drop_columns: tuple[str, ...] = (),
) -> dict:
    """Process all not-yet-committed buckets in chunks.

    Two modes:

    * ``annotate=None`` (legacy): ``source`` is the fully annotated frame
      (has ``bucket``).  NOTE the chunk filter cannot be pushed below the
      nondeterministic annotate UDF in this mode, so every chunk re-runs
      the detector over the FULL input — fine for a single chunk, O(n ×
      n_chunks) detector work otherwise.
    * ``annotate=callable``: ``source`` is the RAW pages frame; the bucket
      is computed from ``bucket_src_col`` (url) BEFORE filtering, so each
      chunk annotates only its own rows (the filter reaches the scan, the
      detector runs exactly once per row across the whole job).  This is
      the mode jobs/run_pipeline.py uses.

    ``fail_after_chunks`` injects a crash after N committed chunks (tests
    exercise the resume path with it).  Returns a summary dict.
    """
    spark = source.sparkSession
    run_id = run_id or uuid.uuid4().hex[:12]
    done = committed_buckets(spark, out_dir)
    todo = [b for b in range(n_buckets) if b not in done]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    if annotate is not None:
        from .repartition import bucket_col

        # this bucket is authoritative for the commit protocol; annotate()
        # implementations must NOT recompute it (QualityFilterPipeline
        # keeps an existing bucket column for exactly this reason)
        source = source.withColumn(
            "bucket", bucket_col(bucket_src_col, n_buckets)
        )

    chunks = [todo[i : i + chunk_size] for i in range(0, len(todo), chunk_size)]
    n_done = 0
    write_sec = audit_sec = 0.0
    for ci, chunk in enumerate(chunks):
        part = source.filter(F.col("bucket").isin(chunk))
        if annotate is not None:
            # detector work is per-chunk: only this chunk's rows cross the UDF
            part = annotate(part)
        if drop_columns:
            # e.g. the raw text column: the output's canonical text is the
            # scrubbed one — dropping the redundant copy halves write bytes
            part = part.drop(*drop_columns)
        # co-locate each bucket into one task before the partitioned write —
        # otherwise every task emits a file per bucket (tasks × buckets small
        # files) and the driver-serial commit dominates at high parallelism
        part = part.repartition(len(chunk), F.col("bucket"))
        t0 = time.time()
        (
            part.write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(f"{out_dir}/data")
        )
        write_sec += time.time() - t0
        t0 = time.time()
        written = spark.read.parquet(f"{out_dir}/data").filter(
            F.col("bucket").isin(chunk)
        )
        audit = audit_aggregation(written, run_id)
        audit.write.mode("append").parquet(f"{out_dir}/audit")
        audit_sec += time.time() - t0
        n_done += 1
        if fail_after_chunks is not None and n_done >= fail_after_chunks:
            raise RuntimeError(f"injected failure after {n_done} chunks")
    return {
        "run_id": run_id,
        "buckets_total": n_buckets,
        "buckets_previously_committed": len(done),
        "buckets_committed_now": sum(len(c) for c in chunks),
        "write_sec": round(write_sec, 2),
        "audit_sec": round(audit_sec, 2),
    }
