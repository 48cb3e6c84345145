"""Structured Streaming form of the pipeline (I10 in SURVEY.md §2.5).

The reference's streaming surface is the append/classify contract
(ILangIdClassifier.java:43-102) — stateless per document — so the whole
batch pipeline lifts to ``readStream`` unchanged: the same annotate UDF +
rule expressions run per micro-batch; watermarked windowed aggregation
provides the audit-metric stream (late data bounded by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..models.factory import DetectorModel
from ..operators.pipeline import PipelineOptions, QualityFilterPipeline
from ..operators.quality import QualityConfig


def streaming_pipeline(
    spark: SparkSession,
    model: DetectorModel,
    input_dir: str,
    schema,
    cfg: QualityConfig | None = None,
) -> DataFrame:
    """File-source streaming pages → annotated stream (same columns as the
    batch ``annotate``)."""
    pages = spark.readStream.schema(schema).parquet(input_dir)
    pipe = QualityFilterPipeline(
        spark, model, cfg or QualityConfig(), PipelineOptions(n_buckets=64)
    )
    return pipe.annotate(pages)


def windowed_audit_stream(
    annotated: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Watermarked tumbling-window audit metrics over the annotated
    stream: rows in/kept per (window, bucket); late events beyond the
    watermark are dropped deterministically."""
    return (
        annotated.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), F.col("bucket"))
        .agg(
            F.count(F.lit(1)).alias("rows_in"),
            F.sum(F.col("keep").cast("long")).alias("rows_kept"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "bucket",
            "rows_in",
            "rows_kept",
        )
    )


def run_stream_once(
    spark: SparkSession,
    model: DetectorModel,
    input_dir: str,
    schema,
    out_dir: str,
    checkpoint_dir: str,
    cfg: QualityConfig | None = None,
) -> None:
    """Process everything currently in ``input_dir`` with availableNow
    (bounded run for tests/backfills), writing kept+scrubbed rows."""
    ann = streaming_pipeline(spark, model, input_dir, schema, cfg)
    out = ann.filter(F.col("keep")).select(
        "url", "warc_ts", "lang", "lang_conf", "scrubbed_text"
    )
    q = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
