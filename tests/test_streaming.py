"""Structured Streaming tests: availableNow bounded run + windowed audit."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from language_detection_spark.operators.quality import QualityConfig
from language_detection_spark.streaming.stream_job import (
    run_stream_once,
    streaming_pipeline,
    windowed_audit_stream,
)


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_in")
    texts = {
        "en": "the cat and the dog have a long history of friendship and that is that "
        * 8,
        "fr": "le chat et le chien sont amis depuis longtemps et les faits sont là "
        * 8,
    }
    rows = []
    for i in range(40):
        lang = ["en", "fr"][i % 2]
        rows.append((f"https://s{i}.example/{i}", i * 60, texts[lang], lang))
    pdf = pd.DataFrame(rows, columns=["url", "secs", "text", "lang"])
    df = spark.createDataFrame(pdf).select(
        "url",
        (
            F.to_timestamp(F.lit("2024-01-01"))
            + F.make_interval(secs=F.col("secs"))
        ).alias("warc_ts"),
        "text",
        "lang",
    )
    df.write.mode("overwrite").parquet(str(d))
    return str(d), df.schema


def test_stream_available_now(spark, tiny_model, stream_input, tmp_path):
    input_dir, schema = stream_input
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    cfg = QualityConfig(
        lang_allow=("en", "fr"), min_words=10, min_stopword_hits=0,
        alpha_word_frac_min=0.5, mean_word_len_min=2.0,
    )
    run_stream_once(spark, tiny_model, input_dir, schema, out, ckpt, cfg)
    got = spark.read.parquet(out)
    assert got.count() == 40
    langs = {r.lang for r in got.select("lang").distinct().collect()}
    assert langs == {"en", "fr"}
    # idempotent restart: nothing new to process
    run_stream_once(spark, tiny_model, input_dir, schema, out, ckpt, cfg)
    assert spark.read.parquet(out).count() == 40


def test_stream_foreach_batch_reconciles_with_batch(
    spark, tiny_model, stream_input, tmp_path
):
    """The full annotate+rules+scrub pipeline inside foreachBatch with the
    data/audit commit protocol, reconciled row-for-row against the BATCH
    pipeline on the same input: same kept urls, same scrubbed text, and
    audit totals that match the committed data."""
    from language_detection_spark.operators.pipeline import (
        PipelineOptions,
        QualityFilterPipeline,
    )
    from language_detection_spark.streaming.stream_job import run_stream_with_audit

    input_dir, schema = stream_input
    out = str(tmp_path / "fb_out")
    ckpt = str(tmp_path / "fb_ckpt")
    cfg = QualityConfig(
        lang_allow=("en", "fr"), min_words=10, min_stopword_hits=0,
        alpha_word_frac_min=0.5, mean_word_len_min=2.0,
    )
    opts = PipelineOptions(n_buckets=8)
    totals = run_stream_with_audit(
        spark, tiny_model, input_dir, schema, out, ckpt, cfg, opts,
        max_files_per_trigger=1,  # force multiple micro-batches
    )
    assert totals["rows_in"] == 40 and totals["n_batches"] >= 1

    data = spark.read.parquet(f"{out}/data")
    audit = spark.read.parquet(f"{out}/audit")
    # audit totals describe exactly the committed data
    assert data.count() == totals["rows_in"]
    assert audit.agg(F.sum("rows_in")).first()[0] == totals["rows_in"]
    assert (
        audit.agg(F.sum("rows_kept")).first()[0]
        == data.filter("keep").count()
        == totals["rows_kept"]
    )

    # batch pipeline on the same input → identical per-url decisions + text
    batch = QualityFilterPipeline(spark, tiny_model, cfg, opts).annotate(
        spark.read.parquet(input_dir)
    )
    b = {
        r.url: (r.keep, r.lang, r.scrubbed_text)
        for r in batch.select("url", "keep", "lang", "scrubbed_text").collect()
    }
    s = {
        r.url: (r.keep, r.lang, r.scrubbed_text)
        for r in data.select("url", "keep", "lang", "scrubbed_text").collect()
    }
    assert s == b

    # restart with the same checkpoint: no new source epochs, nothing added
    again = run_stream_with_audit(
        spark, tiny_model, input_dir, schema, out, ckpt, cfg, opts
    )
    assert again["n_batches"] == 0
    assert spark.read.parquet(f"{out}/data").count() == 40


def test_windowed_audit_stream(spark, tiny_model, stream_input, tmp_path):
    input_dir, schema = stream_input
    cfg = QualityConfig(
        lang_allow=("en", "fr"), min_words=10, min_stopword_hits=0,
        alpha_word_frac_min=0.5, mean_word_len_min=2.0,
    )
    ann = streaming_pipeline(spark, tiny_model, input_dir, schema, cfg)
    audit = windowed_audit_stream(ann, window="10 minutes", watermark="20 minutes")
    q = (
        audit.writeStream.format("memory")
        .queryName("audit_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from audit_stream").collect()
    # 40 docs at 1/min over 40 min → 4 ten-minute windows (modulo watermark
    # holding back the tail window in append mode)
    assert len(rows) >= 1
    assert sum(r.rows_in for r in rows) <= 40
    for r in rows:
        assert r.rows_kept <= r.rows_in
