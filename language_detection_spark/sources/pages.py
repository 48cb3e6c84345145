"""Common-Crawl-style ``pages`` table: (url, warc_ts, html, text, lang).

The reference consumes already-extracted text from the crawler (the Nutch
plugin concatenates title+text, LanguageDetectionFilter.java:55-58); our
input table carries raw ``html`` plus extracted ``text``, so we own the
extraction step (P7 in SURVEY.md §2.2).

The extractor below is FROZEN: the pipeline invariant is byte-identical
extracted text per url, so any change to it is a format break and must be
golden-tested (tests/test_pages.py).

``synth_pages`` derives a deterministic pages table from the driver's
synthetic ``documents`` parquet (seeded, no external data): the html is a
templated wrapper around the document text, and the stored ``text`` column
is *defined* as ``extract_text(html)``.
"""

from __future__ import annotations

import html as _htmllib
import re

import pandas as pd

_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_SCRIPT_RE = re.compile(r"<script\b[^>]*>.*?</script\s*>", re.I | re.S)
_STYLE_RE = re.compile(r"<style\b[^>]*>.*?</style\s*>", re.I | re.S)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")


def extract_text(html: str | bytes | None) -> str:
    """Deterministic HTML → text: drop comments/script/style, strip tags,
    unescape entities, collapse whitespace.  Pure function, frozen."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", "replace")
    t = _COMMENT_RE.sub(" ", html)
    t = _SCRIPT_RE.sub(" ", t)
    t = _STYLE_RE.sub(" ", t)
    t = _TAG_RE.sub(" ", t)
    t = _htmllib.unescape(t)
    return _WS_RE.sub(" ", t).strip()


def extract_text_series(htmls: pd.Series) -> pd.Series:
    return htmls.map(extract_text)


_HTML_TEMPLATE = (
    "<!DOCTYPE html><html><head><meta charset=\"utf-8\">"
    "<title>Document {doc_id}</title>"
    "<style>body {{ margin: 0; }}</style>"
    "<script>var page_id = {doc_id};</script>"
    "</head><body>"
    "<!-- crawl {doc_id} -->"
    "<nav><a href=\"/home\">Home</a> <a href=\"/about\">About</a></nav>"
    "<article><p>{body}</p></article>"
    "</body></html>"
)


def render_html(doc_id: int, text: str) -> str:
    """Deterministic html wrapper used by the synthetic pages table."""
    return _HTML_TEMPLATE.format(doc_id=doc_id, body=_htmllib.escape(text))


def synth_pages_df(spark, sf_dir: str):
    """documents.parquet → pages DataFrame (url, warc_ts, html, text, lang).

    html generation and text extraction ride one Arrow-batched pass; the
    ``lang`` column keeps the generator's ground-truth label (used by
    evaluation queries only, never by the pipeline itself).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        BinaryType,
        StringType,
        StructField,
        StructType,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    out_schema = StructType(
        [
            StructField("html", BinaryType()),
            StructField("text", StringType()),
        ]
    )

    def gen(batch: pd.DataFrame) -> pd.DataFrame:
        htmls = [
            render_html(int(i), t if t is not None else "")
            for i, t in zip(batch["doc_id"], batch["text"])
        ]
        return pd.DataFrame(
            {
                "html": [h.encode("utf-8") for h in htmls],
                "text": [extract_text(h) for h in htmls],
            }
        )

    gen_udf = F.pandas_udf(gen, out_schema)

    return (
        docs.select(
            F.concat(
                F.lit("https://example.org/"),
                F.col("source"),
                F.lit("/"),
                F.lpad(F.col("doc_id").cast("string"), 10, "0"),
            ).alias("url"),
            (
                F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                + F.make_interval(secs=F.col("doc_id").cast("double"))
            ).alias("warc_ts"),
            F.struct("doc_id", "text").alias("_src"),
            F.col("lang"),
        )
        .withColumn("_gen", gen_udf(F.col("_src")))
        .select(
            "url",
            "warc_ts",
            F.col("_gen.html").alias("html"),
            F.col("_gen.text").alias("text"),
            "lang",
        )
    )
