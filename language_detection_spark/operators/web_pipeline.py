"""Composed web-curation gate: the full pre-langid document pipeline a
Common-Crawl-style corpus build runs, as ONE map-side pass.

Stages (each individually implemented + oracled elsewhere, composed
here): RefinedWeb URL filtering (:mod:`.url_filter`) → crawl-policy
directives / robots meta (:func:`.url_filter.page_directives`) →
jusText-style boilerplate block removal (:mod:`.boilerplate`) →
heuristic quality score over the EXTRACTED content
(:func:`.text_analysis.quality_score`) → one keep verdict per page.

Scale shape (100 TB): everything is whole-stage-codegen string/HOF
expressions over the page scan plus ONE broadcast join (the domain
blocklist dim) — ZERO shuffle Exchanges, nothing to the driver.  The
stage operators pass intermediate columns through (``keep_cols``)
instead of re-joining on doc_id, which is what makes the single-pass
plan possible; at 10^12 documents the equivalent join-composed plan
would shuffle the corpus three times for no reason.

Reference anchor: the keep verdict + named reason columns mirror the
reference pipeline's per-document rule chain (`operators/quality.py`
rule_columns, anchored on the nutch-plugin filter role in the
reference README); this module is the web-specific front half that
runs BEFORE the reference's language-ID + quality rules.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .boilerplate import boiler_body_expr, boilerplate_filter
from .url_filter import (
    crawl_url_expr,
    page_directives,
    robots_meta_expr,
    url_filter,
)

#: A page whose extracted content scores below this is dropped even if
#: every upstream gate passed.
DEFAULT_MIN_QUALITY = 0.1


def curate_web_pages(
    pages: DataFrame,
    blocklist: DataFrame | None = None,
    id_col: str = "doc_id",
    url_col: str = "url",
    html_col: str = "html",
    min_quality: float = DEFAULT_MIN_QUALITY,
) -> DataFrame:
    """Run the composed curation gate over ``(doc_id, url, html)`` pages.

    Output per page: ``(doc_id, keep_url, keep_page, n_content_blocks,
    q_score, kept)`` — ``kept`` is the conjunction: URL gate AND robots
    noindex gate AND at-least-one-content-block AND content quality ≥
    ``min_quality``.  Reason columns stay exposed so the audit can
    attribute every drop.

    One map-side pass: the three stage operators thread their inputs
    through via ``keep_cols`` — no doc_id re-joins, no shuffle."""
    from .text_analysis import quality_score

    s1 = url_filter(
        pages, blocklist=blocklist, url_col=url_col, id_col=id_col,
        keep_cols=(html_col,),
    )
    s2 = page_directives(
        s1, html_col=html_col, keep_cols=("keep_url", html_col)
    )
    s3 = boilerplate_filter(
        s2, html_col=html_col, keep_cols=("keep_url", "keep_page")
    )
    q = quality_score(F.col("content_text"))
    return s3.select(
        "doc_id",
        "keep_url",
        "keep_page",
        "n_content_blocks",
        q.alias("q_score"),
        (
            F.col("keep_url")
            & F.col("keep_page")
            & (F.col("n_content_blocks") > 0)
            & (q >= F.lit(min_quality))
        ).alias("kept"),
    )


def synth_web_pages(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One coherent crawl-page fixture for the composed gate: the
    crawl-shaped URL (every url_filter rule exercised), a head cycling
    every robots-meta variant, and a boilerplate-shaped body built from
    the document's words — all deterministic from (doc_id, text) so the
    oracle re-derives the identical page."""
    doc_id = F.col(id_col)
    html = F.concat(
        F.lit("<html><head>"),
        robots_meta_expr(doc_id),
        F.lit("</head><body>"),
        boiler_body_expr(doc_id, F.col(text_col)),
        F.lit("</body></html>"),
    )
    return df.select(
        doc_id.alias("doc_id"),
        crawl_url_expr(doc_id).alias("url"),
        html.alias("html"),
    )
