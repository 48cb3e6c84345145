"""C4-style line-level page filtering.

Public technique: C4 (Raffel et al. 2020, §2.2 "Colossal Clean Crawled
Corpus") cleans web pages line-by-line before any document-level
filtering: keep only lines that end in a terminal punctuation mark and
contain at least three words, drop lines mentioning javascript, and
discard whole pages that contain "lorem ipsum" or a curly brace or
retain too few lines.  This is the canonical first text-shaping pass of
a webtext training-data pipeline, upstream of the document-level
heuristics in :mod:`.quality` (Gopher/C4 document rules).

Reference anchor: plays the same gate role as the reference pipeline's
per-document rule chain (`Detector.java:90` capped-input discipline;
the keep/drop audit shape mirrors `operators/pipeline.py`), one level
finer-grained — per line instead of per document.

Scale shape (100 TB): everything is a narrow projection over
`split`/`filter`/`array_join` higher-order functions — single pass,
whole-stage codegen, zero shuffles, zero Python.  Filters compose with
partition pruning and column pruning untouched because the operator
never leaves the row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: C4 keeps lines ending in one of these (the paper's "terminal
#: punctuation mark", including the closing quote).
TERMINAL_PUNCT = (".", "!", "?", '"')


def line_kept(l: Column, min_words: int = 3) -> Column:
    """The C4 per-line predicate: terminal punctuation, >= min_words
    words, and no mention of javascript."""
    return (
        F.substring(l, -1, 1).isin(*TERMINAL_PUNCT)
        & (F.size(F.split(l, " ")) >= min_words)
        & ~F.lower(l).contains("javascript")
    )


def c4_line_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_kept_lines: int = 3,
    min_words_per_line: int = 3,
) -> DataFrame:
    """Apply the C4 line filter to newline-separated page text.

    Output: ``(doc_id, n_lines, n_kept_lines, keep_page,
    filtered_text)`` where ``filtered_text`` is the kept lines
    re-joined with newlines and ``keep_page`` is false when the page
    contains "lorem ipsum" (case-insensitive) or a ``{``, or keeps
    fewer than ``min_kept_lines`` lines.
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")
    kept = F.filter(lines, lambda l: line_kept(l, min_words_per_line))
    n_kept = F.size(kept)
    keep_page = (
        ~F.lower(text).contains("lorem ipsum")
        & ~text.contains("{")
        & (n_kept >= min_kept_lines)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("int").alias("n_lines"),
        n_kept.cast("int").alias("n_kept_lines"),
        keep_page.alias("keep_page"),
        F.array_join(kept, "\n").alias("filtered_text"),
    )


def synth_page_lines(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministically rebuild flat one-line fixture text into a
    line-structured page exercising every C4 rule (the contract query's
    input builder — the DuckDB oracle re-derives the identical
    construction, same pattern as ``canonical_url_dups``).

    Words are chunked 5 per line; line ``i`` of document ``d`` is
    decorated by ``(d + i) % 7``: terminal '.', '!', '?', bare (no
    terminal punct), a javascript notice, a 2-word stub, or an
    upper-cased sentence.  Every 31st document gains a lorem-ipsum
    line and every 37th a curly-brace script line (page-level drops).
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_lines = F.greatest(
        F.ceil(F.size(words) / F.lit(5.0)).cast("int"), F.lit(1)
    )
    doc_id = F.col(id_col)

    def decorate(i: Column) -> Column:
        base = F.array_join(F.slice(words, i * 5 + 1, 5), " ")
        stub = F.array_join(F.slice(words, i * 5 + 1, 2), " ")
        m = (doc_id + i) % 7
        return (
            F.when(m == 0, F.concat(base, F.lit(".")))
            .when(m == 1, F.concat(base, F.lit("!")))
            .when(m == 2, F.concat(base, F.lit("?")))
            .when(m == 3, base)
            .when(
                m == 4,
                F.concat(
                    F.lit("Please enable javascript to view the "),
                    base,
                    F.lit("."),
                ),
            )
            .when(m == 5, F.concat(stub, F.lit(".")))
            .otherwise(F.concat(F.upper(base), F.lit(".")))
        )

    page = F.array_join(
        F.transform(F.sequence(F.lit(0), n_lines - 1), decorate), "\n"
    )
    page = F.concat(
        page,
        F.when(
            doc_id % 31 == 0, F.lit("\nlorem ipsum dolor sit amet.")
        ).otherwise(F.lit("")),
        F.when(
            doc_id % 37 == 0, F.lit("\nfunction() { return 0; }")
        ).otherwise(F.lit("")),
    )
    return df.select(doc_id.alias("doc_id"), page.alias(text_col))
