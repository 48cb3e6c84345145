"""Block-level boilerplate removal (deterministic jusText-style).

Public technique: jusText (Pomikálek 2011, "Removing Boilerplate and
Duplicate Content from Web Corpora") classifies BLOCKS of a page —
segments between block-level tags — by link density, length, and
stopword density, keeping content paragraphs and dropping navigation /
footer / menu chrome.  CommonCrawl curation pipelines run exactly this
shape of block classifier between raw html and document-level quality
rules.  This is a simplified deterministic variant: the context-aware
short/near-good propagation pass of full jusText is replaced by three
per-block gates so that a second engine can re-derive every decision.

Reference anchor: the frozen whole-page extractor
(`sources/pages.py::extract_text`) defines text := all visible chars;
this operator is the quality-aware alternative front-end for crawl
html, feeding the same downstream rule chain (`operators/quality.py`).

Decision discipline: the two density gates are integer cross-products
(``link_chars·100 <= chars·33`` and ``stop_hits·100 >= words·18``), so
no floating-point comparison exists anywhere — both engines agree
bit-for-bit on every block.

Scale shape (100 TB): one pass of split / transform / filter /
aggregate higher-order functions over the html column — whole-stage
codegen, zero shuffle, zero Python; the page never leaves its row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Block-level boundary tags (split points).  <a> is inline and stays
#: inside its block so link density can be measured.
BLOCK_TAG_RE = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|td|tr|table|nav|footer|header|"
    r"article|section|blockquote|br)[^>]*>"
)
_ANCHOR_RE = r"(?is)<a[^>]*>(.*?)</a>"
_TAG_RE = r"<[^>]*>"

#: Small fixed English stopword list (jusText ships per-language lists;
#: this is the deterministic core set — callers pass their own).
STOPWORDS = (
    "the", "of", "and", "to", "in", "a", "is", "that", "it", "for",
    "on", "was", "with", "as", "at", "by", "this", "are", "be", "or",
)

#: Gates: a content block has >= MIN_WORDS words, link density <= 33%
#: and stopword density >= 18% (integer cross-multiplied).
MIN_WORDS = 5
LINK_DENSITY_PCT = 33
STOPWORD_DENSITY_PCT = 18


def _plain(b: Column) -> Column:
    """Tag-stripped, whitespace-collapsed visible text of a block."""
    return F.trim(
        F.regexp_replace(F.regexp_replace(b, _TAG_RE, " "), r"\s+", " ")
    )


def _words(plain: Column) -> Column:
    return F.when(
        F.length(plain) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(plain, " "))


def boilerplate_filter(
    pages: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    min_words: int = MIN_WORDS,
    stopwords: tuple[str, ...] = STOPWORDS,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Classify each block of each page and rebuild the content text.

    Output: ``(doc_id, n_blocks, n_content_blocks, content_chars,
    boiler_chars, content_text)`` — non-empty blocks only;
    content_text joins kept blocks with newlines in document order.
    ``keep_cols`` names input columns passed through unchanged (keeps
    pipeline compositions one map-side pass — no doc_id re-join).
    """
    html_str = F.col(html_col).cast("string")
    blocks = F.split(html_str, BLOCK_TAG_RE)

    def block_info(b: Column) -> Column:
        plain = _plain(b)
        words = _words(plain)
        anchors = F.regexp_extract_all(b, F.lit(_ANCHOR_RE), 1)
        link_chars = F.aggregate(
            anchors,
            F.lit(0),
            lambda acc, a: acc + F.length(_plain(a)),
        )
        stop_hits = F.size(
            F.filter(words, lambda w: F.lower(w).isin(*stopwords))
        )
        n_words = F.size(words)
        n_chars = F.length(plain)
        good = (
            (n_words >= min_words)
            & (link_chars * 100 <= n_chars * LINK_DENSITY_PCT)
            & (stop_hits * 100 >= n_words * STOPWORD_DENSITY_PCT)
        )
        return F.struct(
            plain.alias("plain"),
            n_chars.alias("n_chars"),
            good.alias("good"),
        )

    infos = F.filter(
        F.transform(blocks, block_info),
        lambda s: F.length(s["plain"]) > 0,
    )
    kept = F.filter(infos, lambda s: s["good"])
    return pages.select(
        F.col(id_col).alias("doc_id"),
        F.size(infos).cast("int").alias("n_blocks"),
        F.size(kept).cast("int").alias("n_content_blocks"),
        F.aggregate(
            kept, F.lit(0), lambda acc, s: acc + s["n_chars"]
        )
        .cast("bigint")
        .alias("content_chars"),
        (
            F.aggregate(
                infos, F.lit(0), lambda acc, s: acc + s["n_chars"]
            )
            - F.aggregate(kept, F.lit(0), lambda acc, s: acc + s["n_chars"])
        )
        .cast("bigint")
        .alias("boiler_chars"),
        F.array_join(
            F.transform(kept, lambda s: s["plain"]), "\n"
        ).alias("content_text"),
        *[F.col(c) for c in keep_cols],
    )


def boiler_body_expr(doc_id: Column, text: Column) -> Column:
    """Boilerplate-shaped page BODY (inner html, no <html>/<body>
    wrapper): nav chrome (pure links), content paragraphs built from the
    document's words (5-word chunks, every other chunk prefixed with
    stopwords so both sides of the stopword gate are exercised), a short
    menu item, and a link-heavy footer.  Shared by the boilerplate
    fixture and the composed web-curation fixture — both oracles bake
    the identical literal construction."""
    words = F.split(F.trim(text), r"\s+")
    n_chunks = F.greatest(
        F.ceil(F.size(words) / F.lit(5.0)).cast("int"), F.lit(1)
    )

    def para(i: Column) -> Column:
        chunk = F.array_join(F.slice(words, i * 5 + 1, 5), " ")
        m = (doc_id + i) % 2
        return F.concat(
            F.lit("<p>"),
            F.when(m == 0, F.concat(F.lit("the rest of the story and "),
                                    chunk)).otherwise(chunk),
            F.lit("</p>"),
        )

    paras = F.array_join(
        F.transform(F.sequence(F.lit(0), n_chunks - 1), para), ""
    )
    return F.concat(
        F.lit('<div><a href="/">Home</a> '
              '<a href="/about">About</a> <a href="/contact">Contact</a>'
              "</div><li>Menu</li>"),
        paras,
        F.lit('<div>Copyright 2024 <a href="/terms">Terms of use</a> '
              '<a href="/privacy">Privacy</a></div>'),
    )


def synth_boiler_pages(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic boilerplate-shaped html fixture (see
    ``boiler_body_expr``); both engines re-derive the identical page."""
    doc_id = F.col(id_col)
    html = F.concat(
        F.lit("<html><body>"),
        boiler_body_expr(doc_id, F.col(text_col)),
        F.lit("</body></html>"),
    )
    return df.select(doc_id.alias("doc_id"), html.alias("html"))
