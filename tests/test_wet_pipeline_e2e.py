"""End-to-end CommonCrawl-shape flow: WET archive in → WARC source →
quality rule columns out.  Pins that the WARC reader's output composes
directly with the document pipeline (the north rule's
"Common-Crawl-style web pages" input path)."""

from pyspark.sql import functions as F

from language_detection_spark.operators.quality import (
    QualityConfig,
    rule_columns,
)
from language_detection_spark.sources.warc import (
    encode_warc,
    gzip_members,
    read_warc,
    wet_text_records,
)

EN = (
    "This is a perfectly ordinary English sentence that should be kept "
    "because the text of the document is long and has the usual words. "
) * 4
SHORT = "too short"


def test_wet_to_quality_rules(spark, tmp_path):
    d = tmp_path / "wet"
    d.mkdir()
    recs = [
        ("warcinfo", None, b"crawl: test"),
        ("conversion", "http://keep.example/a", EN),
        ("conversion", "http://drop.example/b", SHORT),
    ]
    (d / "seg-00000.warc.wet.gz").write_bytes(gzip_members(encode_warc(recs)))

    docs = wet_text_records(read_warc(spark, str(d))).select("url", "text")
    annotated = rule_columns(docs, QualityConfig())
    rows = {r.url: r for r in annotated.collect()}
    assert len(rows) == 2  # the warcinfo record is projected away
    keep, drop = rows["http://keep.example/a"], rows["http://drop.example/b"]
    assert keep["stat_n_words"] >= 50 > drop["stat_n_words"]
    viol_cols = [c for c in annotated.columns if c.startswith("rule_")]
    assert not any(keep[c] for c in viol_cols), keep.asDict()
    assert drop["rule_too_few_words"]
