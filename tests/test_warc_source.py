"""WARC/WET source: record walk, gzip member handling, the Spark
binaryFile→mapInPandas reader, and the ValueError-on-structural-lies
contract (same discipline as functions/codecs.py)."""

import zlib

import pytest

from language_detection_spark.sources.warc import (
    encode_warc,
    gzip_members,
    parse_warc_bytes,
    read_warc,
    wet_text_records,
)

RECS = [
    ("warcinfo", None, b"engine: test"),
    ("conversion", "http://a.example/1", "hello web text."),
    ("conversion", "http://a.example/2", "sécond récord."),  # utf-8
]


def test_roundtrip_plain():
    got = parse_warc_bytes(encode_warc(RECS))
    assert [r["warc_type"] for r in got] == ["warcinfo", "conversion", "conversion"]
    assert got[1]["url"] == "http://a.example/1"
    assert got[1]["payload"] == b"hello web text."
    assert got[2]["payload"].decode("utf-8") == "sécond récord."
    assert got[2]["content_length"] == len(got[2]["payload"])
    assert got[0]["url"] is None


def test_roundtrip_gzip_members():
    gz = gzip_members(encode_warc(RECS))
    assert gz[:2] == b"\x1f\x8b"
    assert parse_warc_bytes(gz) == parse_warc_bytes(encode_warc(RECS))


def test_structural_lies_raise():
    blob = encode_warc(RECS)
    with pytest.raises(ValueError, match="truncated WARC payload"):
        parse_warc_bytes(blob[:-10])
    with pytest.raises(ValueError, match="expected WARC/ magic"):
        parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")
    # lying Content-Length: terminator lands in the wrong place
    bad = blob.replace(b"Content-Length: 12\r\n", b"Content-Length: 11\r\n", 1)
    with pytest.raises(ValueError):
        parse_warc_bytes(bad)
    with pytest.raises(ValueError, match="truncated gzip member"):
        parse_warc_bytes(gzip_members(blob)[:-5])
    with pytest.raises(ValueError, match="corrupt gzip"):
        parse_warc_bytes(b"\x1f\x8b" + b"\x00" * 40)


def test_read_warc_distributed(spark, tmp_path):
    d = tmp_path / "warcs"
    d.mkdir()
    (d / "a.warc").write_bytes(encode_warc(RECS))
    (d / "b.warc.gz").write_bytes(
        gzip_members(
            encode_warc([("conversion", "http://b.example/9", "from gz.")])
        )
    )
    df = read_warc(spark, str(d))
    rows = sorted(df.collect(), key=lambda r: (r.path, r.url or ""))
    assert len(rows) == 4
    wet = {r.url: r.text for r in wet_text_records(df).collect()}
    assert wet["http://b.example/9"] == "from gz."
    assert wet["http://a.example/1"] == "hello web text."
    assert len(wet) == 3


def test_read_warc_no_shuffle(spark, tmp_path):
    d = tmp_path / "w"
    d.mkdir()
    (d / "a.warc").write_bytes(encode_warc(RECS))
    plan = (
        wet_text_records(read_warc(spark, str(d)))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
