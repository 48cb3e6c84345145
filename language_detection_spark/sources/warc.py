"""WARC / WET web-archive ingestion (ISO 28500; CommonCrawl's format).

Public technique: every large webtext pipeline (C4, CCNet, Gopher,
RefinedWeb) starts from CommonCrawl WARC (raw responses) or WET
(plain-text conversion) files — concatenated records of the form::

    WARC/1.0\r\n
    WARC-Type: conversion\r\n
    WARC-Target-URI: http://...\r\n
    Content-Length: N\r\n
    \r\n
    <N payload bytes>\r\n\r\n

optionally with each record its own gzip member (CommonCrawl always
gzips; concatenated members decompress as a stream).

Reference anchor: fills the same slot as the reference's corpus
readers (`sources/wiki_abstracts.py` for Wikipedia XML, SURVEY §2
S3/S6) for the web-crawl corpus family; like `functions/codecs.py`
the parser raises ``ValueError`` on structural lies (truncated
payload, missing mandatory headers) rather than guessing.

Scale shape (100 TB): WARC files are independently parseable units —
`spark.read.format("binaryFile")` distributes one file per task and
each task walks its records sequentially in a `mapInPandas` batch;
no shuffle, no driver involvement.  CommonCrawl segments are ~1 GB
gzipped, a good task granularity as-is; a 100 TB crawl is ~100k such
files, far above any realistic executor count.
"""

from __future__ import annotations

import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CRLF = b"\r\n"


def encode_warc(records, version: str = "1.0") -> bytes:
    """Build a WARC byte stream from ``(warc_type, url, payload_bytes)``
    triples (test/fixture writer; deterministic — no clocks)."""
    out = bytearray()
    for warc_type, url, payload in records:
        if isinstance(payload, str):
            payload = payload.encode("utf-8")
        out += b"WARC/" + version.encode() + _CRLF
        out += b"WARC-Type: " + warc_type.encode() + _CRLF
        if url is not None:
            out += b"WARC-Target-URI: " + url.encode() + _CRLF
        out += b"WARC-Date: 2026-01-01T00:00:00Z" + _CRLF
        out += b"Content-Length: " + str(len(payload)).encode() + _CRLF
        out += _CRLF + payload + _CRLF + _CRLF
    return bytes(out)


def gzip_members(b: bytes) -> bytes:
    """Gzip each WARC record as its own member (CommonCrawl layout)."""
    out = bytearray()
    for rec in _split_records(b):
        co = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
        out += co.compress(rec) + co.flush()
    return bytes(out)


def _split_records(b: bytes):
    for start, end in _record_spans(b):
        yield b[start:end]


def _gunzip_concat(b: bytes) -> bytes:
    """Decompress concatenated gzip members."""
    out, pos = bytearray(), 0
    while pos < len(b):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out += d.decompress(b[pos:])
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member at {pos}: {e}") from e
        if not d.eof:
            raise ValueError("truncated gzip member")
        consumed = len(b) - pos - len(d.unused_data)
        pos += consumed
    return bytes(out)


def _record_spans(b: bytes):
    """Yield (start, end) byte spans of each WARC record, validating
    structure; raises ValueError on truncation or malformed headers."""
    pos = 0
    n = len(b)
    while pos < n:
        if not b.startswith(b"WARC/", pos):
            raise ValueError(f"expected WARC/ magic at offset {pos}")
        hdr_end = b.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            raise ValueError("truncated WARC header block")
        headers = _parse_headers(b[pos:hdr_end])
        if "content-length" not in headers:
            raise ValueError("WARC record missing Content-Length")
        clen = int(headers["content-length"])
        body_start = hdr_end + 4
        end = body_start + clen + 4  # payload + \r\n\r\n
        if end > n:
            raise ValueError("truncated WARC payload")
        if b[body_start + clen : end] != _CRLF + _CRLF:
            raise ValueError("WARC record not terminated by CRLF CRLF")
        yield pos, end
        pos = end


def _parse_headers(block: bytes) -> dict:
    headers = {}
    lines = block.split(_CRLF)
    for line in lines[1:]:  # lines[0] is the WARC/x.y version line
        if b":" not in line:
            raise ValueError(f"malformed WARC header line: {line!r}")
        k, v = line.split(b":", 1)
        headers[k.strip().lower().decode("ascii")] = v.strip().decode(
            "utf-8", "replace"
        )
    return headers


def parse_warc_bytes(b: bytes) -> list[dict]:
    """Parse a (possibly gzipped) WARC/WET byte stream into records:
    ``{warc_type, url, date, content_length, payload: bytes}``."""
    if b[:2] == b"\x1f\x8b":
        b = _gunzip_concat(b)
    out = []
    for start, end in _record_spans(b):
        hdr_end = b.find(_CRLF + _CRLF, start)
        headers = _parse_headers(b[start:hdr_end])
        clen = int(headers["content-length"])
        body_start = hdr_end + 4
        out.append(
            {
                "warc_type": headers.get("warc-type", ""),
                "url": headers.get("warc-target-uri"),
                "date": headers.get("warc-date"),
                "content_length": clen,
                "payload": b[body_start : body_start + clen],
            }
        )
    return out


WARC_RECORD_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("content_length", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def read_warc(spark: SparkSession, path_glob: str) -> DataFrame:
    """Read WARC/WET files (plain or .gz) into one row per record.

    One task per file (`binaryFile` source); the record walk happens
    executor-side in mapInPandas — nothing reaches the driver.
    """
    files = spark.read.format("binaryFile").load(path_glob)

    def _parse(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                for r in parse_warc_bytes(bytes(content)):
                    rows.append(
                        (
                            path,
                            r["warc_type"],
                            r["url"],
                            r["date"],
                            r["content_length"],
                            r["payload"],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in WARC_RECORD_SCHEMA.fields]
            )

    return files.select("path", "content").mapInPandas(
        _parse, WARC_RECORD_SCHEMA
    )


def wet_text_records(records: DataFrame) -> DataFrame:
    """Project WET conversion records to (url, text) — the handoff into
    the document pipeline (language id, quality rules, dedup)."""
    return records.filter(F.col("warc_type") == "conversion").select(
        "url",
        F.col("payload").cast("string").alias("text"),
        "content_length",
    )
