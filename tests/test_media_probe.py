"""probe_media: header-walk metadata for compressed + uncompressed
containers, with hand-built minimal payloads (no codec libs involved)."""

import numpy as np

from language_detection_spark.functions import codecs as c


def _jpeg(w: int, h: int) -> bytes:
    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
        + h.to_bytes(2, "big") + w.to_bytes(2, "big")
        + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    )
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _png(w: int, h: int) -> bytes:
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + b"\x08\x02\x00\x00\x00"
    return (b"\x89PNG\r\n\x1a\n" + (13).to_bytes(4, "big") + b"IHDR"
            + ihdr + b"\x00" * 4)


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 6


def _mp4(timescale: int, duration: int) -> bytes:
    mvhd_body = b"\x00\x00\x00\x00" + b"\x00" * 8 + timescale.to_bytes(
        4, "big"
    ) + duration.to_bytes(4, "big") + b"\x00" * 80
    mvhd = (8 + len(mvhd_body)).to_bytes(4, "big") + b"mvhd" + mvhd_body
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    ftyp = (16).to_bytes(4, "big") + b"ftyp" + b"isom" + b"\x00\x00\x02\x00"
    return ftyp + moov


def test_probe_compressed_formats():
    assert c.probe_media(_jpeg(640, 480)) == {
        "format": "jpeg", "width": 640, "height": 480}
    assert c.probe_media(_png(32, 64)) == {
        "format": "png", "width": 32, "height": 64}
    assert c.probe_media(_gif(12, 7)) == {
        "format": "gif", "width": 12, "height": 7}
    assert c.probe_media(_mp4(1000, 2500)) == {
        "format": "mp4", "duration_ms": 2500}
    # mvhd version 1 (64-bit duration)
    mvhd_body = b"\x01\x00\x00\x00" + b"\x00" * 16 + (90000).to_bytes(
        4, "big") + (450000).to_bytes(8, "big") + b"\x00" * 80
    mvhd = (8 + len(mvhd_body)).to_bytes(4, "big") + b"mvhd" + mvhd_body
    moov = (8 + len(mvhd)).to_bytes(4, "big") + b"moov" + mvhd
    ftyp = (16).to_bytes(4, "big") + b"ftyp" + b"mp42" + b"\x00" * 4
    assert c.probe_media(ftyp + moov) == {"format": "mp4", "duration_ms": 5000}


def test_probe_uncompressed_formats():
    px = np.zeros((5, 9, 3), dtype=np.uint8)
    assert c.probe_media(c.encode_bmp(px)) == {
        "format": "bmp", "width": 9, "height": 5}
    assert c.probe_media(c.encode_ppm(px)) == {
        "format": "ppm", "width": 9, "height": 5}
    wav = c.encode_wav(np.zeros(8000, dtype=np.int16), 16000)
    assert c.probe_media(wav) == {
        "format": "wav", "sample_rate": 16000, "duration_ms": 500}


def test_probe_garbage_and_truncated():
    assert c.probe_media(b"") is None
    assert c.probe_media(b"\x00" * 64) is None
    assert c.probe_media(_jpeg(640, 480)[:6]) is None  # truncated pre-SOF
    assert c.probe_media(b"\xff\xd8\xff") is None


def test_media_metadata_spark(spark):
    from pyspark.sql import functions as F

    from language_detection_spark.operators.multimodal import (
        media_metadata,
        synth_real_media_df,
    )

    df = synth_real_media_df(spark, n=20)
    out = media_metadata(df).collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(by_id) == 20
    for r in out:
        if r["kind"] == "image":
            # synth table cycles BMP / PNG / GIF / JPEG payloads (i % 5)
            assert r["probed_format"] == {
                0: "bmp", 2: "png", 3: "gif", 4: "jpeg"
            }[r["media_id"] % 5]
            assert r["width"] >= 20 and r["height"] >= 16
        else:
            assert r["probed_format"] == "wav"
            assert r["sample_rate"] == 16000
            assert r["duration_ms"] == 2048 * 1000 // 16000
    # probed dimensions must agree with the table's declared metadata
    decl = {r["media_id"]: r for r in df.select(
        "media_id", "width", "height").collect()}
    for mid, r in by_id.items():
        if r["kind"] == "image":
            assert (r["width"], r["height"]) == (
                decl[mid]["width"], decl[mid]["height"])
