"""Pure-numpy codec tests (functions/codecs.py) + the real (non-fake)
multimodal decode path end-to-end on genuine BMP/PPM/WAV payload bytes."""

import struct

import numpy as np
import pytest

from language_detection_spark.functions.codecs import (
    decode_bmp,
    decode_gif,
    decode_gif_indexed,
    decode_png,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_gif,
    encode_png,
    encode_ppm,
    encode_wav,
    sniff_format,
)

# real-world fixtures for third-party-encoder conformance (read-only,
# outside the repo; tests skip when absent)
_ICONS = "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/idlelib/Icons"
_SPARK_IMAGES = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/multi-channel"


def test_bmp_round_trip_rgb():
    rng = np.random.default_rng(1)
    for h, w in [(1, 1), (3, 5), (16, 16), (7, 13)]:  # odd widths hit padding
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        b = encode_bmp(px)
        assert sniff_format(b) == "bmp"
        back = decode_bmp(b)
        assert back.shape == (h, w, 3)
        assert (back == px).all()


def test_bmp_grayscale_promotes_to_rgb():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    back = decode_bmp(encode_bmp(px))
    assert back.shape == (3, 4, 3)
    assert (back[:, :, 0] == px).all() and (back[:, :, 1] == px).all()


def test_bmp_top_down_and_rejects():
    # hand-build a top-down BMP (negative height) and check orientation
    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    b = bytearray(encode_bmp(px))
    # height field at offset 14+8, flip sign and reverse rows in data
    struct.pack_into("<i", b, 22, -2)
    rows = decode_bmp(bytes(b))
    assert (rows == px[::-1]).all()
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 60)  # bpp=0
    with pytest.raises(ValueError):
        decode_bmp(b"notabmp")
    with pytest.raises(ValueError):
        decode_bmp(encode_bmp(px)[:-5])  # truncated pixel data


def test_ppm_pgm_round_trip_and_comments():
    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(4, 9), dtype=np.uint8)
    assert (decode_ppm(encode_ppm(rgb)) == rgb).all()
    assert (decode_ppm(encode_ppm(gray)) == gray).all()
    assert sniff_format(encode_ppm(rgb)) == "ppm"
    assert sniff_format(encode_ppm(gray)) == "pgm"
    # comments in the header are part of the netpbm grammar
    commented = b"P6\n# a comment\n7 5\n# more\n255\n" + rgb.tobytes()
    assert (decode_ppm(commented) == rgb).all()
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)  # 16-bit maxval
    with pytest.raises(ValueError):
        decode_ppm(encode_ppm(rgb)[:-3])


def test_wav_round_trip_mono_stereo():
    rng = np.random.default_rng(3)
    mono = rng.integers(-32768, 32768, size=500, dtype=np.int16)
    b = encode_wav(mono, 22050)
    assert sniff_format(b) == "wav"
    back, rate = decode_wav(b)
    assert rate == 22050 and back.shape == (500,) and (back == mono).all()
    stereo = rng.integers(-32768, 32768, size=(100, 2), dtype=np.int16)
    back2, rate2 = decode_wav(encode_wav(stereo, 8000))
    assert rate2 == 8000 and back2.shape == (100, 2) and (back2 == stereo).all()
    with pytest.raises(ValueError):
        decode_wav(b"RIFFxxxxWAVE")  # no chunks
    with pytest.raises(ValueError):
        decode_wav(b"not a wav at all, definitely not 44 bytes of RIFF")


def test_wav_truncated_fmt_raises_valueerror():
    """A fmt chunk shorter than 16 bytes must raise the documented
    ValueError, not struct.error."""
    body = (
        struct.pack("<4sI", b"fmt ", 8) + b"\x01\x00\x01\x00\x00\x00\x00\x00"
        + struct.pack("<4sI", b"data", 16) + b"\x00" * 16
    )
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(payload)


def test_wav_extra_chunks_skipped():
    """Decoders must walk RIFF chunks, not assume a 44-byte header: insert
    a LIST chunk (odd size → word-alignment padding) between fmt and data."""
    mono = np.arange(-5, 5, dtype=np.int16)
    b = encode_wav(mono, 16000)
    fmt_end = 12 + 8 + 16
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"  # pad byte
    patched = b[:fmt_end] + extra + b[fmt_end:]
    back, rate = decode_wav(patched)
    assert rate == 16000 and (back == mono).all()


# ---------------------------------------------------------------------------
# real decode path end-to-end (no fake decoder anywhere)
# ---------------------------------------------------------------------------


def test_decode_media_real_formats():
    from language_detection_spark.operators.multimodal import decode_media

    px = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    raw = decode_media(encode_bmp(px), "image", fake=False)
    assert (raw == px.ravel()).all()
    samples = np.array([-32768, -1, 0, 1, 32767], dtype=np.int16)
    raw_a = decode_media(encode_wav(samples), "audio", fake=False)
    # fixed affine quantization (s + 32768) >> 8
    assert raw_a.tolist() == [0, 127, 128, 128, 255]
    # a malformed JPEG now reaches the real decoder and fails loudly
    with pytest.raises(ValueError):
        decode_media(b"\xff\xd8\xff\xe0 fake jpeg header", "image", fake=False)
    # formats with no native codec (video) still refuse without fake=True
    with pytest.raises(NotImplementedError):
        decode_media(
            b"\x00\x00\x00\x18ftypisom not decodable", "video", fake=False
        )


def test_resize_image_real_round_trip():
    from language_detection_spark.operators.multimodal import resize_image

    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    out = resize_image(encode_bmp(px), 4, 4)
    assert sniff_format(out) == "bmp"
    small = decode_bmp(out)
    assert small.shape == (4, 4, 3)
    assert (small == px[::2][:, ::2]).all()  # exact nearest-neighbor gather
    out_p = resize_image(encode_ppm(px), 16, 2)
    assert sniff_format(out_p) == "ppm"
    assert decode_ppm(out_p).shape == (2, 16, 3)
    out_png = resize_image(encode_png(px), 4, 4)
    assert sniff_format(out_png) == "png"
    assert (decode_png(out_png) == px[::2][:, ::2]).all()
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(8, 8), dtype=np.uint8)
    out_gif = resize_image(encode_gif(idx, pal), 4, 4)
    assert sniff_format(out_gif) == "gif"
    small_idx, small_pal = decode_gif_indexed(out_gif)
    assert (small_idx == idx[::2][:, ::2]).all()  # palette reused, no requant
    assert (small_pal[:16] == pal).all()
    with pytest.raises(NotImplementedError):
        resize_image(b"\x00\x00\x00\x18ftypisom not an image", 2, 2)


def test_real_media_spark_end_to_end(spark):
    """extract_features and resize_media over GENUINE encoded payloads with
    fake=False — the full Spark path with zero fake decoding."""
    from language_detection_spark.operators.multimodal import (
        extract_features,
        resize_media,
        synth_real_media_df,
    )

    media = synth_real_media_df(spark, n=20)
    feats = extract_features(media, fake=False).collect()
    assert len(feats) == 20
    by_id = {r.media_id: r for r in feats}
    for i, r in by_id.items():
        assert sum(r.byte_hist) > 0 and len(r.feature) == 16
        assert 0.0 <= r.byte_mean <= 255.0
    # images: decoded size = H*W*3 of the row's declared dims
    img = media.filter("kind = 'image'").collect()
    for m in img:
        assert sum(by_id[m.media_id].byte_hist) == m.height * m.width * 3
    # audio: 2048 samples quantized to uint8
    aud = media.filter("kind = 'audio'").collect()
    for m in aud:
        assert sum(by_id[m.media_id].byte_hist) == 2048
    # resize runs on the real decoded geometry (no metadata tiling);
    # images are BMP / PNG / GIF / JPEG rows (i % 5 in {0, 2, 3, 4}) —
    # 16 of 20
    resized = resize_media(media, out_h=8, out_w=8, fake=False).collect()
    assert len(resized) == 16
    for r in resized:
        assert len(r.pixels) == 8 * 8 * 3  # RGB preserved
    # determinism: same seed → same features
    again = extract_features(synth_real_media_df(spark, n=20), fake=False).collect()
    assert {r.media_id: r.byte_mean for r in again} == {
        r.media_id: r.byte_mean for r in feats
    }


# ---------------------------------------------------------------------------
# PNG — stdlib zlib inflate + numpy unfilter
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_round_trip_all_filters(filter_type):
    rng = np.random.default_rng(7)
    for shape in [(1, 1), (13, 17), (13, 17, 3), (9, 5, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        b = encode_png(px, filter_type=filter_type)
        assert sniff_format(b) == "png"
        back = decode_png(b)
        assert back.shape == px.shape and (back == px).all()
    # smooth gradient — the case where Sub/Up/Average/Paeth actually differ
    yy, xx = np.mgrid[0:33, 0:47]
    grad = ((yy * 3 + xx * 5) % 256).astype(np.uint8)
    assert (decode_png(encode_png(grad, filter_type=filter_type)) == grad).all()


def test_png_rejects_malformed():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    b = bytearray(encode_png(px))
    bad = bytes(b[:40]) + bytes([b[40] ^ 0xFF]) + bytes(b[41:])
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bad)
    with pytest.raises(ValueError):
        decode_png(b[:20])  # truncated
    with pytest.raises(ValueError):
        decode_png(b"not a png")
    # 16-bit depth and Adam7 interlace are explicitly unsupported
    import struct as _s
    import zlib as _z

    def chunk(ctype, data):
        return (_s.pack(">I", len(data)) + ctype + data
                + _s.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF))

    magic = b"\x89PNG\r\n\x1a\n"
    ihdr16 = _s.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="8-bit"):
        decode_png(magic + chunk(b"IHDR", ihdr16) + chunk(b"IEND", b""))
    ihdr_i = _s.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    with pytest.raises(ValueError, match="interlace"):
        decode_png(magic + chunk(b"IHDR", ihdr_i) + chunk(b"IEND", b""))


def test_png_palette_color_type():
    """Hand-build a color-type-3 PNG (PLTE + index scanlines) and check
    the palette expansion."""
    import struct as _s
    import zlib as _z

    def chunk(ctype, data):
        return (_s.pack(">I", len(data)) + ctype + data
                + _s.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF))

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 8, 7]],
                   dtype=np.uint8)
    idx = np.array([[0, 1, 2], [3, 2, 1]], dtype=np.uint8)
    raw = b"".join(b"\x00" + row.tobytes() for row in idx)
    b = (b"\x89PNG\r\n\x1a\n"
         + chunk(b"IHDR", _s.pack(">IIBBBBB", 3, 2, 8, 3, 0, 0, 0))
         + chunk(b"PLTE", pal.tobytes())
         + chunk(b"IDAT", _z.compress(raw))
         + chunk(b"IEND", b""))
    out = decode_png(b)
    assert out.shape == (2, 3, 3)
    assert (out == pal[idx]).all()


def test_png_real_third_party_files():
    """Decode PNGs produced by real-world encoders (not our own)."""
    import os

    fixtures = [
        f"{_ICONS}/idle_16.png",
        f"{_SPARK_IMAGES}/BGRA.png",
    ]
    found = [p for p in fixtures if os.path.exists(p)]
    if not found:
        pytest.skip("no third-party PNG fixtures on this machine")
    for p in found:
        arr = decode_png(open(p, "rb").read())
        assert arr.ndim in (2, 3) and arr.size > 0


# ---------------------------------------------------------------------------
# GIF — variable-width LSB-first LZW (decoder and encoder both ours)
# ---------------------------------------------------------------------------


def test_gif_round_trip_palette_sizes():
    rng = np.random.default_rng(11)
    # 2..256 colors: exercises min-code-size 2..8 and width growth
    for npal, shape in [(2, (7, 9)), (4, (16, 16)), (37, (20, 20)),
                        (200, (40, 50)), (256, (80, 90))]:
        pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
        idx = rng.integers(0, npal, size=shape, dtype=np.uint8)
        b = encode_gif(idx, pal)
        assert sniff_format(b) == "gif"
        i2, p2 = decode_gif_indexed(b)
        assert (i2 == idx).all() and (p2[:npal] == pal).all()
    rgb = decode_gif(b)
    assert (rgb == pal[idx]).all()


def test_gif_dictionary_reset_and_repetition():
    rng = np.random.default_rng(12)
    # random 256-color 200x300: LZW table crosses 4096 → clear + reset
    idx = rng.integers(0, 256, size=(200, 300), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    assert (decode_gif_indexed(encode_gif(idx, pal))[0] == idx).all()
    # highly repetitive: long chains, KwKwK cases
    rep = np.tile(np.arange(16, dtype=np.uint8) % 7, (300, 20))[:, :123]
    pal7 = rng.integers(0, 256, size=(7, 3), dtype=np.uint8)
    assert (decode_gif_indexed(encode_gif(rep, pal7))[0] == rep).all()
    # single-run KwKwK stressor
    runs = np.zeros((4, 64), dtype=np.uint8)
    assert (decode_gif_indexed(encode_gif(runs, pal7))[0] == runs).all()


def test_gif_interlaced_and_extensions():
    """Hand-build an interlaced GIF with an 89a graphic-control extension:
    the decoder must skip the extension and undo the 4-pass row order."""
    from language_detection_spark.functions.codecs import (
        _GIF_INTERLACE_PASSES,
        _lzw_encode,
    )

    rng = np.random.default_rng(13)
    h, w, npal = 13, 9, 8
    pal = rng.integers(0, 256, size=(npal, 3), dtype=np.uint8)
    idx = rng.integers(0, npal, size=(h, w), dtype=np.uint8)
    order = np.concatenate(
        [np.arange(s, h, step) for s, step in _GIF_INTERLACE_PASSES]
    )
    stored = idx[order]  # rows as laid out in the stream
    mcs = 3
    lzw = _lzw_encode(stored.tobytes(), mcs)
    blocks = bytearray()
    for off in range(0, len(lzw), 255):
        part = lzw[off:off + 255]
        blocks += bytes([len(part)]) + part
    blocks.append(0)
    k = 3  # 8-entry color table
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # graphic control extension
    payload = (
        b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (k - 1), 0, 0)
        + pal.tobytes() + gce
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlace flag
        + bytes([mcs]) + bytes(blocks) + b"\x3b"
    )
    i2, p2 = decode_gif_indexed(payload)
    assert (i2 == idx).all()
    assert (p2 == pal).all()


def test_gif_real_third_party_files():
    """Decode GIFs produced by real-world encoders — the conformance check
    for the LZW width-growth schedule (early vs late bump)."""
    import os

    if not os.path.isdir(_ICONS):
        pytest.skip("no third-party GIF fixtures on this machine")
    names = [n for n in os.listdir(_ICONS) if n.endswith(".gif")]
    assert names, "fixture dir exists but holds no GIFs"
    for n in names:
        arr = decode_gif(open(f"{_ICONS}/{n}", "rb").read())
        assert arr.ndim == 3 and arr.shape[2] == 3 and arr.size > 0


# ---------------------------------------------------------------------------
# JPEG — baseline sequential decoder (functions/jpeg.py)
# ---------------------------------------------------------------------------

_JPEGS = [
    f"{_SPARK_IMAGES}/chr30.4.184.jpg",
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/29.5.a_b_EGDP022204.jpg",
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/54893.jpg",
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/DP153539.jpg",
    "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/kittens/DP802813.jpg",
]


def test_jpeg_decodes_real_files():
    import os

    from language_detection_spark.functions.jpeg import decode_jpeg

    found = [p for p in _JPEGS if os.path.exists(p)]
    if not found:
        pytest.skip("no JPEG fixtures on this machine")
    for p in found:
        arr = decode_jpeg(open(p, "rb").read())
        assert arr.ndim == 3 and arr.shape[2] == 3 and arr.dtype == np.uint8
        assert sniff_format(open(p, "rb").read()) == "jpeg"


def test_jpeg_rejects_garbage_and_unsupported_modes():
    from language_detection_spark.functions.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg at all")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0 truncated")
    # lossless/arithmetic SOF markers still reject with a clear error
    good = encode_jpeg(np.arange(64, dtype=np.uint8).reshape(8, 8))
    sof = good.find(b"\xff\xc0")
    for bad_sof in (0xC3, 0xC9):
        bad = bytearray(good)
        bad[sof + 1] = bad_sof
        with pytest.raises(ValueError, match="unsupported JPEG mode"):
            decode_jpeg(bytes(bad))


def test_jpeg_progressive_round_trip_and_fixture():
    """SOF2 support: our spectral-selection progressive encode decodes to
    EXACTLY the baseline pixels (same coefficients, different transmission
    order), and the real progressive fixture (libjpeg successive-
    approximation scan script) decodes with sane geometry."""
    import os

    from language_detection_spark.functions.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:24, 0:40]
    px = np.stack(
        [((yy * 3 + xx) % 256), ((xx * 5) % 256), ((yy * 7) % 256)], axis=2
    ).astype(np.uint8)
    plain = encode_jpeg(px, quality=90)
    prog = encode_jpeg(px, quality=90, progressive=True)
    assert prog[prog.find(b"\xff\xc2") : prog.find(b"\xff\xc2") + 2] == b"\xff\xc2"
    assert prog.count(b"\xff\xda") == 4  # DC scan + 3 per-comp AC scans
    assert (decode_jpeg(prog) == decode_jpeg(plain)).all()
    g = ((yy * 4 + xx) % 256).astype(np.uint8)
    assert (
        decode_jpeg(encode_jpeg(g, progressive=True))
        == decode_jpeg(encode_jpeg(g))
    ).all()
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(px, progressive=True, restart_interval=2)
    fixture = f"{_SPARK_IMAGES}/grayscale.jpg"  # SOF2, SA + spectral sel.
    if os.path.exists(fixture):
        arr = decode_jpeg(open(fixture, "rb").read())
        assert arr.ndim == 2 and arr.dtype == np.uint8 and arr.size > 10000


def test_jpeg_restart_interval_round_trip():
    """encode_jpeg(restart_interval=N) emits DRI + RSTn markers; the
    decoder's segment-split path must reproduce EXACTLY the pixels of the
    plain stream (restart only resets DC predictors, never changes
    values)."""
    from language_detection_spark.functions.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:24, 0:40]
    px = np.stack(
        [((yy * 3 + xx) % 256), ((xx * 5) % 256), ((yy * 7) % 256)], axis=2
    ).astype(np.uint8)
    plain = encode_jpeg(px, quality=90)
    restarted = encode_jpeg(px, quality=90, restart_interval=2)
    assert b"\xff\xdd" in restarted and b"\xff\xdd" not in plain
    assert b"\xff\xd0" in restarted  # first RST marker present
    assert (decode_jpeg(restarted) == decode_jpeg(plain)).all()
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(px, restart_interval=-1)
    # a stream PROMISING restarts but missing them must raise, not loop
    broken = bytearray(restarted)
    i = broken.find(b"\xff\xd0")
    broken[i : i + 2] = b"\x00\x00"
    with pytest.raises(ValueError):
        decode_jpeg(bytes(broken))


def test_jpeg_malformed_headers_raise_valueerror():
    """Undefined Huffman/quant table references, SOS/SOF component-id
    mismatches, and zero sampling factors are ValueError (the documented
    malformed-input contract), never KeyError/ZeroDivisionError."""
    from language_detection_spark.functions.jpeg import decode_jpeg, encode_jpeg

    g = np.arange(64, dtype=np.uint8).reshape(8, 8)
    good = encode_jpeg(g, quality=90)
    sof = good.find(b"\xff\xc0")
    sos = good.find(b"\xff\xda")
    assert sof > 0 and sos > sof
    # layout: SOF0 comp0 at sof+10 (id, hv, tq); SOS comp0 at sos+5 (id, tables)
    cases = [
        (sos + 6, 0x33, "Huffman"),          # undefined dc/ac table 3
        (sof + 12, 3, "quant"),              # undefined quant table 3
        (sof + 11, 0x10, "sampling factor"), # v sampling factor 0
        (sos + 5, 9, "missing component"),   # SOS names a non-frame id
    ]
    for off, val, msg in cases:
        bad = bytearray(good)
        bad[off] = val
        with pytest.raises(ValueError, match=msg):
            decode_jpeg(bytes(bad))


def test_jpeg_encoder_round_trip():
    """encode_jpeg → decode_jpeg: reconstruction within quantization error
    (gradient content), exact gray at high quality, and the rejects."""
    from language_detection_spark.functions.jpeg import decode_jpeg, encode_jpeg

    yy, xx = np.mgrid[0:40, 0:56]
    px = np.stack(
        [((yy * 3 + xx * 2) % 256), ((yy * 5) % 256), ((xx * 7) % 256)],
        axis=2,
    ).astype(np.uint8)
    back = decode_jpeg(encode_jpeg(px, quality=95))
    d = np.abs(back.astype(int) - px.astype(int))
    assert back.shape == px.shape and d.max() <= 8 and d.mean() < 1.0
    g = ((yy * 4 + xx) % 256).astype(np.uint8)
    backg = decode_jpeg(encode_jpeg(g, quality=95))
    assert backg.shape == g.shape and (backg == g).all()  # gray: exact here
    # worst-case content (noise) still bounded at quality 100
    rng = np.random.default_rng(6)
    n = rng.integers(0, 256, size=(17, 23, 3), dtype=np.uint8)
    dn = np.abs(
        decode_jpeg(encode_jpeg(n, quality=100)).astype(int) - n.astype(int)
    )
    assert dn.max() <= 3
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((0, 4), np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg(np.zeros((4, 4, 2), np.uint8))


def test_jpeg_encoder_streams_decode_in_java_imageio(spark):
    """Encoder conformance via the independent arbiter: Java ImageIO must
    decode OUR baseline streams (fixed canonical Huffman tables, 4:4:4)
    and reconstruct the original within quantization error."""
    import os
    import tempfile

    from language_detection_spark.functions.jpeg import encode_jpeg

    yy, xx = np.mgrid[0:40, 0:56]
    px = np.stack(
        [((yy * 3 + xx * 2) % 256), ((yy * 5) % 256), ((xx * 7) % 256)],
        axis=2,
    ).astype(np.uint8)
    tmp = tempfile.mkdtemp()
    p = os.path.join(tmp, "ours.jpg")
    with open(p, "wb") as f:
        f.write(encode_jpeg(px, quality=95))
    row = spark.read.format("image").load(p).select("image.*").collect()[0]
    assert (row.height, row.width) == px.shape[:2]
    jav = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(
        row.height, row.width, row.nChannels
    )
    d = np.abs(jav[:, :, :3].astype(int) - px[:, :, ::-1].astype(int))
    assert d.max() <= 8 and d.mean() < 1.0


def test_jpeg_matches_java_imageio(spark):
    """Independent-arbiter conformance for the JPEG path: Java ImageIO
    decodes via a separate native codec stack; entropy decode and geometry
    must agree exactly, pixels within the IDCT/rounding tolerance (our
    float IDCT vs their integer IDCT).  Bound: mean |diff| < 1 count,
    <1% of pixels differ by more than 2 counts."""
    import os

    from language_detection_spark.functions.jpeg import decode_jpeg

    found = [p for p in _JPEGS if os.path.exists(p)]
    if not found:
        pytest.skip("no JPEG fixtures on this machine")
    for p in found:
        row = spark.read.format("image").load(p).select("image.*").collect()[0]
        jav = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(
            row.height, row.width, row.nChannels
        )
        mine = decode_jpeg(open(p, "rb").read())
        assert mine.shape[:2] == (row.height, row.width)
        diff = np.abs(
            mine[:, :, ::-1].astype(np.int32) - jav[:, :, :3].astype(np.int32)
        )
        assert float(diff.mean()) < 1.0, p
        assert float((diff > 2).mean()) < 0.01, p


def test_jpeg_progressive_matches_java_imageio(spark):
    """Progressive conformance, both directions: (a) Java ImageIO decodes
    the real SOF2 fixture (successive approximation + spectral selection,
    libjpeg scan script) and we must match it within IDCT tolerance;
    (b) ImageIO decodes OUR progressive streams back to the original
    within quantization error."""
    import os
    import tempfile

    from language_detection_spark.functions.jpeg import decode_jpeg, encode_jpeg

    fixture = f"{_SPARK_IMAGES}/grayscale.jpg"
    if os.path.exists(fixture):
        row = (
            spark.read.format("image").load(fixture)
            .select("image.*").collect()[0]
        )
        jav = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(
            row.height, row.width, row.nChannels
        )
        mine = decode_jpeg(open(fixture, "rb").read())
        assert mine.shape == (row.height, row.width)
        # ImageIO loads grayscale as a single channel
        diff = np.abs(mine.astype(np.int32) - jav[:, :, 0].astype(np.int32))
        assert float(diff.mean()) < 1.0
        assert float((diff > 2).mean()) < 0.01
    yy, xx = np.mgrid[0:40, 0:56]
    px = np.stack(
        [((yy * 3 + xx * 2) % 256), ((yy * 5) % 256), ((xx * 7) % 256)],
        axis=2,
    ).astype(np.uint8)
    tmp = tempfile.mkdtemp()
    p = os.path.join(tmp, "ours_prog.jpg")
    with open(p, "wb") as f:
        f.write(encode_jpeg(px, quality=95, progressive=True))
    row = spark.read.format("image").load(p).select("image.*").collect()[0]
    assert (row.height, row.width) == px.shape[:2]
    jav = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(
        row.height, row.width, row.nChannels
    )
    d = np.abs(jav[:, :, :3].astype(int) - px[:, :, ::-1].astype(int))
    assert d.max() <= 8 and d.mean() < 1.0


def test_jpeg_through_decode_media_and_features(spark):
    """decode_media routes JPEG to the real decoder; extract_features with
    fake=False over a real JPEG payload produces geometry-true stats."""
    import os

    from language_detection_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        extract_features,
    )

    found = [p for p in _JPEGS if os.path.exists(p)]
    if not found:
        pytest.skip("no JPEG fixtures on this machine")
    payload = open(found[0], "rb").read()
    from language_detection_spark.functions.jpeg import decode_jpeg

    h, w, _ = decode_jpeg(payload).shape
    raw = decode_media(payload, "image", fake=False)
    assert raw.size == h * w * 3
    df = spark.createDataFrame(
        [(0, "image", bytearray(payload), w, h, None, 1)], MEDIA_SCHEMA
    )
    feats = extract_features(df, fake=False).collect()
    assert len(feats) == 1 and sum(feats[0].byte_hist) == h * w * 3


def test_png_gif_match_java_imageio(spark):
    """Independent-arbiter conformance: Spark's image data source decodes
    via Java ImageIO (a codec stack we share zero code with); our decoders
    must agree pixel-exactly.  ImageIO normalizes to BGR(A) and applies
    GIF/tRNS transparency, so compare RGB channels on opaque pixels."""
    import os

    fixtures = [
        f"{_SPARK_IMAGES}/BGRA.png",
        f"{_ICONS}/idle_16.png",
        f"{_ICONS}/idle_16.gif",
        f"{_ICONS}/idle_48.gif",
        f"{_ICONS}/python.gif",
    ]
    found = [p for p in fixtures if os.path.exists(p)]
    if not found:
        pytest.skip("no third-party image fixtures on this machine")
    for p in found:
        row = spark.read.format("image").load(p).select("image.*").collect()[0]
        jav = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(
            row.height, row.width, row.nChannels
        )
        raw = open(p, "rb").read()
        mine = decode_png(raw) if p.endswith("png") else decode_gif(raw)
        assert mine.shape[:2] == (row.height, row.width)
        if mine.ndim == 2:
            mine = np.repeat(mine[:, :, None], 3, axis=2)
        if mine.shape[2] == 4 and row.nChannels == 4:
            # full BGRA comparison, alpha included
            assert (mine[:, :, [2, 1, 0, 3]] == jav).all(), p
            continue
        opaque = (
            jav[:, :, 3] == 255
            if row.nChannels == 4
            else np.ones(jav.shape[:2], dtype=bool)
        )
        assert opaque.any(), p
        assert (
            mine[:, :, :3][:, :, ::-1][opaque] == jav[:, :, :3][opaque]
        ).all(), p


# hypothesis property round-trips — arbitrary shapes/values, not just the
# handful of seeded cases above
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra.numpy import arrays

    @given(
        arrays(
            np.uint8,
            st.tuples(st.integers(1, 12), st.integers(1, 12), st.just(3)),
        )
    )
    @settings(max_examples=40, deadline=None)
    def test_bmp_round_trip_property(px):
        assert (decode_bmp(encode_bmp(px)) == px).all()

    @given(
        arrays(np.uint8, st.tuples(st.integers(1, 12), st.integers(1, 12)))
    )
    @settings(max_examples=40, deadline=None)
    def test_pgm_round_trip_property(px):
        assert (decode_ppm(encode_ppm(px)) == px).all()

    @given(
        arrays(np.int16, st.integers(1, 400)),
        st.sampled_from([8000, 16000, 44100]),
    )
    @settings(max_examples=40, deadline=None)
    def test_wav_round_trip_property(samples, rate):
        back, r = decode_wav(encode_wav(samples, rate))
        assert r == rate and (back == samples).all()

    @given(
        arrays(
            np.uint8,
            st.tuples(st.integers(1, 12), st.integers(1, 12), st.just(3)),
        ),
        st.integers(0, 4),
    )
    @settings(max_examples=40, deadline=None)
    def test_png_round_trip_property(px, filter_type):
        assert (decode_png(encode_png(px, filter_type=filter_type)) == px).all()

    @given(
        arrays(np.uint8, st.tuples(st.integers(1, 24), st.integers(1, 24))),
        st.integers(2, 256),
    )
    @settings(max_examples=40, deadline=None)
    def test_gif_round_trip_property(idx, npal):
        idx = (idx % npal).astype(np.uint8)
        pal = np.arange(npal * 3, dtype=np.uint32).reshape(npal, 3)
        pal = (pal % 256).astype(np.uint8)
        i2, p2 = decode_gif_indexed(encode_gif(idx, pal))
        assert (i2 == idx).all() and (p2[:npal] == pal).all()

    @given(
        arrays(
            np.uint8,
            st.tuples(st.integers(1, 20), st.integers(1, 20), st.just(3)),
        )
    )
    @settings(max_examples=20, deadline=None)
    def test_jpeg_round_trip_property(px):
        # JPEG is lossy; at quality 100 the error is bounded by DCT
        # rounding + the q=1..2 quantization floor
        from language_detection_spark.functions.jpeg import (
            decode_jpeg,
            encode_jpeg,
        )

        back = decode_jpeg(encode_jpeg(px, quality=100))
        assert back.shape == px.shape
        assert np.abs(back.astype(int) - px.astype(int)).max() <= 6

except ImportError:  # pragma: no cover - hypothesis is in the base image
    pass


def test_avi_mjpeg_container_round_trip():
    """MJPEG AVI: encode frames → container → exact frame bytes back;
    probe reads geometry/frame count/duration from the avih header; the
    sampled frames decode with the native JPEG codec."""
    from language_detection_spark.functions.codecs import (
        decode_avi_frames,
        encode_avi_mjpeg,
        probe_media,
        sniff_format,
    )
    from language_detection_spark.functions.jpeg import decode_jpeg, encode_jpeg

    frames = [
        encode_jpeg(
            np.full((16, 24, 3), 20 * t, np.uint8),
            quality=90,
            progressive=t % 2 == 1,
        )
        for t in range(5)
    ]
    avi = encode_avi_mjpeg(frames, 24, 16, fps=10)
    assert sniff_format(avi) == "avi"
    assert probe_media(avi) == {
        "format": "avi", "width": 24, "height": 16, "n_frames": 5,
        "duration_ms": 500,
    }
    back = decode_avi_frames(avi)
    assert [bytes(f) for f in back] == frames
    px = decode_jpeg(back[2])
    assert px.shape == (16, 24, 3)
    with pytest.raises(ValueError):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        encode_avi_mjpeg([b"not a jpeg"], 8, 8)
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], 8, 8)
    # truncation anywhere must raise ValueError (the module's documented
    # structural-lie contract) — NEVER a bare struct.error
    for cut in (13, 20, len(avi) // 2, len(avi) - 3):
        with pytest.raises(ValueError):
            decode_avi_frames(avi[:cut])


def test_sample_frames_real_for_avi():
    """sample_frames is REAL for MJPEG AVI (every_n schedule + cap) and
    still raises for MP4 (ffmpeg territory); decode_media concatenates
    all frames' pixels."""
    from language_detection_spark.functions.codecs import encode_avi_mjpeg
    from language_detection_spark.functions.jpeg import encode_jpeg
    from language_detection_spark.operators.multimodal import (
        decode_media,
        sample_frames,
    )

    frames = [
        encode_jpeg(np.full((8, 8, 3), 10 * t, np.uint8)) for t in range(7)
    ]
    avi = encode_avi_mjpeg(frames, 8, 8, fps=5)
    got = sample_frames(avi, 3)
    assert [bytes(f) for f in got] == [frames[0], frames[3], frames[6]]
    assert len(sample_frames(avi, 1, max_frames=2)) == 2
    raw = decode_media(avi, "video", fake=False)
    assert raw.size == 7 * 8 * 8 * 3
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_frames(b"\x00\x00\x00\x18ftypisom rest-of-mp4-box-data", 2)


def test_extract_frame_features_distributed(spark):
    """synth_video_df → extract_frame_features: the distributed
    frame-sampling decode path — every-2nd-frame schedule, per-frame
    means from real JPEG decode inside mapInPandas."""
    from language_detection_spark.operators.multimodal import (
        extract_frame_features,
        synth_video_df,
    )

    videos = synth_video_df(spark, n=8)
    rows = extract_frame_features(videos, every_n=2).collect()
    by_media: dict = {}
    for r in rows:
        by_media.setdefault(r["media_id"], []).append(r)
    assert len(by_media) == 8
    src = {r["media_id"]: r for r in videos.collect()}
    for mid, frames in by_media.items():
        n_frames = src[mid]["n_frames"]
        n_sampled = -(-n_frames // 2)
        # one row per sampled frame, atomic columns only
        assert len(frames) == n_sampled
        assert sorted(f["frame_idx"] for f in frames) == list(
            range(0, n_frames, 2)
        )
        for f in frames:
            assert f["n_frames"] == n_frames
            assert f["n_sampled"] == n_sampled
            assert 0.0 <= f["frame_mean"] <= 255.0


def test_decode_jpeg_batch_bit_identical():
    """Lockstep batch decode == scalar decode, bit for bit, across
    baseline/progressive/restart-interval/grayscale/color payloads and
    across lockstep group boundaries (small max_blocks forces several
    groups)."""
    import numpy as np

    from language_detection_spark.functions.jpeg import (
        decode_jpeg,
        decode_jpeg_batch,
        encode_jpeg,
    )

    rng = np.random.default_rng(11)
    payloads = []
    for i in range(48):
        h, w = int(8 + rng.integers(0, 90)), int(8 + rng.integers(0, 90))
        if i % 3 == 0:
            px = rng.integers(0, 256, (h, w), dtype=np.uint8)
        else:
            yy, xx = np.mgrid[0:h, 0:w]
            px = np.clip(
                (yy * 3 + xx * 2)[:, :, None] % 256
                + rng.integers(-20, 21, (h, w, 3)),
                0, 255,
            ).astype(np.uint8)
        kw = {}
        if i % 5 == 2:
            kw["progressive"] = True  # exercises the scalar-fallback mix
        elif i % 4 == 1:
            kw["restart_interval"] = 3  # multiple lanes per image
        payloads.append(
            encode_jpeg(px, quality=int(55 + (i % 6) * 9), **kw)
        )
    scalar = [decode_jpeg(p) for p in payloads]
    for kwargs in ({"min_lanes": 1}, {"min_lanes": 1, "max_blocks": 512}):
        batch = decode_jpeg_batch(payloads, **kwargs)
        assert all(
            a.shape == b.shape and (a == b).all()
            for a, b in zip(scalar, batch)
        )
    # below min_lanes everything takes the scalar path — still identical
    few = decode_jpeg_batch(payloads[:3])
    assert all((a == b).all() for a, b in zip(scalar[:3], few))


def test_decode_jpeg_batch_error_parity():
    """A bad payload in a batch raises the scalar decoder's exact
    exception; corrupted entropy streams either fail identically or
    decode to identical pixels."""
    import numpy as np
    import pytest

    from language_detection_spark.functions.jpeg import (
        decode_jpeg,
        decode_jpeg_batch,
        encode_jpeg,
    )

    rng = np.random.default_rng(5)
    px = np.clip(
        np.mgrid[0:40, 0:56][0][:, :, None] * 5
        + rng.integers(-9, 10, (40, 56, 3)),
        0, 255,
    ).astype(np.uint8)
    good = encode_jpeg(px, quality=80)
    with pytest.raises(ValueError, match="no scan data"):
        decode_jpeg_batch([good, b"\xff\xd8\xff\xe0 truncated", good])
    for seed in range(12):
        r2 = np.random.default_rng(seed)
        bad = bytearray(good)
        for _ in range(3):
            bad[int(r2.integers(len(bad) // 2, len(bad)))] = int(
                r2.integers(0, 256)
            )
        bad = bytes(bad)
        try:
            want, want_err = decode_jpeg(bad), None
        except ValueError as e:
            want, want_err = None, str(e)
        try:
            got = decode_jpeg_batch([bad] * 20, min_lanes=1)[9]
            got_err = None
        except ValueError as e:
            got, got_err = None, str(e)
        assert want_err == got_err
        if want is not None:
            assert (want == got).all()


def test_decode_media_batch_matches_scalar(spark):
    """decode_media_batch == row-by-row decode_media over a mixed batch
    of real formats (incl. MJPEG AVI whose frames join the lockstep) and
    fake-decoder rows."""
    import numpy as np

    from language_detection_spark.operators.multimodal import (
        decode_media,
        decode_media_batch,
        synth_real_media_df,
        synth_video_df,
    )

    media = synth_real_media_df(spark, n=20).collect()
    videos = synth_video_df(spark, n=4).collect()
    payloads = [bytes(r["payload"]) for r in media + videos]
    kinds = [r["kind"] for r in media + videos]
    # an unrecognized payload exercising the fake path
    payloads.append(b"\x00\x01unknown-bytes")
    kinds.append("image")
    want = [decode_media(p, k, fake=True) for p, k in zip(payloads, kinds)]
    got = decode_media_batch(payloads, kinds, fake=True)
    assert len(want) == len(got)
    assert all(
        isinstance(g, np.ndarray) and (w == g).all()
        for w, g in zip(want, got)
    )
