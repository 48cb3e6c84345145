"""Pure-numpy codec tests (functions/codecs.py) + the real (non-fake)
multimodal decode path end-to-end on genuine BMP/PPM/WAV payload bytes."""

import struct

import numpy as np
import pytest

from language_detection_spark.functions.codecs import (
    decode_bmp,
    decode_ppm,
    decode_wav,
    encode_bmp,
    encode_ppm,
    encode_wav,
    sniff_format,
)


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
    # compressed formats still refuse without fake=True
    with pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8\xff\xe0 fake jpeg header", "image", fake=False)


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
    with pytest.raises(NotImplementedError):
        resize_image(b"\x89PNG\r\n\x1a\n....", 2, 2)


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
    # resize runs on the real decoded geometry (no metadata tiling)
    resized = resize_media(media, out_h=8, out_w=8, fake=False).collect()
    assert len(resized) == 10
    for r in resized:
        assert len(r.pixels) == 8 * 8 * 3  # RGB preserved
    # determinism: same seed → same features
    again = extract_features(synth_real_media_df(spark, n=20), fake=False).collect()
    assert {r.media_id: r.byte_mean for r in again} == {
        r.media_id: r.byte_mean for r in feats
    }


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

except ImportError:  # pragma: no cover - hypothesis is in the base image
    pass
