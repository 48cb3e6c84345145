"""Pure-numpy codecs for UNCOMPRESSED media containers: BMP (24-bit
BI_RGB), PPM/PGM (binary P6/P5), and WAV (PCM16).  These formats need no
codec library — just header parsing + an array view — so the multimodal
decode path is REAL for them in this environment; compressed formats
(JPEG/PNG/MP4/…) stay stubbed behind NotImplementedError in
operators/multimodal.py.

Encoders exist so tests and synthetic tables can produce genuine on-disk
payload bytes; decoders validate headers strictly and raise ValueError on
malformed/unsupported input (never silently misread).

Format references are the public specs: Windows BITMAPFILEHEADER/
BITMAPINFOHEADER layout, netpbm P5/P6 grammar, RIFF/WAVE PCM chunks.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# sniffing
# --------------------------------------------------------------------------


def sniff_format(payload: bytes) -> str | None:
    """Identify an uncompressed container by magic bytes: 'bmp', 'ppm',
    'pgm', 'wav', or None (unknown / compressed / too short)."""
    b = bytes(payload[:16])
    if b[:2] == b"BM" and len(payload) >= 54:
        return "bmp"
    if b[:2] == b"P6" and len(b) > 2 and b[2:3].isspace():
        return "ppm"
    if b[:2] == b"P5" and len(b) > 2 and b[2:3].isspace():
        return "pgm"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    return None


# --------------------------------------------------------------------------
# BMP — 24-bit uncompressed (BI_RGB), bottom-up or top-down
# --------------------------------------------------------------------------


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(H, W) grayscale or (H, W, 3) RGB uint8 → 24-bit BI_RGB BMP bytes
    (bottom-up rows, 4-byte row padding)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError(f"expected (H,W) or (H,W,3), got {px.shape}")
    h, w, _ = px.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    # BGR order, bottom-up, padded rows
    bgr = px[::-1, :, ::-1]
    rows = np.zeros((h, row_bytes + pad), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    data = rows.tobytes()
    offset = 14 + 40
    file_size = offset + len(data)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0
    )
    return header + info + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes → (H, W, 3) RGB uint8.  Raises ValueError
    on any other BMP flavor (palettes, compression, other bit depths)."""
    b = bytes(payload)
    if len(b) < 54 or b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _, _fsize, _, _, offset = struct.unpack_from("<2sIHHI", b, 0)
    hdr_size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", b, 14)
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    if planes != 1 or bpp != 24 or comp != 0:
        raise ValueError(
            f"only 24-bit uncompressed BMP supported (planes={planes}, "
            f"bpp={bpp}, compression={comp})"
        )
    top_down = h < 0
    h = abs(h)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dims {w}x{h}")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    need = offset + stride * h
    if len(b) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, have {len(b)}")
    rows = np.frombuffer(b, dtype=np.uint8, count=stride * h, offset=offset)
    rows = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # stored BGR
    if not top_down:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


# --------------------------------------------------------------------------
# PPM / PGM — binary netpbm (P6 RGB / P5 grayscale), maxval <= 255
# --------------------------------------------------------------------------


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary P6; (H, W) uint8 → binary P5."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 3 and px.shape[2] == 3:
        magic = b"P6"
    elif px.ndim == 2:
        magic = b"P5"
    else:
        raise ValueError(f"expected (H,W) or (H,W,3), got {px.shape}")
    h, w = px.shape[:2]
    return magic + f"\n{w} {h}\n255\n".encode("ascii") + px.tobytes()


def _pnm_tokens(b: bytes, n: int, start: int) -> tuple[list[int], int]:
    """Read n whitespace-separated ASCII integers (skipping '#' comments)
    from offset start; returns (values, offset one byte past the single
    whitespace that terminates the last token — the netpbm grammar)."""
    vals: list[int] = []
    i = start
    while len(vals) < n:
        while i < len(b) and (b[i : i + 1].isspace() or b[i : i + 1] == b"#"):
            if b[i : i + 1] == b"#":
                while i < len(b) and b[i] != 0x0A:
                    i += 1
            i += 1
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        vals.append(int(b[i:j]))
        i = j
    return vals, i + 1  # exactly one whitespace byte after maxval


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 → (H, W, 3) uint8; binary P5 → (H, W) uint8."""
    b = bytes(payload)
    magic = b[:2]
    if magic not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    (w, h, maxval), off = _pnm_tokens(b, 3, 2)
    if maxval > 255 or maxval <= 0 or w <= 0 or h <= 0:
        raise ValueError(f"unsupported PNM params w={w} h={h} maxval={maxval}")
    channels = 3 if magic == b"P6" else 1
    need = w * h * channels
    if len(b) - off < need:
        raise ValueError(f"truncated PNM: need {need} bytes, have {len(b) - off}")
    arr = np.frombuffer(b, dtype=np.uint8, count=need, offset=off)
    return arr.reshape((h, w, 3) if channels == 3 else (h, w)).copy()


# --------------------------------------------------------------------------
# WAV — RIFF/WAVE, PCM 16-bit
# --------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """(n,) or (n, channels) int16 → PCM16 WAV bytes."""
    s = np.asarray(samples, dtype=np.int16)
    if s.ndim == 1:
        s = s[:, None]
    if s.ndim != 2:
        raise ValueError(f"expected (n,) or (n, channels), got {s.shape}")
    n, ch = s.shape
    data = s.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<4sIHHIIHH", b"fmt ", 16, 1, ch, sample_rate, byte_rate, ch * 2, 16)
    hdr = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + 8 + len(data), b"WAVE")
    return hdr + fmt + struct.pack("<4sI", b"data", len(data)) + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV bytes → ((n, channels) int16 squeezed to (n,) when mono,
    sample_rate).  Walks RIFF chunks; raises on non-PCM16."""
    b = bytes(payload)
    if len(b) < 44 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i = 12
    fmt = None
    data = None
    while i + 8 <= len(b):
        cid, size = struct.unpack_from("<4sI", b, i)
        body = b[i + 8 : i + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            data = body
        i += 8 + size + (size % 2)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, ch, rate, _br, _ba, bits = fmt
    if audio_format != 1 or bits != 16:
        raise ValueError(f"only PCM16 supported (format={audio_format}, bits={bits})")
    n = len(data) // (2 * ch)
    s = np.frombuffer(data, dtype="<i2", count=n * ch).reshape(n, ch)
    return (s[:, 0].copy() if ch == 1 else s.copy()), rate
