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
            if len(body) < 16:
                raise ValueError("WAV fmt chunk truncated (< 16 bytes)")
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


# --------------------------------------------------------------------------
# Container metadata probe — header walks, no pixel/sample decode
# --------------------------------------------------------------------------

_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _probe_jpeg(b: bytes) -> dict | None:
    # marker walk to the first SOFn frame header (precision, height, width)
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            return None
        while i < n and b[i] == 0xFF:
            i += 1
        if i >= n:
            return None
        marker = b[i]
        i += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers, no length field
        if i + 2 > n:
            return None
        seg_len = int.from_bytes(b[i:i + 2], "big")
        if marker in _SOF_MARKERS:
            if i + 7 > n:
                return None
            h = int.from_bytes(b[i + 3:i + 5], "big")
            w = int.from_bytes(b[i + 5:i + 7], "big")
            return {"format": "jpeg", "width": w, "height": h}
        i += seg_len
    return None


def _probe_mp4(b: bytes) -> dict | None:
    # ISO BMFF box walk: top-level to moov, inside moov to mvhd
    def walk(lo: int, hi: int, want: bytes) -> tuple[int, int] | None:
        i = lo
        while i + 8 <= hi:
            size = int.from_bytes(b[i:i + 4], "big")
            btype = b[i + 4:i + 8]
            if size == 1:  # 64-bit largesize
                if i + 16 > hi:
                    return None
                size = int.from_bytes(b[i + 8:i + 16], "big")
                body = i + 16
            else:
                body = i + 8
            if size < 8 or i + size > hi:
                return None
            if btype == want:
                return body, i + size
            i += size
        return None

    moov = walk(0, len(b), b"moov")
    if moov is None:
        return None
    mvhd = walk(moov[0], moov[1], b"mvhd")
    if mvhd is None:
        return {"format": "mp4"}
    p, _ = mvhd
    version = b[p]
    if version == 1:
        timescale = int.from_bytes(b[p + 20:p + 24], "big")
        duration = int.from_bytes(b[p + 24:p + 32], "big")
    else:
        timescale = int.from_bytes(b[p + 12:p + 16], "big")
        duration = int.from_bytes(b[p + 16:p + 20], "big")
    out = {"format": "mp4"}
    if timescale:
        out["duration_ms"] = int(duration * 1000 // timescale)
    return out


def probe_media(payload: bytes) -> dict | None:
    """Container metadata WITHOUT decoding: ``format`` plus width/height
    (images), sample_rate/duration_ms (audio), duration_ms (video).

    Pure byte parsing (magic sniff + header walk), so it covers the
    COMPRESSED formats too — JPEG (SOFn frame header), PNG (IHDR), GIF
    (logical screen descriptor), MP4 (ISO BMFF moov/mvhd) — whose
    pixel/sample decode is environment-stubbed.  Metadata filtering
    (dimensions, duration) is the bulk of what a curation pipeline does
    with media columns, and it needs no codec."""
    b = bytes(payload)
    fmt = sniff_format(b)
    if fmt == "bmp":
        w = int.from_bytes(b[18:22], "little", signed=True)
        h = int.from_bytes(b[22:26], "little", signed=True)
        return {"format": "bmp", "width": abs(w), "height": abs(h)}
    if fmt in ("ppm", "pgm"):
        try:
            (w, h, _maxval), _ = _pnm_tokens(b, 3, 2)
        except Exception:
            return {"format": fmt}
        return {"format": fmt, "width": w, "height": h}
    if fmt == "wav":
        try:
            samples, rate = decode_wav(b)
        except Exception:
            return {"format": "wav"}
        return {
            "format": "wav",
            "sample_rate": rate,
            "duration_ms": int(len(samples) * 1000 // rate) if rate else None,
        }
    if b[:2] == b"\xff\xd8":
        return _probe_jpeg(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and b[12:16] == b"IHDR":
        return {
            "format": "png",
            "width": int.from_bytes(b[16:20], "big"),
            "height": int.from_bytes(b[20:24], "big"),
        }
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return {
            "format": "gif",
            "width": int.from_bytes(b[6:8], "little"),
            "height": int.from_bytes(b[8:10], "little"),
        }
    if len(b) >= 12 and b[4:8] == b"ftyp":
        return _probe_mp4(b)
    return None
