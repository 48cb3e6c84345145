"""Pure-numpy codecs for media containers that need no external codec
library: BMP (24-bit BI_RGB), PPM/PGM (binary P6/P5), WAV (PCM16), PNG
(8-bit, via stdlib zlib + per-row unfilter), and GIF (LZW, implemented
here); baseline JPEG has its own pure-numpy codec in functions/jpeg.py.
The multimodal decode path is therefore REAL for all of BMP/PPM/PGM/WAV/
PNG/GIF/JPEG (baseline AND progressive) in this environment; only
MP4/video genuinely requires ffmpeg and stays stubbed behind
NotImplementedError in operators/multimodal.py (its header-walk
metadata probe below is real).

Encoders exist so tests and synthetic tables can produce genuine on-disk
payload bytes; decoders validate headers strictly and raise ValueError on
malformed/unsupported input (never silently misread).

Format references are the public specs: Windows BITMAPFILEHEADER/
BITMAPINFOHEADER layout, netpbm P5/P6 grammar, RIFF/WAVE PCM chunks,
RFC 2083 (PNG: IHDR/IDAT chunk layout, filter types 0-4, Paeth
predictor), and GIF89a (logical screen descriptor, image descriptor,
variable-width LSB-first LZW with clear/EOI codes).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# --------------------------------------------------------------------------
# sniffing
# --------------------------------------------------------------------------


def sniff_format(payload: bytes) -> str | None:
    """Identify a natively-decodable container by magic bytes: 'bmp',
    'ppm', 'pgm', 'wav', 'png', 'gif', 'jpeg', 'avi', or None (unknown /
    unsupported / too short)."""
    b = bytes(payload[:16])
    if b[:2] == b"BM" and len(payload) >= 54:
        return "bmp"
    if b[:2] == b"P6" and len(b) > 2 and b[2:3].isspace():
        return "ppm"
    if b[:2] == b"P5" and len(b) > 2 and b[2:3].isspace():
        return "pgm"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        return "avi"
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if b[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if b[:2] == b"\xff\xd8":
        return "jpeg"
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
# PNG — 8-bit gray / RGB / palette / gray+alpha / RGBA, non-interlaced
# (RFC 2083: zlib-inflated IDAT scanlines, per-row filter byte, types 0-4)
# --------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
# color type → samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunks(b: bytes):
    """Yield (type, data) for every chunk, verifying lengths and CRCs."""
    i = 8
    n = len(b)
    while i + 8 <= n:
        (length,) = struct.unpack_from(">I", b, i)
        ctype = b[i + 4 : i + 8]
        end = i + 8 + length
        if end + 4 > n:
            raise ValueError(f"truncated PNG chunk {ctype!r}")
        data = b[i + 8 : end]
        (crc,) = struct.unpack_from(">I", b, end)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, data
        if ctype == b"IEND":
            return
        i = end + 4
    raise ValueError("PNG missing IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _png_unfilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Inflated scanline stream → (h, w*ch) recon bytes.  Filters 0/2 are
    pure row ops, 1 (Sub) is a per-lane cumulative sum; 3 (Average) and
    4 (Paeth) depend on the left-neighbor recon so they walk pixels within
    the row (channels vectorized)."""
    stride = w * ch + 1
    if len(raw) != h * stride:
        raise ValueError(
            f"PNG scanline stream: expected {h * stride} bytes, got {len(raw)}"
        )
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    recon = np.zeros((h, w * ch), dtype=np.uint8)
    for y in range(h):
        ft = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        up = recon[y - 1].astype(np.int32) if y > 0 else np.zeros(w * ch, np.int32)
        if ft == 0:
            recon[y] = line.astype(np.uint8)
        elif ft == 1:  # Sub: cumsum along each of the `ch` byte lanes
            recon[y] = np.cumsum(line.reshape(w, ch), axis=0).astype(np.uint8).ravel()
        elif ft == 2:  # Up
            recon[y] = ((line + up) & 0xFF).astype(np.uint8)
        elif ft == 3:  # Average
            out = np.zeros(w * ch, dtype=np.int32)
            left = np.zeros(ch, dtype=np.int32)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                out[s] = (line[s] + ((left + up[s]) >> 1)) & 0xFF
                left = out[s]
            recon[y] = out.astype(np.uint8)
        elif ft == 4:  # Paeth
            out = np.zeros(w * ch, dtype=np.int32)
            for x in range(w):
                for c in range(ch):
                    i = x * ch + c
                    a = int(out[i - ch]) if x > 0 else 0
                    u = int(up[i])
                    ul = int(recon[y - 1, i - ch]) if (x > 0 and y > 0) else 0
                    out[i] = (int(line[i]) + _paeth(a, u, ul)) & 0xFF
            recon[y] = out.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ft} in row {y}")
    return recon


def decode_png(payload: bytes) -> np.ndarray:
    """8-bit non-interlaced PNG → (H, W) uint8 for grayscale, else
    (H, W, C) uint8 (C=3 RGB / palette expansion, 2 gray+alpha, 4 RGBA).
    stdlib zlib inflates IDAT; the per-row unfilter is numpy.  Raises
    ValueError for 1/2/4/16-bit depths and Adam7 interlace."""
    b = bytes(payload)
    if b[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    w = h = None
    ch = 0
    color_type = -1
    palette = None
    idat = bytearray()
    for ctype, data in _png_chunks(b):
        if ctype == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter method")
            if interlace != 0:
                raise ValueError("Adam7-interlaced PNG unsupported")
            if depth != 8:
                raise ValueError(f"only 8-bit PNG supported (depth={depth})")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unknown PNG color type {color_type}")
            ch = _PNG_CHANNELS[color_type]
        elif ctype == b"PLTE":
            if len(data) % 3:
                raise ValueError("PNG PLTE length not a multiple of 3")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
    if w is None:
        raise ValueError("PNG missing IHDR")
    if not idat:
        raise ValueError("PNG missing IDAT")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PNG dims {w}x{h}")
    recon = _png_unfilter(zlib.decompress(bytes(idat)), h, w, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        idx = recon.reshape(h, w)
        if int(idx.max(initial=0)) >= palette.shape[0]:
            raise ValueError("PNG palette index out of range")
        return np.ascontiguousarray(palette[idx])
    if ch == 1:
        return np.ascontiguousarray(recon.reshape(h, w))
    return np.ascontiguousarray(recon.reshape(h, w, ch))


def _png_filter_row(line: np.ndarray, prev: np.ndarray, ch: int,
                    ft: int) -> np.ndarray:
    """Apply PNG filter `ft` to one recon row (the encoder-side inverse of
    _png_unfilter); used to emit genuine multi-filter test vectors."""
    line = line.astype(np.int32)
    prev = prev.astype(np.int32)
    left = np.zeros_like(line)
    left[ch:] = line[:-ch]
    upleft = np.zeros_like(prev)
    upleft[ch:] = prev[:-ch]
    if ft == 0:
        out = line
    elif ft == 1:
        out = line - left
    elif ft == 2:
        out = line - prev
    elif ft == 3:
        out = line - ((left + prev) >> 1)
    elif ft == 4:
        pr = np.zeros_like(line)
        for i in range(line.size):
            pr[i] = _paeth(int(left[i]), int(prev[i]), int(upleft[i]))
        out = line - pr
    else:
        raise ValueError(f"unknown PNG filter type {ft}")
    return (out & 0xFF).astype(np.uint8)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W) gray / (H, W, 3) RGB / (H, W, 4) RGBA uint8 → 8-bit PNG.
    ``filter_type`` applies that row filter to every scanline (0-4), so
    tests can generate payloads exercising each unfilter branch."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, ch = 0, 1
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, ch = 2, 3
    elif px.ndim == 3 and px.shape[2] == 4:
        color_type, ch = 6, 4
    else:
        raise ValueError(f"expected (H,W), (H,W,3) or (H,W,4), got {px.shape}")
    h, w = px.shape[:2]
    flat = px.reshape(h, w * ch)
    lines = bytearray()
    prev = np.zeros(w * ch, dtype=np.uint8)
    for y in range(h):
        lines.append(filter_type)
        lines += _png_filter_row(flat[y], prev, ch, filter_type).tobytes()
        prev = flat[y]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + chunk(b"IEND", b"")
    )


# --------------------------------------------------------------------------
# GIF — 87a/89a single-frame, variable-width LSB-first LZW (decoder AND
# encoder implemented here; no codec library involved)
# --------------------------------------------------------------------------


class _BitReader:
    """LSB-first bit reader over concatenated GIF data sub-blocks."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def read(self, width: int) -> int | None:
        while self.nbits < width:
            if self.pos >= len(self.data):
                return None
            self.buf |= self.data[self.pos] << self.nbits
            self.nbits += 8
            self.pos += 1
        v = self.buf & ((1 << width) - 1)
        self.buf >>= width
        self.nbits -= width
        return v


def _lzw_decode(data: bytes, min_code_size: int, expected: int) -> bytearray:
    """GIF variable-width LZW → pixel indices.  Width grows after the
    dictionary fills the current code space (up to 12 bits); CLEAR resets;
    stops at EOI or once `expected` pixels are produced."""
    clear = 1 << min_code_size
    eoi = clear + 1
    rd = _BitReader(data)
    out = bytearray()

    def reset():
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = reset()
    prev: bytes | None = None
    while len(out) < expected:
        code = rd.read(width)
        if code is None or code == eoi:
            break
        if code == clear:
            table, width = reset()
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code after clear out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:  # deferred-clear streams stop adding here
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF LZW: code {code} out of range")
        out += entry
        prev = entry
        # width grows when the table fills the current code space; the
        # decoder's table lags the encoder's by one entry, which the
        # encoder compensates for by bumping at (1 << width) + 1 — this
        # pairing is what real-world GIF encoders produce (validated
        # against third-party GIFs in tests/test_codecs.py)
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """Pixel indices → GIF variable-width LZW stream (matching
    _lzw_decode's width schedule; dictionary reset at 4096 entries)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits = bytearray()
    buf = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal buf, nbits
        buf |= code << nbits
        nbits += width
        while nbits >= 8:
            out_bits.append(buf & 0xFF)
            buf >>= 8
            nbits -= 8

    def reset():
        return {bytes([i]): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = reset()
    emit(clear, width)
    w_seq = b""
    for c in bytes(indices):
        cand = w_seq + bytes([c])
        if cand in table:
            w_seq = cand
            continue
        emit(table[w_seq], width)
        table[cand] = next_code
        next_code += 1
        # the encoder's table runs one entry ahead of the decoder's, so it
        # bumps one step later than the decoder's (1 << width) rule
        if next_code == (1 << width) + 1 and width < 12:
            width += 1
        if next_code == 4096:  # 12-bit code space exhausted
            emit(clear, width)
            table, next_code, width = reset()
        w_seq = bytes([c])
    if w_seq:
        emit(table[w_seq], width)
    emit(eoi, width)
    if nbits:
        out_bits.append(buf & 0xFF)
    return bytes(out_bits)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_indexed(payload: bytes) -> tuple[np.ndarray, np.ndarray]:
    """First image frame of a GIF → ((H, W) uint8 palette indices,
    (n, 3) uint8 palette).  Skips 89a extension blocks; handles local
    color tables and interlacing."""
    b = bytes(payload)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    if len(b) < 13:
        raise ValueError("truncated GIF header")
    _sw, _sh, flags = struct.unpack_from("<HHB", b, 6)
    i = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(b, dtype=np.uint8, count=n * 3, offset=i).reshape(n, 3)
        i += n * 3
    while i < len(b):
        block = b[i]
        if block == 0x21:  # extension: label + data sub-blocks
            i += 2
            while i < len(b) and b[i] != 0:
                i += 1 + b[i]
            i += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, w, h, iflags = struct.unpack_from("<HHHHB", b, i + 1)
            i += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(
                    b, dtype=np.uint8, count=n * 3, offset=i
                ).reshape(n, 3)
                i += n * 3
            if pal is None:
                raise ValueError("GIF image has no color table")
            if w <= 0 or h <= 0:
                raise ValueError(f"bad GIF dims {w}x{h}")
            mcs = b[i]
            i += 1
            data = bytearray()
            while i < len(b) and b[i] != 0:
                size = b[i]
                data += b[i + 1 : i + 1 + size]
                i += 1 + size
            idx = _lzw_decode(bytes(data), mcs, w * h)
            if len(idx) < w * h:
                raise ValueError(
                    f"GIF LZW underrun: {len(idx)} of {w * h} pixels"
                )
            arr = np.frombuffer(bytes(idx[: w * h]), dtype=np.uint8).reshape(h, w)
            if iflags & 0x40:  # interlaced: rows stored in 4 passes
                order = np.concatenate(
                    [np.arange(start, h, step) for start, step in
                     _GIF_INTERLACE_PASSES]
                )
                de = np.zeros_like(arr)
                de[order] = arr
                arr = de
            if int(arr.max(initial=0)) >= pal.shape[0]:
                raise ValueError("GIF palette index out of range")
            return arr.copy(), pal.copy()
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF → (H, W, 3) uint8 RGB."""
    idx, pal = decode_gif_indexed(payload)
    return np.ascontiguousarray(pal[idx])


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """(H, W) uint8 palette indices + (n, 3) uint8 palette → GIF89a with a
    real LZW-compressed image block."""
    idx = np.asarray(indices, dtype=np.uint8)
    pal = np.asarray(palette, dtype=np.uint8)
    if idx.ndim != 2 or pal.ndim != 2 or pal.shape[1] != 3:
        raise ValueError("expected (H, W) indices and (n, 3) palette")
    if pal.shape[0] < 2 or pal.shape[0] > 256:
        raise ValueError("palette must have 2..256 entries")
    if int(idx.max(initial=0)) >= pal.shape[0]:
        raise ValueError("palette index out of range")
    h, w = idx.shape
    # color table size: next power of two >= len(palette), min 2
    k = max(1, (pal.shape[0] - 1).bit_length())
    table = np.zeros((1 << k, 3), dtype=np.uint8)
    table[: pal.shape[0]] = pal
    mcs = max(2, k)
    lzw = _lzw_encode(idx.tobytes(), mcs)
    blocks = bytearray()
    for off in range(0, len(lzw), 255):
        part = lzw[off : off + 255]
        blocks.append(len(part))
        blocks += part
    blocks.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | (k - 1), 0, 0)
        + table.tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([mcs]) + bytes(blocks)
        + b"\x3b"
    )


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


# --------------------------------------------------------------------------
# AVI (RIFF) Motion-JPEG — a REAL video container whose frames are
# baseline/progressive JPEG streams, i.e. fully decodable by
# functions/jpeg.py with no external codec.  H.264-in-MP4 remains the
# ffmpeg-territory stub; MJPEG-AVI makes the video path (frame
# extraction → per-frame decode → sampling) genuinely end-to-end.
# --------------------------------------------------------------------------

def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: int = 25) -> bytes:
    """JPEG frame streams → minimal spec-conformant MJPEG AVI (RIFF with
    hdrl/avih + vids strl using the MJPG handler, and a movi list of
    00dc chunks; no idx1 — players treat it as an unindexed stream)."""
    if not frames:
        raise ValueError("need at least one frame")
    if fps <= 0:
        raise ValueError("fps must be positive")
    for f in frames:
        if bytes(f[:2]) != b"\xff\xd8":
            raise ValueError("AVI MJPEG frames must be JPEG streams")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return fourcc + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", fourcc + body)

    usec = 1_000_000 // fps
    maxbuf = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I", usec, maxbuf * fps, 0, 0x10, len(frames), 0, 1, maxbuf,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHH8I", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      maxbuf, 0, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh)
                                   + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", bytes(f)) for f in frames))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi_frames(payload: bytes) -> list[bytes]:
    """MJPEG AVI → list of the contained JPEG frame streams (undecoded
    bytes; feed each to functions/jpeg.py decode_jpeg).  Walks the RIFF
    chunk tree to the movi list and collects 00dc/00db video chunks."""
    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")

    frames: list[bytes] = []

    def walk(lo: int, hi: int) -> None:
        i = lo
        while i + 8 <= hi:
            fourcc = b[i : i + 4]
            (size,) = struct.unpack_from("<I", b, i + 4)
            body_lo = i + 8
            body_hi = body_lo + size
            if body_hi > hi:
                raise ValueError("truncated AVI chunk")
            if fourcc == b"LIST":
                walk(body_lo + 4, body_hi)
            elif fourcc[2:4] in (b"dc", b"db") and fourcc[:2].isdigit():
                frames.append(b[body_lo:body_hi])
            i = body_hi + (size & 1)  # chunks are word-aligned

    riff_hi = 8 + struct.unpack_from("<I", b, 4)[0]
    if riff_hi > len(b):
        # size fields are validated against the BUFFER, not just the
        # claimed extent — a truncated file raises ValueError like every
        # other structural lie, never struct.error from unpack_from
        raise ValueError("truncated AVI payload: RIFF size exceeds buffer")
    walk(12, riff_hi)
    if not frames:
        raise ValueError("AVI contains no video chunks")
    return frames


def _probe_avi(b: bytes) -> dict:
    # avih is the first chunk of the hdrl list: fixed offsets after the
    # RIFF header when written by this module; fall back to a chunk walk
    out: dict = {"format": "avi"}
    i = 12
    end = min(len(b), 8 + struct.unpack_from("<I", b, 4)[0])
    while i + 8 <= end:
        fourcc = b[i : i + 4]
        (size,) = struct.unpack_from("<I", b, i + 4)
        if fourcc == b"LIST":
            if b[i + 8 : i + 12] == b"hdrl":
                i += 12
                continue
        elif fourcc == b"avih" and size >= 40:
            usec, _, _, _, nframes = struct.unpack_from("<5I", b, i + 8)
            w, h = struct.unpack_from("<II", b, i + 40)
            out.update(width=w, height=h, n_frames=nframes)
            if usec:
                out["duration_ms"] = int(nframes * usec // 1000)
            return out
        i += 8 + size + (size & 1)
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
    if fmt == "avi":
        return _probe_avi(b)
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
