"""Pure-Python/numpy BASELINE JPEG decoder (ITU-T T.81 sequential DCT,
Huffman entropy coding) — no libjpeg, no PIL.

Scope: SOF0 (baseline sequential), 8-bit samples, grayscale or 3-component
YCbCr with any JFIF sampling factors (4:4:4 / 4:2:2 / 4:2:0 / ...),
restart markers (DRI/RSTn), multiple DQT/DHT segments, stuffed-byte
unescaping.  Out of scope (explicit ValueError): progressive (SOF2),
arithmetic coding (SOF9+), 12-bit precision, hierarchical modes — those
genuinely need a full codec library and are documented stubs in
`operators/multimodal.py`.

Pipeline per the spec: marker parse → per-MCU Huffman decode (DC diff +
RLE AC in zigzag order) → dequantize → 8x8 IDCT (orthonormal separable
matrix form, float64) → plane assembly + chroma upsample → YCbCr→RGB
(JFIF full-range matrix) → level shift and clamp.

Exactness: entropy decode, dequantization and plane geometry are exact;
the IDCT and color transform are float, so pixels can differ from another
decoder's integer IDCT by ±1-2 counts — tests/test_codecs.py validates
against Java ImageIO (Spark image source) with that tolerance.

Decoder-only by design: the synthetic media tables encode BMP/PNG/GIF/WAV
(formats with encoders here); a JPEG ENCODER would only re-test the same
math in reverse.  Real deployments plug libjpeg for throughput; this
module makes `decode_media` semantically complete for crawl payloads.
"""

from __future__ import annotations

import struct

import numpy as np

# k-th coefficient in the zigzag stream → raster index in the 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# orthonormal 8-point DCT matrix: forward F = A @ X @ A.T, inverse
# X = A.T @ F @ A (float64 — the "float IDCT" flavor)
_A = np.zeros((8, 8))
for _k in range(8):
    _alpha = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _A[_k, _n] = _alpha * np.cos((2 * _n + 1) * _k * np.pi / 16.0)


class _HuffTable:
    """Canonical Huffman table from a DHT segment: (length, code) → symbol."""

    def __init__(self, counts: bytes, symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        i = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[i]
                code += 1
                i += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment, unescaping
    stuffed bytes (0xFF 0x00 → 0xFF) and stopping at any real marker."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> bool:
        b = self.data
        p = self.pos
        if p >= len(b):
            return False
        byte = b[p]
        if byte == 0xFF:
            if p + 1 < len(b) and b[p + 1] == 0x00:
                self.pos = p + 2  # stuffed 0xFF
            else:
                return False  # a real marker terminates the segment
        else:
            self.pos = p + 1
        self.buf = (self.buf << 8) | byte
        self.nbits += 8
        return True

    def read_bit(self) -> int:
        if self.nbits == 0 and not self._fill():
            raise ValueError("JPEG entropy stream truncated")
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.buf = 0
        self.nbits = 0
        b = self.data
        p = self.pos
        while p + 1 < len(b):
            if b[p] == 0xFF and 0xD0 <= b[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            p += 1
        raise ValueError("JPEG restart marker expected but not found")


def _extend(v: int, s: int) -> int:
    # T.81 F.2.2.1: map the s-bit magnitude to its signed value
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG bytes → (H, W) uint8 grayscale or (H, W, 3) uint8 RGB.
    Raises ValueError on progressive/arithmetic/12-bit streams."""
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            raise ValueError(f"JPEG marker expected at {i}")
        marker = b[i + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:  # EOI before SOS
            break
        (seglen,) = struct.unpack_from(">H", b, i + 2)
        seg = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                j += 1
                if pq == 0:
                    table = np.frombuffer(seg, np.uint8, 64, j).astype(np.int32)
                    j += 64
                else:
                    table = np.frombuffer(seg, ">u2", 64, j).astype(np.int32)
                    j += 128
                q = np.zeros(64, np.int32)
                q[ZIGZAG] = table  # DQT is stored in zigzag order
                qt[tq] = q.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                counts = seg[j + 1 : j + 17]
                nsym = sum(counts)
                symbols = seg[j + 17 : j + 17 + nsym]
                (huff_dc if tc == 0 else huff_ac)[th] = _HuffTable(
                    counts, symbols
                )
                j += 17 + nsym
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline ok
            precision, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if precision != 8:
                raise ValueError(f"only 8-bit JPEG supported (got {precision})")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG supported (progressive/"
                f"arithmetic SOF 0x{marker:02x} needs a codec library)"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_map = {}
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_map[cs] = (tables >> 4, tables & 0x0F)
            return _decode_scan(
                b, i + 2 + seglen, frame, scan_map, qt, huff_dc, huff_ac,
                restart_interval,
            )
        i += 2 + seglen
    raise ValueError("JPEG contains no scan data")


def _upsample(p: np.ndarray, factor: int, axis: int) -> np.ndarray:
    """Chroma upsampling along one axis.  factor 2 uses the triangle
    filter (3/4 near + 1/4 far with edge replication — libjpeg's "fancy
    upsampling", which Java ImageIO also applies, keeping us within ±2 of
    it); other factors fall back to sample replication."""
    if factor == 1:
        return p
    if factor != 2:
        return np.repeat(p, factor, axis)
    p = np.moveaxis(p, axis, 0)
    prev = np.concatenate([p[:1], p[:-1]], axis=0)
    nxt = np.concatenate([p[1:], p[-1:]], axis=0)
    out = np.empty((2 * p.shape[0],) + p.shape[1:], dtype=p.dtype)
    out[0::2] = 0.75 * p + 0.25 * prev
    out[1::2] = 0.75 * p + 0.25 * nxt
    return np.moveaxis(out, 0, axis)


def _decode_scan(b, pos, frame, scan_map, qt, huff_dc, huff_ac,
                 restart_interval) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    if h <= 0 or w <= 0:
        raise ValueError(f"bad JPEG dims {w}x{h}")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    ]
    rd = _BitReader(b, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                rd.sync_restart()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan_map[c["id"]]
                q = qt[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64)
                        s = rd.decode(huff_dc[dc_t])
                        diff = _extend(rd.read_bits(s), s) if s else 0
                        pred[ci] += diff
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = rd.decode(huff_ac[ac_t])
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL: 16 zeros
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overrun")
                            coef[ZIGZAG[k]] = _extend(rd.read_bits(s), s)
                            k += 1
                        block = _A.T @ (coef.reshape(8, 8) * q) @ _A
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1
    # crop + upsample each plane to (h, w)
    out_planes = []
    for c, p in zip(comps, planes):
        ch = -(-h * c["v"] // vmax)
        cw = -(-w * c["h"] // hmax)
        p = p[:ch, :cw]
        p = _upsample(p, vmax // c["v"], axis=0)
        p = _upsample(p, hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w] + 128.0)
    if len(out_planes) == 1:
        return np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
    if len(out_planes) != 3:
        raise ValueError(f"unsupported JPEG component count {len(out_planes)}")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, bl], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
