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

An encoder (`encode_jpeg`) is included so synthetic tables and round-trip
tests can produce genuine baseline streams: 4:4:4 sampling, Annex-K
quantization scaled by `quality`, and deliberately simple fixed canonical
Huffman tables (all DC categories at 4 bits, all AC symbols at 9 bits —
a VALID prefix code that any conforming decoder reads from the DHT
segments; compression ratio is irrelevant for tests, validity is not).
Java ImageIO decodes our output within quantization error, which is the
independent conformance check of the encoder.  Real deployments plug
libjpeg for throughput; this module makes the media path semantically
complete for crawl payloads.
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
                if hv >> 4 < 1 or hv & 0x0F < 1:
                    raise ValueError(
                        f"JPEG SOF component {cid} has sampling factor 0"
                    )
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
            # malformed streams must fail with ValueError, not KeyError,
            # so callers' "corrupt payload" handling stays one except away
            for comp in frame["comps"]:
                if comp["id"] not in scan_map:
                    raise ValueError(
                        f"JPEG SOS missing component id {comp['id']}"
                    )
                if comp["tq"] not in qt:
                    raise ValueError(
                        f"JPEG references undefined quant table {comp['tq']}"
                    )
                dc_t, ac_t = scan_map[comp["id"]]
                if dc_t not in huff_dc or ac_t not in huff_ac:
                    raise ValueError(
                        f"JPEG references undefined Huffman table "
                        f"(dc={dc_t}, ac={ac_t})"
                    )
            return _decode_scan(
                b, i + 2 + seglen, frame, scan_map, qt, huff_dc, huff_ac,
                restart_interval,
            )
        i += 2 + seglen
    raise ValueError("JPEG contains no scan data")


# Annex K.1/K.2 quantization tables (raster order)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    # the libjpeg quality→scale mapping (public, jcparam.c semantics)
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing and 1-fill padding."""

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self.buf = (self.buf << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.buf >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


# fixed canonical Huffman layouts: DC categories 0..11 all 4 bits long,
# AC symbols 0..255 all 9 bits long — valid canonical tables (the code
# space is half-used and the all-ones code is never assigned)
_ENC_DC_COUNTS = bytes([0, 0, 0, 12] + [0] * 12)
_ENC_DC_SYMBOLS = bytes(range(12))
# 256 symbols don't fit one count byte: 255 at length 9 + 1 at length 10
_ENC_AC_COUNTS = bytes([0] * 8 + [255, 1] + [0] * 6)
_ENC_AC_SYMBOLS = bytes(range(256))


def _enc_table(counts: bytes, symbols: bytes) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for the canonical layout."""
    out = {}
    code = 0
    i = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → baseline JFIF JPEG bytes
    (4:4:4, Annex-K quantization scaled by ``quality``, fixed canonical
    Huffman tables).  Decodable by this module and by any conforming
    decoder; lossy by quantization like any JPEG."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        planes = [px.astype(np.float64) - 128.0]
        qts = [_scaled_qt(_QT_LUMA, quality)]
        comp_qt = [0]
    elif px.ndim == 3 and px.shape[2] == 3:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        qts = [_scaled_qt(_QT_LUMA, quality), _scaled_qt(_QT_CHROMA, quality)]
        comp_qt = [0, 1, 1]
    else:
        raise ValueError(f"expected (H,W) or (H,W,3), got {px.shape}")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    dc_tab = _enc_table(_ENC_DC_COUNTS, _ENC_DC_SYMBOLS)
    ac_tab = _enc_table(_ENC_AC_COUNTS, _ENC_AC_SYMBOLS)
    bw = _BitWriter()
    pred = [0] * len(planes)
    by = -(-h // 8)
    bx = -(-w // 8)
    # pad planes to block multiples by edge replication
    padded = []
    for p in planes:
        pp = np.pad(p, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")
        padded.append(pp)
    inv_zz = ZIGZAG  # zigzag[k] = raster index of k-th coeff
    for myy in range(by):
        for mxx in range(bx):
            for ci, p in enumerate(padded):
                block = p[myy * 8 : myy * 8 + 8, mxx * 8 : mxx * 8 + 8]
                f = _A @ block @ _A.T
                q = qts[comp_qt[ci]]
                coef = np.rint(f / q).astype(np.int64)
                zz = coef.ravel()[inv_zz]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s = _category(diff)
                code, ln = dc_tab[s]
                bw.write(code, ln)
                if s:
                    bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    if k > last_nz:
                        break
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_tab[0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_tab[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v >= 0 else v + (1 << s) - 1, s)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_tab[0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qts):
        zzq = q.ravel()[inv_zz].astype(np.uint8)
        out += seg(0xDB, bytes([ti]) + zzq.tobytes())
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, comp_qt[ci]])
    out += seg(0xC0, sof)
    # one DC and one AC table, shared by every component (scan ids 0/0)
    for tc_th, counts, symbols in [
        (0x00, _ENC_DC_COUNTS, _ENC_DC_SYMBOLS),
        (0x10, _ENC_AC_COUNTS, _ENC_AC_SYMBOLS),
    ]:
        out += seg(0xC4, bytes([tc_th]) + counts + symbols)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


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
