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
    """Canonical Huffman table from a DHT segment, compiled to a 16-bit
    peek LUT (codes are ≤16 bits): ``lut_sym[v16]`` / ``lut_len[v16]``
    give the decoded symbol and its code length for any 16-bit stream
    window; ``lut_len == 0`` marks an invalid prefix.  One array index
    replaces the per-bit tree walk — the decode loop's hot operation."""

    def __init__(self, counts: bytes, symbols: bytes):
        self.lut_sym = np.zeros(1 << 16, np.uint8)
        self.lut_len = np.zeros(1 << 16, np.uint8)
        code = 0
        i = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                lo = code << (16 - length)
                self.lut_sym[lo : lo + (1 << (16 - length))] = symbols[i]
                self.lut_len[lo : lo + (1 << (16 - length))] = length
                code += 1
                i += 1
            code <<= 1


def _entropy_segments(b: bytes, pos: int) -> list[np.ndarray]:
    """Entropy-coded data from ``pos`` → list of unescaped (0xFF00 →
    0xFF) byte arrays, one per restart segment (split at RSTn markers),
    ending at the first real marker.  Fill bytes (0xFF before a marker)
    are dropped.  Vectorized marker scan: one pass over the 0xFF
    positions instead of a per-byte Python loop."""
    arr = np.frombuffer(b, np.uint8, len(b) - pos, pos)
    ffs = np.flatnonzero(arr == 0xFF)
    spans: list[np.ndarray] = []
    segs: list[np.ndarray] = []
    cur = 0

    def _finish(end: int) -> None:
        spans.append(arr[cur:end])
        segs.append(
            np.concatenate(spans) if len(spans) > 1 else spans[0].copy()
        )
        spans.clear()

    for f in map(int, ffs):
        if f < cur:
            continue
        if f + 1 >= len(arr):
            break  # truncated at a lone 0xFF — decode reports it
        nb = int(arr[f + 1])
        if nb == 0x00:  # stuffed data byte: keep the 0xFF, drop the 0x00
            spans.append(arr[cur : f + 1])
            cur = f + 2
        elif nb == 0xFF:  # fill byte before a marker: drop one 0xFF
            spans.append(arr[cur:f])
            cur = f + 1
        elif 0xD0 <= nb <= 0xD7:  # restart marker: next segment
            _finish(f)
            cur = f + 2
        else:  # any real marker terminates the scan
            _finish(f)
            return segs
    _finish(len(arr))
    return segs


def _bit_window(seg: np.ndarray) -> tuple[np.ndarray, int]:
    """(u32, nbits): ``u32[i]`` holds bytes i..i+3 big-endian, so the
    16-bit window at bit offset p is ``(u32[p>>3] << (p&7)) >> 16`` —
    one index + shift per peek.  Zero-padded so peeks near the end stay
    in bounds; ``nbits`` is the segment's real bit length."""
    m = np.concatenate([seg, np.zeros(16, np.uint8)]).astype(np.uint32)
    u32 = (m[:-3] << 24) | (m[1:-2] << 16) | (m[2:-1] << 8) | m[3:]
    return u32, len(seg) * 8


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


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, restart_interval: int = 0
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → baseline JFIF JPEG bytes
    (4:4:4, Annex-K quantization scaled by ``quality``, fixed canonical
    Huffman tables).  Decodable by this module and by any conforming
    decoder; lossy by quantization like any JPEG.

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker every
    N MCUs: each restart segment is then independently decodable (DC
    predictors reset), which is what lets a decoder — this module's
    segment-split decoder included — process a large image's entropy
    segments in isolation (the classic parallel-JPEG mechanism)."""
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
    if restart_interval < 0 or restart_interval > 0xFFFF:
        raise ValueError(f"bad restart interval {restart_interval}")
    dc_tab = _enc_table(_ENC_DC_COUNTS, _ENC_DC_SYMBOLS)
    ac_tab = _enc_table(_ENC_AC_COUNTS, _ENC_AC_SYMBOLS)
    bw = _BitWriter()
    pred = [0] * len(planes)
    by = -(-h // 8)
    bx = -(-w // 8)
    mcu_count = 0
    # pad planes to block multiples by edge replication
    padded = []
    for p in planes:
        pp = np.pad(p, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")
        padded.append(pp)
    inv_zz = ZIGZAG  # zigzag[k] = raster index of k-th coeff
    for myy in range(by):
        for mxx in range(bx):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes(
                    [0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8]
                )
                pred = [0] * len(planes)
            mcu_count += 1
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
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
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
    n_mcus = mcux * mcuy
    # per-MCU block template: component index of each interleaved block
    tmpl = [ci for ci, c in enumerate(comps) for _ in range(c["v"] * c["h"])]
    bpm = len(tmpl)
    dc_tabs = [huff_dc[scan_map[c["id"]][0]] for c in comps]
    ac_tabs = [huff_ac[scan_map[c["id"]][1]] for c in comps]

    # pass 1 — entropy decode every block's coefficients (raster order)
    # into one (n_blocks, 64) array.  Restart segments were pre-split and
    # unescaped, so the hot loop is LUT lookups over a u32 peek window:
    # no per-bit work, no byte-unstuffing branches.
    coefs = np.zeros((n_mcus * bpm, 64))
    segs = _entropy_segments(b, pos)
    ri = restart_interval or n_mcus
    n_segs = -(-n_mcus // ri)
    if len(segs) < n_segs:
        raise ValueError("JPEG restart marker expected but not found")
    zz = ZIGZAG
    bi = 0
    try:
        for si in range(n_segs):
            u32, seg_bits = _bit_window(segs[si])
            p = 0
            pred = [0] * len(comps)
            for _ in range(min(ri, n_mcus - si * ri)):
                for ci in tmpl:
                    dct = dc_tabs[ci]
                    v16 = (int(u32[p >> 3]) << (p & 7) & 0xFFFFFFFF) >> 16
                    s = int(dct.lut_sym[v16])
                    ln = int(dct.lut_len[v16])
                    if ln == 0:
                        raise ValueError("invalid JPEG Huffman code")
                    p += ln
                    if s:
                        v16 = (int(u32[p >> 3]) << (p & 7) & 0xFFFFFFFF) >> 16
                        pred[ci] += _extend(v16 >> (16 - s), s)
                        p += s
                    row = coefs[bi]
                    row[0] = pred[ci]
                    act = ac_tabs[ci]
                    k = 1
                    while k < 64:
                        v16 = (int(u32[p >> 3]) << (p & 7) & 0xFFFFFFFF) >> 16
                        rs = int(act.lut_sym[v16])
                        ln = int(act.lut_len[v16])
                        if ln == 0:
                            raise ValueError("invalid JPEG Huffman code")
                        p += ln
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16  # ZRL: 16 zeros
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("JPEG AC index overrun")
                        v16 = (int(u32[p >> 3]) << (p & 7) & 0xFFFFFFFF) >> 16
                        row[zz[k]] = _extend(v16 >> (16 - s), s)
                        p += s
                        k += 1
                    bi += 1
            if p > seg_bits:
                raise ValueError("JPEG entropy stream truncated")
    except IndexError:
        raise ValueError("JPEG entropy stream truncated") from None

    # pass 2 — dequantize + IDCT every block of a component in ONE einsum,
    # then assemble the plane with a reshape/transpose (block order is
    # (my, mx, by, bx), so no scatter loop is needed)
    tmpl_arr = np.asarray(tmpl)
    planes = []
    for ci, c in enumerate(comps):
        sel = np.flatnonzero(tmpl_arr == ci)
        rows = (np.arange(n_mcus)[:, None] * bpm + sel[None, :]).ravel()
        blocks = coefs[rows].reshape(-1, 8, 8) * qt[c["tq"]]
        idct = np.einsum("ij,njk,kl->nil", _A.T, blocks, _A)
        v, hh = c["v"], c["h"]
        planes.append(
            idct.reshape(mcuy, mcux, v, hh, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * v * 8, mcux * hh * 8)
        )
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
