"""Pure-Python/numpy JPEG codec (ITU-T T.81 sequential + progressive DCT,
Huffman entropy coding) — no libjpeg, no PIL.

Scope: SOF0/1 (baseline sequential) AND SOF2 (progressive: spectral
selection + successive approximation per T.81 Annex G), 8-bit samples,
grayscale or 3-component YCbCr with any JFIF sampling factors (4:4:4 /
4:2:2 / 4:2:0 / ...), restart markers (DRI/RSTn), multiple DQT/DHT
segments, stuffed-byte unescaping.  Out of scope (explicit ValueError):
arithmetic coding (SOF9+), 12-bit precision, lossless/hierarchical
modes — genuinely a full codec library's territory.

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


def _entropy_segments(b: bytes, pos: int) -> tuple[list[np.ndarray], int]:
    """Entropy-coded data from ``pos`` → (segments, end): unescaped
    (0xFF00 → 0xFF) byte arrays, one per restart segment (split at RSTn
    markers), ending at the first real marker; ``end`` is the absolute
    offset of that terminating marker's 0xFF (``len(b)`` when the stream
    ran out — the decoder reports truncation).  Fill bytes (0xFF before
    a marker) are dropped.  Vectorized marker scan: one pass over the
    0xFF positions instead of a per-byte Python loop."""
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
            return segs, pos + f
    _finish(len(arr))
    return segs, len(b)


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
    Handles baseline (SOF0/1) and progressive (SOF2) streams; raises
    ValueError on arithmetic/12-bit/lossless streams and malformed
    input."""
    b = bytes(payload)
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    prog_state = None
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
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
            frame = {
                "h": h, "w": w, "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG mode (lossless/hierarchical/"
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
            if frame["progressive"]:
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                ahal = seg[3 + 2 * ns]
                prog_state = _decode_prog_scan(
                    b, i + 2 + seglen, frame, scan_map, huff_dc, huff_ac,
                    restart_interval, ss, se, ahal >> 4, ahal & 0x0F,
                    prog_state,
                )
                i = prog_state["end"]
                continue
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
    if prog_state is not None:
        return _finish_progressive(prog_state, frame, qt)
    raise ValueError("JPEG contains no scan data")


class _SegReader:
    """MSB-first bit reader over one unescaped entropy segment, built on
    the same u32 peek window as the baseline hot loop."""

    __slots__ = ("u32", "nbits", "p")

    def __init__(self, seg: np.ndarray):
        self.u32, self.nbits = _bit_window(seg)
        self.p = 0

    def _peek16(self) -> int:
        p = self.p
        return (int(self.u32[p >> 3]) << (p & 7) & 0xFFFFFFFF) >> 16

    def huff(self, tab: _HuffTable) -> int:
        v16 = self._peek16()
        ln = int(tab.lut_len[v16])
        if ln == 0:
            raise ValueError("invalid JPEG Huffman code")
        self.p += ln
        return int(tab.lut_sym[v16])

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        v = self._peek16() >> (16 - n)
        self.p += n
        return v

    def bit(self) -> int:
        v = self._peek16() >> 15
        self.p += 1
        return v


def _decode_prog_scan(b, pos, frame, scan_map, huff_dc, huff_ac,
                      restart_interval, ss, se, ah, al, state):
    """One progressive (SOF2) scan per ITU-T T.81 Annex G.2: accumulates
    coefficient bits into the per-component block grids in ``state``.
    DC scans (Ss=Se=0) are diff-coded at Ah=0 and single-refinement-bit
    at Ah>0; AC scans (one component each) use EOB-run codes at Ah=0 and
    the correction-bit refinement procedure at Ah>0 (structure follows
    the public T.81 G.2.2 algorithm as implemented by libjpeg's
    decode_mcu_AC_refine).  Returns the updated state; entropy data ends
    at ``state['end']``."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    if state is None:
        state = {
            "grids": [
                np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32)
                for c in comps
            ],
        }
    idx_of = {c["id"]: i for i, c in enumerate(comps)}
    scs = []
    for cid, (dc_t, ac_t) in scan_map.items():
        if cid not in idx_of:
            raise ValueError(f"JPEG SOS missing component id {cid}")
        scs.append((idx_of[cid], dc_t, ac_t))
    if ss == 0:
        if se != 0:
            raise ValueError("progressive DC scan must have Se=0")
        if ah == 0:
            for _, dc_t, _ in scs:
                if dc_t not in huff_dc:
                    raise ValueError(
                        f"JPEG references undefined Huffman table (dc={dc_t})"
                    )
    else:
        if len(scs) != 1:
            raise ValueError("progressive AC scan must cover one component")
        if se > 63 or ss > se:
            raise ValueError("bad progressive spectral band")
        if scs[0][2] not in huff_ac:
            raise ValueError(
                f"JPEG references undefined Huffman table (ac={scs[0][2]})"
            )
    segs, end = _entropy_segments(b, pos)
    state["end"] = end
    grids = state["grids"]
    zz = ZIGZAG
    p1, m1 = 1 << al, -1 << al

    # unit sequence: interleaved MCUs, or this component's own block
    # raster when the scan is non-interleaved (ns == 1)
    if len(scs) > 1 or (ss == 0 and len(scs) == len(comps) > 1):
        n_units = mcux * mcuy
        interleaved = True
    else:
        ci = scs[0][0]
        c = comps[ci]
        nbw = -(-(-(-frame["w"] * c["h"] // hmax)) // 8)
        nbh = -(-(-(-frame["h"] * c["v"] // vmax)) // 8)
        n_units, interleaved = nbw * nbh, False
    ri = restart_interval or n_units
    n_segs = -(-n_units // ri)
    if len(segs) < n_segs:
        raise ValueError("JPEG restart marker expected but not found")

    def _refine_band(rd, row, k):
        # correction bits for already-nonzero coefficients in [k..se]
        while k <= se:
            v = int(row[zz[k]])
            if v != 0 and rd.bit():
                if (v & p1) == 0:
                    row[zz[k]] = v + (p1 if v >= 0 else m1)
            k += 1

    try:
        for si in range(n_segs):
            rd = _SegReader(segs[si])
            pred = {i: 0 for i, _, _ in scs}
            eobrun = 0
            for u in range(si * ri, min((si + 1) * ri, n_units)):
                if interleaved:
                    my, mx = u // mcux, u % mcux
                    blocks = [
                        (i, dc_t, ac_t,
                         grids[i][my * comps[i]["v"] + by,
                                  mx * comps[i]["h"] + bx])
                        for i, dc_t, ac_t in scs
                        for by in range(comps[i]["v"])
                        for bx in range(comps[i]["h"])
                    ]
                else:
                    i, dc_t, ac_t = scs[0]
                    blocks = [(i, dc_t, ac_t, grids[i][u // nbw, u % nbw])]
                for i, dc_t, ac_t, row in blocks:
                    if ss == 0:  # DC scan
                        if ah == 0:
                            s = rd.huff(huff_dc[dc_t])
                            diff = _extend(rd.bits(s), s) if s else 0
                            pred[i] += diff
                            row[0] = pred[i] << al
                        elif rd.bit():
                            row[0] = int(row[0]) | p1
                        continue
                    act = huff_ac[ac_t]
                    if ah == 0:  # AC first scan (T.81 G.2.1)
                        if eobrun > 0:
                            eobrun -= 1
                            continue
                        k = ss
                        while k <= se:
                            rs = rd.huff(act)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                eobrun = (1 << r) + rd.bits(r) - 1
                                break
                            k += r
                            if k > se:
                                raise ValueError("JPEG AC index overrun")
                            row[zz[k]] = _extend(rd.bits(s), s) << al
                            k += 1
                    else:  # AC refinement scan (T.81 G.2.2)
                        k = ss
                        if eobrun == 0:
                            while k <= se:
                                rs = rd.huff(act)
                                r, s = rs >> 4, rs & 0x0F
                                newval = 0
                                if s == 0:
                                    if r != 15:
                                        eobrun = (1 << r) + rd.bits(r)
                                        break
                                else:
                                    if s != 1:
                                        raise ValueError(
                                            "bad JPEG refinement magnitude"
                                        )
                                    newval = p1 if rd.bit() else m1
                                while k <= se:
                                    v = int(row[zz[k]])
                                    if v != 0:
                                        if rd.bit() and (v & p1) == 0:
                                            row[zz[k]] = v + (
                                                p1 if v >= 0 else m1
                                            )
                                    else:
                                        r -= 1
                                        if r < 0:
                                            break
                                    k += 1
                                if newval and k <= se:
                                    row[zz[k]] = newval
                                k += 1
                        if eobrun > 0:
                            _refine_band(rd, row, k)
                            eobrun -= 1
            if rd.p > rd.nbits:
                raise ValueError("JPEG entropy stream truncated")
    except IndexError:
        raise ValueError("JPEG entropy stream truncated") from None
    return state


def _finish_progressive(state, frame, qt) -> np.ndarray:
    """All progressive scans consumed → dequantize + batched IDCT per
    component and assemble, sharing the baseline finishing path."""
    planes = []
    for c, grid in zip(frame["comps"], state["grids"]):
        if c["tq"] not in qt:
            raise ValueError(
                f"JPEG references undefined quant table {c['tq']}"
            )
        rg, cg, _ = grid.shape
        blocks = grid.reshape(-1, 8, 8).astype(np.float64) * qt[c["tq"]]
        idct = np.matmul(np.matmul(_A.T, blocks), _A)
        planes.append(
            idct.reshape(rg, cg, 8, 8).transpose(0, 2, 1, 3)
            .reshape(rg * 8, cg * 8)
        )
    return _finish_planes(planes, frame)


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
    pixels: np.ndarray, quality: int = 90, restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """(H, W) gray or (H, W, 3) RGB uint8 → JFIF JPEG bytes (4:4:4,
    Annex-K quantization scaled by ``quality``, fixed canonical Huffman
    tables).  Decodable by this module and by any conforming decoder;
    lossy by quantization like any JPEG.

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker every
    N MCUs: each restart segment is then independently decodable (DC
    predictors reset), which is what lets a decoder — this module's
    segment-split decoder included — process a large image's entropy
    segments in isolation (the classic parallel-JPEG mechanism).

    ``progressive`` emits SOF2 with a spectral-selection scan script
    (one interleaved DC scan, then each component's AC band 1-63) —
    the coefficient values are identical to the baseline stream, only
    their transmission order changes, so decoded pixels match the
    baseline encode exactly."""
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
    if progressive and restart_interval:
        raise ValueError(
            "restart markers are not supported in progressive encode"
        )
    dc_tab = _enc_table(_ENC_DC_COUNTS, _ENC_DC_SYMBOLS)
    ac_tab = _enc_table(_ENC_AC_COUNTS, _ENC_AC_SYMBOLS)
    by = -(-h // 8)
    bx = -(-w // 8)
    ncomp = len(planes)
    # pad planes to block multiples by edge replication
    padded = []
    for p in planes:
        pp = np.pad(p, ((0, by * 8 - h), (0, bx * 8 - w)), mode="edge")
        padded.append(pp)
    inv_zz = ZIGZAG  # zigzag[k] = raster index of k-th coeff

    def _zz_block(ci: int, myy: int, mxx: int) -> np.ndarray:
        p = padded[ci]
        block = p[myy * 8 : myy * 8 + 8, mxx * 8 : mxx * 8 + 8]
        f = _A @ block @ _A.T
        return np.rint(f / qts[comp_qt[ci]]).astype(np.int64).ravel()[inv_zz]

    def _write_dc(bw: _BitWriter, zz: np.ndarray, pred: list, ci: int):
        diff = int(zz[0]) - pred[ci]
        pred[ci] = int(zz[0])
        s = _category(diff)
        code, ln = dc_tab[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)

    def _write_ac(bw: _BitWriter, zz: np.ndarray):
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
            code, ln = ac_tab[0x00]  # EOB (progressive: EOB run of 1)
            bw.write(code, ln)

    # each scan = (SOS payload, entropy bytes)
    scans: list[tuple[bytes, bytes]] = []
    if not progressive:
        bw = _BitWriter()
        pred = [0] * ncomp
        mcu_count = 0
        for myy in range(by):
            for mxx in range(bx):
                if restart_interval and mcu_count and \
                        mcu_count % restart_interval == 0:
                    bw.flush()
                    bw.out += bytes(
                        [0xFF, 0xD0 + (mcu_count // restart_interval - 1) % 8]
                    )
                    pred = [0] * ncomp
                mcu_count += 1
                for ci in range(ncomp):
                    zz = _zz_block(ci, myy, mxx)
                    _write_dc(bw, zz, pred, ci)
                    _write_ac(bw, zz)
        bw.flush()
        sos = bytes([ncomp])
        for ci in range(ncomp):
            sos += bytes([ci + 1, 0x00])
        scans.append((sos + b"\x00\x3f\x00", bytes(bw.out)))
    else:
        # spectral-selection scan script (T.81 Annex G): one interleaved
        # DC scan, then each component's full AC band — same coefficient
        # values as baseline, progressive transmission order
        coefs = [
            [_zz_block(ci, myy, mxx) for myy in range(by) for mxx in range(bx)]
            for ci in range(ncomp)
        ]
        bw = _BitWriter()
        pred = [0] * ncomp
        for u in range(by * bx):
            for ci in range(ncomp):
                _write_dc(bw, coefs[ci][u], pred, ci)
        bw.flush()
        sos = bytes([ncomp])
        for ci in range(ncomp):
            sos += bytes([ci + 1, 0x00])
        scans.append((sos + b"\x00\x00\x00", bytes(bw.out)))
        for ci in range(ncomp):
            bw = _BitWriter()
            for u in range(by * bx):
                _write_ac(bw, coefs[ci][u])
            bw.flush()
            scans.append(
                (bytes([1, ci + 1, 0x00, 1, 63, 0]), bytes(bw.out))
            )

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for ti, q in enumerate(qts):
        zzq = q.ravel()[inv_zz].astype(np.uint8)
        out += seg(0xDB, bytes([ti]) + zzq.tobytes())
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, comp_qt[ci]])
    out += seg(0xC2 if progressive else 0xC0, sof)
    # one DC and one AC table, shared by every component (scan ids 0/0)
    for tc_th, counts, symbols in [
        (0x00, _ENC_DC_COUNTS, _ENC_DC_SYMBOLS),
        (0x10, _ENC_AC_COUNTS, _ENC_AC_SYMBOLS),
    ]:
        out += seg(0xC4, bytes([tc_th]) + counts + symbols)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    for sos, entropy in scans:
        out += seg(0xDA, sos)
        out += entropy
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
    segs, _ = _entropy_segments(b, pos)
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

    return _assemble_planes(coefs, frame, qt, mcux, mcuy, tmpl)


def _assemble_planes(coefs, frame, qt, mcux, mcuy, tmpl) -> np.ndarray:
    """Pass 2 of baseline decode (shared by the scalar and batch paths):
    dequantize + IDCT every block of a component in one batched matmul
    chain (A.T @ X @ A over the whole (n, 8, 8) stack — hits BLAS, ~27x
    the equivalent einsum), then assemble the plane with a
    reshape/transpose (block order is (my, mx, by, bx), so no scatter
    loop is needed)."""
    tmpl_arr = np.asarray(tmpl)
    bpm = len(tmpl)
    n_mcus = mcux * mcuy
    planes = []
    for ci, c in enumerate(frame["comps"]):
        sel = np.flatnonzero(tmpl_arr == ci)
        rows = (np.arange(n_mcus)[:, None] * bpm + sel[None, :]).ravel()
        blocks = coefs[rows].reshape(-1, 8, 8) * qt[c["tq"]]
        idct = np.matmul(np.matmul(_A.T, blocks), _A)
        v, hh = c["v"], c["h"]
        planes.append(
            idct.reshape(mcuy, mcux, v, hh, 8, 8)
            .transpose(0, 2, 4, 1, 3, 5)
            .reshape(mcuy * v * 8, mcux * hh * 8)
        )
    return _finish_planes(planes, frame)


def _finish_planes(planes: list[np.ndarray], frame: dict) -> np.ndarray:
    """IDCT'd component planes (padded to MCU multiples) → final uint8
    image: crop, chroma upsample, YCbCr→RGB, level shift + clamp."""
    h, w = frame["h"], frame["w"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
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


# ---------------------------------------------------------------------------
# Batched lockstep decode — SIMD across entropy streams
#
# Huffman entropy coding is bit-serial WITHIN a stream, but a curation
# pipeline decodes an Arrow batch of independent images at once, and every
# restart segment of every image is an independent stream.  The lockstep
# decoder below steps ALL those streams together: one numpy "step" decodes
# the next Huffman symbol of every active stream via gathers into stacked
# 16-bit peek LUTs plus a masked state machine (DC phase / AC phase /
# block advance).  Per-symbol cost drops from a Python loop iteration to
# ~1/L of a vector op over L lanes, so throughput scales with how many
# streams the batch supplies.  Anything unusual — progressive, malformed
# markers, invalid codes, truncation — drops that image to the scalar
# `decode_jpeg`, which produces the identical pixels or the identical
# ValueError, keeping the batch path bit-exact and error-exact.

_TABLE_CACHE: dict[bytes, _HuffTable] = {}


def _cached_table(counts: bytes, symbols: bytes) -> _HuffTable:
    """Memoized `_HuffTable` keyed by DHT content: batches of real-world
    images reuse a handful of tables (libjpeg's defaults, our encoder's
    canonical set), so the 64K-entry LUT build runs once per distinct
    table, and the key doubles as the stacking identity for the batch
    decoder's gather tables."""
    key = bytes(counts) + b"\x00" + bytes(symbols)
    t = _TABLE_CACHE.get(key)
    if t is None:
        if len(_TABLE_CACHE) >= 64:
            _TABLE_CACHE.clear()
        t = _HuffTable(counts, symbols)
        t.key = key
        _TABLE_CACHE[key] = t
    return t


def _parse_baseline(b: bytes):
    """Optimistic header walk for the batch decoder: the parsed scan
    description for a clean 8-bit baseline-sequential JPEG, else None.
    None means "let the scalar `decode_jpeg` handle it" — progressive
    streams, unsupported modes, malformed markers, missing tables: the
    scalar path then yields the identical pixels or identical error, so
    this parser never needs to replicate error semantics."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    i, n = 2, len(b)
    try:
        while i + 4 <= n:
            if b[i] != 0xFF:
                return None
            marker = b[i + 1]
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            if marker == 0xD9:
                return None
            (seglen,) = struct.unpack_from(">H", b, i + 2)
            seg = b[i + 4 : i + 2 + seglen]
            if marker == 0xDB:
                j = 0
                while j < len(seg):
                    pq, tq = seg[j] >> 4, seg[j] & 0x0F
                    j += 1
                    if pq == 0:
                        table = np.frombuffer(seg, np.uint8, 64, j).astype(
                            np.int32
                        )
                        j += 64
                    else:
                        table = np.frombuffer(seg, ">u2", 64, j).astype(
                            np.int32
                        )
                        j += 128
                    q = np.zeros(64, np.int32)
                    q[ZIGZAG] = table
                    qt[tq] = q.reshape(8, 8)
            elif marker == 0xC4:
                j = 0
                while j < len(seg):
                    tc, th = seg[j] >> 4, seg[j] & 0x0F
                    counts = seg[j + 1 : j + 17]
                    nsym = sum(counts)
                    symbols = seg[j + 17 : j + 17 + nsym]
                    if len(counts) < 16 or len(symbols) < nsym:
                        return None
                    (huff_dc if tc == 0 else huff_ac)[th] = _cached_table(
                        counts, symbols
                    )
                    j += 17 + nsym
            elif marker in (0xC0, 0xC1):
                precision, h, w, ncomp = struct.unpack_from(">BHHB", seg, 0)
                if precision != 8 or h <= 0 or w <= 0 or not 1 <= ncomp <= 4:
                    return None
                comps = []
                for c in range(ncomp):
                    cid, hv, tq2 = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                    if hv >> 4 < 1 or hv & 0x0F < 1:
                        return None
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq2}
                    )
                frame = {"h": h, "w": w, "comps": comps, "progressive": False}
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None
            elif marker == 0xDD:
                (restart_interval,) = struct.unpack_from(">H", seg, 0)
            elif marker == 0xDA:
                if frame is None:
                    return None
                ns = seg[0]
                scan_map = {}
                for c in range(ns):
                    scan_map[seg[1 + 2 * c]] = (
                        seg[2 + 2 * c] >> 4,
                        seg[2 + 2 * c] & 0x0F,
                    )
                for comp in frame["comps"]:
                    if comp["id"] not in scan_map or comp["tq"] not in qt:
                        return None
                    dc_t, ac_t = scan_map[comp["id"]]
                    if dc_t not in huff_dc or ac_t not in huff_ac:
                        return None
                return {
                    "frame": frame, "qt": qt, "huff_dc": huff_dc,
                    "huff_ac": huff_ac, "scan_map": scan_map,
                    "ri": restart_interval, "pos": i + 2 + seglen,
                }
            i += 2 + seglen
    except (struct.error, IndexError, ValueError):
        return None
    return None


def _plan_scan(b: bytes, meta: dict):
    """MCU geometry + pre-split entropy segments for one parsed baseline
    image; None on any mismatch (scalar fallback raises the right
    error).  Mirrors `_decode_scan`'s geometry exactly."""
    frame = meta["frame"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    n_mcus = mcux * mcuy
    tmpl = [ci for ci, c in enumerate(comps) for _ in range(c["v"] * c["h"])]
    segs, _ = _entropy_segments(b, meta["pos"])
    ri = meta["ri"] or n_mcus
    n_segs = -(-n_mcus // ri)
    if len(segs) < n_segs:
        return None
    return {
        **meta, "mcux": mcux, "mcuy": mcuy, "n_mcus": n_mcus,
        "tmpl": tmpl, "bpm": len(tmpl), "segs": segs[:n_segs], "ri_eff": ri,
    }


def _run_lockstep(plans: list) -> None:
    """Decode every entropy segment of every planned image in lockstep.
    Fills ``plan["coefs"]`` ((n_blocks, 64) float64, identical to the
    scalar pass-1 output) per image, or sets ``plan["failed"]`` when any
    of its lanes hits a condition the scalar decoder reports as an error
    (invalid code, AC overrun, truncation) — the caller re-decodes those
    images scalar so the exception is exactly the scalar one."""
    # --- stack distinct Huffman LUTs (dedup by DHT content key)
    dc_keys: dict[bytes, int] = {}
    ac_keys: dict[bytes, int] = {}
    dc_sym, dc_len, ac_sym, ac_len = [], [], [], []

    def _tid(tab, keys, syms, lens):
        k = tab.key
        if k not in keys:
            keys[k] = len(syms)
            syms.append(tab.lut_sym)
            lens.append(tab.lut_len)
        return keys[k]

    lane_u: list[np.ndarray] = []
    uoff, uend, segbits = [], [], []
    toff, bpm_l, nblk, outbase = [], [], [], []
    dctab_l, actab_l = [], []
    tmpl_flat: list[int] = []
    u_run = 0
    coef_base = 0
    for pl in plans:
        comps = pl["frame"]["comps"]
        dct, act_ = [0] * 4, [0] * 4
        for ci_, c in enumerate(comps):
            dc_t, ac_t = pl["scan_map"][c["id"]]
            dct[ci_] = _tid(pl["huff_dc"][dc_t], dc_keys, dc_sym, dc_len)
            act_[ci_] = _tid(pl["huff_ac"][ac_t], ac_keys, ac_sym, ac_len)
        t0 = len(tmpl_flat)
        tmpl_flat.extend(pl["tmpl"])
        ri, n_mcus, bpm = pl["ri_eff"], pl["n_mcus"], pl["bpm"]
        pl["coef_base"] = coef_base
        pl["lane_lo"] = len(uoff)
        for si, seg in enumerate(pl["segs"]):
            u32, nbits = _bit_window(seg)
            lane_u.append(u32)
            uoff.append(u_run)
            u_run += len(u32)
            uend.append(u_run)
            segbits.append(nbits)
            toff.append(t0)
            bpm_l.append(bpm)
            nblk.append(min(ri, n_mcus - si * ri) * bpm)
            outbase.append(coef_base + si * ri * bpm)
            dctab_l.append(dct)
            actab_l.append(act_)
        pl["lane_hi"] = len(uoff)
        coef_base += n_mcus * bpm

    L = len(uoff)
    U = np.concatenate(lane_u).astype(np.int64)
    # flat int64 LUTs: one gather via (table_id << 16) | v16, no astype
    # in the hot loop
    DCSf = np.stack(dc_sym).astype(np.int64).ravel()
    DCLf = np.stack(dc_len).astype(np.int64).ravel()
    ACSf = np.stack(ac_sym).astype(np.int64).ravel()
    ACLf = np.stack(ac_len).astype(np.int64).ravel()
    C = np.zeros((coef_base, 64))
    ZZ = ZIGZAG

    uoff_a = np.asarray(uoff, np.int64)
    uend_a = np.asarray(uend, np.int64)
    segbits_a = np.asarray(segbits, np.int64)
    toff_a = np.asarray(toff, np.int64)
    bpm_a = np.asarray(bpm_l, np.int64)
    nblk_a = np.asarray(nblk, np.int64)
    outbase_a = np.asarray(outbase, np.int64)
    dctab_a = np.asarray(dctab_l, np.int64)
    actab_a = np.asarray(actab_l, np.int64)
    tmpl_a = np.asarray(tmpl_flat, np.int64)

    # --- lane state (all L-sized; int64 so corrupt-stream DC chains
    # accumulate exactly like the scalar path's Python ints)
    p = np.zeros(L, np.int64)          # bit position in the segment
    jb = np.zeros(L, np.int64)         # block index within the segment
    kk = np.zeros(L, np.int64)         # zigzag index within the block
    phase = np.zeros(L, np.int8)       # 0 = expect DC code, 1 = AC code
    pred = np.zeros((L, 4), np.int64)  # per-component DC predictor
    alive = np.ones(L, bool)
    fl = np.zeros(L, bool)
    ci = tmpl_a[toff_a]                # current block's component index
    outrow = outbase_a.copy()

    def _fail(idx):
        fl[idx] = True
        alive[idx] = False

    nw_a = uend_a - uoff_a  # words per lane window

    act = np.flatnonzero(alive)
    while act.size:
        pa = p[act]
        oob = (pa >> 3) >= nw_a[act]
        if oob.any():  # scalar raises "truncated" via IndexError here
            _fail(act[oob])
            act = act[~oob]
            if not act.size:
                act = np.flatnonzero(alive)
                continue
            pa = p[act]
        w32 = U[uoff_a[act] + (pa >> 3)]
        sh = pa & 7
        v16 = ((w32 << sh) & 0xFFFFFFFF) >> 16
        isdc = phase[act] == 0
        bdone = np.zeros(L, bool)

        # The magnitude bits that follow a code live in the SAME 32-bit
        # window already fetched for the code whenever sh + ln + s <= 32
        # (the overwhelmingly common case) — extract them with shifts on
        # w32 instead of a second gather.  The scalar path's second peek
        # and its IndexError bound are reproduced exactly: lanes whose
        # magnitude-peek word index would be out of range fail (→ scalar
        # fallback raises), and the rare spill lanes re-gather for real.

        # ---- DC code (+ its magnitude bits in the same step)
        di = np.flatnonzero(isdc)
        if di.size:
            lanes = act[di]
            cid = ci[lanes]
            idx = (dctab_a[lanes, cid] << 16) + v16[di]
            sym = DCSf[idx]
            ln = DCLf[idx]
            bad = (ln == 0) | (sym > 16)
            if bad.any():
                _fail(lanes[bad])
                keep = ~bad
                lanes, cid, sym, ln, di = (
                    lanes[keep], cid[keep], sym[keep], ln[keep], di[keep]
                )
            pa_d = pa[di]
            pnew = pa_d + ln
            hm = sym > 0
            ob = hm & ((pnew >> 3) >= nw_a[lanes])
            if ob.any():
                _fail(lanes[ob])
                keep = ~ob
                lanes, cid, sym, pa_d, pnew, hm, di = (
                    lanes[keep], cid[keep], sym[keep], pa_d[keep],
                    pnew[keep], hm[keep], di[keep]
                )
            s1 = np.maximum(sym, 1)
            mag = ((w32[di] << (sh[di] + (pnew - pa_d))) & 0xFFFFFFFF) >> (
                32 - s1
            )
            spill = hm & (sh[di] + (pnew - pa_d) + sym > 32)
            if spill.any():
                sp = np.flatnonzero(spill)
                w2 = U[uoff_a[lanes[sp]] + (pnew[sp] >> 3)]
                mag[sp] = (
                    ((w2 << (pnew[sp] & 7)) & 0xFFFFFFFF) >> 16
                ) >> (16 - s1[sp])
            diff = np.where(mag >= (1 << (s1 - 1)), mag, mag - (1 << s1) + 1)
            pred[lanes, cid] += np.where(hm, diff, 0)
            p[lanes] = pnew + sym
            C[outrow[lanes], 0] = pred[lanes, cid]
            kk[lanes] = 1
            phase[lanes] = 1

        # ---- AC code (+ magnitude bits)
        ai = np.flatnonzero(~isdc)
        if ai.size:
            lanes = act[ai]
            idx = (actab_a[lanes, ci[lanes]] << 16) + v16[ai]
            rs = ACSf[idx]
            ln = ACLf[idx]
            bad = ln == 0
            if bad.any():
                _fail(lanes[bad])
                keep = ~bad
                lanes, rs, ln, ai = lanes[keep], rs[keep], ln[keep], ai[keep]
            pa_a = pa[ai]
            pnew = pa_a + ln
            r = rs >> 4
            s = rs & 15
            iszero = s == 0
            kadd = np.where(iszero, np.where(r == 15, 16, 0), r)
            kcur = kk[lanes] + kadd
            bdone[lanes[iszero & ((r != 15) | (kcur >= 64))]] = True
            hm = ~iszero
            over = hm & (kcur > 63)
            if over.any():  # scalar: "JPEG AC index overrun"
                _fail(lanes[over])
                hm &= ~over
            ob = hm & ((pnew >> 3) >= nw_a[lanes])
            if ob.any():
                _fail(lanes[ob])
                hm &= ~ob
            s1 = np.maximum(s, 1)
            mag = ((w32[ai] << (sh[ai] + ln)) & 0xFFFFFFFF) >> (32 - s1)
            spill = hm & (sh[ai] + ln + s > 32)
            if spill.any():
                sp = np.flatnonzero(spill)
                w2 = U[uoff_a[lanes[sp]] + (pnew[sp] >> 3)]
                mag[sp] = (
                    ((w2 << (pnew[sp] & 7)) & 0xFFFFFFFF) >> 16
                ) >> (16 - s1[sp])
            val = np.where(mag >= (1 << (s1 - 1)), mag, mag - (1 << s1) + 1)
            wl = np.flatnonzero(hm)
            C[outrow[lanes[wl]], ZZ[kcur[wl]]] = val[wl]
            p[lanes] = pnew + s * hm
            kk[lanes] = kcur + hm
            bdone[lanes[hm & (kcur >= 63)]] = True

        # ---- block advance / segment completion
        adv = np.flatnonzero(bdone & alive)
        if adv.size:
            jb[adv] += 1
            finm = jb[adv] >= nblk_a[adv]
            fin = adv[finm]
            if fin.size:
                trunc = p[fin] > segbits_a[fin]
                _fail(fin[trunc])  # scalar: "entropy stream truncated"
                alive[fin[~trunc]] = False
            cont = adv[~finm]
            if cont.size:
                ci[cont] = tmpl_a[toff_a[cont] + jb[cont] % bpm_a[cont]]
                outrow[cont] = outbase_a[cont] + jb[cont]
                phase[cont] = 0
        act = np.flatnonzero(alive)

    for pl in plans:
        if fl[pl["lane_lo"] : pl["lane_hi"]].any():
            pl["failed"] = True
        else:
            lo = pl["coef_base"]
            pl["coefs"] = C[lo : lo + pl["n_mcus"] * pl["bpm"]]


def decode_jpeg_batch(payloads, min_lanes: int = 128,
                      max_blocks: int = 1 << 19) -> list[np.ndarray]:
    """Decode many JPEG payloads together; returns their pixel arrays in
    input order, bit-identical to ``[decode_jpeg(p) for p in payloads]``
    (the per-payload error is also identical — a failing payload raises
    the scalar decoder's exception at its input position).

    Baseline images feed the lockstep SIMD-across-streams entropy
    decoder; progressive / malformed / exotic payloads fall back to the
    scalar path per image.  Groups are capped at ``max_blocks`` 8x8
    blocks (~256 MB of coefficients) so huge batches stay memory-bounded,
    and groups that would run with fewer than ``min_lanes`` lanes decode
    scalar instead — below that, per-step numpy dispatch overhead beats
    the Python loop it replaces."""
    items = [bytes(p) for p in payloads]
    plans: list = []
    for b in items:
        meta = _parse_baseline(b)
        plans.append(_plan_scan(b, meta) if meta is not None else None)

    # group into memory-bounded lockstep runs
    group: list = []
    g_blocks = g_lanes = 0

    def _flush():
        nonlocal group, g_blocks, g_lanes
        if group:
            if g_lanes >= min_lanes:
                _run_lockstep(group)
            else:
                for pl in group:
                    pl["failed"] = True
            group, g_blocks, g_lanes = [], 0, 0

    for pl in plans:
        if pl is None:
            continue
        nb = pl["n_mcus"] * pl["bpm"]
        if group and g_blocks + nb > max_blocks:
            _flush()
        group.append(pl)
        g_blocks += nb
        g_lanes += len(pl["segs"])
    _flush()

    out: list[np.ndarray] = []
    for b, pl in zip(items, plans):
        if pl is None or pl.get("failed"):
            out.append(decode_jpeg(b))
        else:
            out.append(
                _assemble_planes(
                    pl["coefs"], pl["frame"], pl["qt"],
                    pl["mcux"], pl["mcuy"], pl["tmpl"],
                )
            )
    return out
