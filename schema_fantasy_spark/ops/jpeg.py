"""Baseline JPEG codec in pure numpy + stdlib — no codec library.

Decoder: sequential baseline (SOF0/SOF1) AND progressive (SOF2)
huffman JPEG — DQT/DHT/DRI/SOS marker parse, canonical huffman decode
with byte-destuffing and restart markers; progressive streams
accumulate coefficients across every scan shape (interleaved/single
DC first + refine, per-band AC first + refine with EOB runs and the
T.81 G.1.2.3 correction-bit walk); then dequantize, orthonormal 8x8
IDCT, generic h/v chroma subsampling (4:4:4 / 4:2:2 / 4:2:0 via
repeat-upsample), YCbCr->RGB (JFIF/BT.601), crop to the SOF dims.
Returns HxWx3 uint8; None for arithmetic, hierarchical, lossless, or
12-bit streams — the remaining genuinely-stubbed image formats are
WebP and video.

Encoders: baseline (grayscale or YCbCr 4:4:4 / 4:2:0) and
progressive (grayscale or 4:4:4, spectral selection + successive
approximation), all-ones quantization tables (quality-100-exact),
huffman tables emitted IN the stream (the codec pair is
self-consistent regardless of table constants). With q == 1, an 8x8-constant block quantizes to a
lone integral DC coefficient (DC = 8*(v-128)), so MCU-aligned two-tone
images ROUND-TRIP EXACTLY — the property the driver-gate corpus
(mm_corpus.synthetic_jpegs) is built on.

The reference validates documents and never decodes media; this module
exists for the engine's multimodal-pipeline surface (SURVEY.md §2.4
category sweep), same role as the PNG decoder beside it.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import numpy as np

# ------------------------------------------------------------- constants

#: zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
ZIGZAG = [
    (0, 0), (0, 1), (1, 0), (2, 0), (1, 1), (0, 2), (0, 3), (1, 2),
    (2, 1), (3, 0), (4, 0), (3, 1), (2, 2), (1, 3), (0, 4), (0, 5),
    (1, 4), (2, 3), (3, 2), (4, 1), (5, 0), (6, 0), (5, 1), (4, 2),
    (3, 3), (2, 4), (1, 5), (0, 6), (0, 7), (1, 6), (2, 5), (3, 4),
    (4, 3), (5, 2), (6, 1), (7, 0), (7, 1), (6, 2), (5, 3), (4, 4),
    (3, 5), (2, 6), (1, 7), (2, 7), (3, 6), (4, 5), (5, 4), (6, 3),
    (7, 2), (7, 3), (6, 4), (5, 5), (4, 6), (3, 7), (4, 7), (5, 6),
    (6, 5), (7, 4), (7, 5), (6, 6), (5, 7), (6, 7), (7, 6), (7, 7),
]

#: DC table (Annex-K luminance shape): counts per code length 1..16, then
#: symbols (categories 0..11)
DC_COUNTS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_SYMBOLS = list(range(12))

#: AC table (Annex-K luminance shape): 162 run/size symbols
AC_COUNTS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
AC_SYMBOLS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _idct_matrix() -> "np.ndarray":
    """Orthonormal 8x8 DCT basis M with M[u, x] = C(u)/2 * cos((2x+1)u
    pi/16): spatial = M.T @ coeffs @ M, coeffs = M @ spatial @ M.T."""
    m = np.empty((8, 8))
    for u in range(8):
        c = (1.0 / math.sqrt(2.0)) if u == 0 else 1.0
        for x in range(8):
            m[u, x] = 0.5 * c * math.cos((2 * x + 1) * u * math.pi / 16.0)
    return m


_M = _idct_matrix()

#: zigzag as gather index arrays for batched (n, 8, 8) coefficient ops
_ZR = np.array([r for r, _ in ZIGZAG])
_ZC = np.array([c for _, c in ZIGZAG])
#: zigzag k -> natural-order flat index (r*8 + c) for batched decode
_ZNAT = [r * 8 + c for r, c in ZIGZAG]


def _block_grid(plane: "np.ndarray") -> "np.ndarray":
    """(by, bx, 8, 8) block view of an (8*by, 8*bx) plane (no copy)."""
    h, w = plane.shape
    return plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)


# ---------------------------------------------------------- huffman build


def _build_codes(counts, symbols):
    """Canonical huffman: {symbol: (code, length)} from DHT counts.
    Memoized on the table bytes — encode_jpeg_baseline always uses the
    two spec tables, and rebuilding them per image was pure overhead."""
    return _build_codes_cached(bytes(counts), bytes(symbols))


@functools.lru_cache(maxsize=64)
def _build_codes_cached(counts: bytes, symbols: bytes):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_decode(counts, symbols):
    """Canonical huffman decode structure: a flat 16-bit-peek lookup
    table (lut[next16bits] = symbol*32 + code_length; 0 = invalid).
    Memoized on the table bytes — a corpus of images emitting identical
    DHTs (every stream this codec writes, and most camera firmware)
    builds each table once."""
    return _build_decode_cached(bytes(counts), bytes(symbols))


@functools.lru_cache(maxsize=64)
def _build_decode_cached(counts: bytes, symbols: bytes):
    lut = [0] * (1 << 16)
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            start = code << (16 - length)
            end = start + (1 << (16 - length))
            lut[start:end] = [symbols[k] * 32 + length] * (end - start)
            code += 1
            k += 1
        code <<= 1
    return lut


# -------------------------------------------------------------- bit I/O


class _BitReader:
    """MSB-first bit reader over destuffed entropy bytes, buffered so
    huffman decode is ONE 16-bit peek + flat-table lookup instead of a
    per-bit dict walk (~4x on progressive streams)."""

    __slots__ = ("data", "total", "consumed", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.total = len(data) * 8
        self.consumed = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        # top up to >= 16 buffered bits; virtual zero-padding past the
        # end is fine to PEEK at — consuming past self.total raises
        byte_pos = (self.consumed + self.nbits) >> 3
        while self.nbits < 16:
            b = self.data[byte_pos] if byte_pos < len(self.data) else 0
            self.acc = ((self.acc << 8) | b) & 0xFFFFFF
            self.nbits += 8
            byte_pos += 1

    def receive(self, n: int) -> int:
        if n == 0:
            return 0
        if self.consumed + n > self.total:
            raise EOFError
        if self.nbits < n:
            self._fill()
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        self.consumed += n
        return v

    def read_bit(self) -> int:
        return self.receive(1)

    def decode_huff(self, lut) -> int:
        if self.nbits < 16:
            self._fill()
        peek = (self.acc >> (self.nbits - 16)) & 0xFFFF
        entry = lut[peek]
        if entry == 0:
            raise ValueError("bad huffman code")
        length = entry & 31
        if self.consumed + length > self.total:
            raise EOFError
        self.nbits -= length
        self.acc &= (1 << self.nbits) - 1
        self.consumed += length
        return entry >> 5


def _extend(v: int, s: int) -> int:
    """JPEG sign extension of an s-bit magnitude."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill padding per spec
        return bytes(self.out)


# --------------------------------------------------------------- decoder


def decode_jpeg_pixels(payload: bytes) -> Optional["np.ndarray"]:
    """Decode a baseline-sequential OR progressive huffman JPEG ->
    HxWx3 uint8, or None for streams this decoder does not cover
    (arithmetic coding, hierarchical, lossless, 12-bit, malformed)."""
    try:
        return _decode(payload)
    except (ValueError, EOFError, IndexError, KeyError, ZeroDivisionError):
        return None


def _decode(payload: bytes) -> Optional["np.ndarray"]:
    if payload[:2] != b"\xff\xd8":
        return None
    i = 2
    qt = {}
    huff = {}
    sof = None
    dri = 0
    progressive = False
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        i += 2
        if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            return None  # EOI before any scan
        length = int.from_bytes(payload[i : i + 2], "big")
        if length < 2:
            return None  # malformed zero-length segment would loop forever
        seg = payload[i + 2 : i + length]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec = seg[p] >> 4
                tid = seg[p] & 0x0F
                p += 1
                if prec == 0:
                    qt[tid] = np.frombuffer(seg[p : p + 64], np.uint8).astype(np.int32)
                    p += 64
                else:
                    qt[tid] = np.frombuffer(
                        seg[p : p + 128], ">u2"
                    ).astype(np.int32)
                    p += 128
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls = seg[p] >> 4
                tid = seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + nsym])
                huff[(cls, tid)] = _build_decode(counts, symbols)
                p += 17 + nsym
        elif marker in (0xC0, 0xC1, 0xC2):  # sequential huffman / progressive
            prec = seg[0]
            if prec != 8:
                return None
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            sof = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            return None  # lossless / arithmetic / hierarchical
        elif marker == 0xDD:  # DRI
            dri = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS: entropy data follows the header
            if sof is None:
                return None
            if progressive:
                # hand the whole remaining stream (this SOS onward) to the
                # multi-scan driver; it keeps walking markers itself
                return _decode_progressive(payload, i - 2, sof, qt, huff, dri)
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c : 3 + 2 * c]
                scan.append((cid, tabs >> 4, tabs & 0x0F))
            return _decode_scan(payload, i + length, sof, scan, qt, huff, dri)
        i += length
    return None


def _destuff(payload: bytes, start: int):
    """Entropy bytes destuffed into restart segments; stops at EOI or the
    next marker. Returns (segments, index of the terminating 0xFF)."""
    segs = [bytearray()]
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            segs[-1].append(b)
            i += 1
            continue
        m = payload[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            segs[-1].append(0xFF)
            i += 2
        elif m == 0xFF:  # fill byte before a marker
            i += 1
        elif 0xD0 <= m <= 0xD7:
            segs.append(bytearray())
            i += 2
        else:  # EOI or next marker
            break
    return [bytes(s) for s in segs], i


def _decode_scan(payload, start, sof, scan, qt, huff, dri):
    h, w, comps = sof
    if not comps or h == 0 or w == 0:
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0:
        return None
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    tabs = {cid: (td, ta) for cid, td, ta in scan}
    # dequant tables in natural (row, col) order
    deq = {}
    for c in comps:
        q = qt[c["tq"]]
        nat = np.zeros((8, 8), np.int32)
        for k, (r, cc) in enumerate(ZIGZAG):
            nat[r, cc] = q[k]
        deq[c["id"]] = nat
    segs, _ = _destuff(payload, start)
    seg_i = 0
    reader = _BitReader(segs[0])
    preds = {c["id"]: 0 for c in comps}
    # Entropy decode is inherently sequential; everything after it is
    # not. Accumulate each block as a plain 64-int list (natural order)
    # plus its (block_row, block_col), then dequantize + IDCT every
    # block of a component in ONE batched matmul and scatter into the
    # plane — the per-block np.zeros + 8x8 matmul pair dominated this
    # loop (numpy call overhead, not math).
    coef_lists = {c["id"]: [] for c in comps}
    pos_lists = {c["id"]: [] for c in comps}
    mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu and mcu % dri == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise EOFError
                reader = _BitReader(segs[seg_i])
                preds = {c["id"]: 0 for c in comps}
            for c in comps:
                td, ta = tabs[c["id"]]
                dc_tab = huff[(0, td)]
                ac_tab = huff[(1, ta)]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = [0] * 64
                        s = reader.decode_huff(dc_tab)
                        diff = _extend(reader.receive(s), s) if s else 0
                        preds[c["id"]] += diff
                        coef[0] = preds[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.decode_huff(ac_tab)
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += rs >> 4
                            sbits = rs & 0x0F
                            if k > 63:
                                raise ValueError("AC overrun")
                            coef[_ZNAT[k]] = _extend(
                                reader.receive(sbits), sbits)
                            k += 1
                        coef_lists[c["id"]].append(coef)
                        pos_lists[c["id"]].append(
                            (my * c["v"] + by, mx * c["h"] + bx))
            mcu += 1
    planes = {}
    for c in comps:
        cid = c["id"]
        coefs = np.array(coef_lists[cid], np.int32).reshape(-1, 8, 8)
        blocks = (coefs * deq[cid]).astype(np.float64)
        spatial = _M.T @ blocks @ _M
        ph, pw = mcuy * c["v"] * 8, mcux * c["h"] * 8
        plane = np.zeros((ph, pw), np.float64)
        grid = _block_grid(plane)
        grid[tuple(np.array(pos_lists[cid]).T)] = spatial
        planes[cid] = plane
    # upsample, level-shift, color-convert, crop
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))
    if len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        rgb = np.stack([r, g, b], axis=2)
        return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return None


# ---------------------------------------------------- progressive decode


def _decode_progressive(payload, start, sof, qt, huff, dri):
    """Multi-scan progressive (SOF2) driver: walk every scan, accumulate
    zigzag-ordered coefficients per component (DC/AC first passes and
    successive-approximation refinements), then dequantize + IDCT once.

    Coefficient grids cover the full interleaved MCU grid; non-interleaved
    scans iterate only each component's EFFECTIVE block dims (T.81
    A.2.2: ceil(ceil(dim * samp / samp_max) / 8))."""
    h, w, comps = sof
    if not comps or h == 0 or w == 0:
        return None
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax == 0 or vmax == 0:
        return None
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    by_id = {c["id"]: c for c in comps}
    coefs = {}   # cid -> (blocks_y, blocks_x, 64) zigzag-ordered ints
    effdims = {}  # cid -> (eff_blocks_y, eff_blocks_x)
    for c in comps:
        coefs[c["id"]] = np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
        ch = (h * c["v"] + vmax - 1) // vmax
        cw = (w * c["h"] + hmax - 1) // hmax
        effdims[c["id"]] = ((ch + 7) // 8, (cw + 7) // 8)

    i = start
    n = len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        i += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break  # EOI: render what we have
        length = int.from_bytes(payload[i : i + 2], "big")
        if length < 2:
            raise ValueError("zero-length segment")
        seg = payload[i + 2 : i + length]
        if marker == 0xC4:  # scans may redefine tables
            p = 0
            while p < len(seg):
                cls = seg[p] >> 4
                tid = seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                nsym = sum(counts)
                huff[(cls, tid)] = _build_decode(counts, list(seg[p + 17 : p + 17 + nsym]))
                p += 17 + nsym
        elif marker == 0xDD:
            dri = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:
            ns = seg[0]
            scan = []
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c : 3 + 2 * c]
                scan.append((cid, tabs >> 4, tabs & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            segs, end = _destuff(payload, i + length)
            _progressive_scan(
                segs, scan, ss, se, ah, al, by_id, coefs, effdims,
                huff, dri, mcux, mcuy,
            )
            i = end
            continue
        i += length

    # render: dequant (zigzag -> natural) + IDCT, batched across every
    # block of a component in one matmul (same stacked-dgemm arithmetic
    # as the per-block loop it replaces — see _decode_scan)
    planes = {}
    for c in comps:
        q = qt[c["tq"]]
        grid = coefs[c["id"]]
        by, bx = grid.shape[:2]
        nat = np.zeros((by, bx, 8, 8), np.int64)
        nat[..., _ZR, _ZC] = grid * q
        spatial = _M.T @ nat.astype(np.float64) @ _M
        plane = np.empty((by * 8, bx * 8), np.float64)
        _block_grid(plane)[...] = spatial
        planes[c["id"]] = plane
    full = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[:h, :w] + 128.0)
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))
    if len(full) == 3:
        y, cb, cr = full
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        return np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    return None


def _progressive_scan(segs, scan, ss, se, ah, al, by_id, coefs, effdims,
                      huff, dri, mcux, mcuy):
    """One progressive scan over restart segments. Four shapes: DC first /
    DC refine (interleaved over all scan components), AC first / AC
    refine (single component, effective-dims raster order)."""
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("bad DC spectral range")
    if not is_dc and len(scan) != 1:
        raise ValueError("AC scans are single-component")

    if is_dc:
        units = []  # (cid, by, bx) in interleaved MCU order
        if len(scan) > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    for cid, _, _ in scan:
                        c = by_id[cid]
                        for yy in range(c["v"]):
                            for xx in range(c["h"]):
                                units.append((cid, my * c["v"] + yy, mx * c["h"] + xx))
            mcu_units = sum(by_id[cid]["v"] * by_id[cid]["h"] for cid, _, _ in scan)
        else:
            cid = scan[0][0]
            eby, ebx = effdims[cid]
            units = [(cid, yy, xx) for yy in range(eby) for xx in range(ebx)]
            mcu_units = 1
    else:
        cid = scan[0][0]
        eby, ebx = effdims[cid]
        units = [(cid, yy, xx) for yy in range(eby) for xx in range(ebx)]
        mcu_units = 1

    seg_i = 0
    reader = _BitReader(segs[0])
    preds = {cid: 0 for cid, _, _ in scan}
    eobrun = 0
    p1 = 1 << al
    m1 = -p1
    for u_idx, (ucid, uby, ubx) in enumerate(units):
        if dri and u_idx and (u_idx // mcu_units) and u_idx % (dri * mcu_units) == 0:
            seg_i += 1
            if seg_i >= len(segs):
                raise EOFError
            reader = _BitReader(segs[seg_i])
            preds = {c: 0 for c in preds}
            eobrun = 0
        block = coefs[ucid][uby, ubx]
        if is_dc:
            td = next(t for c, t, _ in scan if c == ucid)
            if ah == 0:  # DC first
                s = reader.decode_huff(huff[(0, td)])
                diff = _extend(reader.receive(s), s) if s else 0
                preds[ucid] += diff
                block[0] = preds[ucid] << al
            else:  # DC refine: one magnitude bit
                if reader.read_bit():
                    block[0] |= p1
        elif ah == 0:  # AC first
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            ta = scan[0][2]
            ac = huff[(1, ta)]
            while k <= se:
                rs = reader.decode_huff(ac)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r < 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.receive(r)
                        break
                    k += 16
                    continue
                k += r
                if k > se:
                    raise ValueError("AC overrun")
                block[k] = _extend(reader.receive(s), s) << al
                k += 1
        else:  # AC refine (T.81 G.1.2.3 / the libjpeg correction-bit walk)
            k = ss
            ta = scan[0][2]
            ac = huff[(1, ta)]

            def correct(idx):
                if reader.read_bit() and (block[idx] & p1) == 0:
                    block[idx] += p1 if block[idx] >= 0 else m1

            if eobrun == 0:
                while k <= se:
                    rs = reader.decode_huff(ac)
                    r, s = rs >> 4, rs & 0x0F
                    val = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.receive(r)
                            break
                        # ZRL: run of 16 zero-history positions
                    else:
                        if s != 1:
                            raise ValueError("bad refine size")
                        val = p1 if reader.read_bit() else m1
                    while k <= se:
                        if block[k] != 0:
                            correct(k)
                        else:
                            if r == 0:
                                if val:
                                    block[k] = val
                                k += 1
                                break
                            r -= 1
                        k += 1
            if eobrun > 0:
                while k <= se:
                    if block[k] != 0:
                        correct(k)
                    k += 1
                eobrun -= 1


# --------------------------------------------------------------- encoder


def _encode_block_zz(writer, zz, pred, dc_codes, ac_codes):
    """Quantized block as a plain 64-int ZIGZAG list -> entropy bits.
    Returns the new DC predictor. (Takes the pre-gathered zigzag list
    so the batched encoder's one-gather-per-plane output feeds straight
    in — the old per-block `[int(block[r, c]) for r, c in ZIGZAG]` was
    64 numpy scalar reads per block.)"""
    dc = zz[0]
    diff = dc - pred
    s = abs(diff).bit_length()
    code, length = dc_codes[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k] != 0:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]
            writer.write(code, length)
            run -= 16
        s = abs(v).bit_length()
        code, length = ac_codes[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]
        writer.write(code, length)
    return dc


def _pad_to_blocks(plane: "np.ndarray", bh: int, bw: int) -> "np.ndarray":
    """Edge-replicate pad to multiples of (8*bh_factor) handled by the
    caller; here simply to (ceil/8)*8 on both axes."""
    h, w = plane.shape
    ph = (h + bh - 1) // bh * bh
    pw = (w + bw - 1) // bw * bw
    if ph == h and pw == w:
        return plane
    out = np.empty((ph, pw), plane.dtype)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def encode_jpeg_baseline(
    px: "np.ndarray", subsample: bool = False
) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 as baseline JPEG with
    all-ones quantization (quality-100-exact). ``subsample=True`` uses
    4:2:0 chroma (2x2 mean), else 4:4:4. Quantized AC coefficients are
    clamped to +-1023 (category 10, the largest the AC table encodes);
    only adversarial checkerboard blocks can reach beyond it."""
    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if h == 0 or w == 0 or h > 65535 or w > 65535:
        raise ValueError("bad dims")
    if gray:
        planes = [px.astype(np.float64)]
        samp = [(1, 1)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
        y, cb, cr = (np.clip(np.rint(p), 0, 255) for p in (y, cb, cr))
        if subsample:
            # pad to even dims (edge replicate) then 2x2 mean, rounded
            def down(p):
                pe = _pad_to_blocks(p, 2, 2)
                return np.rint(
                    (pe[0::2, 0::2] + pe[0::2, 1::2] + pe[1::2, 0::2] + pe[1::2, 1::2])
                    / 4.0
                )

            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # pad every plane to its full MCU coverage
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        padded.append(_pad_to_blocks(p, mcuy * sv * 8, mcux * sh * 8))

    dc_codes = _build_codes(DC_COUNTS, DC_SYMBOLS)
    ac_codes = _build_codes(AC_COUNTS, AC_SYMBOLS)

    # DCT + quantize + zigzag for EVERY block of every plane in one
    # batched matmul per plane (stacked BLAS dgemm — bit-identical to
    # the per-block `_M @ blk @ _M.T`, which also ran through dgemm);
    # only the inherently sequential entropy coding stays per block.
    zz_planes = []
    for p, (sh, sv) in zip(padded, samp):
        blocks = np.ascontiguousarray(_block_grid(p)) - 128.0
        coef = np.rint(_M @ blocks @ _M.T).astype(np.int64)
        ac_clip = np.clip(coef, -1023, 1023)
        ac_clip[..., 0, 0] = np.clip(coef[..., 0, 0], -2047, 2047)
        zz_planes.append(ac_clip[..., _ZR, _ZC])  # (by, bx, 64)

    writer = _BitWriter()
    preds = [0] * len(planes)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (sh, sv) in enumerate(samp):
                zzp = zz_planes[ci]
                for by in range(sv):
                    for bx in range(sh):
                        preds[ci] = _encode_block_zz(
                            writer,
                            zzp[my * sv + by, mx * sh + bx].tolist(),
                            preds[ci], dc_codes, ac_codes,
                        )
    data = writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # DQT id 0, all ones
    sof_body = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof_body += bytes([len(planes)])
    for ci, (sh, sv) in enumerate(samp):
        sof_body += bytes([ci + 1, (sh << 4) | sv, 0])
    out += seg(0xC0, sof_body)
    out += seg(
        0xC4,
        bytes([0x00]) + bytes(DC_COUNTS) + bytes(DC_SYMBOLS),
    )
    out += seg(
        0xC4,
        bytes([0x10]) + bytes(AC_COUNTS) + bytes(AC_SYMBOLS),
    )
    sos_body = bytes([len(planes)])
    for ci in range(len(planes)):
        sos_body += bytes([ci + 1, 0x00])
    sos_body += bytes([0, 63, 0])  # spectral selection (baseline fixed)
    out += seg(0xDA, sos_body)
    out += data
    out += b"\xff\xd9"
    return bytes(out)


# -------------------------------------------------- progressive encoder


def _quantized_blocks(plane: "np.ndarray"):
    """All-ones-quant zigzag coefficient grid for one padded plane."""
    blocks = np.ascontiguousarray(_block_grid(plane)) - 128.0
    nat = np.rint(_M @ blocks @ _M.T).astype(np.int64)   # (by, bx, 8, 8)
    dc = nat[..., 0, 0].copy()
    nat = np.clip(nat, -1023, 1023)
    nat[..., 0, 0] = dc                                  # DC is unclipped
    return nat[..., _ZR, _ZC]


def _towards_zero(v: int, al: int) -> int:
    return -((-v) >> al) if v < 0 else v >> al


def encode_jpeg_progressive(px: "np.ndarray", al: int = 1) -> bytes:
    """Progressive (SOF2) encoder — grayscale or RGB 4:4:4 — with
    spectral selection AND successive approximation: the test-side
    generator for the progressive decode path. Scan script: interleaved
    DC first (Al=al) -> DC refines down to 0 -> per-component per-band
    AC first (1-5, 6-63 at Al=al) -> AC refines down to 0. All-ones
    quant, so the fully-refined stream reconstructs exactly what the
    baseline encoder would."""
    px = np.asarray(px, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        planes = [px.astype(np.float64)]
    else:
        r = px[:, :, 0].astype(np.float64)
        g = px[:, :, 1].astype(np.float64)
        b_ = px[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b_
        cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b_
        cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b_
        planes = [np.clip(np.rint(p), 0, 255) for p in (y, cb, cr)]
    grids = [_quantized_blocks(_pad_to_blocks(p, 8, 8)) for p in planes]
    by, bx = grids[0].shape[:2]
    # per-component raster-order blocks (AC scan order) and the
    # interleaved MCU order (DC scan order; 4:4:4 -> one block per comp
    # per MCU)
    comp_blocks = [
        [g_[yy, xx] for yy in range(by) for xx in range(bx)] for g_ in grids
    ]
    dc_units = [
        (ci, yy * bx + xx)
        for yy in range(by)
        for xx in range(bx)
        for ci in range(len(planes))
    ]

    dc_codes = _build_codes(DC_COUNTS, DC_SYMBOLS)
    # progressive AC scans need the EOBn symbols (0x10..0xE0) that the
    # baseline Annex-K table omits — and that table is kraft-FULL at 16
    # bits (65535/65536), so they cannot be appended. Use a flat 8-bit
    # custom table over all 176 symbols instead: the DHT travels in the
    # stream, so any conformant decoder reads it; compression optimality
    # is irrelevant for a test-side generator.
    prog_ac_symbols = AC_SYMBOLS + [r << 4 for r in range(1, 15)]
    prog_ac_counts = [0] * 16
    prog_ac_counts[7] = len(prog_ac_symbols)
    ac_codes = _build_codes(prog_ac_counts, prog_ac_symbols)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def sos(comp_ids, ss, se, ah, al_):
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al_]))

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof_body = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof_body += bytes([len(planes)])
    for ci in range(len(planes)):
        sof_body += bytes([ci + 1, 0x11, 0])
    out += seg(0xC2, sof_body)
    out += seg(0xC4, bytes([0x00]) + bytes(DC_COUNTS) + bytes(DC_SYMBOLS))
    out += seg(0xC4, bytes([0x10]) + bytes(prog_ac_counts) + bytes(prog_ac_symbols))

    all_ids = [ci + 1 for ci in range(len(planes))]
    # ---- DC first at Al=al (arithmetic shift), then refinement passes —
    # interleaved across components in MCU order, per-component preds
    wtr = _BitWriter()
    preds = [0] * len(planes)
    for ci, bi in dc_units:
        b = comp_blocks[ci][bi]
        t = int(b[0]) >> al
        diff = t - preds[ci]
        preds[ci] = t
        s = abs(diff).bit_length()
        code, ln = dc_codes[s]
        wtr.write(code, ln)
        if s:
            wtr.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    out += sos(all_ids, 0, 0, 0, al) + wtr.flush()
    for lvl in range(al - 1, -1, -1):
        wtr = _BitWriter()
        for ci, bi in dc_units:
            wtr.write((int(comp_blocks[ci][bi][0]) >> lvl) & 1, 1)
        out += sos(all_ids, 0, 0, lvl + 1, lvl) + wtr.flush()

    # ---- AC: two spectral bands per component, first pass at Al=al
    # then refinements (AC scans are single-component by spec)
    bands = [(ci, ss, se) for ci in range(len(planes)) for ss, se in [(1, 5), (6, 63)]]
    for ci, ss, se in bands:
        blocks = comp_blocks[ci]
        wtr = _BitWriter()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            while eobrun > 0:
                r = min(eobrun.bit_length() - 1, 14)
                code, ln = ac_codes[r << 4]
                wtr.write(code, ln)
                if r:
                    wtr.write(eobrun - (1 << r), r)
                eobrun = 0  # encode the whole run in one EOBn symbol

        for b in blocks:
            vals = [_towards_zero(int(b[k]), al) for k in range(ss, se + 1)]
            if not any(vals):
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
                continue
            flush_eob()
            run = 0
            last_nz = max(i for i, v in enumerate(vals) if v)
            for i in range(last_nz + 1):
                v = vals[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, ln = ac_codes[0xF0]
                    wtr.write(code, ln)
                    run -= 16
                s = abs(v).bit_length()
                code, ln = ac_codes[(run << 4) | s]
                wtr.write(code, ln)
                wtr.write(v if v >= 0 else v + (1 << s) - 1, s)
                run = 0
            if last_nz < len(vals) - 1:
                eobrun += 1
        flush_eob()
        out += sos([ci + 1], ss, se, 0, al) + wtr.flush()

    for ci, ss, se in bands:
        for lvl in range(al - 1, -1, -1):
            wtr = _BitWriter()
            p1 = 1 << lvl
            for b in comp_blocks[ci]:
                hist = [_towards_zero(int(b[k]), lvl + 1) for k in range(ss, se + 1)]
                now = [_towards_zero(int(b[k]), lvl) for k in range(ss, se + 1)]
                # newly-nonzero positions get (run,1)+sign; crossed
                # nonzero-history positions append correction bits
                run = 0
                pending = []
                newly = [i for i in range(len(now)) if hist[i] == 0 and now[i] != 0]
                last_new = newly[-1] if newly else -1

                def flush_zrls():
                    # pending ZRLs drain at ANY nonzero position inside
                    # the EOB span — the decoder's walk crosses history
                    # positions while counting down the 16-zero run, so
                    # the correction bits must ride each ZRL it decodes
                    nonlocal run, pending
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        wtr.write(code, ln)
                        for bit in pending:
                            wtr.write(bit, 1)
                        pending = []
                        run -= 16

                for i in range(len(now)):
                    if hist[i] != 0:
                        if i <= last_new:
                            flush_zrls()
                        pending.append((abs(int(b[ss + i])) >> lvl) & 1)
                        continue
                    if now[i] != 0 and i <= last_new:
                        flush_zrls()
                        code, ln = ac_codes[(run << 4) | 1]
                        wtr.write(code, ln)
                        wtr.write(1 if now[i] > 0 else 0, 1)
                        for bit in pending:
                            wtr.write(bit, 1)
                        pending = []
                        run = 0
                    else:
                        run += 1
                if run > 0 or pending:
                    code, ln = ac_codes[0x00]  # EOB (run length 1)
                    wtr.write(code, ln)
                    for bit in pending:
                        wtr.write(bit, 1)
            out += sos([ci + 1], ss, se, lvl + 1, lvl) + wtr.flush()

    out += b"\xff\xd9"
    return bytes(out)
