"""VP8 lossy key-frame decode, pure numpy/stdlib — RFC 6386 from scratch.

Completes the WebP family: ``ops/webp.py`` decodes VP8L (lossless) for
real; this module decodes the LOSSY ``'VP8 '`` chunk — boolean
arithmetic decoder, frame/quant/probability header parse, token
(coefficient) decode with the full default probability model, dequant,
inverse WHT + inverse DCT, and 16x16/chroma intra prediction — all
implemented from the public RFC 6386 pseudocode (section numbers cited
inline). Scope notes:

* The stateless ``decode_vp8_frame`` decodes KEY frames — the FULL
  key-frame envelope: segmentation (per-segment quantizer/filter
  overrides, coded segment maps), loop-filter ref/mode deltas, and
  multi-partition token streams all decode (real cwebp output enables
  segmentation by default). INTER frames decode too, through the
  stateful ``Vp8StreamDecoder`` (reference buffers, near-MV census,
  NEAREST/NEAR/ZERO/NEW/SPLIT modes, six-tap sub-pixel motion
  compensation, entropy persistence) — see the inter section at the
  bottom of this module; libwebp cannot cross-check that layer (WebP
  stills are key frames only), so it is validated by encoder
  round-trips + closed-form motion contracts instead
  (tests/test_vp8_inter.py).
* BOTH intra families are fully decoded: 16x16 modes (DC/V/H/TM +
  Y2 WHT) and B_PRED — all ten per-4x4 sub-modes (RFC 11.2/12.3)
  with contextual key-frame mode coding (KF_BMODE_PROBS), the no-Y2
  residual path (block type 3), and reconstructed-neighbor /
  above-right edge semantics. Chroma DC/V/H/TM.
* The in-loop deblocking filter (normal AND simple variants, RFC
  section 15) is implemented and applied; the gate corpus still
  encodes filter level 0 so its decoded tones stay closed-form.
* Everything above is cross-checked BIT-EXACT against Google's
  libwebp reference codec (tests/test_vp8.py decodes our encoder's
  frames through libwebp via ctypes): probability tables are
  extracted from the library itself (tools/gen_vp8_tables.py), and
  the token-band indexing, int16 coefficient wrap, edge-pixel
  conventions, B_PRED sub-mode table orientation, and the
  interior-deblock nonzero-coefficient predicate were all pinned
  down empirically against it.
* Output is the Y plane (the gate corpus codes flat U=V=128 chroma =
  achromatic); ``decode_vp8_gray`` documents that contract. Chroma
  planes are fully decoded and returned too.

The sibling ``encode_vp8_two_tone`` writes a minimal spec-conformant
key frame (16x16 DC_PRED, DC-only residuals through the Y2/WHT chain,
skip for zero-residual MBs) used by the oracle-gated corpus: the
decoded tone is an exact integer function of the coded level and
quantizer index (``vp8_dc_delta``), which the DuckDB oracle recomputes.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Tuple

import numpy as np

# ----------------------------------------------------------- RFC tables

# RFC 6386 14.1: dequantization lookups, indexed by clamped q index
DC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114, 116, 118,
    122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143, 145, 148, 151, 154, 157,
]
AC_QLOOKUP = [
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106, 108,
    110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140, 143, 146, 149, 152,
    155, 158, 161, 164, 167, 170, 173, 177, 181, 185, 189, 193, 197, 201, 205, 209,
    213, 217, 221, 225, 229, 234, 239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
]

# RFC 6386 13.2: coefficient token tree and extra-bit categories
#   tokens: 0=ZERO 1=ONE 2=TWO 3=THREE 4=FOUR 5=cat1(5-6) 6=cat2(7-10)
#   7=cat3(11-18) 8=cat4(19-34) 9=cat5(35-66) 10=cat6(67-2048) 11=EOB
DCT_EOB = 11
COEFF_TREE = [
    -DCT_EOB, 2,            # eob vs rest
    -0, 4,                  # ZERO
    -1, 6,                  # ONE
    8, 12,
    -2, 10,                 # TWO
    -3, -4,                 # THREE, FOUR
    14, 16,
    -5, -6,                 # cat1, cat2
    18, 20,
    -7, -8,                 # cat3, cat4
    -9, -10,                # cat5, cat6
]
CAT_PROBS = [
    [159],
    [165, 145],
    [173, 148, 140],
    [176, 155, 140, 135],
    [180, 157, 141, 134, 130],
    [254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129],
]
CAT_BASE = [5, 7, 11, 19, 35, 67]

# RFC 6386 13.4: coefficient position -> band
COEFF_BANDS = [0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7]

# RFC 6386 8.2 / 14.3: zigzag
ZIGZAG = [0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15]

# RFC 6386 11.2: key-frame intra Y mode tree (fixed probabilities) —
# modes: 0=DC_PRED 1=V_PRED 2=H_PRED 3=TM_PRED 4=B_PRED
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
KF_YMODE_TREE = [-4, 2, 4, 6, -0, -1, -2, -3]
KF_YMODE_PROBS = [145, 156, 163, 128]
# chroma mode tree (0=DC 1=V 2=H 3=TM)
UV_MODE_TREE = [-0, 2, -1, 4, -2, -3]
KF_UV_MODE_PROBS = [142, 114, 183]

# RFC 6386 11.2: the ten intra 4x4 sub-modes (B_PRED) and their tree.
# Key frames code each sub-mode contextually on the above/left
# neighbors' sub-modes via KF_BMODE_PROBS (ops/vp8_tables.py); 16x16
# MBs contribute their implied sub-mode to neighbor context (11.3).
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED,
 B_RD_PRED, B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)
BMODE_TREE = [
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
]
MODE_TO_BMODE = {DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                 H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED}

# RFC 6386 13.5 / 13.4 / 11.4: the normative probability tables
# (default coefficient probs, their update flags, and the key-frame
# B_PRED sub-mode probs) live in the GENERATED module ops/vp8_tables.py,
# extracted byte-exact from the system libwebp reference codec by
# tools/gen_vp8_tables.py. Round 6 found the previously hand-
# transcribed copies had drifted in 25 + 9 bytes — the extraction (and
# the libwebp ctypes cross-decode in tests/test_vp8.py) retires the
# "constants unverifiable in this container" caveat.
from schema_fantasy_spark.ops.vp8_tables import (  # noqa: E402
    COEFF_UPDATE_PROBS,
    DEFAULT_COEFF_PROBS,
    KF_BMODE_PROBS,
)

# ------------------------------------------------- boolean coder (7.2/7.3)


class BoolDecoder:
    """RFC 6386 7.3 boolean arithmetic decoder."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = ((data[0] << 8) | data[1]) if len(data) >= 2 else (
            (data[0] << 8) if data else 0
        )
        self.range_ = 255
        self.bit_count = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range_ - 1) * prob) >> 8)
        bigsplit = split << 8
        if self.value >= bigsplit:
            ret = 1
            self.range_ -= split
            self.value -= bigsplit
        else:
            ret = 0
            self.range_ = split
        while self.range_ < 128:
            self.value <<= 1
            self.range_ <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                self.value |= nxt
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def tree(self, tree: List[int], probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.get(probs[i >> 1])]
            if i <= 0:
                return -i


class BoolEncoder:
    """Inverse of BoolDecoder (RFC 6386 7.2 pseudocode, incl. carry
    propagation); validated by randomized round-trip tests."""

    def __init__(self):
        self.out = bytearray()
        self.range_ = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        if i >= 0:
            self.out[i] += 1

    def put(self, bit: int, prob: int) -> None:
        split = 1 + (((self.range_ - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range_ -= split
        else:
            self.range_ = split
        while self.range_ < 128:
            self.range_ <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def put_literal(self, v: int, n: int) -> None:
        for b in range(n - 1, -1, -1):
            self.put((v >> b) & 1, 128)

    def put_tree(self, tree: List[int], probs, leaf: int, start: int = 0) -> None:
        # walk the tree to the leaf, emitting the branch bits
        path = []
        found = self._find(tree, start, leaf, path)
        assert found, (leaf, start)
        for i, bit in path:
            self.put(bit, probs[i >> 1])

    def _find(self, tree, i, leaf, path):
        for bit in (0, 1):
            nxt = tree[i + bit]
            if nxt == -leaf and nxt <= 0:
                path.append((i, bit))
                return True
            if nxt > 0:
                path.append((i, bit))
                if self._find(tree, nxt, leaf, path):
                    return True
                path.pop()
        return False

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


# -------------------------------------------- transforms (14.3/14.4)


def inv_walsh4x4(coeffs: List[int]) -> List[int]:
    """Inverse WHT for the Y2 (DC) block: 16 outputs = the DCs of the
    16 Y subblocks in raster order."""
    t = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[12 + i]
        b1 = coeffs[4 + i] + coeffs[8 + i]
        c1 = coeffs[4 + i] - coeffs[8 + i]
        d1 = coeffs[i] - coeffs[12 + i]
        t[i] = a1 + b1
        t[4 + i] = c1 + d1
        t[8 + i] = a1 - b1
        t[12 + i] = d1 - c1
    out = [0] * 16
    for j in range(4):
        a1 = t[4 * j] + t[4 * j + 3]
        b1 = t[4 * j + 1] + t[4 * j + 2]
        c1 = t[4 * j + 1] - t[4 * j + 2]
        d1 = t[4 * j] - t[4 * j + 3]
        # outputs land in the Y blocks' int16 coefficient storage in
        # the reference decoders - wrap, don't saturate
        out[4 * j] = _wrap16((a1 + b1 + 3) >> 3)
        out[4 * j + 1] = _wrap16((c1 + d1 + 3) >> 3)
        out[4 * j + 2] = _wrap16((a1 - b1 + 3) >> 3)
        out[4 * j + 3] = _wrap16((d1 - c1 + 3) >> 3)
    return out


_COS = 20091   # cospi8sqrt2minus1 in Q16
_SIN = 35468   # sinpi8sqrt2 in Q16


def inv_dct4x4(coeffs: List[int]) -> np.ndarray:
    """VP8 4x4 inverse transform -> residual block (int array)."""
    t = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[8 + i]
        b1 = coeffs[i] - coeffs[8 + i]
        temp1 = (coeffs[4 + i] * _SIN) >> 16
        temp2 = coeffs[12 + i] + ((coeffs[12 + i] * _COS) >> 16)
        c1 = temp1 - temp2
        temp1 = coeffs[4 + i] + ((coeffs[4 + i] * _COS) >> 16)
        temp2 = (coeffs[12 + i] * _SIN) >> 16
        d1 = temp1 + temp2
        t[i] = a1 + d1
        t[12 + i] = a1 - d1
        t[4 + i] = b1 + c1
        t[8 + i] = b1 - c1
    out = np.zeros((4, 4), dtype=np.int32)
    for j in range(4):
        a1 = t[4 * j] + t[4 * j + 2]
        b1 = t[4 * j] - t[4 * j + 2]
        temp1 = (t[4 * j + 1] * _SIN) >> 16
        temp2 = t[4 * j + 3] + ((t[4 * j + 3] * _COS) >> 16)
        c1 = temp1 - temp2
        temp1 = t[4 * j + 1] + ((t[4 * j + 1] * _COS) >> 16)
        temp2 = (t[4 * j + 3] * _SIN) >> 16
        d1 = temp1 + temp2
        out[j, 0] = (a1 + d1 + 4) >> 3
        out[j, 3] = (a1 - d1 + 4) >> 3
        out[j, 1] = (b1 + c1 + 4) >> 3
        out[j, 2] = (b1 - c1 + 4) >> 3
    return out


# --------------------------------------------------- dequant (9.6/14.1)


def _clamp_q(i: int) -> int:
    return 0 if i < 0 else (127 if i > 127 else i)


def frame_quants(y_ac_qi, y_dc_d, y2_dc_d, y2_ac_d, uv_dc_d, uv_ac_d):
    """(y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac) dequant factors."""
    y_dc = DC_QLOOKUP[_clamp_q(y_ac_qi + y_dc_d)]
    y_ac = AC_QLOOKUP[_clamp_q(y_ac_qi)]
    y2_dc = DC_QLOOKUP[_clamp_q(y_ac_qi + y2_dc_d)] * 2
    y2_ac = AC_QLOOKUP[_clamp_q(y_ac_qi + y2_ac_d)] * 155 // 100
    if y2_ac < 8:
        y2_ac = 8
    uv_dc = DC_QLOOKUP[_clamp_q(y_ac_qi + uv_dc_d)]
    if uv_dc > 132:
        uv_dc = 132
    uv_ac = AC_QLOOKUP[_clamp_q(y_ac_qi + uv_ac_d)]
    return y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac


# ----------------------------------------------- token decode (13.3)


def _wrap16(x: int) -> int:
    """int16 two's-complement wrap (reference decoders store dequantized
    coefficients and WHT outputs in 16-bit buffers)."""
    return ((x + 0x8000) & 0xFFFF) - 0x8000


def _decode_coeffs(bd, probs, block_type, first_coeff, ctx, dq_dc, dq_ac):
    """Decode one 4x4 block's coefficients -> (coeffs[16] dequantized in
    raster order, any_nonzero). ``ctx`` = above_nz + left_nz."""
    coeffs = [0] * 16
    i = first_coeff
    start = 0
    nonzero = False
    while i < 16:
        # band is indexed by TOKENS READ (i - first_coeff), not by the
        # absolute position: for Y-after-Y2 blocks (first_coeff=1) the
        # first token reads at band 0 and the sequence shifts with it.
        # Verified empirically against the libwebp reference decoder
        # (tests/test_vp8.py cross-decode) - coding position 1 at
        # COEFF_BANDS[1] desynchronizes libwebp's token reader.
        band = COEFF_BANDS[i - first_coeff]
        p = probs[block_type][band][ctx]
        token = bd.tree(COEFF_TREE, p, start)
        if token == DCT_EOB:
            break
        if token == 0:  # ZERO
            ctx = 0
            start = 2  # no EOB directly after a zero run token
            i += 1
            continue
        if token <= 4:
            val = token
        else:
            cat = token - 5
            extra = 0
            for cp in CAT_PROBS[cat]:
                extra = (extra << 1) | bd.get(cp)
            val = CAT_BASE[cat] + extra
        if bd.get(128):  # sign
            val = -val
        dq = dq_dc if i == 0 else dq_ac
        # dequantized coefficients live in int16 storage in the
        # reference implementations - extreme levels WRAP, they do not
        # saturate (cross-checked against libwebp at qi=40/level=796)
        coeffs[ZIGZAG[i]] = _wrap16(val * dq)
        nonzero = True
        ctx = 1 if val in (1, -1) else 2
        start = 0
        i += 1
    return coeffs, nonzero


# -------------------------------------------------------- prediction


def _pred_dc(plane, r, c, size):
    """DC prediction for a size x size block at (r, c) in plane."""
    have_above = r > 0
    have_left = c > 0
    if have_above and have_left:
        s = int(plane[r - 1, c:c + size].sum()) + int(plane[r:r + size, c - 1].sum())
        return (s + size) >> (5 if size == 16 else 4)
    if have_above:
        s = int(plane[r - 1, c:c + size].sum())
        return (s + (size >> 1)) >> (4 if size == 16 else 3)
    if have_left:
        s = int(plane[r:r + size, c - 1].sum())
        return (s + (size >> 1)) >> (4 if size == 16 else 3)
    return 128


def _avg2(a: int, b: int) -> int:
    return (a + b + 1) >> 1


def _avg3(a: int, b: int, c: int) -> int:
    return (a + 2 * b + c + 2) >> 2


def _edges4(plane, r, c):
    """(A[4], AR[4], L[4], P) edge pixels for the 4x4 at global (r, c).
    Out-of-frame substitutes: above row (incl. above-left/above-right)
    127, left column (incl. above-left below the top row) 129. For the
    rightmost sub-block column the above-right comes from the row above
    the MB (the reference decoders reuse the MB's saved top-right for
    all four sub-block rows); for the frame's rightmost MB column it is
    the replicated last top pixel (cross-checked against libwebp)."""
    w = plane.shape[1]
    if r == 0:
        A = [127, 127, 127, 127]
        AR = [127, 127, 127, 127]
        P = 127
    else:
        A = [int(x) for x in plane[r - 1, c:c + 4]]
        P = int(plane[r - 1, c - 1]) if c > 0 else 129
        if (c % 16) // 4 < 3:
            AR = [int(x) for x in plane[r - 1, c + 4:c + 8]]
        else:
            mb_right = (c // 16) * 16 + 16
            ar_row = (r // 16) * 16 - 1
            if ar_row < 0:
                AR = [127, 127, 127, 127]
            elif mb_right >= w:
                AR = [int(plane[ar_row, w - 1])] * 4
            else:
                AR = [int(x) for x in plane[ar_row, mb_right:mb_right + 4]]
    L = [129, 129, 129, 129] if c == 0 else [int(x) for x in plane[r:r + 4, c - 1]]
    return A, AR, L, P


def _predict4(plane, r, c, mode) -> None:
    """Fill the 4x4 at (r, c) with its intra sub-mode prediction
    (RFC 6386 12.3; every variant cross-checked bit-exact against the
    libwebp reference decoder in tests/test_vp8.py)."""
    A, AR, L, P = _edges4(plane, r, c)
    T = A + AR
    p = [[0] * 4 for _ in range(4)]
    if mode == B_DC_PRED:
        dc = (sum(A) + sum(L) + 4) >> 3
        for rr in range(4):
            for cc in range(4):
                p[rr][cc] = dc
    elif mode == B_TM_PRED:
        for rr in range(4):
            for cc in range(4):
                p[rr][cc] = min(255, max(0, L[rr] + A[cc] - P))
    elif mode == B_VE_PRED:
        X = [P] + T[:5]
        row = [_avg3(X[i], X[i + 1], X[i + 2]) for i in range(4)]
        for rr in range(4):
            p[rr] = row[:]
    elif mode == B_HE_PRED:
        col = [_avg3(P, L[0], L[1]), _avg3(L[0], L[1], L[2]),
               _avg3(L[1], L[2], L[3]), _avg3(L[2], L[3], L[3])]
        for rr in range(4):
            for cc in range(4):
                p[rr][cc] = col[rr]
    elif mode == B_LD_PRED:
        for rr in range(4):
            for cc in range(4):
                i = rr + cc
                p[rr][cc] = (_avg3(T[i], T[i + 1], T[i + 2]) if i < 6
                             else _avg3(T[6], T[7], T[7]))
    elif mode == B_RD_PRED:
        E = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        for rr in range(4):
            for cc in range(4):
                i = cc - rr + 4
                p[rr][cc] = _avg3(E[i - 1], E[i], E[i + 1])
    elif mode == B_VR_PRED:
        I, J, K = L[0], L[1], L[2]
        a, b, cN, d = A
        p[0][0] = p[2][1] = _avg2(P, a)
        p[0][1] = p[2][2] = _avg2(a, b)
        p[0][2] = p[2][3] = _avg2(b, cN)
        p[0][3] = _avg2(cN, d)
        p[3][0] = _avg3(K, J, I)
        p[2][0] = _avg3(J, I, P)
        p[1][0] = p[3][1] = _avg3(I, P, a)
        p[1][1] = p[3][2] = _avg3(P, a, b)
        p[1][2] = p[3][3] = _avg3(a, b, cN)
        p[1][3] = _avg3(b, cN, d)
    elif mode == B_VL_PRED:
        a, b, cN, d, e, f, g, h = T
        p[0][0] = _avg2(a, b)
        p[0][1] = p[2][0] = _avg2(b, cN)
        p[0][2] = p[2][1] = _avg2(cN, d)
        p[0][3] = p[2][2] = _avg2(d, e)
        p[1][0] = _avg3(a, b, cN)
        p[1][1] = p[3][0] = _avg3(b, cN, d)
        p[1][2] = p[3][1] = _avg3(cN, d, e)
        p[1][3] = p[3][2] = _avg3(d, e, f)
        p[2][3] = _avg3(e, f, g)
        p[3][3] = _avg3(f, g, h)
    elif mode == B_HD_PRED:
        I, J, K, Lp = L
        a, b, cN = A[0], A[1], A[2]
        p[0][0] = p[1][2] = _avg2(I, P)
        p[1][0] = p[2][2] = _avg2(J, I)
        p[2][0] = p[3][2] = _avg2(K, J)
        p[3][0] = _avg2(Lp, K)
        p[0][3] = _avg3(a, b, cN)
        p[0][2] = _avg3(P, a, b)
        p[0][1] = p[1][3] = _avg3(I, P, a)
        p[1][1] = p[2][3] = _avg3(P, I, J)
        p[2][1] = p[3][3] = _avg3(I, J, K)
        p[3][1] = _avg3(J, K, Lp)
    elif mode == B_HU_PRED:
        I, J, K, Lp = L
        p[0][0] = _avg2(I, J)
        p[0][2] = p[1][0] = _avg2(J, K)
        p[1][2] = p[2][0] = _avg2(K, Lp)
        p[0][1] = _avg3(I, J, K)
        p[0][3] = p[1][1] = _avg3(J, K, Lp)
        p[1][3] = p[2][1] = _avg3(K, Lp, Lp)
        p[2][2] = p[2][3] = Lp
        p[3][0] = p[3][1] = p[3][2] = p[3][3] = Lp
    else:
        raise ValueError(f"bad sub-mode {mode}")
    plane[r:r + 4, c:c + 4] = np.array(p, dtype=np.int32)


def _predict(plane, r, c, size, mode):
    """Fill the size x size block at (r,c) with its intra prediction."""
    if mode == DC_PRED:
        plane[r:r + size, c:c + size] = _pred_dc(plane, r, c, size)
    elif mode == V_PRED:
        row = plane[r - 1, c:c + size] if r > 0 else np.full(size, 127, np.int32)
        plane[r:r + size, c:c + size] = row[None, :]
    elif mode == H_PRED:
        col = plane[r:r + size, c - 1] if c > 0 else np.full(size, 129, np.int32)
        plane[r:r + size, c:c + size] = col[:, None]
    else:  # TM_PRED
        above = plane[r - 1, c:c + size].astype(np.int32) if r > 0 else np.full(size, 127, np.int32)
        left = plane[r:r + size, c - 1].astype(np.int32) if c > 0 else np.full(size, 129, np.int32)
        # above-left: part of the 127-valued above row on the frame's
        # top edge, part of the 129-valued left column otherwise
        # (cross-checked against libwebp; same convention as _edges4)
        al = int(plane[r - 1, c - 1]) if (r > 0 and c > 0) else (127 if r == 0 else 129)
        blk = left[:, None] + above[None, :] - al
        plane[r:r + size, c:c + size] = np.clip(blk, 0, 255)


# ------------------------------------------------------- frame decode


def decode_vp8_frame(data: bytes):
    """Decode a VP8 KEY frame -> (y, u, v) uint8 planes (cropped) or
    None for non-key/unsupported/malformed payloads. Both intra
    families (16x16 and B_PRED) decode fully. This is the STATELESS
    entry point (WebP stills, standalone key frames); inter frames
    need reference buffers — use :class:`Vp8StreamDecoder` for
    multi-frame streams."""
    try:
        return _decode_vp8_frame(data)
    except (IndexError, ValueError, AssertionError):
        return None


def _decode_vp8_frame(data: bytes):
    out = Vp8StreamDecoder()._decode(data, key_only=True)
    return None if out is None else out["planes"]


# ------------------------------------------------------- minimal encoder


def vp8_dc_delta(level: int, qi: int = 0, y2_dc_delta: int = 0) -> int:
    """Per-pixel delta produced by a Y2-DC-only residual with coded
    ``level``: dequant -> inverse WHT (DC-only: (x+3)>>3) -> DC-only
    inverse DCT ((x+4)>>3). Exact integer chain — the oracle SQL
    recomputes it. With qi=0 (q2dc=8), level = 8*d - 4 yields delta d
    for ANY integer d (``level_for_delta``)."""
    q = DC_QLOOKUP[_clamp_q(qi + y2_dc_delta)] * 2
    wht = (level * q + 3) >> 3
    return (wht + 4) >> 3


def level_for_delta(delta: int) -> int:
    """Y2 DC level (at qi=0) whose decoded per-pixel delta is exactly
    ``delta``: vp8_dc_delta(8d - 4, 0) == d."""
    return 8 * delta - 4


def _put_token_value(enc, probs, btype, band, ctx, value, start=0):
    """Encode one nonzero coefficient value (token + extra bits + sign)."""
    mag = abs(value)
    if mag <= 4:
        token = mag
    else:
        token = 10
        for cat in range(6):
            hi = CAT_BASE[cat + 1] - 1 if cat < 5 else 2048
            if mag <= hi:
                token = 5 + cat
                break
    enc.put_tree(COEFF_TREE, probs[btype][band][ctx], token, start)
    if token >= 5:
        cat = token - 5
        extra = mag - CAT_BASE[cat]
        cps = CAT_PROBS[cat]
        for b, cp in enumerate(cps):
            enc.put((extra >> (len(cps) - 1 - b)) & 1, cp)
    enc.put(1 if value < 0 else 0, 128)
    return 1 if mag == 1 else 2  # next-coefficient context


def _put_eob(enc, probs, btype, band, ctx, start=0):
    enc.put_tree(COEFF_TREE, probs[btype][band][ctx], DCT_EOB, start)


def encode_vp8_key_two_tone(
    width: int, height: int, delta_top: int, delta_bottom_rel: int, qi: int = 0,
    filter_level: int = 0, sharpness: int = 0, filter_type: int = 0,
) -> bytes:
    """Minimal spec-conformant VP8 KEY frame: luma rows of the first MB
    row reconstruct to ``128 + vp8_dc_delta(level_for_delta(delta_top))``
    and every later MB row adds ``delta_bottom_rel`` at the second MB
    row boundary (two-tone on the 16-row boundary); chroma flat 128.
    Mechanics: MB(0,0) DC_PRED + Y2-DC residual; rest of row 0 skips
    (DC_PRED from the left reproduces the tone); second-MB-row MBs are
    V_PRED + Y2-DC residual; all later rows V_PRED skip. Loop filter
    level 0, single token partition, default probabilities."""
    if height < 16:
        delta_bottom_rel = 0  # single MB row: flat frame
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    probs = DEFAULT_COEFF_PROBS

    # --- partition 1: header + modes
    p1 = BoolEncoder()
    p1.put_literal(0, 1)   # color space
    p1.put_literal(0, 1)   # clamping
    p1.put(0, 128)         # segmentation_enabled
    p1.put_literal(filter_type, 1)
    p1.put_literal(filter_level, 6)
    p1.put_literal(sharpness, 3)
    p1.put(0, 128)         # loop filter adjustments
    p1.put_literal(0, 2)   # log2 token partitions = 0
    p1.put_literal(qi, 7)  # y_ac_qi
    for _ in range(5):     # no quant deltas
        p1.put(0, 128)
    p1.put_literal(1, 1)   # refresh entropy probs
    for t in range(4):
        for b in range(8):
            for cx in range(3):
                for pi in range(11):
                    p1.put(0, COEFF_UPDATE_PROBS[t][b][cx][pi])
    p1.put_literal(1, 1)   # mb_no_coeff_skip
    p1.put_literal(128, 8)  # prob_skip_false

    def mb_plan(mb_r, mb_c):
        """(skip, ymode, uvmode, level or None)"""
        if mb_r == 0:
            if mb_c == 0:
                return (0, DC_PRED, DC_PRED, level_for_delta(delta_top))
            return (1, DC_PRED, DC_PRED, None)
        if mb_r == 1 and delta_bottom_rel != 0:
            return (0, V_PRED, V_PRED, level_for_delta(delta_bottom_rel))
        return (1, V_PRED, V_PRED, None)

    for mb_r in range(mb_h):
        for mb_c in range(mb_w):
            skip, ym, uvm, _ = mb_plan(mb_r, mb_c)
            p1.put(skip, 128)
            p1.put_tree(KF_YMODE_TREE, KF_YMODE_PROBS, ym)
            p1.put_tree(UV_MODE_TREE, KF_UV_MODE_PROBS, uvm)
    part1 = p1.flush()

    # --- partition 2: tokens, tracking nz contexts exactly as the decoder
    p2 = BoolEncoder()
    above = [{"y2": 0, "y": [0] * 4, "u": [0] * 2, "v": [0] * 2} for _ in range(mb_w)]
    for mb_r in range(mb_h):
        left = {"y2": 0, "y": [0] * 4, "u": [0] * 2, "v": [0] * 2}
        for mb_c in range(mb_w):
            skip, ym, uvm, level = mb_plan(mb_r, mb_c)
            a = above[mb_c]
            if skip:
                left["y"] = [0] * 4
                left["u"] = [0] * 2
                left["v"] = [0] * 2
                a["y"] = [0] * 4
                a["u"] = [0] * 2
                a["v"] = [0] * 2
                left["y2"] = 0
                a["y2"] = 0
                continue
            # Y2: one DC value then EOB
            ctx = a["y2"] + left["y2"]
            nctx = _put_token_value(p2, probs, 1, COEFF_BANDS[0], ctx, level)
            _put_eob(p2, probs, 1, COEFF_BANDS[1], nctx)
            a["y2"] = left["y2"] = 1
            # 16 Y blocks: all-zero AC -> immediate EOB at position 1,
            # which codes at band COEFF_BANDS[0] (bands index tokens
            # read, not positions - see _decode_coeffs)
            for sb in range(16):
                sr, sc = sb // 4, sb % 4
                _put_eob(p2, probs, 0, COEFF_BANDS[0], a["y"][sc] + left["y"][sr])
                a["y"][sc] = left["y"][sr] = 0
            # chroma: empty blocks
            for key, btype in (("u", 2), ("v", 2)):
                for sb in range(4):
                    _put_eob(
                        p2, probs, btype, COEFF_BANDS[0],
                        a[key][sb % 2] + left[key][sb // 2],
                    )
                    a[key][sb % 2] = left[key][sb // 2] = 0
    part2 = p2.flush()

    tag = (0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a"
    head += struct.pack("<H", width) + struct.pack("<H", height)
    return head + part1 + part2


def encode_vp8_key_bpred(
    width: int, height: int, sub_mode_fn, level_fn, qi: int = 0,
    filter_level: int = 0, sharpness: int = 0, filter_type: int = 0,
) -> bytes:
    """Spec-conformant VP8 KEY frame in which EVERY macroblock is
    B_PRED: per-sub-block intra modes from ``sub_mode_fn(mb_r, mb_c,
    sb)`` and an optional DC-only residual level from ``level_fn(mb_r,
    mb_c, sb)`` (0 = none; dequantizes with the Y1 DC quantizer, so the
    per-pixel delta is ``(level * dc_q + 4) >> 3``). Sub-modes code
    contextually exactly as the decoder reads them; chroma is flat
    DC_PRED 128. Used by the gated corpus (an all-B_TM frame
    reconstructs to closed-form tones) and the libwebp cross-checks."""
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    probs = DEFAULT_COEFF_PROBS

    p1 = BoolEncoder()
    p1.put_literal(0, 1)
    p1.put_literal(0, 1)
    p1.put(0, 128)
    p1.put_literal(filter_type, 1)
    p1.put_literal(filter_level, 6)
    p1.put_literal(sharpness, 3)
    p1.put(0, 128)
    p1.put_literal(0, 2)
    p1.put_literal(qi, 7)
    for _ in range(5):
        p1.put(0, 128)
    p1.put_literal(1, 1)
    for t in range(4):
        for b in range(8):
            for cx in range(3):
                for pi in range(11):
                    p1.put(0, COEFF_UPDATE_PROBS[t][b][cx][pi])
    p1.put_literal(1, 1)   # mb_no_coeff_skip
    p1.put_literal(128, 8)

    above_bm = [[B_DC_PRED] * 4 for _ in range(mb_w)]
    for mb_r in range(mb_h):
        left_bm = [B_DC_PRED] * 4
        for mb_c in range(mb_w):
            p1.put(0, 128)  # skip = 0
            p1.put_tree(KF_YMODE_TREE, KF_YMODE_PROBS, B_PRED)
            abm = above_bm[mb_c]
            bm = [0] * 16
            for sb in range(16):
                sr, sc = sb // 4, sb % 4
                ctx_a = abm[sc] if sr == 0 else bm[sb - 4]
                ctx_l = left_bm[sr] if sc == 0 else bm[sb - 1]
                bm[sb] = sub_mode_fn(mb_r, mb_c, sb)
                p1.put_tree(BMODE_TREE, KF_BMODE_PROBS[ctx_a][ctx_l], bm[sb])
            for sc in range(4):
                abm[sc] = bm[12 + sc]
            for sr in range(4):
                left_bm[sr] = bm[4 * sr + 3]
            p1.put_tree(UV_MODE_TREE, KF_UV_MODE_PROBS, DC_PRED)
    part1 = p1.flush()

    p2 = BoolEncoder()
    above = [{"y": [0] * 4, "u": [0] * 2, "v": [0] * 2} for _ in range(mb_w)]
    for mb_r in range(mb_h):
        left = {"y": [0] * 4, "u": [0] * 2, "v": [0] * 2}
        for mb_c in range(mb_w):
            a = above[mb_c]
            for sb in range(16):
                sr, sc = sb // 4, sb % 4
                ctx = a["y"][sc] + left["y"][sr]
                level = level_fn(mb_r, mb_c, sb)
                if level:
                    nctx = _put_token_value(p2, probs, 3, COEFF_BANDS[0], ctx, level)
                    _put_eob(p2, probs, 3, COEFF_BANDS[1], nctx)
                    a["y"][sc] = left["y"][sr] = 1
                else:
                    _put_eob(p2, probs, 3, COEFF_BANDS[0], ctx)
                    a["y"][sc] = left["y"][sr] = 0
            for key in ("u", "v"):
                for sb in range(4):
                    _put_eob(p2, probs, 2, COEFF_BANDS[0],
                             a[key][sb % 2] + left[key][sb // 2])
                    a[key][sb % 2] = left[key][sb // 2] = 0
    part2 = p2.flush()

    tag = (0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a"
    head += struct.pack("<H", width) + struct.pack("<H", height)
    return head + part1 + part2

def encode_vp8_key_mixed(
    width: int, height: int, mb_fn, qi: int = 0,
    filter_level: int = 0, sharpness: int = 0, filter_type: int = 0,
    segments=None, lf_deltas=None, n_token_parts: int = 1,
) -> bytes:
    """Key frame mixing B_PRED and 16x16 macroblocks — the cross-check
    surface for the interactions the homogeneous encoders cannot reach:
    16x16 MBs contribute their IMPLIED sub-mode to B_PRED neighbors'
    mode contexts (MODE_TO_BMODE), and a skipped B_PRED MB leaves the
    Y2 nonzero context of earlier 16x16 MBs intact (13.3).

    ``mb_fn(mb_r, mb_c)`` returns either ``("b", sub_modes[16],
    levels[16], skip)`` (skip requires all-zero levels) or ``(ym,
    y2_level, skip)`` for a 16x16 mode.

    Optional full-envelope features (all cross-checked vs libwebp):
    ``segments`` = {"abs": bool, "q": [4 per-segment quantizer
    values/deltas], "lf": [4 filter values/deltas], "map_fn":
    (mb_r, mb_c) -> 0..3} enables segmentation with an updated map
    (tree probs fixed at 128); ``lf_deltas`` = {"ref0": d, "mode0": d}
    enables loop-filter delta adjustment (INTRA ref delta + B_PRED
    mode delta); ``n_token_parts`` in {1,2,4,8} splits token coding
    across partitions (MB row r -> partition r % n)."""
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    probs = DEFAULT_COEFF_PROBS

    assert n_token_parts in (1, 2, 4, 8)
    log2_parts = {1: 0, 2: 1, 4: 2, 8: 3}[n_token_parts]
    p1 = BoolEncoder()
    p1.put_literal(0, 1)
    p1.put_literal(0, 1)
    if segments is None:
        p1.put(0, 128)  # segmentation disabled
    else:
        p1.put(1, 128)
        p1.put(1, 128)  # update mb segmentation map
        p1.put(1, 128)  # update segment feature data
        p1.put(1 if segments.get("abs") else 0, 128)
        for val in segments["q"]:
            p1.put(1, 128)
            p1.put_literal(abs(val), 7)
            p1.put(1 if val < 0 else 0, 128)
        for val in segments["lf"]:
            p1.put(1, 128)
            p1.put_literal(abs(val), 6)
            p1.put(1 if val < 0 else 0, 128)
        for _ in range(3):  # segment tree probs: explicit 128s
            p1.put(1, 128)
            p1.put_literal(128, 8)
    p1.put_literal(filter_type, 1)
    p1.put_literal(filter_level, 6)
    p1.put_literal(sharpness, 3)
    if lf_deltas is None:
        p1.put(0, 128)
    else:
        p1.put(1, 128)
        p1.put(1, 128)  # update deltas now
        for i, v in enumerate([lf_deltas.get("ref0", 0), 0, 0, 0]):
            if v:
                p1.put(1, 128)
                p1.put_literal(abs(v), 6)
                p1.put(1 if v < 0 else 0, 128)
            else:
                p1.put(0, 128)
        for i, v in enumerate([lf_deltas.get("mode0", 0), 0, 0, 0]):
            if v:
                p1.put(1, 128)
                p1.put_literal(abs(v), 6)
                p1.put(1 if v < 0 else 0, 128)
            else:
                p1.put(0, 128)
    p1.put_literal(log2_parts, 2)
    p1.put_literal(qi, 7)
    for _ in range(5):
        p1.put(0, 128)
    p1.put_literal(1, 1)
    for t in range(4):
        for b in range(8):
            for cx in range(3):
                for pi in range(11):
                    p1.put(0, COEFF_UPDATE_PROBS[t][b][cx][pi])
    p1.put_literal(1, 1)
    p1.put_literal(128, 8)

    seg_tree = [2, 4, -0, -1, -2, -3]
    seg_probs = [128, 128, 128]
    plans = {}
    above_bm = [[B_DC_PRED] * 4 for _ in range(mb_w)]
    for mb_r in range(mb_h):
        left_bm = [B_DC_PRED] * 4
        for mb_c in range(mb_w):
            plan = mb_fn(mb_r, mb_c)
            plans[mb_r, mb_c] = plan
            abm = above_bm[mb_c]
            if segments is not None:
                p1.put_tree(seg_tree, seg_probs,
                            segments["map_fn"](mb_r, mb_c))
            if plan[0] == "b":
                _, sub_modes, levels, skip = plan
                assert not skip or not any(levels)
                p1.put(1 if skip else 0, 128)
                p1.put_tree(KF_YMODE_TREE, KF_YMODE_PROBS, B_PRED)
                bm = list(sub_modes)
                for sb in range(16):
                    sr, sc = sb // 4, sb % 4
                    ctx_a = abm[sc] if sr == 0 else bm[sb - 4]
                    ctx_l = left_bm[sr] if sc == 0 else bm[sb - 1]
                    p1.put_tree(BMODE_TREE, KF_BMODE_PROBS[ctx_a][ctx_l], bm[sb])
            else:
                ym, _, skip = plan
                p1.put(1 if skip else 0, 128)
                p1.put_tree(KF_YMODE_TREE, KF_YMODE_PROBS, ym)
                bm = [MODE_TO_BMODE[ym]] * 16
            for sc in range(4):
                abm[sc] = bm[12 + sc]
            for sr in range(4):
                left_bm[sr] = bm[4 * sr + 3]
            p1.put_tree(UV_MODE_TREE, KF_UV_MODE_PROBS, DC_PRED)
    part1 = p1.flush()

    encs = [BoolEncoder() for _ in range(n_token_parts)]
    above = [{"y2": 0, "y": [0] * 4, "u": [0] * 2, "v": [0] * 2}
             for _ in range(mb_w)]
    for mb_r in range(mb_h):
        p2 = encs[mb_r % n_token_parts]
        left = {"y2": 0, "y": [0] * 4, "u": [0] * 2, "v": [0] * 2}
        for mb_c in range(mb_w):
            plan = plans[mb_r, mb_c]
            a = above[mb_c]
            is_b = plan[0] == "b"
            skip = plan[3] if is_b else plan[2]
            if skip:
                left["y"] = [0] * 4
                left["u"] = [0] * 2
                left["v"] = [0] * 2
                a["y"] = [0] * 4
                a["u"] = [0] * 2
                a["v"] = [0] * 2
                if not is_b:   # Y2 ctx survives a skipped B_PRED MB
                    left["y2"] = 0
                    a["y2"] = 0
                continue
            if is_b:
                _, _, levels, _ = plan
                for sb in range(16):
                    sr, sc = sb // 4, sb % 4
                    ctx = a["y"][sc] + left["y"][sr]
                    if levels[sb]:
                        nctx = _put_token_value(
                            p2, probs, 3, COEFF_BANDS[0], ctx, levels[sb])
                        _put_eob(p2, probs, 3, COEFF_BANDS[1], nctx)
                        a["y"][sc] = left["y"][sr] = 1
                    else:
                        _put_eob(p2, probs, 3, COEFF_BANDS[0], ctx)
                        a["y"][sc] = left["y"][sr] = 0
            else:
                _, y2_level, _ = plan
                ctx = a["y2"] + left["y2"]
                if y2_level:
                    nctx = _put_token_value(
                        p2, probs, 1, COEFF_BANDS[0], ctx, y2_level)
                    _put_eob(p2, probs, 1, COEFF_BANDS[1], nctx)
                    a["y2"] = left["y2"] = 1
                else:
                    _put_eob(p2, probs, 1, COEFF_BANDS[0], ctx)
                    a["y2"] = left["y2"] = 0
                for sb in range(16):
                    sr, sc = sb // 4, sb % 4
                    _put_eob(p2, probs, 0, COEFF_BANDS[0],
                             a["y"][sc] + left["y"][sr])
                    a["y"][sc] = left["y"][sr] = 0
            for key in ("u", "v"):
                for sb in range(4):
                    _put_eob(p2, probs, 2, COEFF_BANDS[0],
                             a[key][sb % 2] + left[key][sb // 2])
                    a[key][sb % 2] = left[key][sb // 2] = 0
    parts = [e.flush() for e in encs]
    size_table = b"".join(
        len(p).to_bytes(3, "little") for p in parts[:-1])
    part2 = size_table + b"".join(parts)

    tag = (0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    head += b"\x9d\x01\x2a"
    head += struct.pack("<H", width) + struct.pack("<H", height)
    return head + part1 + part2

# ------------------------------------------------- loop filter (15.x)
# Transcribed from the RFC 6386 section 15 pseudocode. No reference VP8
# decoder exists in this container to cross-check constants; the tests
# validate the documented algebraic properties (flat regions and
# above-limit edges are untouched; adjustments preserve the +-1 step
# relations) and hand-computed small profiles.


def _c(x: int) -> int:
    """clamp to signed char range."""
    return -128 if x < -128 else (127 if x > 127 else x)


def _u2s(x: int) -> int:
    return x - 128


def _s2u(x: int) -> int:
    return _c(x) + 128


def _common_adjust(use_outer_taps, px, i1, i0, j0, j1):
    """RFC 15.3 common_adjust over pixel indices into list px."""
    p1, p0, q0, q1 = (_u2s(px[i1]), _u2s(px[i0]), _u2s(px[j0]), _u2s(px[j1]))
    a = _c((_c(p1 - q1) if use_outer_taps else 0) + 3 * (q0 - p0))
    f = _c(a + 4) >> 3
    e = _c(a + 3) >> 3
    px[j0] = _s2u(q0 - f)
    px[i0] = _s2u(p0 + e)
    return f


def _filter_mask(px, idx, interior, edge) -> bool:
    p3, p2, p1, p0, q0, q1, q2, q3 = (px[i] for i in idx)
    return (
        abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge
        and abs(p3 - p2) <= interior and abs(p2 - p1) <= interior
        and abs(p1 - p0) <= interior and abs(q1 - q0) <= interior
        and abs(q2 - q1) <= interior and abs(q3 - q2) <= interior
    )


def _hev(px, idx, thresh) -> bool:
    _, _, p1, p0, q0, q1, _, _ = (px[i] for i in idx)
    return abs(p1 - p0) > thresh or abs(q1 - q0) > thresh


def _subblock_filter(px, idx, hev_t, interior, edge):
    """RFC 15.3: interior (subblock) edge filter."""
    if not _filter_mask(px, idx, interior, edge):
        return
    hev = _hev(px, idx, hev_t)
    f = _common_adjust(hev, px, idx[2], idx[3], idx[4], idx[5])
    if not hev:
        a = _c(f + 1) >> 1
        px[idx[5]] = _s2u(_u2s(px[idx[5]]) - a)
        px[idx[2]] = _s2u(_u2s(px[idx[2]]) + a)


def _mb_filter(px, idx, hev_t, interior, edge):
    """RFC 15.3: macroblock edge filter (wider taps)."""
    if not _filter_mask(px, idx, interior, edge):
        return
    if _hev(px, idx, hev_t):
        _common_adjust(True, px, idx[2], idx[3], idx[4], idx[5])
        return
    p2, p1, p0, q0, q1, q2 = (_u2s(px[i]) for i in idx[1:7])
    w = _c(_c(p1 - q1) + 3 * (q0 - p0))
    a = _c((27 * w + 63) >> 7)
    px[idx[4]] = _s2u(q0 - a)
    px[idx[3]] = _s2u(p0 + a)
    a = _c((18 * w + 63) >> 7)
    px[idx[5]] = _s2u(q1 - a)
    px[idx[2]] = _s2u(p1 + a)
    a = _c((9 * w + 63) >> 7)
    px[idx[6]] = _s2u(q2 - a)
    px[idx[1]] = _s2u(p2 + a)


def _filter_params(filter_level: int, sharpness: int, keyframe: bool = True):
    """(interior_limit, hev_threshold, mb_edge_limit, sub_edge_limit)
    per RFC 15.1/15.2."""
    interior = filter_level
    if sharpness:
        interior >>= 2 if sharpness > 4 else 1
        if interior > 9 - sharpness:
            interior = 9 - sharpness
    if interior < 1:
        interior = 1
    hev_t = 0
    if keyframe:
        if filter_level >= 40:
            hev_t = 2
        elif filter_level >= 15:
            hev_t = 1
    else:
        if filter_level >= 40:
            hev_t = 3
        elif filter_level >= 20:
            hev_t = 2
        elif filter_level >= 15:
            hev_t = 1
    mb_edge = ((filter_level + 2) * 2) + interior
    sub_edge = (filter_level * 2) + interior
    return interior, hev_t, mb_edge, sub_edge


def _filter_edge_v(plane, r0, col, n_rows, fn, hev_t, interior, edge):
    """Vertical edge at x=col: pixels col-4..col+3 on each row."""
    for r in range(r0, r0 + n_rows):
        row = plane[r]
        idx = list(range(col - 4, col + 4))
        buf = [int(row[i]) for i in idx]
        tmp = list(buf)
        fn(tmp, list(range(8)), hev_t, interior, edge)
        for k, i in enumerate(idx):
            row[i] = tmp[k]


def _filter_edge_h(plane, row, c0, n_cols, fn, hev_t, interior, edge):
    """Horizontal edge at y=row: pixels row-4..row+3 in each column."""
    for c in range(c0, c0 + n_cols):
        idx = list(range(row - 4, row + 4))
        buf = [int(plane[i][c]) for i in idx]
        tmp = list(buf)
        fn(tmp, list(range(8)), hev_t, interior, edge)
        for k, i in enumerate(idx):
            plane[i][c] = tmp[k]


def apply_loop_filter(y, u, v, modes, has_coeffs, mb_levels, sharpness,
                      filter_type, mb_w, mb_h, keyframe=True):
    """In-loop deblocking over reconstructed planes (int32 numpy), per
    RFC 6386 15.2 ordering: per MB raster, vertical edges (MB-left then
    interior x=4,8,12) then horizontal (MB-top then interior).
    ``mb_levels`` is the PER-MB filter level (segmentation overrides +
    ref/mode loop-filter deltas already applied); a level-0 MB is not
    filtered. Interior edges run only for MBs that decoded nonzero
    coefficients or use B_PRED (the ``has_coeffs`` flags). filter_type
    1 = simple (Y only, via common_adjust with both-outer-taps and the
    edge-only mask)."""
    if not any(mb_levels):
        return

    def simple_seg(px, idx, _hev_t, _interior, edge):
        p1, p0, q0, q1 = (px[idx[2]], px[idx[3]], px[idx[4]], px[idx[5]])
        if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge:
            _common_adjust(True, px, idx[2], idx[3], idx[4], idx[5])

    params_cache = {}

    def params_for(level):
        if level not in params_cache:
            interior, hev_t, mb_edge, sub_edge = _filter_params(
                level, sharpness, keyframe)
            if filter_type == 1:  # simple: Y only
                params_cache[level] = (
                    simple_seg, simple_seg, hev_t, interior,
                    level * 2 + 2 + interior, level * 2 + interior)
            else:
                params_cache[level] = (
                    _mb_filter, _subblock_filter, hev_t, interior,
                    mb_edge, sub_edge)
        return params_cache[level]

    for mb_r in range(mb_h):
        for mb_c in range(mb_w):
            level = mb_levels[mb_r * mb_w + mb_c]
            if level == 0:
                continue
            mbf, subf, hev_t, interior, mb_e, sub_e = params_for(level)
            inner = has_coeffs[mb_r * mb_w + mb_c]
            r0, c0 = mb_r * 16, mb_c * 16
            if mb_c > 0:
                _filter_edge_v(y, r0, c0, 16, mbf, hev_t, interior, mb_e)
            if inner:
                for dx in (4, 8, 12):
                    _filter_edge_v(y, r0, c0 + dx, 16, subf, hev_t, interior, sub_e)
            if mb_r > 0:
                _filter_edge_h(y, r0, c0, 16, mbf, hev_t, interior, mb_e)
            if inner:
                for dy in (4, 8, 12):
                    _filter_edge_h(y, r0 + dy, c0, 16, subf, hev_t, interior, sub_e)
            if filter_type == 1:
                continue  # simple filter: no chroma
            cr0, cc0 = mb_r * 8, mb_c * 8
            for plane in (u, v):
                if mb_c > 0:
                    _filter_edge_v(plane, cr0, cc0, 8, mbf, hev_t, interior, mb_e)
                if inner:
                    _filter_edge_v(plane, cr0, cc0 + 4, 8, subf, hev_t, interior, sub_e)
                if mb_r > 0:
                    _filter_edge_h(plane, cr0, cc0, 8, mbf, hev_t, interior, mb_e)
                if inner:
                    _filter_edge_h(plane, cr0 + 4, cc0, 8, subf, hev_t, interior, sub_e)


# ======================================================= inter frames
# RFC 6386 sections 16-18: inter-frame (P-frame) decode — reference
# frame selection (last/golden/altref), the near-MV census, the
# mode/MV entropy layer, sub-pixel motion compensation with the
# six-tap filters, SPLITMV partitions, and reference-buffer /
# entropy-context management across frames.
#
# Ground truth: libwebp can cross-check ONLY the key-frame layers
# above (WebP stills are single key frames; the library contains no
# inter code), so this layer is validated by spec-conformant
# round-trips through the minimal inter encoder below plus algebraic
# contracts (a NEWMV frame with no residual must reconstruct exactly
# to the motion-shifted reference; fractional MVs to the six-tap
# convolution computed independently in the tests). The shared
# machinery it sits on (boolean coder, token decode, dequant,
# transforms, intra prediction, loop filter) IS bit-exact vs libwebp.

# inter prediction modes continue the intra numbering (DC..B_PRED=0..4)
(NEARESTMV, NEARMV, ZEROMV, NEWMV, SPLITMV) = range(5, 10)
INTRA_FRAME, LAST_FRAME, GOLDEN_FRAME, ALTREF_FRAME = range(4)

# RFC 6386 16.1: inter-frame intra mode trees/probs (the key-frame
# trees above are keyframe-only; these defaults live in the persistent
# entropy context and are updatable per frame header)
YMODE_TREE = [-DC_PRED, 2, 4, 6, -V_PRED, -H_PRED, -TM_PRED, -B_PRED]
YMODE_PROBS_DEFAULT = [112, 86, 140, 37]
UV_MODE_PROBS_DEFAULT = [162, 101, 204]
# B_PRED sub-modes on inter frames code with FIXED probs (no neighbor
# context, unlike key frames)
BMODE_PROBS_INTER = [120, 90, 79, 133, 87, 85, 80, 111, 151]

# RFC 6386 16.2: mv_ref tree; probs come from the near-MV census
# counts via MODE_CONTEXTS (leaves are the mode constants, all > 0,
# so the -0 ambiguity of BoolDecoder.tree never arises)
MV_REF_TREE = [-ZEROMV, 2, -NEARESTMV, 4, -NEARMV, 6, -NEWMV, -SPLITMV]
# vp8_mode_contexts: rows indexed by the census count (0..5) of each
# slot. The reference decoder assigns these int values into 8-bit
# probs, so row 5 wraps mod 256 (257 -> 1, 336 -> 80) — a quirk of
# the normative code that is part of the bitstream; MODE_CONTEXT_PROB
# applies the same wrap.
MODE_CONTEXTS = [
    [7, 1, 1, 143],
    [14, 18, 14, 107],
    [135, 64, 57, 68],
    [60, 56, 128, 65],
    [234, 160, 1, 1],
    [257, 336, 1, 1],
]

# RFC 6386 16.2: SPLITMV partitioning (2 horizontal halves, 2
# vertical, 4 quadrants, 16 singletons). The tree's leaves are coded
# +1 to avoid -0 in our tree representation; decode subtracts 1.
MBSPLIT_TREE_P1 = [-4, 2, -3, 4, -1, -2]
MBSPLIT_PROBS = [110, 111, 150]
MBSPLIT_COUNT = [2, 2, 4, 16]
MBSPLITS = [
    [0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1],
    [0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1],
    [0, 0, 1, 1, 0, 0, 1, 1, 2, 2, 3, 3, 2, 2, 3, 3],
    list(range(16)),
]
# sub-MV references within a partition (RFC 16.2): LEFT/ABOVE copy a
# neighboring sub-MV, ZERO is (0,0), NEW reads an MV delta vs best_mv
LEFT4X4, ABOVE4X4, ZERO4X4, NEW4X4 = range(1, 5)
SUB_MV_REF_TREE = [-LEFT4X4, 2, -ABOVE4X4, 4, -ZERO4X4, -NEW4X4]
# probs by context: NORMAL, LEFT_ZED, LEFT_ABOVE_SAME, ABOVE_ZED,
# LEFT_ABOVE_ZED (vp8_sub_mv_ref_prob2)
SUB_MV_REF_PROBS = [
    [147, 136, 18],
    [106, 145, 1],
    [179, 121, 1],
    [223, 1, 34],
    [208, 1, 1],
]

# RFC 6386 17.2: MV component entropy. 19 probs per component:
# [0] long-form flag, [1] sign, [2:9] short tree, [9:19] long bits.
MVP_IS_SHORT, MVP_SIGN, MVP_SHORT, MVP_BITS = 0, 1, 2, 9
MV_LONG_WIDTH = 10
# short-form magnitude tree (leaves +1 to avoid -0; decode - 1)
SMALL_MV_TREE_P1 = [2, 8, 4, 6, -1, -2, -3, -4, 10, 12, -5, -6, -7, -8]
MV_PROBS_DEFAULT = [
    [162, 128, 225, 146, 172, 147, 214, 39, 156,
     128, 129, 132, 75, 145, 178, 206, 239, 254, 254],   # row
    [164, 128, 204, 170, 119, 235, 140, 230, 228,
     128, 130, 130, 74, 148, 180, 203, 236, 254, 254],   # col
]
MV_UPDATE_PROBS = [
    [237, 246, 253, 253, 254, 254, 254, 254, 254,
     254, 254, 254, 254, 254, 250, 250, 252, 254, 254],
    [231, 243, 245, 253, 254, 254, 254, 254, 254,
     254, 254, 254, 254, 254, 251, 251, 254, 254, 254],
]

# RFC 6386 section 6: six-tap sub-pixel interpolation filters,
# indexed by the 3 fractional MV bits (luma MVs are even in 1/8-pel
# units -> quarter-pel; derived chroma MVs reach all eight).
SIXTAP_FILTERS = [
    [0, 0, 128, 0, 0, 0],
    [0, -6, 123, 12, -1, 0],
    [2, -11, 108, 36, -8, 1],
    [0, -9, 93, 50, -6, 0],
    [3, -16, 77, 77, -16, 3],
    [0, -6, 50, 93, -9, 0],
    [1, -8, 36, 108, -11, 2],
    [0, -1, 12, 123, -6, 0],
]

# RFC 6386 section 6: two-tap bilinear filters for version 1-2 frames
# (the cheap reconstruction profile), same 1/8-pel index.
BILINEAR_FILTERS = [
    [128, 0], [112, 16], [96, 32], [80, 48],
    [64, 64], [48, 80], [32, 96], [16, 112],
]

_REF_PAD = 32  # replicated border around reference planes (motion
               # clamps keep every six-tap read within this margin)


def _mode_context_prob(cnt, slot):
    return MODE_CONTEXTS[cnt][slot] & 0xFF


def _mv_bias(mv, flip):
    return (-mv[0], -mv[1]) if flip else mv


def _clamp_mv_census(mv, mb_r, mb_c, mb_w, mb_h):
    """RFC 16.3 candidate clamp: the 16x16 prediction block may extend
    at most 16 pixels beyond any frame edge (units: 1/8 pel)."""
    row, col = mv
    lo_c = (-(mb_c * 16) << 3) - (16 << 3)
    hi_c = (((mb_w - 1 - mb_c) * 16) << 3) + (16 << 3)
    lo_r = (-(mb_r * 16) << 3) - (16 << 3)
    hi_r = (((mb_h - 1 - mb_r) * 16) << 3) + (16 << 3)
    return (min(max(row, lo_r), hi_r), min(max(col, lo_c), hi_c))


def _clamp_mv_umv(mv, mb_r, mb_c, mb_w, mb_h):
    """Prediction-time clamp to the extended ("unrestricted MV")
    border: beyond 19 px outside the edge, snap back to 16 px."""
    row, col = mv
    to_left = -(mb_c * 16) << 3
    to_right = ((mb_w - 1 - mb_c) * 16) << 3
    to_top = -(mb_r * 16) << 3
    to_bottom = ((mb_h - 1 - mb_r) * 16) << 3
    if col < to_left - (19 << 3):
        col = to_left - (16 << 3)
    elif col > to_right + (18 << 3):
        col = to_right + (16 << 3)
    if row < to_top - (19 << 3):
        row = to_top - (16 << 3)
    elif row > to_bottom + (18 << 3):
        row = to_bottom + (16 << 3)
    return (row, col)


def _find_near_mvs(info, mb_r, mb_c, mb_w, mb_h, ref_frame, sign_bias):
    """RFC 6386 16.3 near-MV census over the above / left / above-left
    neighbors. ``info[r][c]`` is (ref, mode, mv, sub_mvs); out-of-frame
    neighbors count as intra. Returns (best, nearest, near, probs) with
    the three candidate MVs already clamped and the four mv_ref tree
    probs derived from the census counts."""

    def at(r, c):
        if r < 0 or c < 0:
            return (INTRA_FRAME, DC_PRED, (0, 0), None)
        return info[r][c]

    above = at(mb_r - 1, mb_c)
    left = at(mb_r, mb_c - 1)
    aboveleft = at(mb_r - 1, mb_c - 1)
    near_mvs = [(0, 0), (0, 0), (0, 0), (0, 0)]
    cnt = [0, 0, 0, 0]
    idx = 0

    if above[0] != INTRA_FRAME:
        if above[2] != (0, 0):
            idx += 1
            near_mvs[idx] = _mv_bias(
                above[2], sign_bias[above[0]] != sign_bias[ref_frame])
        cnt[idx] += 2
    if left[0] != INTRA_FRAME:
        if left[2] != (0, 0):
            m = _mv_bias(left[2], sign_bias[left[0]] != sign_bias[ref_frame])
            if m != near_mvs[idx]:
                idx += 1
                near_mvs[idx] = m
            cnt[idx] += 2
        else:
            cnt[0] += 2
    if aboveleft[0] != INTRA_FRAME:
        if aboveleft[2] != (0, 0):
            m = _mv_bias(
                aboveleft[2], sign_bias[aboveleft[0]] != sign_bias[ref_frame])
            if m != near_mvs[idx]:
                idx += 1
                near_mvs[idx] = m
            cnt[idx] += 1
        else:
            cnt[0] += 1

    # three distinct candidates where the third duplicates nearest
    # (possible via sign-bias flips): fold its weight into nearest
    if cnt[3] and near_mvs[idx] == near_mvs[1]:
        cnt[1] += 1
    cnt[3] = (int(above[1] == SPLITMV) + int(left[1] == SPLITMV)) * 2 \
        + int(aboveleft[1] == SPLITMV)
    if cnt[2] > cnt[1]:
        cnt[1], cnt[2] = cnt[2], cnt[1]
        near_mvs[1], near_mvs[2] = near_mvs[2], near_mvs[1]
    if cnt[1] >= cnt[0]:
        near_mvs[0] = near_mvs[1]

    best = _clamp_mv_census(near_mvs[0], mb_r, mb_c, mb_w, mb_h)
    nearest = _clamp_mv_census(near_mvs[1], mb_r, mb_c, mb_w, mb_h)
    near = _clamp_mv_census(near_mvs[2], mb_r, mb_c, mb_w, mb_h)
    probs = [_mode_context_prob(cnt[i], i) for i in range(4)]
    return best, nearest, near, probs


def _sub_mv_context(lmv, amv):
    if lmv == amv:
        return 4 if lmv == (0, 0) else 2
    if amv == (0, 0):
        return 3
    if lmv == (0, 0):
        return 1
    return 0


def _left_block_mv(info, sub_mvs, mb_r, mb_c, i):
    """MV of the sub-block left of sub-block i (RFC 16.2): within the
    MB, or the right edge of the left MB (whole-MB MV unless SPLITMV)."""
    if i % 4:
        return sub_mvs[i - 1]
    if mb_c == 0:
        return (0, 0)
    ref, mode, mv, smvs = info[mb_r][mb_c - 1]
    return smvs[i + 3] if mode == SPLITMV else mv


def _above_block_mv(info, sub_mvs, mb_r, mb_c, i):
    if i >= 4:
        return sub_mvs[i - 4]
    if mb_r == 0:
        return (0, 0)
    ref, mode, mv, smvs = info[mb_r - 1][mb_c]
    return smvs[i + 12] if mode == SPLITMV else mv


def _read_mv_component(bd, p):
    """RFC 6386 17.2: one MV component in 1/4-pel units (doubled to
    1/8 by the caller). Long form codes bits 0..2 then 9..4, with bit
    3 implicit-one when bits 4..9 are all zero."""
    if bd.get(p[MVP_IS_SHORT]):
        x = 0
        for i in range(3):
            x += bd.get(p[MVP_BITS + i]) << i
        for i in range(MV_LONG_WIDTH - 1, 3, -1):
            x += bd.get(p[MVP_BITS + i]) << i
        if not (x & 0xFFF0) or bd.get(p[MVP_BITS + 3]):
            x += 8
    else:
        x = bd.tree(SMALL_MV_TREE_P1, p[MVP_SHORT:MVP_SHORT + 7]) - 1
    if x and bd.get(p[MVP_SIGN]):
        x = -x
    return x


def _read_mv(bd, mvp):
    return (_read_mv_component(bd, mvp[0]) * 2,
            _read_mv_component(bd, mvp[1]) * 2)


def _put_mv_component(enc, p, x):
    """Inverse of _read_mv_component (x in 1/4-pel units, |x| <= 1023)."""
    mag = abs(x)
    assert mag <= 1023
    if mag < 8:
        enc.put(0, p[MVP_IS_SHORT])
        enc.put_tree(SMALL_MV_TREE_P1, p[MVP_SHORT:MVP_SHORT + 7], mag + 1)
    else:
        enc.put(1, p[MVP_IS_SHORT])
        for i in range(3):
            enc.put((mag >> i) & 1, p[MVP_BITS + i])
        for i in range(MV_LONG_WIDTH - 1, 3, -1):
            enc.put((mag >> i) & 1, p[MVP_BITS + i])
        if mag & 0xFFF0:
            enc.put((mag >> 3) & 1, p[MVP_BITS + 3])
        else:
            assert mag & 8, "short-form range must use the short tree"
    if mag:
        enc.put(1 if x < 0 else 0, p[MVP_SIGN])


def _put_mv(enc, mvp, mv):
    assert mv[0] % 2 == 0 and mv[1] % 2 == 0, "luma MVs are quarter-pel"
    _put_mv_component(enc, mvp[0], mv[0] // 2)
    _put_mv_component(enc, mvp[1], mv[1] // 2)


def _chroma_mv(mv):
    """Derived chroma MV: luma MV halved, rounding half away from zero
    (RFC 18.2). Result is in 1/8 pel of the half-resolution plane."""
    def half(c):
        return -((-c + 1) // 2) if c < 0 else (c + 1) // 2
    return (half(mv[0]), half(mv[1]))


def _chroma_mv_split(sub_mvs, quad_r, quad_c):
    """Chroma MV for one 8x8 quadrant of a SPLITMV MB: the average of
    its four luma sub-MVs, rounded half away from zero (RFC 18.2)."""
    idxs = [(2 * quad_r) * 4 + 2 * quad_c, (2 * quad_r) * 4 + 2 * quad_c + 1,
            (2 * quad_r + 1) * 4 + 2 * quad_c, (2 * quad_r + 1) * 4 + 2 * quad_c + 1]

    def avg(k):
        s = sum(sub_mvs[i][k] for i in idxs)
        return -((-s + 4) // 8) if s < 0 else (s + 4) // 8
    return (avg(0), avg(1))


def _predict_inter_block(ref_pad, r0, c0, h, w, mv, filt="sixtap"):
    """Motion-compensated prediction of an h x w block at plane
    coordinates (r0, c0) from a _REF_PAD-padded reference plane; mv in
    1/8-pel. Zero fractions copy; otherwise the 2-pass filter chain —
    six-tap (version 0: horizontal first over h+5 rows) or bilinear
    (version 1-2: two taps, horizontal first over h+1 rows) — both
    passes rounded by +64 >> 7 and clamped to 0..255, matching the
    reference C exactly. Version-3 (full-pel) frames mask the MV
    fractions before calling, so they always take the copy path."""
    rr = r0 + (mv[0] >> 3) + _REF_PAD
    cc = c0 + (mv[1] >> 3) + _REF_PAD
    fy, fx = mv[0] & 7, mv[1] & 7
    if fx == 0 and fy == 0:
        return ref_pad[rr:rr + h, cc:cc + w]
    if filt == "bilinear":
        src = ref_pad[rr:rr + h + 1, cc:cc + w + 1].astype(np.int64)
        if fx:
            f = BILINEAR_FILTERS[fx]
            src = (f[0] * src[:, :w] + f[1] * src[:, 1:w + 1] + 64) >> 7
        else:
            src = src[:, :w]
        if fy:
            f = BILINEAR_FILTERS[fy]
            src = (f[0] * src[:h, :] + f[1] * src[1:h + 1, :] + 64) >> 7
        else:
            src = src[:h, :]
        return np.clip(src, 0, 255).astype(np.int32)
    fh = SIXTAP_FILTERS[fx]
    fv = SIXTAP_FILTERS[fy]
    src = ref_pad[rr - 2:rr + h + 3, cc - 2:cc + w + 3].astype(np.int64)
    tmp = np.zeros((h + 5, w), dtype=np.int64)
    for t in range(6):
        tmp += fh[t] * src[:, t:t + w]
    tmp = np.clip((tmp + 64) >> 7, 0, 255)
    out = np.zeros((h, w), dtype=np.int64)
    for t in range(6):
        out += fv[t] * tmp[t:t + h, :]
    return np.clip((out + 64) >> 7, 0, 255).astype(np.int32)


def _default_entropy():
    """Frame-persistent entropy context (RFC 6386 9.9): coefficient
    probs, MV probs, and the inter-frame intra mode probs. Key frames
    reset it to these defaults; per-frame updates persist only when
    the header's refresh_entropy_probs bit is set."""
    return {
        "coeff": [[[list(p) for p in ctxs] for ctxs in bands]
                  for bands in DEFAULT_COEFF_PROBS],
        "mv": [list(MV_PROBS_DEFAULT[0]), list(MV_PROBS_DEFAULT[1])],
        "ymode": list(YMODE_PROBS_DEFAULT),
        "uvmode": list(UV_MODE_PROBS_DEFAULT),
    }


class Vp8StreamDecoder:
    """Stateful VP8 stream decoder: KEY frames (the bit-exact-vs-
    libwebp layer) plus INTER frames — last/golden/altref reference
    buffers, copy/refresh buffer management, persistent entropy and
    segmentation state, the near-MV census, NEAREST/NEAR/ZERO/NEW/
    SPLIT motion modes, and sub-pixel motion compensation across all
    four bitstream versions (RFC 6386 9.1 / libvpx vp8_setup_version):
    0 six-tap + normal loop filter, 1 bilinear + simple filter, 2
    bilinear + no filter, 3 full-pel only + no filter. Feed frames in
    bitstream order; ``decode_frame`` returns {"planes": (y,u,v),
    "keyframe": bool, "show": bool} or None on unsupported/corrupt
    input (state is then best-effort and the caller should resync at
    the next key frame)."""

    def __init__(self):
        self.dims = None
        self.refs = {LAST_FRAME: None, GOLDEN_FRAME: None, ALTREF_FRAME: None}
        self.entropy = None
        self.seg_q = [0, 0, 0, 0]
        self.seg_lf = [0, 0, 0, 0]
        self.seg_abs = False
        self.seg_map = None
        self.ref_lf_delta = [0, 0, 0, 0]
        self.mode_lf_delta = [0, 0, 0, 0]

    def decode_frame(self, data):
        try:
            return self._decode(data)
        except (IndexError, ValueError, AssertionError):
            return None

    def _decode(self, data, key_only=False):
        if len(data) < 3:
            return None
        tag = data[0] | (data[1] << 8) | (data[2] << 16)
        key = not (tag & 1)
        version = (tag >> 1) & 7
        show = bool((tag >> 4) & 1)
        first_part_size = tag >> 5
        if key:
            if len(data) < 10 or data[3:6] != b"\x9d\x01\x2a":
                return None
            width = (data[6] | (data[7] << 8)) & 0x3FFF
            height = (data[8] | (data[9] << 8)) & 0x3FFF
            if width == 0 or height == 0:
                return None
            hdr_off = 10
            self.dims = (width, height)
            self.entropy = _default_entropy()
            self.seg_map = None  # realloc below once mb dims known
        else:
            if key_only or self.dims is None or version > 3 \
                    or self.refs[LAST_FRAME] is None:
                return None
            width, height = self.dims
            hdr_off = 3
        # RFC 9.1 / libvpx: version selects the reconstruction filter —
        # 0 six-tap, 1-2 bilinear, 3 full-pel only (MV fractions masked)
        mc_filt = "sixtap" if version == 0 else "bilinear"
        fullpel_mask = ~7 if version == 3 else ~0
        if hdr_off + first_part_size > len(data):
            return None
        mb_w = (width + 15) // 16
        mb_h = (height + 15) // 16
        if self.seg_map is None or len(self.seg_map) != mb_w * mb_h:
            self.seg_map = [0] * (mb_w * mb_h)
        p1 = BoolDecoder(data[hdr_off:hdr_off + first_part_size])
        if key:
            p1.literal(1)  # color space
            p1.literal(1)  # clamping type

        # segmentation (9.3): feature data and the map PERSIST across
        # frames; the header carries update flags for each
        seg_enabled = p1.get(128)
        seg_update_map = False
        seg_tree_probs = [255, 255, 255]
        if seg_enabled:
            seg_update_map = bool(p1.get(128))
            if p1.get(128):  # update feature data
                self.seg_abs = bool(p1.get(128))
                for i in range(4):
                    self.seg_q[i] = p1.signed_literal(7) if p1.get(128) else 0
                for i in range(4):
                    self.seg_lf[i] = p1.signed_literal(6) if p1.get(128) else 0
            if seg_update_map:
                for i in range(3):
                    seg_tree_probs[i] = p1.literal(8) if p1.get(128) else 255

        filter_type = p1.literal(1)
        filter_level = p1.literal(6)
        sharpness = p1.literal(3)
        # libvpx vp8_setup_version: the bitstream version overrides the
        # header's loop-filter bits — version 1 forces the simple
        # filter, versions 2-3 disable loop filtering entirely.
        if version == 1:
            filter_type = 1
        elif version >= 2:
            filter_level = 0

        # loop-filter ref/mode deltas (9.4) — persistent, update-flagged
        lf_delta_on = p1.get(128)
        if lf_delta_on and p1.get(128):
            for i in range(4):
                if p1.get(128):
                    self.ref_lf_delta[i] = p1.signed_literal(6)
            for i in range(4):
                if p1.get(128):
                    self.mode_lf_delta[i] = p1.signed_literal(6)

        log2_parts = p1.literal(2)
        n_parts = 1 << log2_parts
        y_ac_qi = p1.literal(7)

        def _delta():
            return p1.signed_literal(4) if p1.get(128) else 0

        y_dc_d, y2_dc_d, y2_ac_d, uv_dc_d, uv_ac_d = (
            _delta(), _delta(), _delta(), _delta(), _delta()
        )

        # reference-buffer management fields (9.7/9.8)
        sign_bias = {INTRA_FRAME: 0, LAST_FRAME: 0,
                     GOLDEN_FRAME: 0, ALTREF_FRAME: 0}
        refresh_golden = refresh_alt = copy_gf = copy_arf = 0
        if not key:
            refresh_golden = p1.get(128)
            refresh_alt = p1.get(128)
            if not refresh_golden:
                copy_gf = p1.literal(2)
            if not refresh_alt:
                copy_arf = p1.literal(2)
            sign_bias[GOLDEN_FRAME] = p1.get(128)
            sign_bias[ALTREF_FRAME] = p1.get(128)
        refresh_entropy = p1.get(128)
        refresh_last = 1 if key else p1.get(128)

        # working entropy = persistent + this frame's updates
        ent = self.entropy
        probs = [[[list(p) for p in ctxs] for ctxs in bands]
                 for bands in ent["coeff"]]
        mvp = [list(ent["mv"][0]), list(ent["mv"][1])]
        ymode_p = list(ent["ymode"])
        uvmode_p = list(ent["uvmode"])
        for t in range(4):
            for b in range(8):
                for cx in range(3):
                    for pi in range(11):
                        if p1.get(COEFF_UPDATE_PROBS[t][b][cx][pi]):
                            probs[t][b][cx][pi] = p1.literal(8)
        mb_no_skip = p1.literal(1)
        prob_skip = p1.literal(8) if mb_no_skip else 0
        prob_intra = prob_last = prob_gf = 0
        if not key:
            prob_intra = p1.literal(8)
            prob_last = p1.literal(8)
            prob_gf = p1.literal(8)
            if p1.get(128):
                for i in range(4):
                    ymode_p[i] = p1.literal(8)
            if p1.get(128):
                for i in range(3):
                    uvmode_p[i] = p1.literal(8)
            for comp in range(2):
                for j in range(19):
                    if p1.get(MV_UPDATE_PROBS[comp][j]):
                        v = p1.literal(7)
                        mvp[comp][j] = (v << 1) if v else 1

        # pass A: modes (+ MVs on inter frames) from partition 1.
        # modes[i] = (skip, ym, uvm, bm, seg); minfo[r][c] =
        # (ref, mode, mv, sub_mvs) feeds the census and prediction.
        modes = []
        minfo = [[None] * mb_w for _ in range(mb_h)]
        above_bm = [[B_DC_PRED] * 4 for _ in range(mb_w)]
        left_bm = [B_DC_PRED] * 4
        seg_tree = [2, 4, -0, -1, -2, -3]
        for mb_i in range(mb_w * mb_h):
            mb_r, mb_c = mb_i // mb_w, mb_i % mb_w
            if mb_c == 0:
                left_bm = [B_DC_PRED] * 4
            if seg_update_map:
                seg = p1.tree(seg_tree, seg_tree_probs)
                self.seg_map[mb_i] = seg
            else:
                seg = self.seg_map[mb_i] if seg_enabled else 0
            skip = p1.get(prob_skip) if mb_no_skip else 0
            abm = above_bm[mb_c]
            if not key and p1.get(prob_intra):
                # ----- inter MB
                if not p1.get(prob_last):
                    ref = LAST_FRAME
                elif p1.get(prob_gf):
                    ref = ALTREF_FRAME
                else:
                    ref = GOLDEN_FRAME
                best, nearest, near, mvref_p = _find_near_mvs(
                    minfo, mb_r, mb_c, mb_w, mb_h, ref, sign_bias)
                mode = p1.tree(MV_REF_TREE, mvref_p)
                sub_mvs = None
                if mode == SPLITMV:
                    part = p1.tree(MBSPLIT_TREE_P1, MBSPLIT_PROBS) - 1
                    partmap = MBSPLITS[part]
                    sub_mvs = [None] * 16
                    for k in range(MBSPLIT_COUNT[part]):
                        i0 = partmap.index(k)
                        lmv = _left_block_mv(minfo, sub_mvs, mb_r, mb_c, i0)
                        amv = _above_block_mv(minfo, sub_mvs, mb_r, mb_c, i0)
                        sm = p1.tree(SUB_MV_REF_TREE,
                                     SUB_MV_REF_PROBS[_sub_mv_context(lmv, amv)])
                        if sm == NEW4X4:
                            d = _read_mv(p1, mvp)
                            mvk = (d[0] + best[0], d[1] + best[1])
                        elif sm == LEFT4X4:
                            mvk = lmv
                        elif sm == ABOVE4X4:
                            mvk = amv
                        else:
                            mvk = (0, 0)
                        for i in range(16):
                            if partmap[i] == k:
                                sub_mvs[i] = mvk
                    mv = sub_mvs[15]
                elif mode == NEARESTMV:
                    mv = nearest
                elif mode == NEARMV:
                    mv = near
                elif mode == NEWMV:
                    d = _read_mv(p1, mvp)
                    mv = (d[0] + best[0], d[1] + best[1])
                else:
                    mv = (0, 0)
                minfo[mb_r][mb_c] = (ref, mode, mv, sub_mvs)
                modes.append((skip, mode, None, None, seg))
                continue
            # ----- intra MB (key frame, or intra-in-inter)
            if key:
                ym = p1.tree(KF_YMODE_TREE, KF_YMODE_PROBS)
            else:
                ym = p1.tree(YMODE_TREE, ymode_p)
            if ym == B_PRED:
                bm = [0] * 16
                for sb in range(16):
                    sr, sc = sb // 4, sb % 4
                    if key:
                        ctx_a = abm[sc] if sr == 0 else bm[sb - 4]
                        ctx_l = left_bm[sr] if sc == 0 else bm[sb - 1]
                        bm[sb] = p1.tree(BMODE_TREE, KF_BMODE_PROBS[ctx_a][ctx_l])
                    else:
                        bm[sb] = p1.tree(BMODE_TREE, BMODE_PROBS_INTER)
            else:
                bm = [MODE_TO_BMODE[ym]] * 16
            for sc in range(4):
                abm[sc] = bm[12 + sc]
            for sr in range(4):
                left_bm[sr] = bm[4 * sr + 3]
            if key:
                uvm = p1.tree(UV_MODE_TREE, KF_UV_MODE_PROBS)
            else:
                uvm = p1.tree(UV_MODE_TREE, uvmode_p)
            minfo[mb_r][mb_c] = (INTRA_FRAME, ym, (0, 0), None)
            modes.append((skip, ym, uvm, bm, seg))

        # per-segment dequant tables
        def seg_qi(s):
            base = self.seg_q[s] if self.seg_abs else y_ac_qi + self.seg_q[s]
            return min(127, max(0, base))

        dq_tables = [
            frame_quants(seg_qi(s) if seg_enabled else y_ac_qi,
                         y_dc_d, y2_dc_d, y2_ac_d, uv_dc_d, uv_ac_d)
            for s in range(4 if seg_enabled else 1)
        ]

        def mb_filter_level(s, ym, ref):
            lvl = filter_level
            if seg_enabled:
                lvl = self.seg_lf[s] if self.seg_abs \
                    else filter_level + self.seg_lf[s]
                lvl = min(63, max(0, lvl))
            if lf_delta_on:
                lvl += self.ref_lf_delta[ref]
                if ref == INTRA_FRAME:
                    if ym == B_PRED:
                        lvl += self.mode_lf_delta[0]
                else:
                    # RFC 9.4 mode deltas: [1]=ZEROMV, [2]=other
                    # inter (NEAREST/NEAR/NEW), [3]=SPLITMV
                    lvl += self.mode_lf_delta[
                        1 if ym == ZEROMV else (3 if ym == SPLITMV else 2)]
                lvl = min(63, max(0, lvl))
            return lvl

        if filter_level == 0:
            mb_levels = [0] * len(modes)
        else:
            mb_levels = [
                mb_filter_level(m[4], m[1], minfo[i // mb_w][i % mb_w][0])
                for i, m in enumerate(modes)
            ]

        token_area = data[hdr_off + first_part_size:]
        if n_parts == 1:
            part_decoders = [BoolDecoder(token_area)]
        else:
            table = token_area[: 3 * (n_parts - 1)]
            if len(table) < 3 * (n_parts - 1):
                return None
            sizes = [int.from_bytes(table[3 * i:3 * i + 3], "little")
                     for i in range(n_parts - 1)]
            off = 3 * (n_parts - 1)
            part_decoders = []
            for i in range(n_parts):
                end = off + sizes[i] if i < n_parts - 1 else len(token_area)
                if end > len(token_area):
                    return None
                part_decoders.append(BoolDecoder(token_area[off:end]))
                off = end
        y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.int32)
        u = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int32)
        v = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int32)

        # lazily padded reference planes for motion compensation
        pad_cache = {}

        def ref_planes(ref):
            if ref not in pad_cache:
                ry, ru, rv = self.refs[ref]
                pad_cache[ref] = tuple(
                    np.pad(p, _REF_PAD, mode="edge") for p in (ry, ru, rv))
            return pad_cache[ref]

        has_coeffs = []
        above = [{"y2": 0, "y": [0] * 4, "u": [0] * 2, "v": [0] * 2}
                 for _ in range(mb_w)]
        for mb_r in range(mb_h):
            left = {"y2": 0, "y": [0] * 4, "u": [0] * 2, "v": [0] * 2}
            for mb_c in range(mb_w):
                skip, ym, uvm, bm, seg = modes[mb_r * mb_w + mb_c]
                ref, _, mv, sub_mvs = minfo[mb_r][mb_c]
                inter = ref != INTRA_FRAME
                has_y2 = ym not in (B_PRED, SPLITMV)
                y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac = dq_tables[
                    seg if seg_enabled else 0]
                p2 = part_decoders[mb_r % n_parts]
                a = above[mb_c]
                mb_nz = False
                ycoef = [[0] * 16 for _ in range(16)]
                ucoef = [[0] * 16 for _ in range(4)]
                vcoef = [[0] * 16 for _ in range(4)]
                if skip:
                    left["y"] = [0] * 4
                    left["u"] = [0] * 2
                    left["v"] = [0] * 2
                    a["y"] = [0] * 4
                    a["u"] = [0] * 2
                    a["v"] = [0] * 2
                    if has_y2:
                        left["y2"] = 0
                        a["y2"] = 0
                else:
                    if not has_y2:
                        for sb in range(16):
                            sr, sc = sb // 4, sb % 4
                            cc, nz = _decode_coeffs(
                                p2, probs, 3, 0,
                                a["y"][sc] + left["y"][sr], y_dc, y_ac)
                            ycoef[sb] = cc
                            a["y"][sc] = left["y"][sr] = 1 if nz else 0
                            mb_nz = mb_nz or nz
                    else:
                        c2, nz2 = _decode_coeffs(
                            p2, probs, 1, 0, a["y2"] + left["y2"], y2_dc, y2_ac)
                        a["y2"] = left["y2"] = 1 if nz2 else 0
                        mb_nz = mb_nz or nz2 or any(c2)
                        dcs = inv_walsh4x4(c2)
                        for sb in range(16):
                            sr, sc = sb // 4, sb % 4
                            cc, nz = _decode_coeffs(
                                p2, probs, 0, 1,
                                a["y"][sc] + left["y"][sr], y_dc, y_ac)
                            cc[0] = dcs[sb]
                            ycoef[sb] = cc
                            a["y"][sc] = left["y"][sr] = 1 if nz else 0
                            mb_nz = mb_nz or nz
                    for pl, coefs, pkey in ((2, ucoef, "u"), (2, vcoef, "v")):
                        for sb in range(4):
                            cc, nz = _decode_coeffs(
                                p2, probs, pl, 0,
                                a[pkey][sb % 2] + left[pkey][sb // 2],
                                uv_dc, uv_ac)
                            coefs[sb] = cc
                            a[pkey][sb % 2] = left[pkey][sb // 2] = 1 if nz else 0
                            mb_nz = mb_nz or nz

                has_coeffs.append(mb_nz or ym == B_PRED or ym == SPLITMV)

                r0, c0 = mb_r * 16, mb_c * 16
                cr0, cc0 = mb_r * 8, mb_c * 8
                if inter:
                    py, pu, pv = ref_planes(ref)

                    def fp(m):
                        return (m[0] & fullpel_mask, m[1] & fullpel_mask)

                    if ym == SPLITMV:
                        smv_c = [
                            fp(_clamp_mv_umv(m, mb_r, mb_c, mb_w, mb_h))
                            for m in sub_mvs]
                        for sb in range(16):
                            sr, sc = sb // 4, sb % 4
                            y[r0 + sr * 4:r0 + sr * 4 + 4,
                              c0 + sc * 4:c0 + sc * 4 + 4] = \
                                _predict_inter_block(
                                    py, r0 + sr * 4, c0 + sc * 4, 4, 4,
                                    smv_c[sb], mc_filt)
                        for qr in range(2):
                            for qc in range(2):
                                cm = fp(_chroma_mv_split(smv_c, qr, qc))
                                for plane, pref in ((u, pu), (v, pv)):
                                    plane[cr0 + qr * 4:cr0 + qr * 4 + 4,
                                          cc0 + qc * 4:cc0 + qc * 4 + 4] = \
                                        _predict_inter_block(
                                            pref, cr0 + qr * 4, cc0 + qc * 4,
                                            4, 4, cm, mc_filt)
                    else:
                        mv_c = fp(_clamp_mv_umv(mv, mb_r, mb_c, mb_w, mb_h))
                        y[r0:r0 + 16, c0:c0 + 16] = _predict_inter_block(
                            py, r0, c0, 16, 16, mv_c, mc_filt)
                        cm = fp(_chroma_mv(mv_c))
                        u[cr0:cr0 + 8, cc0:cc0 + 8] = _predict_inter_block(
                            pu, cr0, cc0, 8, 8, cm, mc_filt)
                        v[cr0:cr0 + 8, cc0:cc0 + 8] = _predict_inter_block(
                            pv, cr0, cc0, 8, 8, cm, mc_filt)
                    if not skip:
                        for sb in range(16):
                            rr = r0 + (sb // 4) * 4
                            ccx = c0 + (sb % 4) * 4
                            res = inv_dct4x4(ycoef[sb])
                            y[rr:rr + 4, ccx:ccx + 4] = np.clip(
                                y[rr:rr + 4, ccx:ccx + 4] + res, 0, 255)
                        for plane, coefs in ((u, ucoef), (v, vcoef)):
                            for sb in range(4):
                                rr = cr0 + (sb // 2) * 4
                                ccx = cc0 + (sb % 2) * 4
                                res = inv_dct4x4(coefs[sb])
                                plane[rr:rr + 4, ccx:ccx + 4] = np.clip(
                                    plane[rr:rr + 4, ccx:ccx + 4] + res, 0, 255)
                elif ym == B_PRED:
                    for sb in range(16):
                        rr, ccx = r0 + (sb // 4) * 4, c0 + (sb % 4) * 4
                        _predict4(y, rr, ccx, bm[sb])
                        if not skip:
                            res = inv_dct4x4(ycoef[sb])
                            y[rr:rr + 4, ccx:ccx + 4] = np.clip(
                                y[rr:rr + 4, ccx:ccx + 4] + res, 0, 255)
                    _predict(u, cr0, cc0, 8, uvm)
                    _predict(v, cr0, cc0, 8, uvm)
                    if not skip:
                        for plane, coefs in ((u, ucoef), (v, vcoef)):
                            for sb in range(4):
                                rr = cr0 + (sb // 2) * 4
                                ccx = cc0 + (sb % 2) * 4
                                res = inv_dct4x4(coefs[sb])
                                plane[rr:rr + 4, ccx:ccx + 4] = np.clip(
                                    plane[rr:rr + 4, ccx:ccx + 4] + res, 0, 255)
                else:
                    _predict(y, r0, c0, 16, ym)
                    _predict(u, cr0, cc0, 8, uvm)
                    _predict(v, cr0, cc0, 8, uvm)
                    if not skip:
                        for sb in range(16):
                            rr, ccx = r0 + (sb // 4) * 4, c0 + (sb % 4) * 4
                            res = inv_dct4x4(ycoef[sb])
                            y[rr:rr + 4, ccx:ccx + 4] = np.clip(
                                y[rr:rr + 4, ccx:ccx + 4] + res, 0, 255)
                        for plane, coefs in ((u, ucoef), (v, vcoef)):
                            for sb in range(4):
                                rr = cr0 + (sb // 2) * 4
                                ccx = cc0 + (sb % 2) * 4
                                res = inv_dct4x4(coefs[sb])
                                plane[rr:rr + 4, ccx:ccx + 4] = np.clip(
                                    plane[rr:rr + 4, ccx:ccx + 4] + res, 0, 255)
        apply_loop_filter(y, u, v, modes, has_coeffs, mb_levels, sharpness,
                          filter_type, mb_w, mb_h, keyframe=key)

        # reference-buffer management (9.7/9.10): copies read the
        # buffers sequentially (arf first, then gf — so a gf copy
        # "from altref" sees an arf that was itself just copied),
        # then refresh flags install the new frame; key frames
        # refresh all three.
        cur = (y, u, v)
        if key:
            self.refs = {LAST_FRAME: cur, GOLDEN_FRAME: cur, ALTREF_FRAME: cur}
        else:
            if copy_arf == 1:
                self.refs[ALTREF_FRAME] = self.refs[LAST_FRAME]
            elif copy_arf == 2:
                self.refs[ALTREF_FRAME] = self.refs[GOLDEN_FRAME]
            if copy_gf == 1:
                self.refs[GOLDEN_FRAME] = self.refs[LAST_FRAME]
            elif copy_gf == 2:
                self.refs[GOLDEN_FRAME] = self.refs[ALTREF_FRAME]
            if refresh_golden:
                self.refs[GOLDEN_FRAME] = cur
            if refresh_alt:
                self.refs[ALTREF_FRAME] = cur
            if refresh_last:
                self.refs[LAST_FRAME] = cur
        if refresh_entropy:
            self.entropy = {"coeff": probs, "mv": mvp,
                            "ymode": ymode_p, "uvmode": uvmode_p}

        cw, ch = (width + 1) // 2, (height + 1) // 2
        return {
            "planes": (
                y[:height, :width].astype(np.uint8),
                u[:ch, :cw].astype(np.uint8),
                v[:ch, :cw].astype(np.uint8),
            ),
            "keyframe": key,
            "show": show,
        }


def encode_vp8_inter(
    width, height, mb_plan, qi=0, filter_level=0, sharpness=0,
    filter_type=0, refresh_last=True, refresh_golden=False,
    refresh_alt=False, copy_gf=0, copy_arf=0, sign_bias_golden=0,
    sign_bias_alt=0, refresh_entropy=True, prob_skip=128, prob_intra=128,
    prob_last=128, prob_gf=128, mv_prob_updates=(), show=True, version=0,
):
    """Minimal spec-conformant VP8 INTER frame for the stream-decoder
    tests. ``mb_plan(mb_r, mb_c)`` returns a dict:

    * ``{"kind": "zero"|"nearest"|"near", "ref": ..., "skip": 1}`` —
      ZEROMV / census-candidate modes (caller is responsible for the
      census producing the MV it wants for nearest/near; the encoder
      runs the same census as the decoder and records the actual MV);
    * ``{"kind": "new", "mv": (row, col), ...}`` — NEWMV with an
      absolute 1/8-pel MV (even components), coded as a delta against
      the census best_mv;
    * ``{"kind": "split", "partition": p, "mvs": [...]}`` — SPLITMV
      with one absolute MV per partition (skip/level unsupported for
      splits beyond zero residual);
    * ``{"kind": "intra", "ym": DC_PRED.., "uvm": ..., "level": n}`` —
      an intra MB inside the inter frame (16x16 modes only).

    Non-split/non-intra MBs accept ``"level"`` (a Y2 DC token exactly
    as :func:`encode_vp8_key_two_tone`: the decoded MB adds
    ``vp8_dc_delta(level)`` to its prediction) and ``"skip"``.
    ``mv_prob_updates`` is a list of (component, index, 7-bit value)
    written through the RFC 17.1 update scheme (effective prob =
    value<<1 or 1). Entropy defaults are assumed current (i.e. the
    preceding frames either were key frames or wrote no persistent
    updates); pair with refresh_entropy=False to keep it that way.
    """
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    probs = DEFAULT_COEFF_PROBS
    mvp = [list(MV_PROBS_DEFAULT[0]), list(MV_PROBS_DEFAULT[1])]
    sign_bias = {INTRA_FRAME: 0, LAST_FRAME: 0,
                 GOLDEN_FRAME: sign_bias_golden, ALTREF_FRAME: sign_bias_alt}

    p1 = BoolEncoder()
    p1.put(0, 128)                    # segmentation disabled
    p1.put_literal(filter_type, 1)
    p1.put_literal(filter_level, 6)
    p1.put_literal(sharpness, 3)
    p1.put(0, 128)                    # no lf deltas
    p1.put_literal(0, 2)              # one token partition
    p1.put_literal(qi, 7)
    for _ in range(5):
        p1.put(0, 128)                # no quant deltas
    p1.put(1 if refresh_golden else 0, 128)
    p1.put(1 if refresh_alt else 0, 128)
    if not refresh_golden:
        p1.put_literal(copy_gf, 2)
    if not refresh_alt:
        p1.put_literal(copy_arf, 2)
    p1.put(sign_bias_golden, 128)
    p1.put(sign_bias_alt, 128)
    p1.put(1 if refresh_entropy else 0, 128)
    p1.put(1 if refresh_last else 0, 128)
    for t in range(4):
        for b in range(8):
            for cx in range(3):
                for pi in range(11):
                    p1.put(0, COEFF_UPDATE_PROBS[t][b][cx][pi])
    p1.put_literal(1, 1)              # mb_no_coeff_skip
    p1.put_literal(prob_skip, 8)
    p1.put_literal(prob_intra, 8)
    p1.put_literal(prob_last, 8)
    p1.put_literal(prob_gf, 8)
    p1.put(0, 128)                    # no ymode prob update
    p1.put(0, 128)                    # no uv mode prob update
    updates = {(c, i): val for c, i, val in mv_prob_updates}
    for comp in range(2):
        for j in range(19):
            if (comp, j) in updates:
                p1.put(1, MV_UPDATE_PROBS[comp][j])
                p1.put_literal(updates[(comp, j)], 7)
                val = updates[(comp, j)]
                mvp[comp][j] = (val << 1) if val else 1
            else:
                p1.put(0, MV_UPDATE_PROBS[comp][j])

    # mode/MV pass, running the decoder's census on the evolving grid
    minfo = [[None] * mb_w for _ in range(mb_h)]
    plans = {}
    for mb_r in range(mb_h):
        for mb_c in range(mb_w):
            plan = dict(mb_plan(mb_r, mb_c))
            plans[(mb_r, mb_c)] = plan
            kind = plan["kind"]
            skip = int(plan.get("skip", 0))
            level = plan.get("level", 0)
            assert not (skip and level), "skip MBs carry no residual"
            p1.put(skip, prob_skip)
            if kind == "intra":
                p1.put(0, prob_intra)
                ym = plan.get("ym", DC_PRED)
                assert ym in MODE_TO_BMODE, "16x16 intra modes only"
                p1.put_tree(YMODE_TREE, YMODE_PROBS_DEFAULT, ym)
                p1.put_tree(UV_MODE_TREE, UV_MODE_PROBS_DEFAULT,
                            plan.get("uvm", DC_PRED))
                minfo[mb_r][mb_c] = (INTRA_FRAME, ym, (0, 0), None)
                continue
            p1.put(1, prob_intra)
            ref = plan.get("ref", LAST_FRAME)
            if ref == LAST_FRAME:
                p1.put(0, prob_last)
            else:
                p1.put(1, prob_last)
                p1.put(1 if ref == ALTREF_FRAME else 0, prob_gf)
            best, nearest, near, mvref_p = _find_near_mvs(
                minfo, mb_r, mb_c, mb_w, mb_h, ref, sign_bias)
            if kind == "split":
                part = plan["partition"]
                partmap = MBSPLITS[part]
                p1.put_tree(MV_REF_TREE, mvref_p, SPLITMV)
                p1.put_tree(MBSPLIT_TREE_P1, MBSPLIT_PROBS, part + 1)
                sub_mvs = [None] * 16
                for k in range(MBSPLIT_COUNT[part]):
                    mvk = tuple(plan["mvs"][k])
                    i0 = partmap.index(k)
                    lmv = _left_block_mv(minfo, sub_mvs, mb_r, mb_c, i0)
                    amv = _above_block_mv(minfo, sub_mvs, mb_r, mb_c, i0)
                    sp = SUB_MV_REF_PROBS[_sub_mv_context(lmv, amv)]
                    if mvk == lmv:
                        p1.put_tree(SUB_MV_REF_TREE, sp, LEFT4X4)
                    elif mvk == amv:
                        p1.put_tree(SUB_MV_REF_TREE, sp, ABOVE4X4)
                    elif mvk == (0, 0):
                        p1.put_tree(SUB_MV_REF_TREE, sp, ZERO4X4)
                    else:
                        p1.put_tree(SUB_MV_REF_TREE, sp, NEW4X4)
                        _put_mv(p1, mvp,
                                (mvk[0] - best[0], mvk[1] - best[1]))
                    for i in range(16):
                        if partmap[i] == k:
                            sub_mvs[i] = mvk
                minfo[mb_r][mb_c] = (ref, SPLITMV, sub_mvs[15], sub_mvs)
                assert not level, "split MBs: zero residual only"
                continue
            if kind == "zero":
                p1.put_tree(MV_REF_TREE, mvref_p, ZEROMV)
                mv = (0, 0)
            elif kind == "nearest":
                p1.put_tree(MV_REF_TREE, mvref_p, NEARESTMV)
                mv = nearest
            elif kind == "near":
                p1.put_tree(MV_REF_TREE, mvref_p, NEARMV)
                mv = near
            else:
                mv = tuple(plan["mv"])
                p1.put_tree(MV_REF_TREE, mvref_p, NEWMV)
                _put_mv(p1, mvp, (mv[0] - best[0], mv[1] - best[1]))
            mode = {"zero": ZEROMV, "nearest": NEARESTMV,
                    "near": NEARMV, "new": NEWMV}[kind]
            minfo[mb_r][mb_c] = (ref, mode, mv, None)
    part1 = p1.flush()

    # token pass (mirrors the decoder's context tracking)
    p2 = BoolEncoder()
    above = [{"y2": 0, "y": [0] * 4, "u": [0] * 2, "v": [0] * 2}
             for _ in range(mb_w)]
    for mb_r in range(mb_h):
        left = {"y2": 0, "y": [0] * 4, "u": [0] * 2, "v": [0] * 2}
        for mb_c in range(mb_w):
            plan = plans[(mb_r, mb_c)]
            kind = plan["kind"]
            skip = int(plan.get("skip", 0))
            level = plan.get("level", 0)
            has_y2 = kind != "split"
            a = above[mb_c]
            if skip:
                left["y"] = [0] * 4
                left["u"] = [0] * 2
                left["v"] = [0] * 2
                a["y"] = [0] * 4
                a["u"] = [0] * 2
                a["v"] = [0] * 2
                if has_y2:
                    left["y2"] = 0
                    a["y2"] = 0
                continue
            if has_y2:
                ctx = a["y2"] + left["y2"]
                if level:
                    nctx = _put_token_value(
                        p2, probs, 1, COEFF_BANDS[0], ctx, level)
                    _put_eob(p2, probs, 1, COEFF_BANDS[1], nctx)
                    a["y2"] = left["y2"] = 1
                else:
                    _put_eob(p2, probs, 1, COEFF_BANDS[0], ctx)
                    a["y2"] = left["y2"] = 0
                for sb in range(16):
                    sr, sc = sb // 4, sb % 4
                    _put_eob(p2, probs, 0, COEFF_BANDS[0],
                             a["y"][sc] + left["y"][sr])
                    a["y"][sc] = left["y"][sr] = 0
            else:
                for sb in range(16):
                    sr, sc = sb // 4, sb % 4
                    _put_eob(p2, probs, 3, COEFF_BANDS[0],
                             a["y"][sc] + left["y"][sr])
                    a["y"][sc] = left["y"][sr] = 0
            for key_, btype in (("u", 2), ("v", 2)):
                for sb in range(4):
                    _put_eob(p2, probs, btype, COEFF_BANDS[0],
                             a[key_][sb % 2] + left[key_][sb // 2])
                    a[key_][sb % 2] = left[key_][sb // 2] = 0
    part2 = p2.flush()

    tag = 1 | (version << 1) | ((1 if show else 0) << 4) | (len(part1) << 5)
    head = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    return head + part1 + part2
