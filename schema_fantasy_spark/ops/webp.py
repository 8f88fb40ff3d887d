"""WebP lossless (VP8L) codec in pure numpy + stdlib — no codec library.

Decoder: the full VP8L still-image bitstream (public "WebP Lossless
Bitstream Specification"): LSB-first bit reading, simple and
code-length-coded canonical prefix codes, meta prefix groups (entropy
image), color cache, LZ77 backward references with the 2D distance
mapping, and all four transforms applied inversely in reverse order —
predictor (14 modes), color transform, subtract-green, color indexing
(with sub-byte pixel bundling). Returns HxWx3 uint8 (alpha dropped).

Encoder: a minimal-legal generator for tests/corpus — images whose
channels each take at most TWO distinct values (e.g. the two-tone gate
corpus) encode entirely with SIMPLE prefix codes: no transforms, no
cache, no LZ77, one prefix group. Lossless, so round trips are
bit-exact. Paths the encoder cannot emit (normal code-length codes,
transforms, palettes) are covered by hand-assembled golden streams in
the tests.

Caveat, documented: the 120-entry 2D distance map is transcribed from
the spec (this codec's own encoder never emits 2D distance codes).

VP8 LOSSY key frames decode for real too, via ``ops/vp8.py`` (boolean
arithmetic decoder, token decode, WHT/DCT, 16x16 AND per-4x4 B_PRED
intra prediction, in-loop deblocking — RFC 6386 in pure numpy), now
cross-checked BIT-EXACT against the system libwebp reference codec
(tests/test_vp8.py); ``decode_webp`` routes both variants. Only
inter-frame video (motion compensation) remains stubbed.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

#: code-length-code symbol transmission order (VP8L spec)
CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]

#: green-channel extra alphabet: 24 LZ77 length codes past the literals
NUM_LENGTH_CODES = 24
NUM_DISTANCE_CODES = 40

#: 2D distance map (dx, dy) for distance codes 1..120 (spec table,
#: transcribed; see module caveat)
DISTANCE_MAP: List[Tuple[int, int]] = [
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (8, 5), (7, 6), (-7, 6), (8, 6), (7, 7), (-7, 7), (8, 7),
]
assert len(DISTANCE_MAP) == 120


# -------------------------------------------------------------- bit I/O


class _LsbReader:
    """LSB-first bit reader (VP8L convention — opposite of JPEG)."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError
        b = (self.data[self.pos] >> self.bit) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            v |= self.read_bit() << i
        return v


class _LsbWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


# ------------------------------------------------------------ prefix code


class _Prefix:
    """Canonical prefix code: decode bit-by-bit via (len, code) map —
    codes assigned per code length in symbol order, MSB-first walk over
    the LSB-first bit stream (DEFLATE-style)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: List[int]):
        nonzero = [(s, l) for s, l in enumerate(lengths) if l > 0]
        if len(nonzero) == 1:
            self.single = nonzero[0][0]
            self.table = None
            return
        self.single = None
        max_len = max(l for _, l in nonzero)
        bl_count = [0] * (max_len + 1)
        for _, l in nonzero:
            bl_count[l] += 1
        next_code = [0] * (max_len + 2)
        code = 0
        for l in range(1, max_len + 1):
            code = (code + bl_count[l - 1]) << 1
            next_code[l] = code
        table = {}
        for s, l in nonzero:
            table[(l, next_code[l])] = s
            next_code[l] += 1
        self.table = table

    def decode(self, r: _LsbReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for length in range(1, 16):
            code = (code << 1) | r.read_bit()
            sym = self.table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("bad prefix code")


def _read_prefix_code(r: _LsbReader, alphabet_size: int) -> _Prefix:
    if r.read_bit():  # simple code
        num_symbols = r.read_bit() + 1
        first_8bits = r.read_bit()
        sym0 = r.read(8 if first_8bits else 1)
        lengths = [0] * alphabet_size
        if num_symbols == 2:
            sym1 = r.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise ValueError("simple code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        else:
            if sym0 >= alphabet_size:
                raise ValueError("simple code symbol out of range")
            lengths[sym0] = 1  # single-symbol: zero bits read per decode
            p = _Prefix(lengths)
            return p
        return _Prefix(lengths)
    # normal: code-length code first
    num_codes = 4 + r.read(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[CODE_LENGTH_ORDER[i]] = r.read(3)
    if all(l == 0 for l in cl_lengths):
        raise ValueError("empty code-length code")
    cl = _Prefix(cl_lengths)
    if r.read_bit():  # bounded symbol count
        length_nbits = 2 + 2 * r.read(3)
        max_symbol = 2 + r.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl.decode(r)
        if s < 16:
            lengths[symbol] = s
            symbol += 1
            if s != 0:
                prev = s
        elif s == 16:
            rep = 3 + r.read(2)
            for _ in range(rep):
                if symbol < alphabet_size:
                    lengths[symbol] = prev
                    symbol += 1
        elif s == 17:
            symbol += 3 + r.read(3)
        else:  # 18
            symbol += 11 + r.read(7)
    if not any(lengths):
        raise ValueError("empty prefix code")
    return _Prefix(lengths)


def _prefix_value(code: int, r: _LsbReader) -> int:
    """LZ77 length/distance prefix coding: code -> value (+extra bits)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + r.read(extra) + 1


# ----------------------------------------------------------------- decode


def _div_round_up(a: int, b: int) -> int:
    return (a + b - 1) // b


def _decode_argb_image(
    r: _LsbReader, width: int, height: int, is_main: bool
):
    """Decode one VP8L (sub-)image -> (height, width) uint32 ARGB array.
    Transform parsing happens only for the main image."""
    transforms = []
    w = width
    if is_main:
        seen = set()
        while r.read_bit():
            ttype = r.read(2)
            if ttype in seen:
                raise ValueError("duplicate transform")
            seen.add(ttype)
            if ttype == 0 or ttype == 1:  # predictor / color transform
                size_bits = r.read(3) + 2
                bw = _div_round_up(w, 1 << size_bits)
                bh = _div_round_up(height, 1 << size_bits)
                data = _decode_argb_image(r, bw, bh, False)
                transforms.append((ttype, size_bits, data))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None))
            else:  # 3: color indexing
                n_colors = r.read(8) + 1
                palette = _decode_argb_image(r, n_colors, 1, False)[0]
                # palette entries are delta-coded per channel
                pal = palette.copy()
                for i in range(1, n_colors):
                    a0, r0, g0, b0 = _unpack(pal[i - 1])
                    a1, r1, g1, b1 = _unpack(palette[i])
                    pal[i] = _pack(
                        (a0 + a1) & 0xFF, (r0 + r1) & 0xFF,
                        (g0 + g1) & 0xFF, (b0 + b1) & 0xFF,
                    )
                if n_colors <= 2:
                    wbits = 3
                elif n_colors <= 4:
                    wbits = 2
                elif n_colors <= 16:
                    wbits = 1
                else:
                    wbits = 0
                transforms.append((3, (wbits, pal), None))
                w = _div_round_up(w, 1 << wbits)

    cache_bits = 0
    cache = None
    if r.read_bit():
        cache_bits = r.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("bad cache bits")
        cache = [0] * (1 << cache_bits)

    meta = None
    meta_bits = 0
    if is_main and r.read_bit():  # meta prefix codes (entropy image)
        meta_bits = r.read(3) + 2
        meta = _decode_argb_image(
            r, _div_round_up(w, 1 << meta_bits), _div_round_up(height, 1 << meta_bits),
            False,
        )
        n_groups = int(((meta >> 8) & 0xFFFF).max()) + 1
    else:
        n_groups = 1

    green_alpha = 256 + NUM_LENGTH_CODES + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        groups.append((
            _read_prefix_code(r, green_alpha),
            _read_prefix_code(r, 256),   # red
            _read_prefix_code(r, 256),   # blue
            _read_prefix_code(r, 256),   # alpha
            _read_prefix_code(r, NUM_DISTANCE_CODES),
        ))

    n = w * height
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    while pos < n:
        x, y = pos % w, pos // w
        if meta is not None:
            mp = meta[y >> meta_bits, x >> meta_bits]
            g = groups[int((mp >> 8) & 0xFFFF)]
        else:
            g = groups[0]
        s = g[0].decode(r)
        if s < 256:
            red = g[1].decode(r)
            blue = g[2].decode(r)
            alpha = g[3].decode(r)
            px = _pack(alpha, red, s, blue)
            out[pos] = px
            pos += 1
        elif s < 256 + NUM_LENGTH_CODES:
            length = _prefix_value(s - 256, r)
            dist_code = _prefix_value(g[4].decode(r), r)
            if dist_code > 120:
                dist = dist_code - 120
            else:
                dx, dy = DISTANCE_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > pos or pos + length > n:
                raise ValueError("bad backward reference")
            for _ in range(length):
                out[pos] = out[pos - dist]
                if cache is not None:
                    cache[_hash(out[pos], cache_bits)] = int(out[pos])
                pos += 1
            continue
        else:
            if cache is None:
                raise ValueError("cache symbol without cache")
            px = np.uint32(cache[s - 256 - NUM_LENGTH_CODES])
            out[pos] = px
            pos += 1
        if cache is not None:
            cache[_hash(out[pos - 1], cache_bits)] = int(out[pos - 1])

    img = out.reshape(height, w)
    if not is_main:
        return img
    # inverse transforms, reverse order
    for ttype, p1, p2 in reversed(transforms):
        if ttype == 3:
            img = _inverse_palette(img, width, p1[0], p1[1])
        elif ttype == 2:
            img = _inverse_subtract_green(img)
        elif ttype == 1:
            img = _inverse_color_transform(img, p1, p2)
        else:
            img = _inverse_predictor(img, p1, p2)
    return img


def _unpack(px) -> Tuple[int, int, int, int]:
    px = int(px)
    return (px >> 24) & 0xFF, (px >> 16) & 0xFF, (px >> 8) & 0xFF, px & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _hash(px, bits: int) -> int:
    return ((0x1E35A7BD * int(px)) & 0xFFFFFFFF) >> (32 - bits)


def _inverse_subtract_green(img: "np.ndarray") -> "np.ndarray":
    g = (img >> 8) & 0xFF
    r = (((img >> 16) & 0xFF) + g) & 0xFF
    b = ((img & 0xFF) + g) & 0xFF
    return (img & np.uint32(0xFF00FF00)) | (r << np.uint32(16)) | b


def _inverse_palette(img, true_width: int, wbits: int, pal) -> "np.ndarray":
    h = img.shape[0]
    if wbits == 0:
        idx = (img >> 8) & 0xFF
        idx = idx[:, :true_width]
    else:
        per = 1 << wbits          # pixels per packed byte = 8 >> ... inverse
        bits = 8 >> wbits         # bits per index
        packed = ((img >> 8) & 0xFF).astype(np.uint32)
        cols = []
        for k in range(per):
            cols.append((packed >> (k * bits)) & ((1 << bits) - 1))
        idx = np.stack(cols, axis=2).reshape(h, -1)[:, :true_width]
    n_pal = len(pal)
    safe = np.where(idx < n_pal, idx, 0)
    return np.asarray(pal, dtype=np.uint32)[safe.astype(np.int64)]


def _cdelta(t: int, c: int) -> int:
    """ColorTransformDelta: signed int8 multiply, arithmetic >> 5."""
    t = t - 256 if t >= 128 else t
    c = c - 256 if c >= 128 else c
    return (t * c) >> 5


def _inverse_color_transform(img, size_bits: int, data) -> "np.ndarray":
    """Per-block inverse color transform: the transform pixel packs
    (0xff, red_to_blue, green_to_blue, green_to_red); inverse ADDS the
    cross-channel deltas the encoder subtracted."""
    h, w = img.shape
    out = img.copy()
    for y in range(h):
        brow = data[y >> size_bits]
        for x in range(w):
            cm = int(brow[x >> size_bits])
            g2r = cm & 0xFF
            g2b = (cm >> 8) & 0xFF
            r2b = (cm >> 16) & 0xFF
            px = int(out[y, x])
            a, r, g, b = _unpack(px)
            r = (r + _cdelta(g2r, g)) & 0xFF
            b = (b + _cdelta(g2b, g)) & 0xFF
            b = (b + _cdelta(r2b, r)) & 0xFF
            out[y, x] = _pack(a, r, g, b)
    return out


def _inverse_predictor(img, size_bits: int, modes) -> "np.ndarray":
    h, w = img.shape
    out = np.zeros((h, w), dtype=np.uint32)

    def addpx(base, resid):
        ba, br, bg, bb = _unpack(base)
        ra, rr, rg, rb = _unpack(resid)
        return _pack((ba + ra) & 0xFF, (br + rr) & 0xFF, (bg + rg) & 0xFF,
                     (bb + rb) & 0xFF)

    def avg2(p, q):
        pa, pr, pg, pb = _unpack(p)
        qa, qr, qg, qb = _unpack(q)
        return _pack((pa + qa) >> 1, (pr + qr) >> 1, (pg + qg) >> 1, (pb + qb) >> 1)

    def select(l, t, tl):
        la, lr, lg, lb = _unpack(l)
        ta, tr_, tg, tb = _unpack(t)
        xa, xr, xg, xb = _unpack(tl)
        p_l = abs(ta - xa) + abs(tr_ - xr) + abs(tg - xg) + abs(tb - xb)
        p_t = abs(la - xa) + abs(lr - xr) + abs(lg - xg) + abs(lb - xb)
        return l if p_l <= p_t else t

    def clamp(v):
        return 0 if v < 0 else 255 if v > 255 else v

    def cas_full(l, t, tl):
        out_c = []
        for i in range(4):
            sh = 24 - 8 * i
            out_c.append(clamp(((l >> sh) & 0xFF) + ((t >> sh) & 0xFF)
                               - ((tl >> sh) & 0xFF)))
        return _pack(*out_c)

    def cas_half(av, tl):
        out_c = []
        for i in range(4):
            sh = 24 - 8 * i
            a = (av >> sh) & 0xFF
            x = (tl >> sh) & 0xFF
            out_c.append(clamp(a + (a - x) // 2))
        return _pack(*out_c)

    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = int(out[0, x - 1])  # top row: left
            elif x == 0:
                pred = int(out[y - 1, 0])  # left column: top
            else:
                mode = int((modes[y >> size_bits, x >> size_bits] >> 8) & 0xFF)
                l = int(out[y, x - 1])
                t = int(out[y - 1, x])
                # TR = data[pix - w + 1] in 1D order: for the last column
                # that wraps to the CURRENT row's first pixel (decoded)
                tr = int(out[y - 1, x + 1]) if x + 1 < w else int(out[y, 0])
                tl = int(out[y - 1, x - 1])
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = l
                elif mode == 2:
                    pred = t
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = avg2(avg2(l, tr), t)
                elif mode == 6:
                    pred = avg2(l, tl)
                elif mode == 7:
                    pred = avg2(l, t)
                elif mode == 8:
                    pred = avg2(tl, t)
                elif mode == 9:
                    pred = avg2(t, tr)
                elif mode == 10:
                    pred = avg2(avg2(l, tl), avg2(t, tr))
                elif mode == 11:
                    pred = select(l, t, tl)
                elif mode == 12:
                    pred = cas_full(l, t, tl)
                elif mode == 13:
                    pred = cas_half(avg2(l, t), tl)
                else:
                    raise ValueError("bad predictor mode")
            out[y, x] = addpx(pred, int(img[y, x]))
    return out


# --------------------------------------------------------- container API


def parse_webp_header(payload: bytes) -> Optional[Tuple[int, int, str]]:
    """(width, height, variant) for a WebP container: 'VP8L' (lossless,
    dims from the 14-bit header fields) or 'VP8 ' (lossy, dims from the
    keyframe header). None if not WebP/malformed."""
    if len(payload) < 20 or payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        return None
    fourcc = payload[12:16]
    body = payload[20:]
    if fourcc == b"VP8L":
        if not body or body[0] != 0x2F:
            return None
        r = _LsbReader(body[1:])
        try:
            w = r.read(14) + 1
            h = r.read(14) + 1
        except EOFError:
            return None
        return w, h, "vp8l"
    if fourcc == b"VP8 ":
        # keyframe: 3-byte frame tag, sync 9D 01 2A, 2x16-bit LE dims
        if len(body) < 10 or body[3:6] != b"\x9d\x01\x2a":
            return None
        w = int.from_bytes(body[6:8], "little") & 0x3FFF
        h = int.from_bytes(body[8:10], "little") & 0x3FFF
        return w, h, "vp8"
    return None


def decode_webp_lossless(payload: bytes) -> Optional["np.ndarray"]:
    """Decode a lossless WebP -> HxWx3 uint8 (alpha dropped); None for
    lossy VP8 (needs the arithmetic decoder), non-WebP, or malformed."""
    try:
        hdr = parse_webp_header(payload)
        if hdr is None or hdr[2] != "vp8l":
            return None
        w, h, _ = hdr
        r = _LsbReader(payload[21:])
        r.read(14)
        r.read(14)
        r.read_bit()        # alpha hint
        if r.read(3) != 0:  # version
            return None
        argb = _decode_argb_image(r, w, h, True)
        red = ((argb >> 16) & 0xFF).astype(np.uint8)
        green = ((argb >> 8) & 0xFF).astype(np.uint8)
        blue = (argb & 0xFF).astype(np.uint8)
        return np.ascontiguousarray(np.stack([red, green, blue], axis=2))
    except (ValueError, EOFError, IndexError, KeyError):
        return None


# ---------------------------------------------------------------- encode


def encode_webp_lossless_two_tone(px: "np.ndarray") -> bytes:
    """Encode an RGB image whose R, G, B channels each take at most TWO
    distinct values (any two-tone image qualifies) as a minimal VP8L
    stream: no transforms, no cache, no meta, one prefix group, SIMPLE
    codes per channel. Bit-exact lossless."""
    px = np.asarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = np.repeat(px[:, :, None], 3, axis=2)
    h, w = px.shape[:2]
    if not (0 < w <= 1 << 14 and 0 < h <= 1 << 14):
        raise ValueError("bad dims")
    chans = [px[:, :, 1], px[:, :, 0], px[:, :, 2]]  # green, red, blue order
    vals = [sorted(set(int(v) for v in c.reshape(-1))) for c in chans]
    if any(len(v) > 2 for v in vals):
        raise ValueError("channels must each have <= 2 distinct values")

    wtr = _LsbWriter()
    wtr.write(w - 1, 14)
    wtr.write(h - 1, 14)
    wtr.write(0, 1)  # no alpha hint
    wtr.write(0, 3)  # version
    wtr.write(0, 1)  # no transforms
    wtr.write(0, 1)  # no color cache
    wtr.write(0, 1)  # no meta prefix codes

    def write_simple(symbols: List[int]):
        wtr.write(1, 1)                       # simple code
        wtr.write(len(symbols) - 1, 1)        # 1 or 2 symbols
        wtr.write(1, 1)                       # first symbol in 8 bits
        wtr.write(symbols[0], 8)
        if len(symbols) == 2:
            wtr.write(symbols[1], 8)

    write_simple(vals[0])          # green (literals only)
    write_simple(vals[1])          # red
    write_simple(vals[2])          # blue
    write_simple([255])            # alpha: single symbol, zero bits/pixel
    write_simple([0])              # distance: unused, single symbol

    g, r_, b = chans
    gm = {v: i for i, v in enumerate(vals[0])}
    rm = {v: i for i, v in enumerate(vals[1])}
    bm = {v: i for i, v in enumerate(vals[2])}
    for y in range(h):
        for x in range(w):
            if len(vals[0]) == 2:
                wtr.write(gm[int(g[y, x])], 1)
            if len(vals[1]) == 2:
                wtr.write(rm[int(r_[y, x])], 1)
            if len(vals[2]) == 2:
                wtr.write(bm[int(b[y, x])], 1)
    body = b"\x2f" + wtr.flush()
    chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


# ------------------------------------------------------------ lossy VP8


def decode_webp(payload: bytes) -> Optional["np.ndarray"]:
    """Decode a WebP container -> HxWx3 uint8: VP8L via the lossless
    decoder above, lossy 'VP8 ' key frames via ``ops/vp8.py`` (pure
    numpy RFC 6386 decode). For lossy frames with FLAT chroma (U=V=128,
    what the gate corpus emits) the output is exactly gray Y; otherwise
    the YUV->RGB step uses the standard BT.601 full-range float formula
    (documented approximation — the VP8 payload decode itself is exact,
    the colorspace conversion is not part of RFC 6386)."""
    hdr = parse_webp_header(payload)
    if hdr is None:
        return None
    if hdr[2] == "vp8l":
        return decode_webp_lossless(payload)
    from schema_fantasy_spark.ops.vp8 import decode_vp8_frame

    out = decode_vp8_frame(payload[20:])
    if out is None:
        return None
    y, u, v = out
    h, w = y.shape
    if (u == 128).all() and (v == 128).all():
        return np.repeat(y[:, :, None], 3, axis=2)
    uf = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w].astype(np.float64) - 128
    vf = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w].astype(np.float64) - 128
    yf = y.astype(np.float64)
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


def encode_webp_lossy_bpred(
    width: int, height: int, level_top: int, level_bottom_rel: int
) -> bytes:
    """RIFF/WEBP container around an all-B_PRED lossy key frame: every
    sub-block B_TM_PRED, a DC residual ``level_top`` on the first
    sub-block and ``level_bottom_rel`` on the second MB row's first
    sub-block. TM propagates the shifted edges unchanged, so the frame
    is EXACTLY two-tone on the 16-row boundary: top rows
    clamp(129 + (level_top*dc_q + 4 >> 3)), lower rows that plus
    (level_bottom_rel*dc_q + 4 >> 3) — the oracle-replayable contract
    for the gated corpus's B_PRED family (and the path is bit-exact vs
    libwebp, tests/test_vp8.py)."""
    from schema_fantasy_spark.ops.vp8 import B_TM_PRED, encode_vp8_key_bpred

    def lvl(mb_r, mb_c, sb):
        if (mb_r, mb_c, sb) == (0, 0, 0):
            return level_top
        if (mb_r, mb_c, sb) == (1, 0, 0):
            return level_bottom_rel
        return 0

    frame = encode_vp8_key_bpred(
        width, height, lambda r, c, s: B_TM_PRED, lvl)
    chunk = b"VP8 " + len(frame).to_bytes(4, "little") + frame
    if len(frame) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def encode_webp_lossy_two_tone(
    width: int, height: int, delta_top: int, delta_bottom_rel: int
) -> bytes:
    """RIFF/WEBP container around a minimal lossy VP8 key frame (see
    ``ops/vp8.encode_vp8_key_two_tone``): gray two-tone split on the
    16-row MB boundary, exact integer reconstruction."""
    from schema_fantasy_spark.ops.vp8 import encode_vp8_key_two_tone

    frame = encode_vp8_key_two_tone(width, height, delta_top, delta_bottom_rel)
    chunk = b"VP8 " + len(frame).to_bytes(4, "little") + frame
    if len(frame) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body
