"""VP8L (WebP lossless) decoder tests.

The shipped encoder only emits SIMPLE prefix codes (two-tone corpus),
so every other decoder path is exercised by GOLDEN STREAMS assembled
bit-by-bit here with an INDEPENDENT LSB-first writer and an independent
canonical-code builder: normal (code-length-coded) prefix codes with
and without max_symbol, zero-run repeats, LZ77 backward references with
linear distances, the color cache, and all four transforms.
"""

import numpy as np
import pytest

from schema_fantasy_spark.ops.webp import (
    CODE_LENGTH_ORDER,
    decode_webp_lossless,
    encode_webp_lossless_two_tone,
    parse_webp_header,
)


class W:
    """Independent LSB-first bit writer (mirrors the spec, not the module)."""

    def __init__(self):
        self.bits = []

    def put(self, value, n):
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def put_code(self, code, length):
        # prefix codes walk MSB-of-code first
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self):
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for j, bit in enumerate(self.bits[i : i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


def canonical(lengths_map):
    """{symbol: length} -> {symbol: (code, length)}, canonical order."""
    items = sorted(lengths_map.items())
    max_len = max(lengths_map.values())
    bl = [0] * (max_len + 1)
    for _, l in items:
        bl[l] += 1
    code = 0
    next_code = {}
    for l in range(1, max_len + 1):
        code = (code + bl[l - 1]) << 1
        next_code[l] = code
    out = {}
    for s, l in sorted(items, key=lambda kv: (kv[1], kv[0])):
        pass
    # canonical: by (length asc? no — by symbol order within the run of
    # each length, lengths processed ascending over symbol order)
    out = {}
    codes = dict(next_code)
    for s, l in items:  # symbol order; code assignment per length
        out[s] = (codes[l], l)
        codes[l] += 1
    return out


def complete_lengths(symbols):
    """Equal-ish lengths forming a COMPLETE code over the symbol set."""
    k = len(symbols)
    if k == 1:
        return {symbols[0]: 1}
    L = max(1, (k - 1).bit_length())
    n_short = (1 << L) - k  # symbols at length L-1
    out = {}
    for i, s in enumerate(sorted(symbols)):
        out[s] = (L - 1) if i < n_short and L > 1 else L
    return out


def write_simple(w, syms):
    w.put(1, 1)
    w.put(len(syms) - 1, 1)
    w.put(1, 1)  # 8-bit first symbol
    w.put(syms[0], 8)
    if len(syms) == 2:
        w.put(syms[1], 8)


def write_normal(w, alphabet_size, lengths_map, use_max=False):
    """Emit a code-length-coded prefix code for {symbol: length}.

    ``use_max=True`` emits the max_symbol field set to the CL-symbol
    COUNT (libwebp semantics: the bound counts decoded code-length
    symbols, a repeat run counting as one) so trailing zeros need no
    transmission; otherwise trailing zero runs pad the full alphabet."""

    def zero_runs(stream, gap):
        while gap > 0:
            if gap < 3:
                for _ in range(gap):
                    stream.append((0, None, 0))
                gap = 0
            elif gap <= 10:
                stream.append((17, gap - 3, 3))
                gap = 0
            else:
                run = min(gap, 138)
                stream.append((18, run - 11, 7))
                gap -= run

    used = sorted(lengths_map)
    stream = []  # (cl_symbol, extra_value, extra_bits)
    pos = 0
    for s in used:
        zero_runs(stream, s - pos)
        stream.append((lengths_map[s], None, 0))
        pos = s + 1
    if not use_max:
        zero_runs(stream, alphabet_size - pos)
    cl_used = sorted({cl for cl, _, _ in stream})
    cl_lengths = complete_lengths(cl_used)
    cl_codes = canonical(cl_lengths)
    num_codes = max(CODE_LENGTH_ORDER.index(s) for s in cl_used) + 1
    w.put(0, 1)  # normal code
    w.put(num_codes - 4, 4)
    for i in range(num_codes):
        w.put(cl_lengths.get(CODE_LENGTH_ORDER[i], 0), 3)
    if not use_max:
        w.put(0, 1)
    else:
        w.put(1, 1)
        max_symbol = len(stream)
        # length_nbits = 2 + 2*read(3): pick the smallest that fits
        for k in range(8):
            nbits = 2 + 2 * k
            if max_symbol - 2 < (1 << nbits):
                w.put(k, 3)
                w.put(max_symbol - 2, nbits)
                break
    for cl, extra, ebits in stream:
        c, l = cl_codes[cl]
        w.put_code(c, l)
        if ebits:
            w.put(extra, ebits)
    return canonical(lengths_map)


def wrap_vp8l(bit_writer) -> bytes:
    body = b"\x2f" + bit_writer.bytes()
    chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def header(w_, width, height):
    w_.put(width - 1, 14)
    w_.put(height - 1, 14)
    w_.put(0, 1)  # alpha hint
    w_.put(0, 3)  # version


SINGLE_DIST = [0]


def test_webp_two_tone_roundtrip_exact():
    img = np.empty((16, 13, 3), np.uint8)
    img[:8] = (200, 30, 90)
    img[8:] = (55, 225, 165)
    enc = encode_webp_lossless_two_tone(img)
    assert parse_webp_header(enc) == (13, 16, "vp8l")
    dec = decode_webp_lossless(enc)
    assert dec is not None and (dec == img).all()


def test_webp_golden_normal_code_with_max_symbol():
    """2x2 four-gray image: the green code uses the full code-length-code
    machinery (zero runs + max_symbol bound); other channels simple."""
    w = W()
    header(w, 2, 2)
    w.put(0, 1)  # no transforms
    w.put(0, 1)  # no cache
    w.put(0, 1)  # no meta
    codes = write_normal(w, 280, {10: 2, 20: 2, 30: 2, 40: 2}, use_max=True)
    write_simple(w, [1])    # red
    write_simple(w, [2])    # blue
    write_simple(w, [255])  # alpha
    write_simple(w, SINGLE_DIST)
    for g in (10, 20, 30, 40):
        c, l = codes[g]
        w.put_code(c, l)
    dec = decode_webp_lossless(wrap_vp8l(w))
    assert dec is not None
    assert dec[:, :, 1].tolist() == [[10, 20], [30, 40]]
    assert (dec[:, :, 0] == 1).all() and (dec[:, :, 2] == 2).all()


def test_webp_golden_lz77_linear_distance():
    """8x1 image ABABABAB: two literals + a length-6 copy at distance 2
    (linear distance code 122 -> dist 2)."""
    w = W()
    header(w, 8, 1)
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 1)
    codes = write_normal(w, 280, {10: 1, 20: 2, 260: 2})
    write_simple(w, [1])
    write_simple(w, [2])
    write_simple(w, [255])
    write_simple(w, [13])  # distance prefix symbol 13: values 97..128
    c, l = codes[10]
    w.put_code(c, l)
    c, l = codes[20]
    w.put_code(c, l)
    c, l = codes[260]  # length code 4 -> value 5 + extra bit
    w.put_code(c, l)
    w.put(1, 1)        # extra: length = 6
    w.put(25, 5)       # distance extra: 96 + 25 + 1 = 122 -> dist 2
    dec = decode_webp_lossless(wrap_vp8l(w))
    assert dec is not None
    assert dec[0, :, 1].tolist() == [10, 20, 10, 20, 10, 20, 10, 20]


def test_webp_golden_color_cache():
    """3x1 image A B A where the third pixel is a color-cache hit."""
    A = (0xFF << 24) | (1 << 16) | (10 << 8) | 2
    B = (0xFF << 24) | (1 << 16) | (20 << 8) | 2
    bits = 4

    def slot(px):
        return ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - bits)

    assert slot(A) != slot(B)
    w = W()
    header(w, 3, 1)
    w.put(0, 1)        # no transforms
    w.put(1, 1)        # cache on
    w.put(bits, 4)
    w.put(0, 1)        # no meta
    cache_sym = 256 + 24 + slot(A)
    codes = write_normal(w, 256 + 24 + (1 << bits), {10: 1, 20: 2, cache_sym: 2})
    write_simple(w, [1])
    write_simple(w, [2])
    write_simple(w, [255])
    write_simple(w, SINGLE_DIST)
    for s in (10, 20, cache_sym):
        c, l = codes[s]
        w.put_code(c, l)
    dec = decode_webp_lossless(wrap_vp8l(w))
    assert dec is not None
    assert dec[0, :, 1].tolist() == [10, 20, 10]


def test_webp_golden_subtract_green():
    """2x1 stream with the subtract-green transform: stored r/b have the
    green channel subtracted; the inverse must restore the originals."""
    true_px = [(100, 10, 200), (5, 250, 30)]  # (r, g, b)
    w = W()
    header(w, 2, 1)
    w.put(1, 1)  # transform present
    w.put(2, 2)  # subtract green
    w.put(0, 1)  # no more transforms
    w.put(0, 1)  # no cache
    w.put(0, 1)  # no meta
    greens = [g for _, g, _ in true_px]
    reds = [(r - g) % 256 for r, g, _ in true_px]
    blues = [(b - g) % 256 for _, g, b in true_px]
    gc = write_normal(w, 280, complete_lengths(sorted(set(greens))))
    write_simple(w, sorted(set(reds)))
    write_simple(w, sorted(set(blues)))
    write_simple(w, [255])
    write_simple(w, SINGLE_DIST)
    rmap = {v: i for i, v in enumerate(sorted(set(reds)))}
    bmap = {v: i for i, v in enumerate(sorted(set(blues)))}
    for (r, g, b) in true_px:
        c, l = gc[g]
        w.put_code(c, l)
        w.put(rmap[(r - g) % 256], 1)
        w.put(bmap[(b - g) % 256], 1)
    dec = decode_webp_lossless(wrap_vp8l(w))
    assert dec is not None
    assert [tuple(dec[0, x]) for x in range(2)] == true_px


def test_webp_golden_predictor_top_mode():
    """4x2 constant image through predictor mode 2 (TOP), one block:
    only the first pixel carries a nonzero residual."""
    v = 77
    w = W()
    header(w, 4, 2)
    w.put(1, 1)  # transform
    w.put(0, 2)  # predictor
    w.put(0, 3)  # size_bits = 2 -> one 4x4 block covers 4x2
    # predictor subimage 1x1: green = mode 2
    w.put(0, 1)  # (subimage) no cache
    write_simple(w, [2])    # green = mode
    write_simple(w, [0])
    write_simple(w, [0])
    write_simple(w, [255])
    write_simple(w, SINGLE_DIST)
    w.put(0, 1)  # main: no more transforms
    w.put(0, 1)  # no cache
    w.put(0, 1)  # no meta
    write_simple(w, [0, v])   # green residuals {0, v}
    write_simple(w, [0, v])   # red
    write_simple(w, [0, v])   # blue
    write_simple(w, [0])      # alpha residual always 0
    write_simple(w, SINGLE_DIST)
    for pos in range(8):
        first = pos == 0
        w.put(1 if first else 0, 1)  # green: v for (0,0), else 0
        w.put(1 if first else 0, 1)  # red
        w.put(1 if first else 0, 1)  # blue
    dec = decode_webp_lossless(wrap_vp8l(w))
    assert dec is not None
    assert (dec == v).all()


def test_webp_golden_palette_packed():
    """8x2 two-color image via the color-indexing transform with 8
    indices packed per byte (wbits=3); rows 0x55 / 0xAA alternate."""
    C0 = (10, 20, 30)
    C1 = (200, 210, 220)
    w = W()
    header(w, 8, 2)
    w.put(1, 1)  # transform
    w.put(3, 2)  # color indexing
    w.put(1, 8)  # n_colors - 1 = 1
    # palette subimage 2x1, delta-coded: C0 then C1-C0 per channel
    d = tuple((b - a) % 256 for a, b in zip(C0, C1))
    w.put(0, 1)  # (subimage) no cache
    write_simple(w, sorted({C0[1], d[1]}))
    write_simple(w, sorted({C0[0], d[0]}))
    write_simple(w, sorted({C0[2], d[2]}))
    write_simple(w, [255, 0][:2] if True else [255])  # alphas {255, 0}
    write_simple(w, SINGLE_DIST)
    gm = {v: i for i, v in enumerate(sorted({C0[1], d[1]}))}
    rm = {v: i for i, v in enumerate(sorted({C0[0], d[0]}))}
    bm = {v: i for i, v in enumerate(sorted({C0[2], d[2]}))}
    am = {255: None, 0: None}
    amap = {v: i for i, v in enumerate(sorted({255, 0}))}
    for (rr, gg, bb, aa) in [(C0[0], C0[1], C0[2], 255), (d[0], d[1], d[2], 0)]:
        w.put(gm[gg], 1)
        w.put(rm[rr], 1)
        w.put(bm[bb], 1)
        w.put(amap[aa], 1)
    # main packed image: w=1, h=2; green bytes 0xAA row0, 0x55 row1
    w.put(0, 1)  # no more transforms
    w.put(0, 1)  # no cache
    w.put(0, 1)  # no meta
    write_simple(w, [0x55, 0xAA])
    write_simple(w, [0])
    write_simple(w, [0])
    write_simple(w, [255])
    write_simple(w, SINGLE_DIST)
    w.put(1, 1)  # row0 green = 0xAA (second symbol)
    w.put(0, 1)  # row1 green = 0x55
    dec = decode_webp_lossless(wrap_vp8l(w))
    assert dec is not None
    # bit k of 0xAA: even k -> 0 (C0), odd k -> 1 (C1)
    assert tuple(dec[0, 0]) == C0 and tuple(dec[0, 1]) == C1
    assert tuple(dec[1, 0]) == C1 and tuple(dec[1, 1]) == C0
    assert [tuple(dec[0, x]) for x in range(8)] == [C0, C1] * 4


def test_webp_decoder_survives_fuzz():
    import random

    rng = random.Random(31)
    img = np.empty((8, 8, 3), np.uint8)
    img[:4] = 10
    img[4:] = 245
    enc = bytearray(encode_webp_lossless_two_tone(img))
    for _ in range(150):
        mut = bytearray(enc)
        for _ in range(rng.randint(1, 5)):
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
        decode_webp_lossless(bytes(mut))  # None or image; no hang/raise
    for _ in range(100):
        n = rng.randint(0, 60)
        decode_webp_lossless(
            b"RIFF" + bytes(rng.getrandbits(8) for _ in range(n))
        )
