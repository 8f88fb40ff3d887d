"""VP8 lossy key-frame codec (ops/vp8.py): boolean coder round-trips,
exact two-tone reconstruction, container routing, robustness."""

import random

import numpy as np
import pytest

from schema_fantasy_spark.ops import vp8


def test_bool_coder_random_roundtrip():
    """The arithmetic encoder/decoder pair is exact over random
    bit/probability sequences (incl. extreme probs and carry chains)."""
    rng = random.Random(1234)
    for trial in range(300):
        n = rng.randint(1, 500)
        if trial % 3 == 0:
            seq = [(rng.randint(0, 1), rng.choice([1, 2, 254, 255]))
                   for _ in range(n)]  # extreme probs stress carries
        else:
            seq = [(rng.randint(0, 1), rng.randint(1, 255)) for _ in range(n)]
        enc = vp8.BoolEncoder()
        for bit, prob in seq:
            enc.put(bit, prob)
        dec = vp8.BoolDecoder(enc.flush())
        for i, (bit, prob) in enumerate(seq):
            assert dec.get(prob) == bit, (trial, i)


def test_bool_coder_literals_and_trees():
    enc = vp8.BoolEncoder()
    enc.put_literal(0b1011001, 7)
    enc.put_tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROBS, vp8.V_PRED)
    enc.put_tree(vp8.UV_MODE_TREE, vp8.KF_UV_MODE_PROBS, vp8.TM_PRED)
    enc.put_literal(200, 8)
    dec = vp8.BoolDecoder(enc.flush())
    assert dec.literal(7) == 0b1011001
    assert dec.tree(vp8.KF_YMODE_TREE, vp8.KF_YMODE_PROBS) == vp8.V_PRED
    assert dec.tree(vp8.UV_MODE_TREE, vp8.KF_UV_MODE_PROBS) == vp8.TM_PRED
    assert dec.literal(8) == 200


def test_inverse_transforms_dc_only():
    """DC-only inputs follow the closed-form integer chains the corpus
    (and the DuckDB oracle) rely on."""
    for dc in (-117, -8, 0, 5, 96, 250):
        wht = vp8.inv_walsh4x4([dc] + [0] * 15)
        assert wht == [(dc + 3) >> 3] * 16
        out = vp8.inv_dct4x4([dc] + [0] * 15)
        assert (out == ((dc + 4) >> 3)).all()
    # level_for_delta inverts vp8_dc_delta at qi=0 for any sign
    for d in range(-100, 101):
        assert vp8.vp8_dc_delta(vp8.level_for_delta(d)) == d


@pytest.mark.parametrize(
    "w,h,delta", [(18, 32, 20), (16, 32, -30), (5, 32, 77), (19, 16, 12), (33, 48, -1)]
)
def test_two_tone_frame_exact(w, h, delta):
    ta = 128 + delta
    dbrel = 255 - 2 * ta
    frame = vp8.encode_vp8_key_two_tone(w, h, ta - 128, dbrel)
    out = vp8.decode_vp8_frame(frame)
    assert out is not None
    y, u, v = out
    assert y.shape == (h, w)
    assert (y[:16] == ta).all()
    if h >= 32:
        assert (y[16:32] == 255 - ta).all()
        if h > 32:  # V_PRED propagates the last region tone downward
            assert (y[32:] == 255 - ta).all()
    assert (u == 128).all() and (v == 128).all()


def test_large_level_cat_tokens():
    """|level| beyond the small tokens exercises cat1-cat6 extra bits."""
    for delta in (-90, 60, 127, -128):
        frame = vp8.encode_vp8_key_two_tone(16, 16, delta, 0)
        y, _, _ = vp8.decode_vp8_frame(frame)
        assert (y == np.clip(128 + delta, 0, 255)).all(), delta


def test_decode_rejects_and_robustness():
    full = vp8.encode_vp8_key_two_tone(18, 32, 20, -40)
    # truncation never raises
    for cut in range(0, len(full), 3):
        vp8.decode_vp8_frame(full[:cut])
    assert vp8.decode_vp8_frame(b"") is None
    assert vp8.decode_vp8_frame(b"garbage stream!!") is None
    # inter-frame tag bit set -> rejected (out of scope, not misdecoded)
    inter = bytearray(full)
    inter[0] |= 1
    assert vp8.decode_vp8_frame(bytes(inter)) is None
    # bad sync code
    bad = bytearray(full)
    bad[3] = 0x00
    assert vp8.decode_vp8_frame(bytes(bad)) is None


def test_webp_container_lossy_roundtrip():
    from schema_fantasy_spark.ops.webp import (
        decode_webp,
        encode_webp_lossy_two_tone,
        parse_webp_header,
    )

    pl = encode_webp_lossy_two_tone(18, 32, 25, 255 - 2 * 153)
    assert parse_webp_header(pl) == (18, 32, "vp8")
    px = decode_webp(pl)
    assert px.shape == (32, 18, 3)
    assert (px[:16] == 153).all() and (px[16:] == 102).all()
    # multimodal generic router takes the same path
    from schema_fantasy_spark.ops.multimodal import decode_image_pixels

    px2 = decode_image_pixels(pl)
    assert (px2 == px).all()


def test_loop_filter_flat_identity():
    """The in-loop filter is an identity on flat content at any level,
    for both normal and simple variants."""
    from schema_fantasy_spark.ops import vp8

    for ft in (0, 1):
        for lvl in (0, 10, 25, 63):
            fr = vp8.encode_vp8_key_two_tone(
                32, 16, 30, 0, filter_level=lvl, sharpness=0, filter_type=ft
            )
            y, u, v = vp8.decode_vp8_frame(fr)
            assert (y == 158).all(), (ft, lvl)
            assert (u == 128).all() and (v == 128).all()


def test_loop_filter_edge_preservation_and_smoothing():
    from schema_fantasy_spark.ops import vp8

    # large step at the MB boundary, small level: the mask fails and the
    # edge is preserved exactly
    fr = vp8.encode_vp8_key_two_tone(16, 32, 100, -200, filter_level=4)
    y, _, _ = vp8.decode_vp8_frame(fr)
    assert (y[:16] == 228).all() and (y[16:] == 28).all()

    # small step, big level: the normal MB filter applies the exact
    # RFC 15.3 arithmetic. Hand derivation for p=2,q=-2 (signed):
    # w = clamp(clamp(p1-q1) + 3(q0-p0)) = -8; 27w+63>>7 = -2 ->
    # P0/Q0 -> 128; 18w+63>>7 = -1 -> P1=129,Q1=127; 9w+63>>7 = -1 ->
    # P2=129,Q2=127. Rows 13..18 read 129,129,128,128,127,127.
    fr1 = vp8.encode_vp8_key_two_tone(16, 32, 2, -4, filter_level=40)
    y1, _, _ = vp8.decode_vp8_frame(fr1)
    assert (y1[:13] == 130).all() and (y1[19:] == 126).all()
    col = [int(y1[r, 0]) for r in range(13, 19)]
    assert col == [129, 129, 128, 128, 127, 127], col
    # every column is filtered identically
    assert (y1 == y1[:, :1]).all()


def test_loop_filter_simple_variant_y_only():
    from schema_fantasy_spark.ops import vp8

    fr = vp8.encode_vp8_key_two_tone(16, 32, 2, -4, filter_level=40,
                                     filter_type=1)
    y, u, v = vp8.decode_vp8_frame(fr)
    # simple filter: only p0/q0 adjust (common_adjust with outer taps):
    # a = clamp(clamp(p1-q1) + 3(q0-p0)) = -8; F = (a+4)>>3 = -1;
    # E = (a+3)>>3 = -1 -> Q0 = -2+1 = -1 -> 127, P0 = 2-1 = 1 -> 129
    col = [int(y[r, 0]) for r in range(13, 19)]
    assert col == [130, 130, 129, 127, 126, 126], col
    assert (u == 128).all() and (v == 128).all()


def test_libwebp_reference_cross_decode():
    """GROUND-TRUTH check: frames from our encoder decode bit-identically
    through Google's libwebp (ctypes, tests/_libwebp.py) AND through our
    decoder — cross-validating the boolean coder, header layout, the
    extracted probability tables (ops/vp8_tables.py), token bands (the
    tokens-read band indexing), dequant int16 wrap, inverse transforms,
    prediction, and BOTH loop-filter variants against the reference
    codec rather than only our own round-trip."""
    import pytest

    from _libwebp import load_libwebp, reference_decode_yuv, wrap_vp8_container

    if load_libwebp() is None:
        pytest.skip("libwebp shared library not available")
    cases = [
        (32, 32, 40, -30, 0, 0, 0, 0),    # unfiltered
        (48, 32, -50, 90, 10, 35, 3, 0),  # normal filter + sharpness
        (32, 32, 60, -80, 0, 63, 0, 0),   # max filter level
        (48, 48, 25, 50, 5, 40, 7, 1),    # simple filter + max sharpness
        (33, 17, 25, 10, 80, 12, 1, 0),   # odd crop dims, high qi
        (64, 32, -20, 100, 40, 31, 2, 0), # int16 coefficient wrap
        (32, 32, 100, -100, 127, 63, 7, 1),  # extreme qi + wrap
    ]
    for (w, h, dt, db, qi, fl, sh, ft) in cases:
        frame = vp8.encode_vp8_key_two_tone(
            w, h, dt, db, qi=qi, filter_level=fl, sharpness=sh, filter_type=ft
        )
        ours = vp8.decode_vp8_frame(frame)
        ref = reference_decode_yuv(wrap_vp8_container(frame))
        assert ours is not None
        for name, a, b in zip("yuv", ours, ref):
            assert (a == b).all(), (w, h, dt, db, qi, fl, sh, ft, name)


def test_bpred_roundtrip_all_submodes():
    """Our encoder/decoder pair round-trips every sub-mode family and
    mixed frames exactly (no reference needed — pure self-consistency;
    the libwebp test below adds the external ground truth)."""
    for m in range(10):
        f = vp8.encode_vp8_key_bpred(48, 48, lambda r, c, s, m=m: m,
                                     lambda r, c, s: 0)
        assert vp8.decode_vp8_frame(f) is not None
    # all-B_TM with a DC residual only on sub-block 0: closed-form
    # uniform tone clamp(129 + (level*dc_q + 4 >> 3)) (TM propagates
    # the shifted edge unchanged) — the gate corpus contract
    for level, qi in [(13, 0), (-9, 0), (25, 12)]:
        f = vp8.encode_vp8_key_bpred(
            48, 48, lambda r, c, s: vp8.B_TM_PRED,
            lambda r, c, s, lv=level: lv if (r, c, s) == (0, 0, 0) else 0,
            qi=qi)
        y, u, v = vp8.decode_vp8_frame(f)
        dq = vp8.frame_quants(qi, 0, 0, 0, 0, 0)[0]  # y1 dc quantizer
        tone = min(255, max(0, 129 + ((level * dq + 4) >> 3)))
        assert (y == tone).all(), (level, qi, tone, y[0, 0])
        assert (u == 128).all() and (v == 128).all()


def test_bpred_libwebp_cross_decode():
    """B_PRED ground truth: all ten sub-modes, mixed-mode frames with
    residuals, mixed B_PRED/16x16 macroblocks (implied sub-mode
    contexts), skip-context semantics, loop filters, odd crops — every
    frame decodes bit-identically through libwebp and through us."""
    import pytest

    from _libwebp import load_libwebp, reference_decode_yuv, wrap_vp8_container

    if load_libwebp() is None:
        pytest.skip("libwebp shared library not available")

    def assert_exact(frame, label):
        ours = vp8.decode_vp8_frame(frame)
        ref = reference_decode_yuv(wrap_vp8_container(frame))
        assert ours is not None, label
        for name, a, b in zip("yuv", ours, ref):
            assert (a == b).all(), (label, name)

    for m in range(10):
        assert_exact(vp8.encode_vp8_key_bpred(
            48, 48, lambda r, c, s, m=m: m, lambda r, c, s: 0),
            f"pure sub-mode {m}")

    mix = lambda r, c, s: (r * 7 + c * 3 + s) % 10
    lvl = lambda r, c, s: ((r + c + s) % 5) - 2
    assert_exact(vp8.encode_vp8_key_bpred(64, 48, mix, lvl), "mixed+residuals")
    assert_exact(vp8.encode_vp8_key_bpred(64, 48, mix, lvl, filter_level=20),
                 "mixed+normal filter")
    assert_exact(vp8.encode_vp8_key_bpred(
        64, 48, mix, lvl, filter_level=25, filter_type=1, sharpness=2),
        "mixed+simple filter")
    assert_exact(vp8.encode_vp8_key_bpred(33, 17, mix, lvl, qi=30), "odd crop")
    # rightmost-column above-right replication (B_LD reads it)
    assert_exact(vp8.encode_vp8_key_bpred(
        48, 48, lambda r, c, s: vp8.B_LD_PRED,
        lambda r, c, s: 9 if r == 0 else 0), "last-col above-right")

    # mixed B_PRED / 16x16 MBs: implied sub-mode contexts + the
    # interior-deblock nonzero predicate (the TM MB has ZERO coeffs
    # while unskipped - its interior edges must not filter)
    def mbf(r, c):
        k = (r * 3 + c) % 6
        if k < 2:
            return ("b", [(r + c + s) % 10 for s in range(16)],
                    [((s + r) % 4) - 1 for s in range(16)], False)
        if k == 2:
            return (vp8.DC_PRED, 11, False)
        if k == 3:
            return (vp8.V_PRED, -6, False)
        if k == 4:
            return (vp8.TM_PRED, 0, False)
        return (vp8.H_PRED, 4, False)
    assert_exact(vp8.encode_vp8_key_mixed(96, 64, mbf), "mixed MB types")
    assert_exact(vp8.encode_vp8_key_mixed(96, 64, mbf, filter_level=28,
                                          sharpness=1), "mixed MBs + filter")
    assert_exact(vp8.encode_vp8_key_mixed(96, 64, mbf, filter_level=63,
                                          sharpness=4), "mixed MBs maxfilter")

    # Y2 context survives a SKIPPED B_PRED MB but resets on 16x16 skip
    bp_skip = ("b", [vp8.B_TM_PRED] * 16, [0] * 16, True)
    assert_exact(vp8.encode_vp8_key_mixed(
        96, 32, lambda r, c: bp_skip if c % 3 == 1 else (vp8.DC_PRED, 7, False)),
        "y2 ctx across B_PRED skip")
    assert_exact(vp8.encode_vp8_key_mixed(
        96, 32, lambda r, c: (vp8.V_PRED, 0, True) if c % 3 == 1
        else (vp8.DC_PRED, 9, False)), "y2 ctx reset on 16x16 skip")


def test_full_envelope_libwebp_cross_decode():
    """The complete key-frame envelope — segmentation (abs + delta
    modes, per-segment quantizer and filter overrides, coded segment
    map), loop-filter ref/mode deltas, and multi-partition token
    streams (2/4/8) — decodes bit-identically through libwebp. Real
    cwebp output enables segmentation by default, so this is the
    coverage that makes arbitrary crawl WebP decodable."""
    import pytest

    from _libwebp import load_libwebp, reference_decode_yuv, wrap_vp8_container

    if load_libwebp() is None:
        pytest.skip("libwebp shared library not available")

    def assert_exact(frame, label):
        ours = vp8.decode_vp8_frame(frame)
        ref = reference_decode_yuv(wrap_vp8_container(frame))
        assert ours is not None, label
        for name, a, b in zip("yuv", ours, ref):
            assert (a == b).all(), (label, name)

    def mbf(r, c):
        k = (r * 3 + c) % 6
        if k < 2:
            return ("b", [(r + c + s) % 10 for s in range(16)],
                    [((s + r) % 4) - 1 for s in range(16)], False)
        if k == 2:
            return (vp8.DC_PRED, 11, False)
        if k == 3:
            return (vp8.V_PRED, -6, False)
        if k == 4:
            return (vp8.TM_PRED, 0, False)
        return (vp8.H_PRED, 4, False)

    segs = {"abs": False, "q": [0, 8, -6, 20], "lf": [0, 5, -10, 15],
            "map_fn": lambda r, c: (r + 2 * c) % 4}
    segs_abs = {"abs": True, "q": [10, 40, 70, 110], "lf": [0, 12, 30, 55],
                "map_fn": lambda r, c: (r * 3 + c) % 4}
    cases = [
        ("seg delta, filter off (level-0 disables the whole filter)",
         dict(qi=20, segments=segs)),
        ("seg delta + filter", dict(qi=20, filter_level=24, sharpness=1,
                                    segments=segs)),
        ("seg abs + filter", dict(qi=20, filter_level=30, segments=segs_abs)),
        ("lf deltas", dict(filter_level=25,
                           lf_deltas={"ref0": 9, "mode0": -12})),
        ("token partitions x4", dict(n_token_parts=4)),
        ("token partitions x8", dict(n_token_parts=8)),
        ("everything at once", dict(qi=15, filter_level=26, sharpness=2,
                                    segments=segs,
                                    lf_deltas={"ref0": 6, "mode0": -4},
                                    n_token_parts=4)),
        ("everything + simple filter", dict(qi=15, filter_level=18,
                                            filter_type=1, segments=segs,
                                            lf_deltas={"ref0": -3, "mode0": 7},
                                            n_token_parts=2)),
    ]
    for label, kw in cases:
        assert_exact(vp8.encode_vp8_key_mixed(96, 64, mbf, **kw), label)
