"""GIF codec (ops/gif.py): encoder/decoder round trips plus the block
and LZW edge cases a crawl corpus hits — interlace, transparency
compositing, local color tables, frame offsets, dictionary growth to
the 4096-entry cap with explicit resets, KwKwK, truncation quarantine,
and the mm_corpus family contract (two-tone GIF rows decode to exactly
the same pixels as their ppm siblings)."""

import numpy as np
import pytest

from schema_fantasy_spark.ops import gif, mm_corpus, multimodal


def _random_paletted(seed, h, w, ncolors):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (ncolors, 3), dtype=np.uint8)
    return pal[rng.randint(0, ncolors, (h, w))]


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("version", [b"87a", b"89a"])
def test_round_trip(interlace, version):
    px = _random_paletted(3, 23, 37, 5)
    b = gif.encode_gif_rgb(px, interlace=interlace, version=version)
    assert b[:6] == b"GIF" + version
    out = gif.decode_gif(b)
    assert out is not None and np.array_equal(out, px)
    assert gif.parse_gif_header(b) == (37, 23, 1)


def test_two_tone_round_trip_all_corpus_dims():
    # every (w, h) the gate corpus generates, palette of exactly 2
    for w in range(4, 20):
        for h in (8, 16, 24):
            px = np.empty((h, w, 3), dtype=np.uint8)
            px[: h // 2] = (200, 30, 99)
            px[h // 2:] = (55, 225, 156)
            for interlace in (False, True):
                out = gif.decode_gif(gif.encode_gif_rgb(px, interlace=interlace))
                assert np.array_equal(out, px), (w, h, interlace)


def test_256_colors_dictionary_reset():
    # 256-color 128x128: 8-bit min code size, LZW table fills past
    # 4096 and resets mid-stream — decode must stay bit-exact
    base = np.arange(256, dtype=np.uint8).repeat(3).reshape(16, 16, 3)
    px = np.tile(base, (8, 8, 1))
    out = gif.decode_gif(gif.encode_gif_rgb(px))
    assert np.array_equal(out, px)


def test_kwkwk_case():
    # aaa...a produces the code-equals-next-entry (KwKwK) path
    px = np.zeros((4, 64, 3), dtype=np.uint8)
    px[0, 0] = (255, 255, 255)  # two palette entries
    out = gif.decode_gif(gif.encode_gif_rgb(px))
    assert np.array_equal(out, px)


def test_transparency_composites_over_background():
    # palette[0] (unique-sort order: black) is the background; the
    # transparent color's pixels must read back as that background
    px = np.zeros((8, 8, 3), np.uint8)
    px[:4] = (200, 10, 10)
    out = gif.decode_gif(gif.encode_gif_rgb(px, transparent_rgb=(200, 10, 10)))
    assert np.array_equal(out, np.zeros((8, 8, 3), np.uint8))
    # and the non-transparent encoding keeps both tones
    out2 = gif.decode_gif(gif.encode_gif_rgb(px))
    assert np.array_equal(out2, px)


def test_frame_offset_blits_onto_background_canvas():
    px = np.full((6, 5, 3), 77, dtype=np.uint8)
    px[0, 0] = (1, 2, 3)
    b = gif.encode_gif_rgb(px, offset=(3, 2), screen=(12, 10))
    out = gif.decode_gif(b)
    assert out.shape == (10, 12, 3)
    assert np.array_equal(out[2:8, 3:8], px)
    # the rest of the canvas is palette[0] = unique-sorted first color
    pal0 = np.unique(px.reshape(-1, 3), axis=0)[0]
    assert (out[0] == pal0).all()
    assert gif.parse_gif_header(b) == (12, 10, 1)


def test_local_color_table_wins_over_global():
    # hand-build: GCT says red, LCT says blue — pixels must be blue
    pal = bytes([255, 0, 0, 0, 0, 0])      # GCT: red, black
    lct = bytes([0, 0, 255, 0, 0, 0])      # LCT: blue, black
    lzw = gif._lzw_encode(2, bytes(4))     # 2x2, all index 0
    data = (b"GIF89a" + (2).to_bytes(2, "little") * 2
            + bytes([0x80, 0, 0]) + pal
            + bytes([0x2C, 0, 0, 0, 0, 2, 0, 2, 0, 0x80]) + lct
            + bytes([2, len(lzw)]) + lzw + bytes([0, 0x3B]))
    out = gif.decode_gif(data)
    assert (out == (0, 0, 255)).all()


def test_multi_frame_returns_first_composited():
    f1 = np.full((4, 4, 3), 10, dtype=np.uint8)
    f2 = np.full((4, 4, 3), 200, dtype=np.uint8)
    b1 = gif.encode_gif_rgb(f1)
    b2 = gif.encode_gif_rgb(f2)
    # splice frame 2's descriptor+data before frame 1's trailer
    animated = b1[:-1] + b2[13 + 6:]  # drop b2's header+LSD+GCT(2 colors=6B)
    assert gif.parse_gif_header(animated) == (4, 4, 2)
    out = gif.decode_gif(animated)
    assert np.array_equal(out, f1)


def test_truncation_and_garbage_quarantine():
    b = gif.encode_gif_rgb(_random_paletted(1, 16, 16, 4))
    for cut in (5, 12, 20, len(b) // 2, len(b) - 2):
        assert gif.decode_gif(b[:cut]) is None
    assert gif.decode_gif(b"not a gif at all") is None
    assert gif.parse_gif_header(b"GIF89a") is None
    # palette index beyond the table must quarantine, not crash:
    # hand-build a 1x1 frame whose LZW stream emits literal 3 against
    # a 2-entry color table
    lzw = gif._lzw_encode(2, bytes([3]))
    bad = (b"GIF89a" + (1).to_bytes(2, "little") * 2
           + bytes([0x80, 0, 0]) + bytes(6)
           + bytes([0x2C, 0, 0, 0, 0, 1, 0, 1, 0, 0])
           + bytes([2, len(lzw)]) + lzw + bytes([0, 0x3B]))
    assert gif.decode_gif(bad) is None


def test_encoder_rejects_too_many_colors():
    rng = np.random.RandomState(0)
    px = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
    assert np.unique(px.reshape(-1, 3), axis=0).shape[0] > 256
    with pytest.raises(ValueError):
        gif.encode_gif_rgb(px)


def test_multimodal_dispatch():
    px = _random_paletted(9, 24, 17, 7)
    b = gif.encode_gif_rgb(px)
    assert multimodal.decode_image_header(b) == (17, 24, "gif")
    assert np.array_equal(multimodal.decode_image_pixels(b), px)


def test_corpus_gif_rows_match_ppm_siblings():
    # nibble-13-odd fsel==1 rows emit GIF; the decoded pixels must be
    # byte-identical to what the ppm encoding of the same row gives
    seen = 0
    for doc_id in range(400):
        nib = mm_corpus._nibbles(doc_id)
        fsel, w, h, color_a = mm_corpus.image_params(doc_id, nib)
        if fsel != 1 or nib[13] % 2 == 0:
            continue
        payload = mm_corpus._image_payload(doc_id)
        assert payload[:6] == b"GIF89a"
        px = multimodal.decode_image_pixels(payload)
        color_b = tuple(255 - c for c in color_a)
        exp = np.empty((h, w, 3), dtype=np.uint8)
        exp[: h // 2] = color_a
        exp[h // 2:] = color_b
        assert np.array_equal(px, exp), doc_id
        seen += 1
    assert seen > 10  # the family actually occurs
