"""FLAC STREAMINFO and Ogg (Opus/Vorbis) metadata walks
(ops/audio_formats.py): stub-encoder round trips, the RFC 3533 page
CRC actually gating corrupt pages, pre-skip subtraction per RFC 7845,
multi-lace packets, truncation quarantine, and the mm_corpus family
contract feeding the gated audio query."""

import numpy as np
import pytest

from schema_fantasy_spark.ops import audio_formats as af
from schema_fantasy_spark.ops import mm_corpus as mc


def test_flac_round_trip_bitfields():
    # 20-bit rate / 3-bit channels / 36-bit total boundaries
    for sr, nch, total in [(8000, 1, 0), (44100, 2, 123456),
                           (96000, 8, (1 << 36) - 1), (655350, 3, 7)]:
        b = af.encode_flac_stub(sr, nch, total)
        assert af.parse_flac_metadata(b) == (sr, nch, total, total / sr)


def test_flac_block_walk_and_truncation():
    b = af.encode_flac_stub(48000, 2, 1000)
    # the chain is STREAMINFO -> VORBIS_COMMENT -> PADDING(last):
    # cutting anywhere inside the chain must return None
    for cut in (3, 7, 20, 41, 60):
        assert af.parse_flac_metadata(b[:cut]) is None
    assert af.parse_flac_metadata(b"fLaC") is None
    assert af.parse_flac_metadata(b"OggS" + b[4:]) is None
    # zero sample rate is malformed
    bits = (0 << 44) | (1 << 41) | (15 << 36) | 100
    si = (4096).to_bytes(2, "big") * 2 + bytes(6) + bits.to_bytes(8, "big") + bytes(16)
    bad = b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + si
    assert af.parse_flac_metadata(bad) is None


@pytest.mark.parametrize("codec,sr,nch,n", [
    ("opus", 48000, 2, 96000),
    ("opus", 48000, 1, 0),
    ("vorbis", 22050, 1, 44100),
    ("vorbis", 11025, 2, 5128),
])
def test_ogg_round_trip(codec, sr, nch, n):
    b = af.encode_ogg_stub(codec, sr, nch, n)
    got = af.parse_ogg_metadata(b)
    assert got == (codec, sr if codec == "vorbis" else 48000, nch, n, n / (sr if codec == "vorbis" else 48000))


def test_ogg_pre_skip_subtracted():
    # RFC 7845 §4: playable samples = final granule - pre-skip
    b = af.encode_ogg_stub("opus", 48000, 2, 4800, pre_skip=120)
    assert af.parse_ogg_metadata(b)[3] == 4800


def test_ogg_crc_gates_corruption():
    b = bytearray(af.encode_ogg_stub("vorbis", 22050, 1, 1000))
    # flip one byte in the LAST page's body (granule carrier)
    b[-5] ^= 0x10
    assert af.parse_ogg_metadata(bytes(b)) is None
    # flip a byte inside a page HEADER (granule field) — CRC catches it
    b2 = bytearray(af.encode_ogg_stub("vorbis", 22050, 1, 1000))
    b2[7] ^= 1
    assert af.parse_ogg_metadata(bytes(b2)) is None


def test_ogg_truncation_and_missing_eos():
    b = af.encode_ogg_stub("opus", 48000, 2, 96000)
    for cut in (3, 10, 30, len(b) // 2, len(b) - 3):
        assert af.parse_ogg_metadata(b[:cut]) is None
    assert af.parse_ogg_metadata(b"not ogg") is None


def test_ogg_multi_lace_packet():
    # a >255-byte identification packet spans several lacing values
    big_comment = af._ogg_page(7, 1, 0, -1, bytes(700))
    assert big_comment[26] == 3  # 255+255+190
    ident = af._ogg_page(7, 0, 0x02, -1,
                         b"OpusHead" + bytes([1, 2]) + (0).to_bytes(2, "little")
                         + (48000).to_bytes(4, "little") + bytes(3))
    eos = af._ogg_page(7, 2, 0x04, 480, bytes(10))
    got = af.parse_ogg_metadata(ident + big_comment + eos)
    assert got == ("opus", 48000, 2, 480, 0.01)


def test_ogg_exact_255_multiple_lacing():
    # a 510-byte packet laces as 255,255,0 — the terminal 0 lace
    page = af._ogg_page(1, 0, 0, 0, bytes(510))
    assert page[26] == 3 and page[27:30] == bytes([255, 255, 0])


def test_corpus_families_round_trip():
    seen = {4: 0, 5: 0}
    for d in range(600):
        sr, nf, amp, corrupt, law = mc.audio_params(d)
        if law not in (4, 5):
            continue
        nib = mc._nibbles(d)
        p = mc._audio_payload(d)
        if corrupt:
            assert (af.parse_flac_metadata(p) is None
                    and af.parse_ogg_metadata(p) is None), d
            continue
        if law == 4:
            m = af.parse_flac_metadata(p)
            assert m == (sr, 1 + nib[11] % 2, nf, nf / sr), d
        else:
            m = af.parse_ogg_metadata(p)
            codec = "opus" if nib[13] % 2 == 0 else "vorbis"
            assert m == (codec, sr, 1 + nib[11] % 2, nf, nf / sr), d
        seen[law] += 1
    assert seen[4] > 20 and seen[5] > 20


def test_audio_metadata_dispatch(spark):
    rows = [(1, bytearray(af.encode_flac_stub(44100, 2, 44100))),
            (2, bytearray(af.encode_ogg_stub("opus", 48000, 1, 9600))),
            (3, bytearray(af.encode_ogg_stub("vorbis", 8000, 1, 4000))),
            (4, bytearray(b"fLaC truncated")),
            (5, bytearray(af.encode_ogg_stub("opus", 48000, 1, 9600)[:40]))]
    from schema_fantasy_spark.ops.multimodal import audio_metadata
    df = spark.createDataFrame(rows, "doc_id: long, payload: binary")
    got = {r["doc_id"]: r for r in
           audio_metadata(df, binary_col="payload", id_col="doc_id").collect()}
    assert set(got) == {1, 2, 3}  # corrupt rows quarantined
    assert (got[1]["sample_rate"], got[1]["n_frames"],
            got[1]["duration_sec"], got[1]["rms"]) == (44100, 44100, 1.0, None)
    assert (got[2]["sample_rate"], got[2]["n_frames"]) == (48000, 9600)
    assert got[2]["duration_sec"] == 0.2
    assert (got[3]["sample_rate"], got[3]["duration_sec"]) == (8000, 0.5)
