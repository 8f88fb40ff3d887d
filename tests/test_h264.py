"""H.264 metadata slice (ops/h264.py): SPS/avcC parsing, the Exp-Golomb
and emulation-prevention primitives, and the avc1-in-MP4 integration —
the dominant real-crawl video format handled at the metadata/index level
(the engine's documented no-decoder stance for AVC/HEVC/AV1)."""

import itertools
import math
import random

import pytest

from schema_fantasy_spark.ops.h264 import (
    encode_avcc,
    encode_sps,
    insert_emulation_prevention,
    parse_avcc,
    parse_sps,
    strip_emulation_prevention,
)
from schema_fantasy_spark.ops.video import (
    encode_mp4_avc1,
    encode_mp4_stub,
    parse_mp4_header,
    parse_mp4_samples,
)

_HIGH = (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135)


def test_sps_round_trip_grid():
    """encode -> parse recovers every field across profiles (baseline/
    main/extended/high family), chroma formats, crop combinations,
    scaling matrices, and pic_order_cnt types. Crop units differ per
    chroma format (SubWidthC/SubHeightC), so non-multiple-of-16 dims
    exercise the §7.4.2.1.1 arithmetic."""
    dims = [(320, 180), (1920, 1080), (354, 198), (16, 16), (640, 350),
            (174, 98), (3840, 2160)]
    for (w, h), prof, chroma, scal, poc in itertools.product(
        dims, [66, 77, 88, 100, 122, 244], [0, 1, 2, 3],
        [False, True], [0, 1, 2],
    ):
        if prof not in _HIGH and (chroma != 1 or scal):
            continue  # chroma/scaling blocks exist only in high profiles
        try:
            sps = encode_sps(w, h, prof, 31, chroma,
                             with_scaling_matrix=scal, poc_type=poc)
        except ValueError:
            # odd dims inexpressible in this chroma's crop units
            assert (w % 2 or h % 2) and chroma in (1, 2)
            continue
        got = parse_sps(sps)
        assert got is not None, (w, h, prof, chroma, scal, poc)
        assert (got["width"], got["height"]) == (w, h)
        assert got["profile_idc"] == prof and got["level_idc"] == 31
        assert got["chroma_format_idc"] == chroma
        assert got["frame_mbs_only_flag"] == 1


def test_emulation_prevention_round_trip():
    """strip(insert(x)) == x for adversarial byte runs (00 00 0x is the
    escape trigger, §7.4.1)."""
    rng = random.Random(0xA7C)
    for _ in range(3000):
        b = bytes(rng.choice([0, 0, 0, 1, 2, 3, 0x67, 0xFF])
                  for _ in range(rng.randint(0, 48)))
        assert strip_emulation_prevention(insert_emulation_prevention(b)) == b
    # the canonical fixtures
    assert insert_emulation_prevention(b"\x00\x00\x01") == b"\x00\x00\x03\x01"
    assert strip_emulation_prevention(b"\x00\x00\x03\x00") == b"\x00\x00\x00"
    # a 0x03 NOT preceded by two zeros is payload, not an escape
    assert strip_emulation_prevention(b"\x00\x03\x00") == b"\x00\x03\x00"


def test_sps_malformed_quarantine():
    """Truncated / garbage NALs return None — the per-row quarantine
    contract (never an exception in a mapInPandas loop)."""
    good = encode_sps(354, 198, 100, 41)
    assert parse_sps(good) is not None
    for cut in range(len(good)):
        parse_sps(good[:cut])  # must never raise
    # cuts inside the mandatory field run must quarantine
    assert parse_sps(b"") is None
    assert parse_sps(good[:5]) is None
    assert parse_sps(good[: len(good) // 2]) is None


def test_avcc_round_trip_and_quarantine():
    sps = encode_sps(1280, 720, 100, 40)
    rec = parse_avcc(encode_avcc(sps))
    assert rec["width"] == 1280 and rec["height"] == 720
    assert rec["profile_idc"] == 100 and rec["level_idc"] == 40
    assert rec["nal_length_size"] == 4
    assert rec["sps"] == [sps] and len(rec["pps"]) == 1
    assert parse_avcc(b"") is None
    assert parse_avcc(b"\x02\x64\x00\x28") is None  # wrong version
    assert parse_avcc(encode_avcc(sps)[:9]) is None  # truncated SPS len


def test_avc1_mp4_header_dims_from_sps():
    """tkhd presentation dims are ZERO in the writer by default — the
    parser must still report the SPS coded dims, profile and level
    (that is the avc1 metadata gap this module closes)."""
    p = encode_mp4_avc1(354, 198, 24, profile_idc=100, level_idc=41,
                        keyframe_every=5)
    m = parse_mp4_header(p)
    assert (m["width"], m["height"]) == (354, 198)
    assert m["codec"] == "avc1"
    assert m["profile_idc"] == 100 and m["level_idc"] == 41
    assert m["n_frames"] == 24 and m["duration_sec"] == 3.0
    # non-avc containers keep codec metadata NULL (backward compat)
    m2 = parse_mp4_header(encode_mp4_stub(160, 90, 3.0, 24))
    assert m2["codec"] is None and m2["profile_idc"] is None


def test_avc1_mp4_keyframe_index():
    """parse_mp4_samples walks stsd/stsz/stsc/stco/stss of the avc1
    file: one entry per sample, sync flags at every ke-th sample, and
    byte offsets matching the writer's deterministic layout."""
    nf, ke = 25, 4
    p = encode_mp4_avc1(320, 180, nf, keyframe_every=ke)
    got = parse_mp4_samples(p)
    assert got["codec"] == "avc1"
    assert len(got["samples"]) == nf
    # replay the writer's size/offset arithmetic
    off = 32  # ftyp (24) + mdat header (8)
    for k, (o, sz, sync) in enumerate(got["samples"]):
        body = (200 if k % ke == 0 else 40) + 8 * (k % 3)
        assert sz == 4 + body
        assert o == off
        assert sync == (k % ke == 0)
        off += sz
    assert sum(1 for (_, _, s) in got["samples"] if s) == math.ceil(nf / ke)


def test_video_metadata_avc1_hvc1_dataframe(spark):
    """DataFrame-level integration: the synthetic codec corpus (avc1,
    hvc1 and av01 families) reports codec/profile/level/dims via
    video_metadata, keyframes via video_frame_index — all from the codec
    config inside avcC/hvcC/av1C plus the stss walk, tkhd dims zeroed."""
    from schema_fantasy_spark.ops import mm_corpus, multimodal

    docs = spark.range(40).withColumnRenamed("id", "doc_id")
    vids = mm_corpus.synthetic_avc1_videos(docs)
    meta = {r["doc_id"]: r for r in multimodal.video_metadata(
        vids, binary_col="payload", id_col="doc_id").collect()}
    kf = multimodal.video_frame_index(
        vids, binary_col="payload", id_col="doc_id", keyframes_only=True
    ).groupBy("doc_id").count().collect()
    nk = {r["doc_id"]: r["count"] for r in kf}
    assert len(meta) == 40
    codecs_seen = set()
    for i in range(40):
        codec, w, h, nf, prof, lvl, ke = mm_corpus.avc1_params(i)
        codecs_seen.add(codec)
        r = meta[i]
        assert (r["width"], r["height"], r["n_frames"]) == (w, h, nf)
        assert r["codec"] == codec
        assert (r["profile_idc"], r["level_idc"]) == (prof, lvl)
        assert r["duration_sec"] == nf / 8
        assert nk[i] == math.ceil(nf / ke)
    assert codecs_seen == {"avc1", "hvc1", "av01"}  # all families exercised


def test_h265_sps_round_trip_grid():
    """HEVC sibling of the H.264 grid: encode -> parse recovers dims
    (conformance-window path for non-8-aligned dims), profile, level,
    tier and chroma format."""
    from schema_fantasy_spark.ops.h265 import (
        encode_hvcc,
        encode_sps_h265,
        parse_hvcc,
        parse_sps_h265,
    )

    for (w, h), prof, lvl, chroma, tier in itertools.product(
        [(1920, 1080), (642, 362), (111, 97), (8, 8), (3840, 2160)],
        [1, 2, 3, 4], [93, 120, 153], [0, 1, 2, 3], [0, 1],
    ):
        try:
            sps = encode_sps_h265(w, h, prof, lvl, chroma, tier)
        except ValueError:
            assert (w % 2 or h % 2) and chroma in (1, 2)
            continue
        got = parse_sps_h265(sps)
        assert got is not None
        assert (got["width"], got["height"]) == (w, h)
        assert (got["profile_idc"], got["level_idc"]) == (prof, lvl)
        assert (got["chroma_format_idc"], got["tier"]) == (chroma, tier)
    rec = parse_hvcc(encode_hvcc(encode_sps_h265(354, 198, 2, 120)))
    assert (rec["width"], rec["height"], rec["profile_idc"],
            rec["level_idc"], rec["nal_length_size"]) == (354, 198, 2, 120, 4)
    assert parse_hvcc(b"") is None and parse_sps_h265(b"\xff") is None


def test_hvc1_mp4_header_dims_from_sps():
    from schema_fantasy_spark.ops.video import encode_mp4_hvc1

    p = encode_mp4_hvc1(642, 362, 25, profile_idc=2, level_idc=120,
                        keyframe_every=4)
    m = parse_mp4_header(p)
    assert (m["width"], m["height"]) == (642, 362)
    assert m["codec"] == "hvc1"
    assert (m["profile_idc"], m["level_idc"]) == (2, 120)
    got = parse_mp4_samples(p)
    assert got["codec"] == "hvc1" and len(got["samples"]) == 25
    assert sum(1 for (_, _, s) in got["samples"] if s) == math.ceil(25 / 4)


def test_av1_sequence_header_round_trip():
    """AV1 leg of the trio: sequence-header OBU encode -> parse recovers
    dims/profile/level/tier, including the timing-info skip path and
    leb128-sized OBUs; av1C wraps and unwraps; malformed quarantines."""
    import itertools as it

    from schema_fantasy_spark.ops.av1 import (
        encode_av1_sequence_header,
        encode_av1c,
        parse_av1_sequence_header,
        parse_av1c,
    )

    for (w, h), prof, lvl, ti in it.product(
        [(1920, 1080), (354, 198), (1, 1), (65536, 4096), (111, 97)],
        [0, 1, 2], [0, 8, 12, 16, 31], [False, True],
    ):
        obu = encode_av1_sequence_header(w, h, prof, lvl,
                                         with_timing_info=ti)
        got = parse_av1_sequence_header(obu)
        assert got is not None
        assert (got["width"], got["height"]) == (w, h)
        assert (got["seq_profile"], got["seq_level_idx"]) == (prof, lvl)
    rec = parse_av1c(encode_av1c(encode_av1_sequence_header(354, 198, 1, 12)))
    assert (rec["width"], rec["height"], rec["seq_profile"],
            rec["seq_level_idx"]) == (354, 198, 1, 12)
    assert parse_av1c(b"") is None
    assert parse_av1_sequence_header(b"\x80") is None


def test_av01_mp4_header_dims_from_config():
    from schema_fantasy_spark.ops.video import encode_mp4_av01

    p = encode_mp4_av01(354, 198, 24, profile_idc=2, level_idc=13,
                        keyframe_every=6)
    m = parse_mp4_header(p)
    assert (m["width"], m["height"]) == (354, 198)
    assert m["codec"] == "av01"
    assert (m["profile_idc"], m["level_idc"]) == (2, 13)
    got = parse_mp4_samples(p)
    assert got["codec"] == "av01" and len(got["samples"]) == 24
    assert sum(1 for (_, _, s) in got["samples"] if s) == math.ceil(24 / 6)
