"""Deterministic multimodal corpus generator for the driver oracle gate.

The sf dirs carry no binary test table, so the gated multimodal queries
synthesize one ON BOTH SIDES of the gate from the same seed: every
generation parameter is a nibble of ``md5(str(doc_id))``, which the
DuckDB oracle recomputes as ``md5(CAST(doc_id AS VARCHAR))`` — so every
value the decoders emit (dims, format, perceptual hash, sample rate,
frame count, duration, RMS) is re-derivable in pure SQL with no binary
data crossing engines.

Payload design makes the DECODED values SQL-expressible:

* images are two-tone: top half ``color_a``, bottom half the exact
  inverse ``255 - color_a`` — so the 8x8 aHash grid is 32 cells of A
  over 32 cells of B, the grid mean is exactly 127.5, and the hash is
  one of two constants selected by ``sum(color_a) >= 383`` (heights are
  multiples of 8 so grid sampling never straddles the boundary);
* audio is a full-scale alternating square wave (+amp/-amp), so
  RMS == amp/32768 exactly, and amp is a multiple of 512 so the value
  has <= 6 decimal digits (round(x, 6) is an exact no-op in any engine).

A deterministic slice of audio rows (nibble 13 == 0) is truncated mid
header: the WAV decoder must QUARANTINE those rows (absent from output,
never a stage failure) — the same per-row quarantine contract the
validation kernels model with $parse rows (reference semantics: one bad
document is one violation, src/index.js:56-63 evaluates per value).

Generators run as mapInPandas (partition-preserving, Arrow transport);
the per-row byte assembly is the unavoidable per-container loop, exactly
like the decode side.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, types as T

from schema_fantasy_spark.ops.multimodal import (
    encode_bmp24,
    encode_png_rgb,
    encode_ppm6,
    encode_wav_pcm16,
)

PAYLOAD_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("payload", T.BinaryType()),
])


def _nibbles(doc_id: int) -> list:
    """32 md5 nibbles of str(doc_id) — nibble i (0-based) mirrors the SQL
    ``strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)),
    i+1, 1)) - 1``."""
    return [int(c, 16) for c in hashlib.md5(str(doc_id).encode()).hexdigest()]


def image_params(
    doc_id: int, nib: list | None = None
) -> Tuple[int, int, int, Tuple[int, int, int]]:
    """(format_selector, width, height, color_a); color_b = inverse.
    format_selector: 0 = bmp, 1 = ppm or GIF (nibble-13 split),
    2 = png, 3 = webp (VP8L lossless — two-tone channels encode with
    simple prefix codes, bit-exact). Pass precomputed ``nib`` to avoid
    re-hashing in per-row loops."""
    nib = _nibbles(doc_id) if nib is None else nib
    fsel = nib[0] % 4
    w = 4 + nib[1]                      # 4..19
    h = 8 * (1 + nib[2] % 3)            # 8, 16, 24 — multiples of 8
    color_a = (nib[3] * 16 + nib[4], nib[5] * 16 + nib[6], nib[7] * 16 + nib[8])
    return fsel, w, h, color_a


def jpeg_params(doc_id: int, nib: list | None = None) -> Tuple[int, int, int, bool]:
    """(width, height, tone_a, progressive) for the JPEG corpus:
    GRAYSCALE two-tone with the tone split on the 8-row MCU boundary
    (height fixed at 16, halves of 8) — every 8x8 block is CONSTANT, so
    the all-ones-quant encode round-trips bit-exactly (DC = 8*(v-128)
    is integral, AC all zero) and the decoded aHash is one of the same
    two constants as the two-tone RGB corpus, selected by ``tone_a >=
    128`` (grid mean exactly 127.5 since tone_b = 255 - tone_a). Half
    the rows (nibble 6 odd) encode PROGRESSIVE (SOF2, successive
    approximation): with full refinement the reconstruction is
    identical, so the SAME oracle gates both entropy paths."""
    nib = _nibbles(doc_id) if nib is None else nib
    return 4 + nib[1], 16, nib[3] * 16 + nib[4], nib[6] % 2 == 1


def _jpeg_payload(doc_id: int) -> bytes:
    from schema_fantasy_spark.ops.jpeg import (
        encode_jpeg_baseline,
        encode_jpeg_progressive,
    )

    w, h, tone_a, progressive = jpeg_params(doc_id)
    px = np.empty((h, w), dtype=np.uint8)
    px[: h // 2] = tone_a
    px[h // 2 :] = 255 - tone_a
    if progressive:
        return encode_jpeg_progressive(px)
    return encode_jpeg_baseline(px)


def synthetic_jpegs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) of deterministic two-tone baseline JPEGs — the
    entropy-coded format under the gate: huffman decode + IDCT run for
    real, and every decoded value is still a pure function of the md5
    nibbles (exact round trip by construction, see jpeg_params)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "payload": pd.Series([_jpeg_payload(i) for i in ids],
                                     dtype="object"),
            })

    # corpus synthesis + downstream decode are compute-heavy: spread
    # the 8-byte ids across cores before synthesizing payloads (no-op
    # at scale / on already-parallel scans; bodies never shuffle)
    from schema_fantasy_spark.ops.dedup import _ensure_parallelism

    return _ensure_parallelism(df.select(id_col)).mapInPandas(
        run, PAYLOAD_SCHEMA)


def video_params(doc_id: int, nib: list | None = None) -> Tuple[int, int, int, int]:
    """(width, height, n_frames, tone_base) for the video corpus:
    each frame is two-tone grayscale — frame i's top tone is
    ``(tone_base + 17*i) % 256`` with bottom tone its inverse, so every
    sampled frame's aHash is one of the two corpus constants selected by
    ``tone_i >= 128`` — a pure function of (doc_id, frame_idx) the
    DuckDB oracle recomputes. n_frames in 4..8, so sampling every 2nd
    frame yields indices 0,2,4,6 bounded by n_frames. Nibble 5 splits
    the CONTAINER/CODEC family three ways: odd docs are VP8-in-WEBM
    (all-B_TM key frames whose sub-block DC residuals land the two
    tones EXACTLY: delta (2L*dcq+4)>>3 == L at qi 0); even docs carry
    the SAME MCU-aligned JPEG frames either in AVI (nib 5 % 4 == 0,
    RIFF movi walk) or in MP4 (nib 5 % 4 == 2, full ISO-BMFF
    sample-table demux: stsd/stsz/stsc/stco/stss) — the oracle rows
    are IDENTICAL across the split, so the gate passes only if all
    three real demux+decode pipelines agree with it. Within the WEBM
    family, nibble 13 splits key-only streams from INTER streams:
    frame 0 is the key frame at tone_base, odd frames are ZEROMV
    skip copies and even frames SPLITMV 16x8 half-swaps (per-partition
    full-pel MVs +/-8 rows read the OTHER half of the last frame), so
    sampled frame j's top tone is tone_base when j % 4 == 0 and its
    inverse when j % 4 == 2 — exact (full-pel motion compensation is
    a copy), oracle-derivable, and NOT reproducible by a keyframe-only
    or motion-ignoring decoder (row count / hash both diverge). The
    nibble-13 % 4 == 3 quarter carries the SAME inter sequence in the
    harder container forms — Xiph-laced SimpleBlocks, EBML-laced
    BlockGroups (keyframe-ness from ReferenceBlock absence), plain
    BlockGroups — with oracle rows identical to the % 4 == 1 docs, so
    lace expansion and BlockGroup parsing are gated too."""
    nib = _nibbles(doc_id) if nib is None else nib
    return 4 + nib[1], 16, 4 + nib[6] % 5, nib[3] * 16 + nib[4]


def _vp8_two_tone_frame(w: int, h: int, tone: int) -> bytes:
    """One VP8 key frame, EXACT two-tone on the 8-row boundary: B_TM
    everywhere propagates the (129 + d) shifted edges unchanged, DC
    residuals on sub-blocks (0,0,0) and (0,0,8) place the tones."""
    from schema_fantasy_spark.ops.vp8 import B_TM_PRED, encode_vp8_key_bpred

    lv = {(0, 0, 0): 2 * (tone - 129), (0, 0, 8): 2 * (255 - 2 * tone)}
    return encode_vp8_key_bpred(
        w, h, lambda r, c, s: B_TM_PRED,
        lambda r, c, s: lv.get((r, c, s), 0),
    )


def _video_payload(doc_id: int) -> bytes:
    from schema_fantasy_spark.ops.jpeg import encode_jpeg_baseline
    from schema_fantasy_spark.ops.video import (
        encode_avi_mjpeg, encode_mp4_mjpeg, encode_webm_vp8,
    )

    nib = _nibbles(doc_id)
    w, h, n_frames, tone_base = video_params(doc_id, nib)
    tones = [(tone_base + 17 * i) % 256 for i in range(n_frames)]
    if nib[5] % 2 == 1:
        if nib[13] % 2 == 1:
            # INTER stream: key frame 0, then alternating ZEROMV skip
            # copies (odd) and SPLITMV 16x8 half-swaps (even) — the
            # swap's full-pel +/-8-row MVs read the other half of the
            # last frame, so motion compensation is an exact copy
            from schema_fantasy_spark.ops.vp8 import encode_vp8_inter

            swap = {"kind": "split", "partition": 0,
                    "mvs": [(64, 0), (-64, 0)]}
            skip = {"kind": "zero", "skip": 1}
            frames = [(_vp8_two_tone_frame(w, h, tone_base), True)]
            for i in range(1, n_frames):
                plan = swap if i % 2 == 0 else skip
                frames.append(
                    (encode_vp8_inter(w, h, lambda r, c, p=plan: p), False))
            if nib[13] % 4 == 3:
                # same frame SEQUENCE, harder container form: inter
                # frames ride in Xiph-laced SimpleBlocks and EBML-laced
                # BlockGroups (keyframe-ness from ReferenceBlock
                # absence) alternately, leftover singles in a plain
                # BlockGroup — the oracle rows are IDENTICAL to the
                # n14 % 4 == 1 docs, so the gate passes only if lace
                # expansion and BlockGroup parsing are exact
                entries, j, g = [frames[0]], 1, 0
                while j < n_frames:
                    pair = frames[j : j + 2]
                    if len(pair) == 1:
                        entries.append({"frames": pair, "group": True})
                    elif g % 2 == 0:
                        entries.append({"frames": pair, "lacing": "xiph"})
                    else:
                        entries.append({"frames": pair, "lacing": "ebml",
                                        "group": True})
                    j += 2
                    g += 1
                return encode_webm_vp8(entries, w, h, fps=12)
            return encode_webm_vp8(frames, w, h, fps=12)
        frames = [_vp8_two_tone_frame(w, h, t) for t in tones]
        return encode_webm_vp8(frames, w, h, fps=12)
    frames = []
    for tone in tones:
        px = np.empty((h, w), dtype=np.uint8)
        px[: h // 2] = tone
        px[h // 2 :] = 255 - tone
        frames.append(encode_jpeg_baseline(px))
    if nib[5] % 4 == 2:
        return encode_mp4_mjpeg(frames, w, h, fps=12)
    return encode_avi_mjpeg(frames, w, h, fps=12)


def synthetic_videos(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) of deterministic MJPEG-in-AVI clips — the video
    path under the gate: RIFF parse + per-frame huffman+IDCT run for
    real, every decoded value a pure function of the md5 nibbles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "payload": pd.Series([_video_payload(i) for i in ids],
                                     dtype="object"),
            })

    # corpus synthesis + downstream decode are compute-heavy: spread
    # the 8-byte ids across cores before synthesizing payloads (no-op
    # at scale / on already-parallel scans; bodies never shuffle)
    from schema_fantasy_spark.ops.dedup import _ensure_parallelism

    return _ensure_parallelism(df.select(id_col)).mapInPandas(
        run, PAYLOAD_SCHEMA)


def container_params(doc_id: int, nib: list | None = None):
    """(container, width, height, n_frames, duration_sec, variant) for
    the codec-video CONTAINER corpus (header metadata only — the sample
    data of MP4/MKV needs codec libs and stays stubbed): half the docs
    get an ISO-BMFF MP4 (variant selects the v0/v1 mvhd+tkhd layout),
    half a Matroska/WebM EBML skeleton (variant selects the DocType).
    duration = n_frames/8 s — an exact multiple of 125 ms, so both the
    mvhd tick math (timescale 1000) and the EBML float-ms Duration
    round-trip it exactly and the DuckDB oracle recomputes it as
    (24 + n12)/8 with no float fuzz. Matroska headers carry no frame
    count, so n_frames is None for mkv rows."""
    nib = _nibbles(doc_id) if nib is None else nib
    container = "mp4" if nib[8] % 2 == 0 else "mkv"
    w = 160 + 16 * nib[9]               # 160..400
    h = 90 + 16 * nib[10]               # 90..330
    nf = 24 + nib[11]                   # 24..39
    dur = nf / 8
    return container, w, h, (nf if container == "mp4" else None), dur, nib[12] % 2


def _container_payload(doc_id: int) -> bytes:
    from schema_fantasy_spark.ops.video import encode_mkv_stub, encode_mp4_stub

    container, w, h, nf, dur, variant = container_params(doc_id)
    if container == "mp4":
        return encode_mp4_stub(w, h, dur, nf, version=variant)
    return encode_mkv_stub(w, h, dur, doctype=b"webm" if variant else b"matroska")


def synthetic_video_containers(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) of deterministic MP4/MKV container skeletons —
    the codec-video HEADER path under the gate: ISO-BMFF box walk (v0
    and v1) and Matroska EBML walk both run for real, every emitted
    value a pure function of the md5 nibbles."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "payload": pd.Series([_container_payload(i) for i in ids],
                                     dtype="object"),
            })

    # corpus synthesis + downstream decode are compute-heavy: spread
    # the 8-byte ids across cores before synthesizing payloads (no-op
    # at scale / on already-parallel scans; bodies never shuffle)
    from schema_fantasy_spark.ops.dedup import _ensure_parallelism

    return _ensure_parallelism(df.select(id_col)).mapInPandas(
        run, PAYLOAD_SCHEMA)


def avc1_params(doc_id: int, nib: list | None = None):
    """(codec, width, height, n_frames, profile_idc, level_idc,
    keyframe_every) for the H.264/H.265/AV1-in-MP4 metadata corpus:
    nibble 7 % 3 splits avc1/hvc1/av01 — together the two codecs that carry essentially
    all real-crawl MP4 video. Dims are EVEN but mostly not multiples of
    16, so the avc1 SPS carries real frame-cropping values (4:2:0
    crop-unit path) and the hvc1 SPS a real conformance window (AV1
    signals exact dims directly); profile spans baseline/main/high/
    high422 (H.264), Main/Main10/MainSP/REXT (H.265, whose level_idc
    scale is 30x the level number), or seq_profile 0..2 with
    seq_level_idx (AV1); keyframe
    cadence varies; fps is fixed at 8 so duration = nf/8 is an exact
    multiple of 125 ms the DuckDB oracle recomputes with no float
    fuzz."""
    nib = _nibbles(doc_id) if nib is None else nib
    codec = ["avc1", "hvc1", "av01"][nib[7] % 3]
    w = 320 + 2 * nib[9]                       # 320..350, even
    h = 180 + 2 * nib[10]                      # 180..210, even
    nf = 24 + nib[11]                          # 24..39
    if codec == "avc1":
        profile = [66, 77, 100, 122][nib[12] % 4]
        level = [30, 31, 40, 41][nib[13] % 4]
    elif codec == "hvc1":
        profile = [1, 2, 3, 4][nib[12] % 4]
        level = [93, 120, 123, 150][nib[13] % 4]
    else:
        profile = nib[12] % 3
        level = [8, 12, 13, 16][nib[13] % 4]
    ke = 4 + nib[8] % 3                        # 4..6
    return codec, w, h, nf, profile, level, ke


def _avc1_payload(doc_id: int) -> bytes:
    from schema_fantasy_spark.ops.video import (
        encode_mp4_av01,
        encode_mp4_avc1,
        encode_mp4_hvc1,
    )

    codec, w, h, nf, profile, level, ke = avc1_params(doc_id)
    enc = {"avc1": encode_mp4_avc1, "hvc1": encode_mp4_hvc1,
           "av01": encode_mp4_av01}[codec]
    return enc(
        w, h, nf, fps=8, profile_idc=profile, level_idc=level,
        keyframe_every=ke,
    )


def synthetic_avc1_videos(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) of deterministic H.264/H.265/AV1-in-MP4 files whose
    tkhd presentation dims are ZERO — every reported dimension must come
    from the avcC/hvcC/av1C config parse (ops/h264.py, ops/h265.py, ops/av1.py), every
    keyframe position from the stss walk; all emitted values are pure
    functions of the md5 nibbles so the oracle restates them
    closed-form."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "payload": pd.Series([_avc1_payload(i) for i in ids],
                                     dtype="object"),
            })

    from schema_fantasy_spark.ops.dedup import _ensure_parallelism

    return _ensure_parallelism(df.select(id_col)).mapInPandas(
        run, PAYLOAD_SCHEMA)


def audio_params(doc_id: int) -> Tuple[int, int, int, bool, int]:
    """(sample_rate, n_frames, amplitude, corrupt, law). ``law`` splits
    the corpus between codecs: 0 = 16-bit PCM, 1 = G.711 mu-law,
    2 = G.711 A-law (the telephony WAVs the stdlib wave module refuses
    — ops/multimodal.parse_wav_g711 decodes them for real, tables
    byte-verified against audioop). G.711 rows are square waves of one
    +/- code pair whose decoded magnitude is an exact integer function
    of the nibbles, so the oracle replays the G.711 expansion formula
    in SQL and RMS stays an exact rational."""
    nib = _nibbles(doc_id)
    sr = 8000 * (1 + nib[9] % 3)        # 8000, 16000, 24000
    n_frames = 400 + 64 * nib[10]       # 400..1360
    amp = 512 * (1 + nib[11])           # 512..8192 — rms = (1+nib)/64
    corrupt = nib[12] == 0              # 1/16 of rows: quarantine path
    # law 3 = MP3 (header walk; nibble 9 gates it ahead of the WAV
    # codecs); laws 4 (FLAC) and 5 (Ogg Opus/Vorbis) carve half of two
    # WAV residue classes via nibble 8; else nibble 14 splits
    # PCM / mu-law / A-law
    if nib[8] % 4 == 0:
        law = 3
    elif nib[8] % 4 == 2 and nib[7] % 2 == 0:
        law = 4
    elif nib[8] % 4 == 3 and nib[7] % 2 == 0:
        law = 5
    else:
        law = nib[13] % 3
    if law == 4:   # FLAC STREAMINFO metadata family
        sr = [44100, 48000, 96000, 22050][nib[9] % 4]
        n_frames = 10000 + 256 * nib[10]
    elif law == 5:  # Ogg family: nibble 14 splits opus / vorbis
        if nib[13] % 2 == 0:  # opus decodes at 48 kHz regardless
            sr = 48000
            n_frames = 960 * (20 + nib[10])
        else:
            sr = [8000, 11025, 22050, 44100][nib[9] % 4]
            n_frames = 5000 + 128 * nib[10]
    return sr, n_frames, amp, corrupt, law


def _image_payload(doc_id: int) -> bytes:
    nib = _nibbles(doc_id)  # one md5 per row, shared with image_params
    fsel, w, h, color_a = image_params(doc_id, nib)
    color_b = tuple(255 - c for c in color_a)
    px = np.empty((h, w, 3), dtype=np.uint8)
    px[: h // 2] = color_a
    px[h // 2 :] = color_b
    if fsel == 0:
        return encode_bmp24(px)
    if fsel == 1:
        # the ppm family splits by nibble 13: odd rows become GIF89a
        # (palette-exact two-tone, losslessly identical pixels), with
        # nibble 12 choosing interlaced vs sequential row order — the
        # oracle only sees format/mime flip, every decoded value is
        # unchanged (ops/gif.py LZW + interlace both round-trip exact)
        if nib[13] % 2 == 1:
            from schema_fantasy_spark.ops.gif import encode_gif_rgb

            return encode_gif_rgb(px, interlace=bool(nib[12] % 2))
        return encode_ppm6(px)
    if fsel == 3:
        # webp rows split lossless VP8L / LOSSY VP8 by nibble 13: the
        # lossy frames are gray two-tone on the 16-row MB boundary
        # (h=32), top tone keyed on the same n4*16+n5 nibble pair the
        # jpeg corpus uses, bottom on its inverse. Nibble 12 further
        # splits the lossy family between the 16x16 path (DC/V_PRED +
        # Y2 WHT chain, exact tones via ops/vp8.vp8_dc_delta) and the
        # B_PRED path (all-B_TM sub-modes, type-3 DC residuals; levels
        # DOUBLED so the bottom delta keeps its sign through the >>3,
        # preserving the oracle's ta*3 >= 383 brighter-half predicate)
        if nib[13] % 2 == 1:
            ta = nib[3] * 16 + nib[4]
            if nib[12] % 2 == 1:
                from schema_fantasy_spark.ops.webp import encode_webp_lossy_bpred

                return encode_webp_lossy_bpred(
                    w, 32, 2 * (ta - 128), 2 * (255 - 2 * ta))
            from schema_fantasy_spark.ops.webp import encode_webp_lossy_two_tone

            return encode_webp_lossy_two_tone(w, 32, ta - 128, 255 - 2 * ta)
        from schema_fantasy_spark.ops.webp import encode_webp_lossless_two_tone

        return encode_webp_lossless_two_tone(px)
    # vary the PNG filter deterministically so the gate exercises
    # None/Sub/Up/Average/Paeth unfiltering, not just the trivial path
    return encode_png_rgb(px, filter_type=nib[13] % 5)


def _audio_payload(doc_id: int) -> bytes:
    sr, n_frames, amp, corrupt, law = audio_params(doc_id)
    nib = _nibbles(doc_id)
    if law == 3:
        from schema_fantasy_spark.ops.multimodal import (
            _MP3_BITRATE_V1L3, encode_mp3_stub,
        )

        payload = encode_mp3_stub(
            _MP3_BITRATE_V1L3[1 + nib[9] % 14],
            [44100, 48000, 32000][nib[10] % 3],
            nib[11] % 4,
            8 + nib[13] % 8,
            id3_size=20 + nib[10],
        )
        return payload[:13] if corrupt else payload
    if law == 4:
        from schema_fantasy_spark.ops.audio_formats import encode_flac_stub

        payload = encode_flac_stub(sr, 1 + nib[11] % 2, n_frames)
        return payload[:9] if corrupt else payload
    if law == 5:
        from schema_fantasy_spark.ops.audio_formats import encode_ogg_stub

        codec = "opus" if nib[13] % 2 == 0 else "vorbis"
        payload = encode_ogg_stub(codec, sr, 1 + nib[11] % 2, n_frames,
                                  pre_skip=8 * nib[9])
        # mid-page cut: the CRC walk must quarantine, not misread
        return payload[: len(payload) // 2] if corrupt else payload
    if law == 0:
        samples = np.empty(n_frames, dtype="<i2")
        samples[0::2] = amp
        samples[1::2] = -amp
        payload = encode_wav_pcm16(samples, rate=sr)
    else:
        from schema_fantasy_spark.ops.multimodal import encode_wav_g711

        # +/- square wave of one G.711 code: exp from nib[11], mant
        # from nib[9] (both reused across families, distinct arithmetic)
        exp, mant = nib[11] % 8, nib[9] % 16
        mag = (exp << 4) | mant
        if law == 1:   # mu-law: bytes stored complemented; ~mag -> +
            pos, neg = 0xFF ^ mag, 0x7F ^ mag
        else:          # A-law: 0x80 bit SET means positive; XOR 0x55
            pos, neg = (0x80 | mag) ^ 0x55, mag ^ 0x55
        codes = np.empty(n_frames, dtype=np.uint8)
        codes[0::2] = pos
        codes[1::2] = neg
        payload = encode_wav_g711(codes, rate=sr,
                                  law="ulaw" if law == 1 else "alaw")
    if corrupt:
        return payload[:13]  # truncated mid-RIFF-header: quarantined
    return payload


#: charset-gate page families (ops/charset.py under the oracle gate), one
#: per ``md5(doc_id)`` nibble-1 % 14: (meta_label, bom, python_codec,
#: special_chars, expected_charset, expected_source). ``special`` is the
#: non-ASCII payload appended to the page body — the chars that prove the
#: transcode actually ran (ASCII bytes are identical across every family's
#: charset, so without them a wrong decode would be invisible).
CHARSET_FAMILIES = [
    (None, None, "utf-8", "é", "utf-8", "utf8"),
    (None, "utf-8", "utf-8", "中\U0001f600", "utf-8", "bom"),
    (None, "utf-16le", "utf-16-le", "中é\U0001f600", "utf-16le", "bom"),
    (None, "utf-16be", "utf-16-be", "中é\U0001f600", "utf-16be", "bom"),
    ("windows-1252", None, "cp1252", "é€", "windows-1252", "meta"),
    ("latin1", None, "cp1252", "é", "windows-1252", "meta"),
    ("iso-8859-2", None, "iso8859-2", "őč", "iso-8859-2", "meta"),
    ("koi8-r", None, "koi8-r", "Жя", "koi8-r", "meta"),
    ("shift_jis", None, "shift_jis", "あ中", "shift_jis", "meta"),
    ("euc-kr", None, "cp949", "한글", "euc-kr", "meta"),
    ("gb2312", None, "gbk", "中文", "gbk", "meta"),
    ("big5", None, "big5", "中文", "big5", "meta"),
    # meta-declared utf-16: WHATWG change-the-encoding says treat as
    # UTF-8 (the prescan could only see the label in ASCII-compatible
    # bytes), so the payload IS utf-8
    ("utf-16", None, "utf-8", "é", "utf-8", "meta"),
    # undeclared cp1252: the é€ bytes are invalid UTF-8, so detection
    # must fall through the grammar check to the windows-1252 fallback
    (None, None, "cp1252", "é€", "windows-1252", "fallback"),
]

_CHARSET_BOMS = {"utf-8": b"\xef\xbb\xbf", "utf-16le": b"\xff\xfe",
                 "utf-16be": b"\xfe\xff"}


def charset_fam(doc_id: int) -> int:
    """Family index for a doc: nibble 1 of md5(doc_id), mod 14."""
    return _nibbles(doc_id)[0] % len(CHARSET_FAMILIES)


def encode_charset_page(fam: int, page: str) -> bytes:
    """Encode a full page string per its family: BOM prefix for the BOM
    families, the family codec for the bytes (the meta tag itself must
    already be in ``page`` — the query builds the markup)."""
    label, bom, codec, _special, _cs, _src = CHARSET_FAMILIES[fam]
    return (_CHARSET_BOMS[bom] if bom else b"") + page.encode(codec)


def synthetic_images(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) of deterministic two-tone BMP/PPM/PNG/WebP images."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "payload": pd.Series([_image_payload(i) for i in ids],
                                     dtype="object"),
            })

    # corpus synthesis + downstream decode are compute-heavy: spread
    # the 8-byte ids across cores before synthesizing payloads (no-op
    # at scale / on already-parallel scans; bodies never shuffle)
    from schema_fantasy_spark.ops.dedup import _ensure_parallelism

    return _ensure_parallelism(df.select(id_col)).mapInPandas(
        run, PAYLOAD_SCHEMA)


def synthetic_audio(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) of deterministic square-wave PCM WAVs; rows with
    nibble 13 == 0 are truncated containers (the quarantine fixture)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "payload": pd.Series([_audio_payload(i) for i in ids],
                                     dtype="object"),
            })

    # corpus synthesis + downstream decode are compute-heavy: spread
    # the 8-byte ids across cores before synthesizing payloads (no-op
    # at scale / on already-parallel scans; bodies never shuffle)
    from schema_fantasy_spark.ops.dedup import _ensure_parallelism

    return _ensure_parallelism(df.select(id_col)).mapInPandas(
        run, PAYLOAD_SCHEMA)


def pdf_params(doc_id: int, nib: list | None = None):
    """(n_pages, lines_per_page list, pad_width, compress, hex_strings,
    corrupt, objstm, lzw, cid) — every TEXT-affecting value a nibble
    function the SQL oracle replays; objstm/lzw vary only the
    container (PDF 1.5 ObjStm+xref-stream layout, LZWDecode instead of
    FlateDecode), and ``cid`` (n9 odd) switches the FONT to
    Type0/Identity-H with a generated ToUnicode CMap — 2-byte CID hex
    strings, ASCII through the bfrange path, plus a per-line non-ASCII
    suffix '' é→'' through the bfchar path (text-affecting, replayed by
    the oracle). Page p carries 2 + (n2 + p) % 3 lines; line (p, l)
    reads ``doc {id} pg {p} ln {l} `` + 'w' * (1 + n3 % 8)."""
    nib = _nibbles(doc_id) if nib is None else nib
    n_pages = 1 + nib[0] % 3
    lines = [2 + (nib[1] + p) % 3 for p in range(n_pages)]
    return (n_pages, lines, 1 + nib[2] % 8,
            nib[3] % 2 == 1, nib[4] % 2 == 1, nib[5] == 0,
            nib[6] % 2 == 1, nib[7] % 2 == 1, nib[8] % 2 == 1)


def _pdf_payload(doc_id: int) -> bytes:
    from schema_fantasy_spark.ops.pdf import encode_pdf

    n_pages, lines, pad, compress, hexs, corrupt, objstm, lzw, cid = \
        pdf_params(doc_id)
    suffix = " é→" if cid else ""  # bfchar coverage (BMP only)
    pages = [
        [f"doc {doc_id} pg {p} ln {l} " + "w" * pad + suffix
         for l in range(lines[p])]
        for p in range(n_pages)
    ]
    payload = encode_pdf(pages, compress=compress, hex_strings=hexs,
                         objstm=objstm, lzw=lzw, cid=cid)
    # header-only stump: no object survives -> quarantine (the salvage
    # path for mid-file cuts is exercised in tests/test_pdf.py)
    return payload[:15] if corrupt else payload


def synthetic_pdfs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(doc_id, payload) of deterministic multi-page PDFs — half the
    rows FlateDecode-compressed, half literal/hex-string split; rows
    with nibble 6 == 0 are header stumps (the quarantine fixture)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].tolist()
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "payload": pd.Series([_pdf_payload(i) for i in ids],
                                     dtype="object"),
            })

    from schema_fantasy_spark.ops.dedup import _ensure_parallelism

    return _ensure_parallelism(df.select(id_col)).mapInPandas(
        run, PAYLOAD_SCHEMA)
