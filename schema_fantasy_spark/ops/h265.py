"""H.265/HEVC *metadata* parsing — the hvcC + SPS slice, no decoder.

Companion to ops/h264.py: together they cover the two codecs that carry
essentially all real-crawl MP4 video (avc1/hvc1). Same stance — parse
the codec CONFIG for authoritative coded dimensions and profile/level,
never decode samples; keyframe access stays byte-range indexing through
the stbl walk (ops/video.py).

Implements the minimal faithful slice of ITU-T H.265 §7.3.2.2.1
(seq_parameter_set_rbsp up through the conformance window — dimensions
appear early, unlike H.264's) plus ISO 14496-15 §8.3.3.1
(HEVCDecoderConfigurationRecord). profile_tier_level is parsed in full,
including sub-layer PTL blocks. Bit primitives (Exp-Golomb,
emulation-prevention) are shared with ops/h264.py.

Scale shape: pure per-row byte parsing inside Arrow-batched mapInPandas
loops; payloads never shuffle; a header parse touches a few hundred
bytes per doc.
"""

from __future__ import annotations

from typing import Optional

from schema_fantasy_spark.ops.h264 import (
    _BitReader,
    _BitWriter,
    insert_emulation_prevention,
    strip_emulation_prevention,
)

__all__ = ["parse_sps_h265", "encode_sps_h265", "parse_hvcc", "encode_hvcc"]


def _parse_ptl(r: _BitReader, max_sub_layers_minus1: int) -> dict:
    """profile_tier_level(1, msl) — §7.3.3; returns the general fields
    and skips sub-layer blocks faithfully."""
    r.u(2)  # general_profile_space
    tier = r.u(1)
    profile_idc = r.u(5)
    r.u(32)  # general_profile_compatibility_flag[32]
    r.u(32)
    r.u(16)  # 48 bits: progressive/interlaced/non-packed/frame-only + reserved
    level_idc = r.u(8)
    sub_profile = []
    sub_level = []
    for _ in range(max_sub_layers_minus1):
        sub_profile.append(r.u(1))
        sub_level.append(r.u(1))
    if max_sub_layers_minus1 > 0:
        for _ in range(8 - max_sub_layers_minus1):
            r.u(2)  # reserved_zero_2bits
    for i in range(max_sub_layers_minus1):
        if sub_profile[i]:
            r.u(32)
            r.u(32)
            r.u(24)  # 2+1+5 + 32 + 48 = 88 bits of sub-layer profile
        if sub_level[i]:
            r.u(8)
    return {"profile_idc": profile_idc, "level_idc": level_idc, "tier": tier}


def parse_sps_h265(nal: bytes) -> Optional[dict]:
    """Parse an HEVC SPS NAL (2-byte NAL header included or raw RBSP)
    into dict(profile_idc, level_idc, tier, chroma_format_idc, width,
    height) — coded dims with the conformance window applied
    (SubWidthC/SubHeightC units, §7.4.3.2.1). None when malformed."""
    try:
        if len(nal) < 2:
            return None
        body = nal
        if (body[0] >> 1) & 0x3F == 33:  # NAL type 33 = SPS: 2-byte header
            body = body[2:]
        r = _BitReader(strip_emulation_prevention(body))
        r.u(4)  # sps_video_parameter_set_id
        msl = r.u(3)  # sps_max_sub_layers_minus1
        r.u(1)  # sps_temporal_id_nesting_flag
        ptl = _parse_ptl(r, msl)
        r.ue()  # sps_seq_parameter_set_id
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            r.u(1)  # separate_colour_plane_flag
        width = r.ue()  # pic_width_in_luma_samples
        height = r.ue()  # pic_height_in_luma_samples
        if r.u(1):  # conformance_window_flag
            left, right, top, bottom = r.ue(), r.ue(), r.ue(), r.ue()
            sub_w = 2 if chroma_format_idc in (1, 2) else 1
            sub_h = 2 if chroma_format_idc == 1 else 1
            width -= (left + right) * sub_w
            height -= (top + bottom) * sub_h
        if width <= 0 or height <= 0:
            return None
        return {
            "profile_idc": ptl["profile_idc"],
            "level_idc": ptl["level_idc"],
            "tier": ptl["tier"],
            "chroma_format_idc": chroma_format_idc,
            "width": width,
            "height": height,
        }
    except (ValueError, IndexError):
        return None


def encode_sps_h265(
    width: int,
    height: int,
    profile_idc: int = 1,
    level_idc: int = 93,
    chroma_format_idc: int = 1,
    tier: int = 0,
) -> bytes:
    """Spec-layout HEVC SPS NAL (2-byte header included) with the coded
    dims expressed through the conformance window when not aligned to
    the 8-sample minimum CTU granularity — the construction real
    encoders use. H.265 signals luma sample dims directly (no
    macroblock arithmetic), so the window only carries the chroma
    rounding: width/height must be even for 4:2:0 (asserted)."""
    sub_w = 2 if chroma_format_idc in (1, 2) else 1
    sub_h = 2 if chroma_format_idc == 1 else 1
    # align coded dims up to the minimum coding block size (8)
    cw = (width + 7) // 8 * 8
    ch = (height + 7) // 8 * 8
    if (cw - width) % sub_w or (ch - height) % sub_h:
        raise ValueError("dims not expressible in conformance-window units")
    w = _BitWriter()
    w.u(0, 4)  # vps id
    w.u(0, 3)  # max_sub_layers_minus1
    w.u(1, 1)  # temporal_id_nesting
    # profile_tier_level, no sub-layers
    w.u(0, 2)
    w.u(tier, 1)
    w.u(profile_idc, 5)
    w.u(1 << (31 - profile_idc) if profile_idc < 32 else 0, 32)  # compat
    w.u(0, 32)
    w.u(0, 16)  # constraint/reserved 48 bits
    w.u(level_idc, 8)
    w.ue(0)  # sps id
    w.ue(chroma_format_idc)
    if chroma_format_idc == 3:
        w.u(0, 1)
    w.ue(cw)
    w.ue(ch)
    if cw != width or ch != height:
        w.u(1, 1)  # conformance_window_flag
        w.ue(0)
        w.ue((cw - width) // sub_w)
        w.ue(0)
        w.ue((ch - height) // sub_h)
    else:
        w.u(0, 1)
    # enough trailing structure for parsers that read a bit further:
    w.ue(0)  # bit_depth_luma_minus8
    w.ue(0)  # bit_depth_chroma_minus8
    w.ue(4)  # log2_max_pic_order_cnt_lsb_minus4
    nal_header = bytes([33 << 1, 1])  # type 33, layer 0, tid+1 = 1
    return nal_header + insert_emulation_prevention(w.rbsp_bytes())


def parse_hvcc(b: bytes) -> Optional[dict]:
    """HEVCDecoderConfigurationRecord -> dict(profile_idc, level_idc,
    nal_length_size, sps: list[bytes], **first-SPS fields). The record
    carries profile/level itself; dims come from the embedded SPS
    (NAL-unit array type 33). None when malformed."""
    try:
        if len(b) < 23 or b[0] != 1:
            return None
        out = {
            "profile_idc": b[1] & 0x1F,
            "level_idc": b[12],
            "nal_length_size": (b[21] & 0x03) + 1,
        }
        i = 23
        sps_list = []
        for _ in range(b[22]):  # numOfArrays
            nal_type = b[i] & 0x3F
            n = int.from_bytes(b[i + 1 : i + 3], "big")
            i += 3
            for _ in range(n):
                ln = int.from_bytes(b[i : i + 2], "big")
                i += 2
                if i + ln > len(b):
                    return None
                if nal_type == 33:
                    sps_list.append(b[i : i + ln])
                i += ln
        out["sps"] = sps_list
        if sps_list:
            parsed = parse_sps_h265(sps_list[0])
            if parsed is not None:
                out.update(parsed)
        return out
    except (ValueError, IndexError):
        return None


def encode_hvcc(sps: bytes) -> bytes:
    """Wrap one HEVC SPS into an HEVCDecoderConfigurationRecord;
    profile/level mirror the SPS."""
    parsed = parse_sps_h265(sps)
    if parsed is None:
        raise ValueError("unparseable HEVC SPS")
    head = bytearray(23)
    head[0] = 1
    head[1] = parsed["profile_idc"] | (parsed["tier"] << 5)
    head[2:6] = (1 << (31 - parsed["profile_idc"])
                 if parsed["profile_idc"] < 32 else 0).to_bytes(4, "big")
    # bytes 6-11: constraint flags (zero); byte 12: level
    head[12] = parsed["level_idc"]
    head[13] = 0xF0  # reserved + min_spatial_segmentation_idc hi
    head[15] = 0xFC  # reserved + parallelismType
    head[16] = 0xFC | (parsed["chroma_format_idc"] & 0x03)
    head[17] = 0xF8  # bitDepthLumaMinus8 = 0
    head[18] = 0xF8  # bitDepthChromaMinus8 = 0
    head[21] = 0x03  # lengthSizeMinusOne = 3 (4-byte lengths)
    head[22] = 1  # numOfArrays
    arr = bytes([0x20 | 33]) + (1).to_bytes(2, "big") \
        + len(sps).to_bytes(2, "big") + sps
    return bytes(head) + arr
