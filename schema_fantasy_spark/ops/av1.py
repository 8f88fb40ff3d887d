"""AV1 *metadata* parsing — the av1C + Sequence Header OBU slice, no
decoder. Completes the modern-codec trio with ops/h264.py and
ops/h265.py: avc1/hvc1/av01 together cover what real crawls serve as
MP4 video, all handled at the metadata/keyframe-index level.

Implements the AV1 Codec ISO Media File Format Binding's
AV1CodecConfigurationRecord (the ``av1C`` box) and the slice of the AOM
AV1 bitstream spec §5.5 (sequence_header_obu) needed for authoritative
coded dimensions: OBU header + leb128 size, profile/still flags, the
operating-points loop (including timing_info and decoder_model_info
skipping, so real encoder output parses), then
max_frame_width/height_minus_1. Level comes from seq_level_idx of
operating point 0 (the spec's 2.0 + idx*... scale is reported raw, as
av1C does).

Scale shape: identical to the H.264/H.265 modules — per-row byte
parsing inside Arrow-batched loops, payloads never shuffle.
"""

from __future__ import annotations

from typing import Optional

from schema_fantasy_spark.ops.h264 import _BitReader, _BitWriter

__all__ = ["parse_av1_sequence_header", "encode_av1_sequence_header",
           "parse_av1c", "encode_av1c"]


def _leb128(data: bytes, i: int):
    """(value, next_i) of a leb128 at byte offset i."""
    v = 0
    for k in range(8):
        if i >= len(data):
            raise ValueError("truncated leb128")
        b = data[i]
        i += 1
        v |= (b & 0x7F) << (7 * k)
        if not (b & 0x80):
            return v, i
    raise ValueError("leb128 too long")


def _uvlc(r: _BitReader) -> int:
    zeros = 0
    while r.u(1) == 0:
        zeros += 1
        if zeros > 31:
            raise ValueError("uvlc too long")
    if zeros == 0:
        return 0
    return (1 << zeros) - 1 + r.u(zeros)


def parse_av1_sequence_header(obu: bytes) -> Optional[dict]:
    """Parse a Sequence Header OBU (header + payload) into
    dict(seq_profile, seq_level_idx, seq_tier, width, height).
    None when malformed or not a sequence header (quarantine)."""
    try:
        if not obu:
            return None
        b0 = obu[0]
        if b0 & 0x80 or (b0 >> 3) & 0x0F != 1:  # forbidden / type != 1
            return None
        i = 1
        if b0 & 0x04:  # obu_extension_flag
            i += 1
        if b0 & 0x02:  # obu_has_size_field
            _, i = _leb128(obu, i)
        r = _BitReader(obu[i:])
        seq_profile = r.u(3)
        r.u(1)  # still_picture
        reduced = r.u(1)
        seq_tier = 0
        if reduced:
            seq_level_idx = r.u(5)
        else:
            decoder_model_info = None
            if r.u(1):  # timing_info_present_flag
                r.u(32)  # num_units_in_display_tick
                r.u(32)  # time_scale
                if r.u(1):  # equal_picture_interval
                    _uvlc(r)  # num_ticks_per_picture_minus_1
                if r.u(1):  # decoder_model_info_present_flag
                    buffer_delay_len = r.u(5) + 1
                    r.u(32)  # num_units_in_decoding_tick
                    r.u(5)  # buffer_removal_time_length_minus_1
                    r.u(5)  # frame_presentation_time_length_minus_1
                    decoder_model_info = buffer_delay_len
            initial_display_delay_present = r.u(1)
            n_ops = r.u(5) + 1
            seq_level_idx = 0
            for op in range(n_ops):
                r.u(12)  # operating_point_idc
                lvl = r.u(5)
                tier = r.u(1) if lvl > 7 else 0
                if op == 0:
                    seq_level_idx, seq_tier = lvl, tier
                if decoder_model_info is not None:
                    if r.u(1):  # decoder_model_present_for_this_op
                        r.u(decoder_model_info)  # decoder_buffer_delay
                        r.u(decoder_model_info)  # encoder_buffer_delay
                        r.u(1)  # low_delay_mode_flag
                if initial_display_delay_present:
                    if r.u(1):
                        r.u(4)  # initial_display_delay_minus_1
        wbits = r.u(4) + 1
        hbits = r.u(4) + 1
        width = r.u(wbits) + 1
        height = r.u(hbits) + 1
        if width <= 0 or height <= 0:
            return None
        return {
            "seq_profile": seq_profile,
            "seq_level_idx": seq_level_idx,
            "seq_tier": seq_tier,
            "width": width,
            "height": height,
        }
    except (ValueError, IndexError):
        return None


def encode_av1_sequence_header(
    width: int, height: int, seq_profile: int = 0, seq_level_idx: int = 8,
    seq_tier: int = 0, with_timing_info: bool = False,
) -> bytes:
    """Spec-layout Sequence Header OBU (has_size_field set, one
    operating point); ``with_timing_info`` exercises the timing-info
    skip path real encoder output hits."""
    w = _BitWriter()
    w.u(seq_profile, 3)
    w.u(0, 1)  # still_picture
    w.u(0, 1)  # reduced_still_picture_header
    if with_timing_info:
        w.u(1, 1)
        w.u(25, 32)  # num_units_in_display_tick
        w.u(200, 32)  # time_scale
        w.u(1, 1)  # equal_picture_interval
        # num_ticks_per_picture_minus_1 = 0 via uvlc: one '1' bit
        w.u(1, 1)
        w.u(0, 1)  # decoder_model_info_present
    else:
        w.u(0, 1)  # timing_info_present
    w.u(0, 1)  # initial_display_delay_present
    w.u(0, 5)  # operating_points_cnt_minus_1
    w.u(0, 12)  # operating_point_idc
    w.u(seq_level_idx, 5)
    if seq_level_idx > 7:
        w.u(seq_tier, 1)
    wbits = max((width - 1).bit_length(), 1)
    hbits = max((height - 1).bit_length(), 1)
    w.u(wbits - 1, 4)
    w.u(hbits - 1, 4)
    w.u(width - 1, wbits)
    w.u(height - 1, hbits)
    # frame_id_numbers_present + enough trailing zeros for over-readers
    w.u(0, 8)
    payload = w.rbsp_bytes()
    size = len(payload)
    leb = []
    v = size
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            leb.append(b | 0x80)
        else:
            leb.append(b)
            break
    return bytes([0x0A]) + bytes(leb) + payload  # type 1, has_size


def parse_av1c(b: bytes) -> Optional[dict]:
    """AV1CodecConfigurationRecord -> dict(seq_profile, seq_level_idx,
    seq_tier, and — when a Sequence Header OBU rides in configOBUs —
    width/height from it). None when malformed."""
    try:
        if len(b) < 4 or b[0] != 0x81:  # marker=1, version=1
            return None
        out = {
            "seq_profile": b[1] >> 5,
            "seq_level_idx": b[1] & 0x1F,
            "seq_tier": b[2] >> 7,
        }
        i = 4
        while i < len(b):  # configOBUs: find the sequence header
            got = parse_av1_sequence_header(b[i:])
            if got is not None:
                out.update({"width": got["width"], "height": got["height"]})
                break
            i += 1
        return out
    except (ValueError, IndexError):
        return None


def encode_av1c(seq_header_obu: bytes) -> bytes:
    """Wrap a Sequence Header OBU into an AV1CodecConfigurationRecord;
    profile/level/tier mirror the OBU."""
    parsed = parse_av1_sequence_header(seq_header_obu)
    if parsed is None:
        raise ValueError("unparseable sequence header")
    b1 = (parsed["seq_profile"] << 5) | parsed["seq_level_idx"]
    b2 = parsed["seq_tier"] << 7 | 0x0C  # 4:2:0 subsampling x+y
    return bytes([0x81, b1, b2, 0x00]) + seq_header_obu
