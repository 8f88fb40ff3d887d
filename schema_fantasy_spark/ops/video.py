"""MJPEG-in-AVI video: pure-struct RIFF container parse + writer.

The container is plain RIFF chunk walking (no codec work), and each
frame is a JPEG the sibling ``ops/jpeg.py`` codec decodes — so video
keyframe sampling is a fully REAL path for MJPEG AVIs: parse the
``movi`` list, pick every k-th ``00dc``/``00db`` chunk, huffman+IDCT
decode the frame. MP4/MOV gets a REAL container-metadata parse
(``parse_mp4_header``: dims/duration/frame count from the box tree);
its sample DATA (H.264/H.265/AV1) and WebM/VP9 need codec libraries
and remain stubbed in ``ops/multimodal.py``.

Writer emits the minimal standard layout: RIFF('AVI ' LIST('hdrl'
avih, LIST('strl' strh strf)) LIST('movi' 00dc...)); parser walks any
chunk order, skips unknown chunks (idx1, JUNK, extra streams), honors
even-byte chunk padding, and returns None for anything malformed.
"""

from __future__ import annotations

import struct
from typing import List, Optional

# ------------------------------------------------------------------ parse


def _chunks(buf: bytes, start: int, end: int):
    """Iterate (fourcc, body_start, body_size) over a RIFF chunk run;
    stops at truncation. Chunk bodies pad to even length."""
    i = start
    while i + 8 <= end:
        fourcc = buf[i : i + 4]
        size = struct.unpack_from("<I", buf, i + 4)[0]
        body = i + 8
        if body + size > end:
            return
        yield fourcc, body, size
        i = body + size + (size & 1)


def parse_avi(payload: bytes) -> Optional[dict]:
    """Parse an AVI container -> dict(width, height, fps, n_frames,
    frames=[bytes]) or None if not a (well-formed) AVI. ``frames`` holds
    the raw per-frame payloads from the ``movi`` list in order
    (``00dc``/``00db`` video chunks of stream 0)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None
    meta = {"width": None, "height": None, "fps": None, "n_frames": None}
    frames: List[bytes] = []

    def walk_list(body: int, size: int) -> None:
        list_type = payload[body : body + 4]
        inner, inner_end = body + 4, body + size
        if list_type == b"movi":
            for cc, b, s in _chunks(payload, inner, inner_end):
                if cc in (b"00dc", b"00db"):
                    frames.append(payload[b : b + s])
                elif cc == b"LIST" and payload[b : b + 4] == b"rec ":
                    for cc2, b2, s2 in _chunks(payload, b + 4, b + s):
                        if cc2 in (b"00dc", b"00db"):
                            frames.append(payload[b2 : b2 + s2])
            return
        for cc, b, s in _chunks(payload, inner, inner_end):
            if cc == b"LIST":
                walk_list(b, s)
            elif cc == b"avih" and s >= 40:
                (usec_pf, _, _, _, total) = struct.unpack_from("<5I", payload, b)
                if usec_pf:
                    meta["fps"] = round(1_000_000 / usec_pf, 3)
                meta["n_frames"] = total
            elif cc == b"strh" and s >= 48:
                if payload[b : b + 4] == b"vids":
                    scale, rate = struct.unpack_from("<II", payload, b + 20)
                    if scale:
                        meta["fps"] = round(rate / scale, 3)
            elif cc == b"strf" and s >= 24 and meta["width"] is None:
                w, h = struct.unpack_from("<ii", payload, b + 4)
                meta["width"], meta["height"] = w, abs(h)

    for cc, b, s in _chunks(payload, 12, len(payload)):
        if cc == b"LIST":
            walk_list(b, s)
    if meta["width"] is None or not frames:
        return None
    if meta["n_frames"] in (None, 0):
        meta["n_frames"] = len(frames)
    meta["frames"] = frames
    return meta


# ------------------------------------------------------------------ write


def encode_avi_mjpeg(
    frames: List[bytes], width: int, height: int, fps: int = 12
) -> bytes:
    """Minimal standard MJPEG AVI from per-frame JPEG payloads."""
    if not frames or fps <= 0:
        raise ValueError("need frames and positive fps")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        max_bytes * fps,   # dwMaxBytesPerSec
        0, 0x10,           # padding, AVIF_HASINDEX off -> plain flags
        len(frames), 0, 1, max_bytes,
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      max_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


# ------------------------------------------------------------- mp4 (meta)


def parse_mp4_header(payload: bytes) -> Optional[dict]:
    """ISO-BMFF (MP4/MOV) container METADATA — pure box walking, no
    codec work: dict(width, height, duration_sec, n_frames|None). The
    sample data itself needs H.264/H.265/AV1 decoders (stubbed);
    training pipelines routinely need exactly this header slice (dims,
    duration) without decode.

    Walks ftyp/moov(mvhd, trak(tkhd, mdia(mdhd, minf(stbl(stsz))))),
    64-bit box sizes included; dims come from the first video trak's
    tkhd fixed-point 16.16 fields, duration from mvhd, frame count from
    that trak's stsz sample_count when present."""
    n = len(payload)
    if n < 16 or payload[4:8] != b"ftyp":
        return None

    def boxes(start: int, end: int):
        i = start
        while i + 8 <= end:
            size = int.from_bytes(payload[i : i + 4], "big")
            typ = payload[i + 4 : i + 8]
            body = i + 8
            if size == 1:  # 64-bit largesize
                if i + 16 > end:
                    return
                size = int.from_bytes(payload[i + 8 : i + 16], "big")
                body = i + 16
            elif size == 0:  # to end of file
                size = end - i
            if size < 8 or i + size > end:
                return
            yield typ, body, i + size
            i += size

    meta = {"width": None, "height": None, "duration_sec": None, "n_frames": None}

    def walk_trak(start: int, end: int):
        got = {}
        for typ, b, e in boxes(start, end):
            if typ == b"tkhd":
                ver = payload[b]
                off = b + (32 if ver == 1 else 20) + 52
                if off + 8 <= e:
                    w = int.from_bytes(payload[off : off + 4], "big") >> 16
                    h = int.from_bytes(payload[off + 4 : off + 8], "big") >> 16
                    got["dims"] = (w, h)
            elif typ == b"mdia":
                for t2, b2, e2 in boxes(b, e):
                    if t2 == b"minf":
                        for t3, b3, e3 in boxes(b2, e2):
                            if t3 == b"stbl":
                                for t4, b4, e4 in boxes(b3, e3):
                                    if t4 == b"stsz" and b4 + 12 <= e4:
                                        got["n_frames"] = int.from_bytes(
                                            payload[b4 + 8 : b4 + 12], "big"
                                        )
        return got

    for typ, b, e in boxes(0, n):
        if typ != b"moov":
            continue
        for t1, b1, e1 in boxes(b, e):
            if t1 == b"mvhd":
                ver = payload[b1]
                if ver == 1:
                    scale = int.from_bytes(payload[b1 + 20 : b1 + 24], "big")
                    dur = int.from_bytes(payload[b1 + 24 : b1 + 32], "big")
                else:
                    scale = int.from_bytes(payload[b1 + 12 : b1 + 16], "big")
                    dur = int.from_bytes(payload[b1 + 16 : b1 + 20], "big")
                if scale:
                    meta["duration_sec"] = round(dur / scale, 6)
            elif t1 == b"trak":
                got = walk_trak(b1, e1)
                dims = got.get("dims")
                if dims and dims[0] and dims[1] and meta["width"] is None:
                    meta["width"], meta["height"] = dims
                    if "n_frames" in got:
                        meta["n_frames"] = got["n_frames"]
    if meta["width"] is None and meta["duration_sec"] is None:
        return None
    return meta


def encode_mp4_stub(
    width: int, height: int, duration_sec: float, n_frames: int,
    timescale: int = 1000,
) -> bytes:
    """Minimal valid ISO-BMFF skeleton (ftyp + moov with mvhd/trak/
    tkhd/mdia/minf/stbl/stsz) for header-parse tests — carries NO
    sample data (the decode side is codec-stubbed by design)."""

    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    dur = int(round(duration_sec * timescale))
    mvhd = box(
        b"mvhd",
        bytes(4) + bytes(8)
        + timescale.to_bytes(4, "big") + dur.to_bytes(4, "big")
        + bytes(80),
    )
    tkhd = box(
        b"tkhd",
        bytes(4) + bytes(16) + bytes(52)
        + (width << 16).to_bytes(4, "big") + (height << 16).to_bytes(4, "big"),
    )
    stsz = box(b"stsz", bytes(4) + bytes(4) + n_frames.to_bytes(4, "big"))
    stbl = box(b"stbl", stsz)
    minf = box(b"minf", stbl)
    mdia = box(b"mdia", minf)
    trak = box(b"trak", tkhd + mdia)
    moov = box(b"moov", mvhd + trak)
    ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2")
    return ftyp + moov
