"""MJPEG-in-AVI video: pure-struct RIFF container parse + writer.

The container is plain RIFF chunk walking (no codec work), and each
frame is a JPEG the sibling ``ops/jpeg.py`` codec decodes — so video
keyframe sampling is a fully REAL path for MJPEG AVIs: parse the
``movi`` list, pick every k-th ``00dc``/``00db`` chunk, huffman+IDCT
decode the frame. Other video containers (MP4/H.264, WebM/VP9) need
codec libraries and remain stubbed in ``ops/multimodal.py``.

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
