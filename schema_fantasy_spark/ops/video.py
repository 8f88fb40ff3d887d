"""MJPEG-in-AVI video: pure-struct RIFF container parse + writer.

The container is plain RIFF chunk walking (no codec work), and each
frame is a JPEG the sibling ``ops/jpeg.py`` codec decodes — so video
keyframe sampling is a fully REAL path for MJPEG AVIs: parse the
``movi`` list, pick every k-th ``00dc``/``00db`` chunk, huffman+IDCT
decode the frame. MP4/MOV gets a REAL container-metadata parse
(``parse_mp4_header``: dims/duration/frame count from the box tree),
as does Matroska/WebM (``parse_mkv_header``: EBML tree walk); the
sample DATA of those containers (H.264/H.265/AV1/VP9) needs codec
libraries and remains stubbed in ``ops/multimodal.py``.

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
        # a strf's layout depends on the enclosing strl's stream type
        # (fccType in its strh): only a 'vids' strf is a
        # BITMAPINFOHEADER — an audio strl's WAVEFORMATEX would parse
        # as garbage dims, and audio strls may legally precede video
        cur_fcc = None
        for cc, b, s in _chunks(payload, inner, inner_end):
            if cc == b"LIST":
                walk_list(b, s)
            elif cc == b"avih" and s >= 40:
                (usec_pf, _, _, _, total) = struct.unpack_from("<5I", payload, b)
                if usec_pf:
                    meta["fps"] = round(1_000_000 / usec_pf, 3)
                meta["n_frames"] = total
            elif cc == b"strh" and s >= 48:
                cur_fcc = payload[b : b + 4]
                if cur_fcc == b"vids":
                    scale, rate = struct.unpack_from("<II", payload, b + 20)
                    if scale:
                        meta["fps"] = round(rate / scale, 3)
            elif (
                cc == b"strf"
                and s >= 24
                and cur_fcc == b"vids"
                and meta["width"] is None
            ):
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

    Walks ftyp/moov(mvhd, trak(tkhd, mdia(mdhd, minf(stbl(stsz, stsd))))),
    64-bit box sizes included; duration comes from mvhd, frame count
    from the video trak's stsz sample_count when present. Dims: for
    ``avc1``/``avc3`` entries the authoritative CODED dims are parsed
    from the SPS inside the stsd entry's ``avcC`` box (ops/h264.py —
    tkhd carries presentation hints that may be scaled or zero), which
    also yields profile_idc/level_idc; other codecs fall back to the
    tkhd fixed-point 16.16 fields. The returned dict always carries
    codec/profile_idc/level_idc keys (None when not applicable)."""
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

    meta = {
        "width": None, "height": None, "duration_sec": None,
        "n_frames": None, "codec": None, "profile_idc": None,
        "level_idc": None,
    }

    def walk_stsd(b: int, e: int) -> dict:
        """First sample entry of an stsd box: codec fourcc, plus SPS
        dims/profile/level for avc1/avc3 (avcC child of the
        VisualSampleEntry, whose fixed part is 78 bytes past its own
        8-byte box header — ISO 14496-12 §12.1.3)."""
        got: dict = {}
        if b + 16 > e:
            return got
        fmt = payload[b + 12 : b + 16]
        got["codec"] = fmt.decode("latin-1")
        if fmt not in (b"avc1", b"avc3", b"hvc1", b"hev1", b"av01"):
            return got
        entry_b = b + 8
        entry_size = int.from_bytes(payload[entry_b : entry_b + 4], "big")
        entry_e = min(entry_b + entry_size, e)
        for t, bb, ee in boxes(entry_b + 86, entry_e):
            if t == b"avcC" and fmt in (b"avc1", b"avc3"):
                from schema_fantasy_spark.ops.h264 import parse_avcc

                rec = parse_avcc(payload[bb:ee])
            elif t == b"hvcC" and fmt in (b"hvc1", b"hev1"):
                from schema_fantasy_spark.ops.h265 import parse_hvcc

                rec = parse_hvcc(payload[bb:ee])
            elif t == b"av1C" and fmt == b"av01":
                from schema_fantasy_spark.ops.av1 import parse_av1c

                rec = parse_av1c(payload[bb:ee])
                if rec is not None:  # av1C names differ from the h26x keys
                    rec = {
                        "width": rec.get("width"),
                        "height": rec.get("height"),
                        "profile_idc": rec["seq_profile"],
                        "level_idc": rec["seq_level_idx"],
                    }
            else:
                continue
            if rec is not None and rec.get("width"):
                got["sps_dims"] = (rec["width"], rec["height"])
                got["profile_idc"] = rec["profile_idc"]
                got["level_idc"] = rec["level_idc"]
            break
        return got

    def walk_trak(start: int, end: int):
        got = {}
        for typ, b, e in boxes(start, end):
            if typ == b"tkhd":
                # fixed part before the reserved/layer/matrix tail:
                # v0 = verflags4 + created4 + modified4 + track_ID4 +
                # reserved4 + duration4 = 24; v1 widens created/
                # modified/duration to 8 bytes = 36. Then reserved8 +
                # layer2 + alt_group2 + volume2 + reserved2 + matrix36
                # = 52 to reach the 16.16 width/height pair.
                ver = payload[b]
                off = b + (36 if ver == 1 else 24) + 52
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
                                    elif t4 == b"stsd":
                                        got.update(walk_stsd(b4, e4))
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
                sps_dims = got.get("sps_dims")
                usable = sps_dims or (dims and dims[0] and dims[1])
                if usable and meta["width"] is None:
                    # SPS coded dims are authoritative for avc1/avc3 —
                    # tkhd presentation dims may be scaled or zero
                    meta["width"], meta["height"] = sps_dims or dims
                    meta["codec"] = got.get("codec")
                    meta["profile_idc"] = got.get("profile_idc")
                    meta["level_idc"] = got.get("level_idc")
                    if "n_frames" in got:
                        meta["n_frames"] = got["n_frames"]
    if meta["width"] is None and meta["duration_sec"] is None:
        return None
    return meta


def encode_mp4_stub(
    width: int, height: int, duration_sec: float, n_frames: int,
    timescale: int = 1000, version: int = 0,
) -> bytes:
    """Minimal valid ISO-BMFF skeleton (ftyp + moov with mvhd/trak/
    tkhd/mdia/minf/stbl/stsz) for header-parse tests — carries NO
    sample data (the decode side is codec-stubbed by design).
    ``version`` selects v0 (32-bit created/modified/duration) or v1
    (64-bit) mvhd+tkhd layouts, both of which the parser must walk."""

    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    dur = int(round(duration_sec * timescale))
    if version == 1:
        mvhd_head = (
            b"\x01" + bytes(3) + bytes(16)
            + timescale.to_bytes(4, "big") + dur.to_bytes(8, "big")
        )
        tkhd_head = (
            b"\x01" + bytes(3) + bytes(16)
            + (1).to_bytes(4, "big") + bytes(4) + dur.to_bytes(8, "big")
        )
    else:
        mvhd_head = (
            bytes(4) + bytes(8)
            + timescale.to_bytes(4, "big") + dur.to_bytes(4, "big")
        )
        # verflags4 + created4 + mod4 + track_ID4 + reserved4 + duration4
        tkhd_head = (
            bytes(4) + bytes(8) + (1).to_bytes(4, "big") + bytes(4)
            + dur.to_bytes(4, "big")
        )
    mvhd = box(b"mvhd", mvhd_head + bytes(80))
    tkhd = box(
        b"tkhd",
        # head + (reserved8 layer2 alt2 vol2 res2 matrix36 = 52) — the
        # spec layout parse_mp4_header walks
        tkhd_head + bytes(52)
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


def parse_mp4_samples(payload: bytes) -> Optional[dict]:
    """ISO-BMFF sample-table DEMUX — the stbl walk that locates every
    sample's bytes without touching a codec: dict(codec, width, height,
    samples=[(offset, size, is_sync)]). This is the core of MP4 reading
    (stsd codec entry, stsz sizes, stsc sample-to-chunk runs, stco/co64
    chunk offsets, stss sync table — absent stss means every sample is
    sync, ISO 14496-12 §8.6.2). With it a pipeline can (a) extract and
    decode samples for codecs it has (MJPEG -> ops/jpeg.py), and (b)
    build a keyframe byte-range INDEX for codecs it doesn't — at 10^12
    docs, sampling keyframes by byte range without decoding is the
    scale path.

    First video track wins (the one whose stsd entry is 4+ bytes).
    Returns None when there is no walkable sample table."""
    n = len(payload)
    if n < 16 or payload[4:8] != b"ftyp":
        return None

    def boxes(start: int, end: int):
        i = start
        while i + 8 <= end:
            size = int.from_bytes(payload[i : i + 4], "big")
            typ = payload[i + 4 : i + 8]
            body = i + 8
            if size == 1:
                if i + 16 > end:
                    return
                size = int.from_bytes(payload[i + 8 : i + 16], "big")
                body = i + 16
            elif size == 0:
                size = end - i
            if size < 8 or i + size > end:
                return
            yield typ, body, i + size
            i += size

    def u32(i: int) -> int:
        return int.from_bytes(payload[i : i + 4], "big")

    def walk_stbl(b: int, e: int) -> Optional[dict]:
        codec = None
        sizes: Optional[list] = None
        stsc: list = []
        chunk_offsets: list = []
        sync: Optional[set] = None
        for t, bb, ee in boxes(b, e):
            if t == b"stsd" and bb + 16 <= ee:
                # verflags4 + entry_count4, then the first sample entry
                # (a box itself: size4 + format4)
                codec = payload[bb + 12 : bb + 16].decode("latin-1")
            elif t == b"stsz" and bb + 12 <= ee:
                fixed = u32(bb + 4)
                cnt = u32(bb + 8)
                if fixed:
                    sizes = [fixed] * cnt
                else:
                    if bb + 12 + 4 * cnt > ee:
                        return None  # truncated size table
                    sizes = [u32(bb + 12 + 4 * k) for k in range(cnt)]
            elif t == b"stsc" and bb + 8 <= ee:
                cnt = u32(bb + 4)
                if bb + 8 + 12 * cnt > ee:
                    return None
                stsc = [
                    (u32(bb + 8 + 12 * k), u32(bb + 12 + 12 * k))
                    for k in range(cnt)
                ]  # (first_chunk, samples_per_chunk); desc index unused
            elif t in (b"stco", b"co64") and bb + 8 <= ee:
                cnt = u32(bb + 4)
                step = 4 if t == b"stco" else 8
                if bb + 8 + step * cnt > ee:
                    return None
                chunk_offsets = [
                    int.from_bytes(
                        payload[bb + 8 + step * k : bb + 8 + step * (k + 1)],
                        "big",
                    )
                    for k in range(cnt)
                ]
            elif t == b"stss" and bb + 8 <= ee:
                cnt = u32(bb + 4)
                if bb + 8 + 4 * cnt > ee:
                    return None
                sync = {u32(bb + 8 + 4 * k) for k in range(cnt)}  # 1-based
        if codec is None or sizes is None or not chunk_offsets or not stsc:
            return None
        # expand stsc runs across the chunk list, then lay samples out
        # within each chunk back to back (ISO 14496-12 §8.7.4-5)
        samples = []
        si = 0
        for run, (first, per) in enumerate(stsc):
            last = (
                stsc[run + 1][0] - 1 if run + 1 < len(stsc) else len(chunk_offsets)
            )
            for ch in range(first - 1, last):
                if ch >= len(chunk_offsets):
                    break
                off = chunk_offsets[ch]
                for _ in range(per):
                    if si >= len(sizes):
                        break
                    sz = sizes[si]
                    is_sync = sync is None or (si + 1) in sync
                    if off + sz <= n:  # truncated tail: quarantine sample
                        samples.append((off, sz, is_sync))
                    off += sz
                    si += 1
        return {"codec": codec, "samples": samples}

    for typ, b, e in boxes(0, n):
        if typ != b"moov":
            continue
        for t1, b1, e1 in boxes(b, e):
            if t1 != b"trak":
                continue
            for t2, b2, e2 in boxes(b1, e1):
                if t2 != b"mdia":
                    continue
                for t3, b3, e3 in boxes(b2, e2):
                    if t3 != b"minf":
                        continue
                    for t4, b4, e4 in boxes(b3, e3):
                        if t4 == b"stbl":
                            got = walk_stbl(b4, e4)
                            if got is not None:
                                return got
    return None


def encode_mp4_mjpeg(
    frames: list, width: int, height: int, fps: int = 12,
    chunk_size: int = 2,
) -> bytes:
    """Playable-layout MJPEG-in-MP4: ftyp + mdat (the JPEG samples,
    chunked ``chunk_size`` per chunk) + moov whose stbl carries the REAL
    tables — stsd 'jpeg' VisualSampleEntry, stts, stsc (two runs when
    the tail chunk is short), stsz, stco, and an stss marking the
    0-based-even samples sync (exercises the sync-table path even
    though MJPEG is all-intra)."""

    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    nf = len(frames)
    timescale = fps
    mdat_body = b"".join(frames)
    ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isomiso2")
    mdat = box(b"mdat", mdat_body)
    data_base = len(ftyp) + 8  # first sample byte inside mdat

    chunks = [frames[i : i + chunk_size] for i in range(0, nf, chunk_size)]
    offsets, off = [], data_base
    for ch in chunks:
        offsets.append(off)
        off += sum(len(f) for f in ch)

    # VisualSampleEntry 'jpeg' (ISO 14496-12 §12.1.3 layout)
    entry = (
        bytes(6) + (1).to_bytes(2, "big")          # reserved + data_ref_idx
        + bytes(16)                                  # predefined/reserved
        + width.to_bytes(2, "big") + height.to_bytes(2, "big")
        + (0x480000).to_bytes(4, "big") * 2          # 72 dpi x/y
        + bytes(4) + (1).to_bytes(2, "big")          # reserved + frame_count
        + bytes(32)                                  # compressorname
        + (24).to_bytes(2, "big") + (0xFFFF).to_bytes(2, "big")
    )
    stsd = box(b"stsd", bytes(4) + (1).to_bytes(4, "big")
               + box(b"jpeg", entry))
    stts = box(b"stts", bytes(4) + (1).to_bytes(4, "big")
               + nf.to_bytes(4, "big") + (1).to_bytes(4, "big"))
    stsc_entries = [(1, chunk_size, 1)]
    if nf % chunk_size and len(chunks) > 1:
        stsc_entries.append((len(chunks), nf % chunk_size, 1))
    stsc = box(b"stsc", bytes(4) + len(stsc_entries).to_bytes(4, "big")
               + b"".join(a.to_bytes(4, "big") + b.to_bytes(4, "big")
                          + c.to_bytes(4, "big") for a, b, c in stsc_entries))
    stsz = box(b"stsz", bytes(4) + bytes(4) + nf.to_bytes(4, "big")
               + b"".join(len(f).to_bytes(4, "big") for f in frames))
    stco = box(b"stco", bytes(4) + len(offsets).to_bytes(4, "big")
               + b"".join(o.to_bytes(4, "big") for o in offsets))
    syncs = [k + 1 for k in range(0, nf, 2)]
    stss = box(b"stss", bytes(4) + len(syncs).to_bytes(4, "big")
               + b"".join(s.to_bytes(4, "big") for s in syncs))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    minf = box(b"minf", stbl)
    dur = nf  # timescale = fps -> 1 tick per frame
    mdhd = box(b"mdhd", bytes(4) + bytes(8) + timescale.to_bytes(4, "big")
               + dur.to_bytes(4, "big") + bytes(4))
    mdia = box(b"mdia", mdhd + minf)
    tkhd = box(
        b"tkhd",
        bytes(4) + bytes(8) + (1).to_bytes(4, "big") + bytes(4)
        + dur.to_bytes(4, "big") + bytes(52)
        + (width << 16).to_bytes(4, "big") + (height << 16).to_bytes(4, "big"),
    )
    trak = box(b"trak", tkhd + mdia)
    mvhd = box(b"mvhd", bytes(4) + bytes(8) + timescale.to_bytes(4, "big")
               + dur.to_bytes(4, "big") + bytes(80))
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def encode_mp4_avc1(
    width: int, height: int, n_frames: int, fps: int = 8,
    profile_idc: int = 66, level_idc: int = 30, keyframe_every: int = 4,
    chunk_size: int = 2, zero_tkhd_dims: bool = True,
) -> bytes:
    """Spec-layout H.264-in-MP4 for the METADATA/INDEX path: ftyp + mdat
    (length-prefixed filler NAL samples — the engine indexes avc1 by
    byte range, it does not decode it) + moov whose stbl carries the
    real tables (stsd 'avc1' VisualSampleEntry with an avcC holding a
    REAL SPS from ops/h264.encode_sps, stts/stsc/stsz/stco, and an stss
    marking every ``keyframe_every``-th sample sync). ``zero_tkhd_dims``
    writes 0x0 presentation dims so a parser that skips the SPS reports
    nothing — proving dims came from the codec config, which is the
    whole point of the avc1 metadata path."""
    from schema_fantasy_spark.ops.h264 import encode_avcc, encode_sps

    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    sps = encode_sps(width, height, profile_idc, level_idc)
    cfg = box(b"avcC", encode_avcc(sps))
    return _encode_mp4_codec(
        b"avc1", cfg, width, height, n_frames, fps, keyframe_every,
        chunk_size, zero_tkhd_dims,
    )


def encode_mp4_hvc1(
    width: int, height: int, n_frames: int, fps: int = 8,
    profile_idc: int = 1, level_idc: int = 93, keyframe_every: int = 4,
    chunk_size: int = 2, zero_tkhd_dims: bool = True,
) -> bytes:
    """HEVC sibling of :func:`encode_mp4_avc1`: stsd 'hvc1' entry with an
    hvcC holding a REAL H.265 SPS (ops/h265.encode_sps_h265); same
    sample layout, same zeroed tkhd dims proving the config-parse path."""
    from schema_fantasy_spark.ops.h265 import encode_hvcc, encode_sps_h265

    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    sps = encode_sps_h265(width, height, profile_idc, level_idc)
    cfg = box(b"hvcC", encode_hvcc(sps))
    return _encode_mp4_codec(
        b"hvc1", cfg, width, height, n_frames, fps, keyframe_every,
        chunk_size, zero_tkhd_dims,
    )


def encode_mp4_av01(
    width: int, height: int, n_frames: int, fps: int = 8,
    profile_idc: int = 0, level_idc: int = 8, keyframe_every: int = 4,
    chunk_size: int = 2, zero_tkhd_dims: bool = True,
) -> bytes:
    """AV1 sibling of :func:`encode_mp4_avc1`: stsd 'av01' entry with an
    av1C carrying a REAL Sequence Header OBU (ops/av1.py); same sample
    layout, same zeroed tkhd dims proving the config-parse path.
    ``profile_idc``/``level_idc`` map to seq_profile/seq_level_idx."""
    from schema_fantasy_spark.ops.av1 import (
        encode_av1_sequence_header,
        encode_av1c,
    )

    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    obu = encode_av1_sequence_header(width, height, profile_idc, level_idc)
    cfg = box(b"av1C", encode_av1c(obu))
    return _encode_mp4_codec(
        b"av01", cfg, width, height, n_frames, fps, keyframe_every,
        chunk_size, zero_tkhd_dims,
    )


def _encode_mp4_codec(
    fourcc: bytes, config_box: bytes, width: int, height: int,
    n_frames: int, fps: int, keyframe_every: int, chunk_size: int,
    zero_tkhd_dims: bool,
) -> bytes:
    """Shared ftyp/mdat/moov layout for the codec-config writers."""

    def box(typ: bytes, body: bytes) -> bytes:
        return (len(body) + 8).to_bytes(4, "big") + typ + body

    nf = n_frames
    # deterministic filler samples: a 4-byte NAL length prefix + bytes,
    # keyframes bigger (as in real streams), sizes a pure function of k
    samples = []
    for k in range(nf):
        body_len = (200 if k % keyframe_every == 0 else 40) + 8 * (k % 3)
        nal = bytes([(k * 37 + j) & 0xFF for j in range(body_len)])
        samples.append(len(nal).to_bytes(4, "big") + nal)
    timescale = fps
    mdat_body = b"".join(samples)
    ftyp = box(b"ftyp", b"isom" + (0).to_bytes(4, "big") + b"isom" + fourcc)
    mdat = box(b"mdat", mdat_body)
    data_base = len(ftyp) + 8

    chunks = [samples[i : i + chunk_size] for i in range(0, nf, chunk_size)]
    offsets, off = [], data_base
    for ch in chunks:
        offsets.append(off)
        off += sum(len(s) for s in ch)

    entry = (
        bytes(6) + (1).to_bytes(2, "big")          # reserved + data_ref_idx
        + bytes(16)                                  # predefined/reserved
        + width.to_bytes(2, "big") + height.to_bytes(2, "big")
        + (0x480000).to_bytes(4, "big") * 2          # 72 dpi x/y
        + bytes(4) + (1).to_bytes(2, "big")          # reserved + frame_count
        + bytes(32)                                  # compressorname
        + (24).to_bytes(2, "big") + (0xFFFF).to_bytes(2, "big")
        + config_box
    )
    stsd = box(b"stsd", bytes(4) + (1).to_bytes(4, "big")
               + box(fourcc, entry))
    stts = box(b"stts", bytes(4) + (1).to_bytes(4, "big")
               + nf.to_bytes(4, "big") + (1).to_bytes(4, "big"))
    stsc_entries = [(1, chunk_size, 1)]
    if nf % chunk_size and len(chunks) > 1:
        stsc_entries.append((len(chunks), nf % chunk_size, 1))
    stsc = box(b"stsc", bytes(4) + len(stsc_entries).to_bytes(4, "big")
               + b"".join(a.to_bytes(4, "big") + b.to_bytes(4, "big")
                          + c.to_bytes(4, "big") for a, b, c in stsc_entries))
    stsz = box(b"stsz", bytes(4) + bytes(4) + nf.to_bytes(4, "big")
               + b"".join(len(s).to_bytes(4, "big") for s in samples))
    stco = box(b"stco", bytes(4) + len(offsets).to_bytes(4, "big")
               + b"".join(o.to_bytes(4, "big") for o in offsets))
    syncs = [k + 1 for k in range(0, nf, keyframe_every)]
    stss = box(b"stss", bytes(4) + len(syncs).to_bytes(4, "big")
               + b"".join(s.to_bytes(4, "big") for s in syncs))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    minf = box(b"minf", stbl)
    dur = nf  # timescale = fps -> 1 tick per frame
    mdhd = box(b"mdhd", bytes(4) + bytes(8) + timescale.to_bytes(4, "big")
               + dur.to_bytes(4, "big") + bytes(4))
    mdia = box(b"mdia", mdhd + minf)
    tw, th = (0, 0) if zero_tkhd_dims else (width, height)
    tkhd = box(
        b"tkhd",
        bytes(4) + bytes(8) + (1).to_bytes(4, "big") + bytes(4)
        + dur.to_bytes(4, "big") + bytes(52)
        + (tw << 16).to_bytes(4, "big") + (th << 16).to_bytes(4, "big"),
    )
    trak = box(b"trak", tkhd + mdia)
    mvhd = box(b"mvhd", bytes(4) + bytes(8) + timescale.to_bytes(4, "big")
               + dur.to_bytes(4, "big") + bytes(80))
    moov = box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# -------------------------------------------------- matroska/webm (meta)

EBML_MAGIC = b"\x1a\x45\xdf\xa3"


def _ebml_id(buf: bytes, i: int, end: int):
    """Element ID at i -> (id_value_with_marker, next_i) or None. The
    leading-zero count of the first byte gives the length (1-4); IDs
    conventionally keep their marker bits (0x1A45DFA3 style)."""
    if i >= end:
        return None
    b0 = buf[i]
    for ln in range(1, 5):
        if b0 & (0x100 >> ln):
            if i + ln > end:
                return None
            return int.from_bytes(buf[i : i + ln], "big"), i + ln
    return None


def _ebml_size(buf: bytes, i: int, end: int):
    """Size VINT at i -> (size, next_i) or None; marker bit masked out.
    The all-ones 'unknown size' form (used by live-streamed Segments)
    resolves to everything up to ``end``."""
    if i >= end:
        return None
    b0 = buf[i]
    for ln in range(1, 9):
        if b0 & (0x100 >> ln):
            if i + ln > end:
                return None
            v = b0 & ((0x100 >> ln) - 1)
            for k in range(1, ln):
                v = (v << 8) | buf[i + k]
            if v == (1 << (7 * ln)) - 1:
                v = end - (i + ln)
            return v, i + ln
    return None


def _ebml_children(buf: bytes, start: int, end: int):
    """Iterate (element_id, body_start, body_end) over an EBML run;
    stops cleanly at truncation or malformed lengths."""
    i = start
    while i < end:
        rid = _ebml_id(buf, i, end)
        if rid is None:
            return
        eid, j = rid
        rsz = _ebml_size(buf, j, end)
        if rsz is None:
            return
        sz, k = rsz
        if k + sz > end:
            # truncated CONTAINER elements still yield their available
            # prefix so complete children before the damage survive
            # (leaf readers bound themselves by body_end; a truncated
            # leaf yields a short body, read defensively). Master
            # elements this codebase walks are the Segment/Tracks/
            # Cluster tree - clamping is the per-row quarantine rule.
            if eid in (0x18538067, 0x1654AE6B, 0x1F43B675, 0xAE, 0xE0):
                yield eid, k, end
            return
        yield eid, k, k + sz
        i = k + sz


def parse_mkv_header(payload: bytes) -> Optional[dict]:
    """Matroska/WebM container METADATA — pure EBML tree walking, no
    codec work: dict(width, height, duration_sec, n_frames=None). Dims
    come from the first TrackEntry with TrackType video (1); duration
    from Segment Info (Duration float ticks x TimestampScale ns,
    default 1,000,000 = milliseconds). Matroska headers carry no total
    frame count (that lives in the Cluster/Block stream), so n_frames
    is always None here."""
    n = len(payload)
    if n < 8 or payload[:4] != EBML_MAGIC:
        return None
    meta = {"width": None, "height": None, "duration_sec": None, "n_frames": None}
    scale_ns = 1_000_000
    dur_ticks = None
    for eid, b, e in _ebml_children(payload, 0, n):
        if eid != 0x18538067:  # Segment
            continue
        for e1, b1, e1e in _ebml_children(payload, b, e):
            if e1 == 0x1549A966:  # Info
                for e2, b2, e2e in _ebml_children(payload, b1, e1e):
                    if e2 == 0x2AD7B1 and e2e > b2:  # TimestampScale
                        scale_ns = int.from_bytes(payload[b2:e2e], "big")
                    elif e2 == 0x4489:  # Duration (float)
                        raw = payload[b2:e2e]
                        if len(raw) == 4:
                            dur_ticks = struct.unpack(">f", raw)[0]
                        elif len(raw) == 8:
                            dur_ticks = struct.unpack(">d", raw)[0]
            elif e1 == 0x1654AE6B:  # Tracks
                for e2, b2, e2e in _ebml_children(payload, b1, e1e):
                    if e2 != 0xAE:  # TrackEntry
                        continue
                    ttype, w, h = None, None, None
                    for e3, b3, e3e in _ebml_children(payload, b2, e2e):
                        if e3 == 0x83 and e3e > b3:  # TrackType
                            ttype = int.from_bytes(payload[b3:e3e], "big")
                        elif e3 == 0xE0:  # Video settings
                            for e4, b4, e4e in _ebml_children(payload, b3, e3e):
                                if e4 == 0xB0 and e4e > b4:  # PixelWidth
                                    w = int.from_bytes(payload[b4:e4e], "big")
                                elif e4 == 0xBA and e4e > b4:  # PixelHeight
                                    h = int.from_bytes(payload[b4:e4e], "big")
                    if ttype == 1 and w and h and meta["width"] is None:
                        meta["width"], meta["height"] = w, h
    if dur_ticks is not None and scale_ns > 0:
        meta["duration_sec"] = round(dur_ticks * scale_ns / 1e9, 6)
    if meta["width"] is None and meta["duration_sec"] is None:
        return None
    return meta


def _ebml_vint(n: int) -> bytes:
    """Minimal-length EBML size VINT (marker bit in the first byte)."""
    for ln in range(1, 9):
        if n < (1 << (7 * ln)) - 1:
            return ((1 << (7 * ln)) | n).to_bytes(ln, "big")
    raise ValueError("EBML size out of range")


def _ebml_uint(n: int) -> bytes:
    """Minimal big-endian unsigned payload (>= 1 byte)."""
    return n.to_bytes(max(1, (n.bit_length() + 7) // 8), "big")


def encode_mkv_stub(
    width: int, height: int, duration_sec: float,
    timescale_ns: int = 1_000_000, doctype: bytes = b"matroska",
) -> bytes:
    """Minimal valid Matroska/WebM skeleton (EBML header + Segment with
    Info(TimestampScale, Duration) and Tracks(video TrackEntry)) for
    header-parse tests — no Cluster/Block data (codec-stubbed)."""

    def el(eid: bytes, body: bytes) -> bytes:
        return eid + _ebml_vint(len(body)) + body

    ebml = el(
        EBML_MAGIC,
        el(b"\x42\x86", b"\x01") + el(b"\x42\xf7", b"\x01")      # EBML(Read)Version
        + el(b"\x42\xf2", b"\x04") + el(b"\x42\xf3", b"\x08")    # MaxID/SizeLength
        + el(b"\x42\x82", doctype)                                # DocType
        + el(b"\x42\x87", b"\x04") + el(b"\x42\x85", b"\x02"),   # DocType(Read)Version
    )
    dur_ticks = duration_sec * 1e9 / timescale_ns
    info = el(
        b"\x15\x49\xa9\x66",
        el(b"\x2a\xd7\xb1", _ebml_uint(timescale_ns))
        + el(b"\x44\x89", struct.pack(">d", dur_ticks)),
    )
    video = el(b"\xe0", el(b"\xb0", _ebml_uint(width)) + el(b"\xba", _ebml_uint(height)))
    track = el(b"\xae", el(b"\x83", b"\x01") + el(b"\xd7", b"\x01") + video)
    tracks = el(b"\x16\x54\xae\x6b", track)
    segment = el(b"\x18\x53\x80\x67", info + tracks)
    return ebml + segment

# ----------------------------------------------- webm/vp8 (real frames)


def _ebml_svint(v: int) -> bytes:
    """Signed EBML VINT (lace-size delta coding): stored value is
    ``v + (2^(7L-1) - 1)`` at the minimal length L."""
    for ln in range(1, 9):
        bias = (1 << (7 * ln - 1)) - 1
        if -bias <= v <= bias:
            return ((1 << (7 * ln)) | (v + bias)).to_bytes(ln, "big")
    raise ValueError("svint out of range")


def _lace_payload(bodies: list, lacing: str) -> bytes:
    """Lace-header + concatenated frame data for a multi-frame block
    (Matroska 4.1.3): Xiph (255-run sizes), EBML (VINT first size +
    signed-VINT deltas), or fixed (equal sizes, no size table). The
    last frame's size is implicit in every scheme."""
    head = bytes([len(bodies) - 1])
    if lacing == "fixed":
        if len({len(b) for b in bodies}) != 1:
            raise ValueError("fixed lacing needs equal frame sizes")
        return head + b"".join(bodies)
    if lacing == "xiph":
        for b in bodies[:-1]:
            sz = len(b)
            head += b"\xff" * (sz // 255) + bytes([sz % 255])
        return head + b"".join(bodies)
    if lacing == "ebml":
        head += _ebml_vint(len(bodies[0]))
        for prev, cur in zip(bodies, bodies[1:-1]):
            head += _ebml_svint(len(cur) - len(prev))
        return head + b"".join(bodies)
    raise ValueError(f"unknown lacing {lacing!r}")


_LACE_BITS = {"xiph": 0x02, "fixed": 0x04, "ebml": 0x06}


def encode_webm_vp8(
    frames: list, width: int, height: int, fps: int = 12,
    timescale_ns: int = 1_000_000,
) -> bytes:
    """Full WebM file around raw VP8 frames: EBML header (DocType
    webm), Segment with Info/Tracks (CodecID V_VP8, TrackNumber 1,
    PixelWidth/Height) and one Cluster at fps spacing. Each entry of
    ``frames`` is one of:

    * raw bytes — a keyframe SimpleBlock (the historical form);
    * ``(bytes, is_key)`` — a SimpleBlock, keyframe flag as given;
    * ``{"frames": [(bytes, is_key), ...], "lacing": None | "xiph" |
      "ebml" | "fixed", "group": bool}`` — several frames in ONE block:
      a laced SimpleBlock (keyframe flag set only when every frame is a
      key frame), or with ``group=True`` a BlockGroup whose Block
      carries the frames and which emits a ReferenceBlock element when
      any frame is an inter frame (the Matroska way of marking
      non-keyframes — Block has no keyframe flag).

    Pairs with :func:`parse_webm_vp8` + ops/vp8.Vp8StreamDecoder for a
    real in-container VP8 video pipeline (key AND inter frames, laced
    and BlockGroup forms included)."""

    def el(eid: bytes, body: bytes) -> bytes:
        return eid + _ebml_vint(len(body)) + body

    ebml = el(
        EBML_MAGIC,
        el(b"\x42\x86", b"\x01") + el(b"\x42\xf7", b"\x01")
        + el(b"\x42\xf2", b"\x04") + el(b"\x42\xf3", b"\x08")
        + el(b"\x42\x82", b"webm")
        + el(b"\x42\x87", b"\x04") + el(b"\x42\x85", b"\x02"),
    )
    dur_ticks = len(frames) / fps * 1e9 / timescale_ns
    info = el(
        b"\x15\x49\xa9\x66",
        el(b"\x2a\xd7\xb1", _ebml_uint(timescale_ns))
        + el(b"\x44\x89", struct.pack(">d", dur_ticks)),
    )
    video = el(b"\xe0", el(b"\xb0", _ebml_uint(width)) + el(b"\xba", _ebml_uint(height)))
    track = el(
        b"\xae",
        el(b"\xd7", b"\x01") + el(b"\x83", b"\x01")
        + el(b"\x86", b"V_VP8") + video,
    )
    tracks = el(b"\x16\x54\xae\x6b", track)
    ms_per_frame = round(1000 / fps)

    def one_block(entry, ts):
        head = b"\x81" + struct.pack(">h", ts)          # track 1, rel ts
        if not isinstance(entry, dict):
            body, is_key = entry if isinstance(entry, tuple) else (entry, True)
            return el(b"\xa3", head + (b"\x80" if is_key else b"\x00")
                      + bytes(body))
        group = entry.get("group", False)
        lacing = entry.get("lacing")
        bodies = [bytes(b) for b, _k in entry["frames"]]
        all_key = all(k for _b, k in entry["frames"])
        if lacing:
            data = bytes([_LACE_BITS[lacing]]) + _lace_payload(bodies, lacing)
        else:
            if len(bodies) != 1:
                raise ValueError("multiple frames need lacing")
            data = b"\x00" + bodies[0]
        if not group:
            if lacing:
                data = bytes([data[0] | (0x80 if all_key else 0)]) + data[1:]
            elif all_key:
                data = b"\x80" + data[1:]
            return el(b"\xa3", head + data)
        block = el(b"\xa1", head + data)
        if not all_key:  # ReferenceBlock (-1: refs the previous frame)
            block += el(b"\xfb", b"\xff")
        return el(b"\xa0", block)

    blocks, ts = b"", 0
    for entry in frames:
        blocks += one_block(entry, ts * ms_per_frame)
        ts += (len(entry["frames"]) if isinstance(entry, dict) else 1)
    cluster = el(b"\x1f\x43\xb6\x75", el(b"\xe7", b"\x00") + blocks)
    segment = el(b"\x18\x53\x80\x67", info + tracks + cluster)
    return ebml + segment


def _unlace(buf: bytes, pos: int, end: int, lace_bits: int):
    """Frame bodies of a (Simple)Block payload after the flags byte:
    no lacing -> one body; Xiph (255-run size table), EBML (VINT first
    size + signed-VINT deltas), or fixed (equal split) -> each laced
    frame in order (Matroska 4.1.3; the last size is implicit). None on
    malformed tables — the caller quarantines the block."""
    if lace_bits == 0:
        return [buf[pos:end]]
    if pos >= end:
        return None
    n = buf[pos] + 1
    pos += 1
    sizes = []
    if lace_bits == 0x02:          # Xiph
        for _ in range(n - 1):
            sz = 0
            while pos < end and buf[pos] == 255:
                sz += 255
                pos += 1
            if pos >= end:
                return None
            sz += buf[pos]
            pos += 1
            sizes.append(sz)
    elif lace_bits == 0x04:        # fixed
        if (end - pos) % n:
            return None
        each = (end - pos) // n
        sizes = [each] * (n - 1)
    else:                          # EBML
        first = _ebml_size(buf, pos, end)
        if first is None:
            return None
        sz, pos = first
        sizes.append(sz)
        for _ in range(n - 2):
            if pos >= end:
                return None
            b0 = buf[pos]
            ln = next((k for k in range(1, 9) if b0 & (0x100 >> k)), None)
            if ln is None or pos + ln > end:
                return None
            v = int.from_bytes(buf[pos : pos + ln], "big") & ~(
                (0x100 >> ln) << (8 * (ln - 1))
            )
            sz += v - ((1 << (7 * ln - 1)) - 1)
            pos += ln
            sizes.append(sz)
    if any(s < 0 for s in sizes) or pos + sum(sizes) > end:
        return None
    out = []
    for s in sizes:
        out.append(buf[pos : pos + s])
        pos += s
    out.append(buf[pos:end])       # last frame: implicit size
    return out


def parse_webm_vp8(payload: bytes) -> Optional[dict]:
    """VP8 frames of a WebM/Matroska file: {width, height,
    track_number, frames: [bytes], blocks: [(bytes, is_key)]} walking
    Segment -> Tracks (the V_VP8 TrackEntry) -> Clusters ->
    SimpleBlocks AND BlockGroups of that track. ``blocks`` carries
    EVERY frame in bitstream order with its keyframe flag (feed to
    Vp8StreamDecoder): laced blocks (Xiph / EBML / fixed) expand to
    one entry per laced frame (the SimpleBlock keyframe flag applies
    to the whole lace), and BlockGroup keyframe-ness comes from the
    ABSENCE of a ReferenceBlock child (Block has no keyframe flag).
    ``frames`` keeps the historical keyframe-only view. Malformed/
    truncated tails quarantine cleanly: complete blocks before the
    damage survive, like every decoder in ops/. None when the payload
    is not EBML or has no V_VP8 track."""
    n = len(payload)
    if n < 8 or payload[:4] != EBML_MAGIC:
        return None
    out = {"width": None, "height": None, "track_number": None,
           "frames": [], "blocks": []}
    try:
        for eid, b, e in _ebml_children(payload, 0, n):
            if eid != 0x18538067:  # Segment
                continue
            # pass 1: find the V_VP8 track
            for e1, b1, e1e in _ebml_children(payload, b, e):
                if e1 != 0x1654AE6B:  # Tracks
                    continue
                for e2, b2, e2e in _ebml_children(payload, b1, e1e):
                    if e2 != 0xAE:  # TrackEntry
                        continue
                    tn, codec, w, h = None, None, None, None
                    for e3, b3, e3e in _ebml_children(payload, b2, e2e):
                        if e3 == 0xD7:
                            tn = int.from_bytes(payload[b3:e3e], "big")
                        elif e3 == 0x86:
                            codec = payload[b3:e3e].rstrip(b"\x00")
                        elif e3 == 0xE0:  # Video
                            for e4, b4, e4e in _ebml_children(payload, b3, e3e):
                                if e4 == 0xB0:
                                    w = int.from_bytes(payload[b4:e4e], "big")
                                elif e4 == 0xBA:
                                    h = int.from_bytes(payload[b4:e4e], "big")
                    if codec == b"V_VP8" and tn is not None:
                        out["track_number"] = tn
                        out["width"], out["height"] = w, h
            if out["track_number"] is None:
                return None
            # pass 2: collect the track's frames from SimpleBlocks and
            # BlockGroups (laced or not), in bitstream order
            def eat_block(b2, e2e, is_key):
                """(Simple)Block payload -> append expanded frames;
                is_key None means 'from the SimpleBlock flag'."""
                if e2e - b2 < 5:
                    return
                tb = payload[b2]
                if not tb & 0x80:  # multi-byte track VINT: not ours
                    return
                if (tb & 0x7F) != out["track_number"]:
                    return
                flags = payload[b2 + 3]
                if is_key is None:
                    is_key = bool(flags & 0x80)
                bodies = _unlace(payload, b2 + 4, e2e, flags & 0x06)
                if bodies is None:
                    return  # malformed lace table: quarantine the block
                for body in bodies:
                    out["blocks"].append((body, is_key))
                    if is_key:
                        out["frames"].append(body)

            for e1, b1, e1e in _ebml_children(payload, b, e):
                if e1 != 0x1F43B675:  # Cluster
                    continue
                for e2, b2, e2e in _ebml_children(payload, b1, e1e):
                    if e2 == 0xA3:                     # SimpleBlock
                        eat_block(b2, e2e, None)
                    elif e2 == 0xA0:                   # BlockGroup
                        blk = None
                        referenced = False
                        for e3, b3, e3e in _ebml_children(payload, b2, e2e):
                            if e3 == 0xA1:             # Block
                                blk = (b3, e3e)
                            elif e3 == 0xFB:           # ReferenceBlock
                                referenced = True
                        if blk is not None:
                            eat_block(blk[0], blk[1], not referenced)
    except Exception:
        pass  # truncated tail: keep what parsed
    return out if out["track_number"] is not None else None

