"""GIF (87a/89a) decode + encode in pure Python/numpy — no codec libs.

Decoder coverage: logical screen descriptor, global AND local color
tables, LZW decompression (variable 3..12-bit codes, clear/EOI, the
KwKwK case, deferred-clear streams that fill the 4096-entry table),
interlaced row ordering (the 8/8/4/2 four-pass scheme), and Graphic
Control Extension transparency — transparent pixels composite over the
logical-screen background color, frames blit at their descriptor
offsets onto a background-initialized canvas. ``decode_gif`` returns
the FIRST displayed frame as an HxWx3 uint8 array (the still-image
contract the rest of the image pipeline uses — the same stance as
keyframe-only video sampling); ``parse_gif_header`` walks the block
structure without LZW work to report dims + frame count, so metadata
stays O(bytes-scanned) per image.

Encoder (tests + the deterministic oracle-gate corpus): palette
building for <=256 distinct colors, LZW with the decoder-view width
schedule and table reset at 4096, optional interlace and transparency,
87a or 89a output.

The reference validator has no binary surface; this sits in the
multimodal lane the engine adds for training-data pipelines (SURVEY.md
§2 category sweep — the per-row quarantine contract mirrors the
reference's one-bad-document-is-one-violation semantics,
src/index.js:56-63).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

_MAX_DIM = 1 << 15


# ---------------------------------------------------------------- LZW


def _lzw_decode(min_code_size: int, data: bytes, npix: int) -> bytes:
    """GIF-flavor LZW: codes start at min_code_size+1 bits, LSB-first
    bit packing, width grows when the table reaches 1 << width (capped
    at 12 bits / 4096 entries — further codes reuse existing entries
    until a clear, the "deferred clear" encoders emit)."""
    if not 2 <= min_code_size <= 11:
        raise ValueError("bad LZW min code size")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    prev: Optional[bytes] = None
    acc = nbits = 0
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return bytes(out)
            if prev is None:
                if code >= clear:
                    raise ValueError("first LZW code not a literal")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code out of range")
            out += entry
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
            if len(out) >= npix:
                return bytes(out[:npix])
    return bytes(out)


def _lzw_encode(min_code_size: int, data: bytes) -> bytes:
    """Inverse of :func:`_lzw_decode`, using the decoder-view width
    schedule (widen when next_code - 1 == 1 << width) so the streams
    stay in lockstep; resets the table with an explicit clear code when
    it fills."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    prev = b""
    for byte in data:
        cur = prev + bytes([byte])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        if next_code < 4096:
            table[cur] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([byte])
    if prev:
        emit(table[prev])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ------------------------------------------------------- block walking


def _color_table(data: bytes, off: int, size_field: int):
    n = 2 << size_field
    end = off + 3 * n
    if end > len(data):
        raise ValueError("truncated color table")
    return np.frombuffer(data[off:end], dtype=np.uint8).reshape(n, 3), end


def _skip_subblocks(data: bytes, off: int) -> int:
    while True:
        if off >= len(data):
            raise ValueError("truncated sub-blocks")
        n = data[off]
        off += 1
        if n == 0:
            return off
        off += n
        if off > len(data):
            raise ValueError("truncated sub-blocks")


def _collect_subblocks(data: bytes, off: int) -> Tuple[bytes, int]:
    chunks = []
    while True:
        if off >= len(data):
            raise ValueError("truncated sub-blocks")
        n = data[off]
        off += 1
        if n == 0:
            return b"".join(chunks), off
        if off + n > len(data):
            raise ValueError("truncated sub-blocks")
        chunks.append(data[off:off + n])
        off += n


def _interlace_order(h: int) -> list:
    return (list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2)))


# ------------------------------------------------------------- decode


def parse_gif_header(payload: bytes) -> Optional[Tuple[int, int, int]]:
    """(logical width, logical height, frame count) from the block
    structure alone — color tables and pixel sub-blocks are skipped,
    never LZW-decoded. None if not a (well-formed-enough) GIF."""
    try:
        if payload[:6] not in (b"GIF87a", b"GIF89a") or len(payload) < 13:
            return None
        w = int.from_bytes(payload[6:8], "little")
        h = int.from_bytes(payload[8:10], "little")
        if not (0 < w <= _MAX_DIM and 0 < h <= _MAX_DIM):
            return None
        packed = payload[10]
        off = 13
        if packed & 0x80:
            _, off = _color_table(payload, off, packed & 7)
        frames = 0
        while off < len(payload):
            block = payload[off]
            off += 1
            if block == 0x3B:
                break
            if block == 0x21:
                off = _skip_subblocks(payload, off + 1)
            elif block == 0x2C:
                if off + 9 > len(payload):
                    raise ValueError("truncated image descriptor")
                ipacked = payload[off + 8]
                off += 9
                if ipacked & 0x80:
                    _, off = _color_table(payload, off, ipacked & 7)
                off = _skip_subblocks(payload, off + 1)
                frames += 1
            else:
                raise ValueError("unknown block")
        if frames == 0:
            return None
        return w, h, frames
    except (ValueError, IndexError):
        return None


def decode_gif(payload: bytes) -> Optional["np.ndarray"]:
    """First displayed frame as HxWx3 uint8 (logical-screen sized), or
    None on non-GIF / corrupt input (the quarantine contract)."""
    try:
        return _decode_first_frame(payload)
    except (ValueError, IndexError):
        return None


def _decode_first_frame(data: bytes) -> Optional["np.ndarray"]:
    if data[:6] not in (b"GIF87a", b"GIF89a") or len(data) < 13:
        return None
    width = int.from_bytes(data[6:8], "little")
    height = int.from_bytes(data[8:10], "little")
    if not (0 < width <= _MAX_DIM and 0 < height <= _MAX_DIM):
        return None
    packed, bg_index = data[10], data[11]
    off = 13
    gct = None
    if packed & 0x80:
        gct, off = _color_table(data, off, packed & 7)
    transparent: Optional[int] = None
    while off < len(data):
        block = data[off]
        off += 1
        if block == 0x3B:
            break
        if block == 0x21:  # extension
            label = data[off]
            off += 1
            if label == 0xF9 and off < len(data) and data[off] >= 4:
                gpk = data[off + 1]
                transparent = data[off + 4] if (gpk & 1) else None
            off = _skip_subblocks(data, off)
            continue
        if block != 0x2C:
            raise ValueError("unknown block")
        if off + 9 > len(data):
            raise ValueError("truncated image descriptor")
        left = int.from_bytes(data[off:off + 2], "little")
        top = int.from_bytes(data[off + 2:off + 4], "little")
        fw = int.from_bytes(data[off + 4:off + 6], "little")
        fh = int.from_bytes(data[off + 6:off + 8], "little")
        ipacked = data[off + 8]
        off += 9
        lct = gct
        if ipacked & 0x80:
            lct, off = _color_table(data, off, ipacked & 7)
        if lct is None:
            raise ValueError("no color table")
        if fw == 0 or fh == 0 or left + fw > width or top + fh > height:
            raise ValueError("frame outside logical screen")
        mcs = data[off]
        off += 1
        lzw, off = _collect_subblocks(data, off)
        idx = np.frombuffer(
            _lzw_decode(mcs, lzw, fw * fh), dtype=np.uint8)
        if idx.size < fw * fh:
            raise ValueError("truncated pixel data")
        idx = idx.reshape(fh, fw)
        if ipacked & 0x40:
            deint = np.empty_like(idx)
            deint[_interlace_order(fh)] = idx
            idx = deint
        if int(idx.max(initial=0)) >= lct.shape[0]:
            raise ValueError("palette index out of range")
        bg_rgb = (gct[bg_index] if gct is not None and bg_index < len(gct)
                  else np.zeros(3, dtype=np.uint8))
        canvas = np.empty((height, width, 3), dtype=np.uint8)
        canvas[:] = bg_rgb
        frame = lct[idx]
        region = canvas[top:top + fh, left:left + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = frame[mask]
        else:
            region[:] = frame
        return canvas
    return None


# ------------------------------------------------------------- encode


def encode_gif_rgb(
    px: "np.ndarray",
    interlace: bool = False,
    version: bytes = b"89a",
    transparent_rgb: Optional[Tuple[int, int, int]] = None,
    offset: Tuple[int, int] = (0, 0),
    screen: Optional[Tuple[int, int]] = None,
) -> bytes:
    """Single-frame GIF from an HxWx3 uint8 array (<=256 distinct
    colors — palette-exact, so two-tone corpus rows round-trip
    losslessly). ``transparent_rgb`` marks that palette color
    transparent via a GCE (89a only); ``offset``/``screen`` place the
    frame inside a larger logical screen for compositing tests."""
    px = np.ascontiguousarray(np.asarray(px, dtype=np.uint8))
    h, w = px.shape[:2]
    colors, inverse = np.unique(
        px.reshape(-1, 3), axis=0, return_inverse=True)
    if colors.shape[0] > 256:
        raise ValueError("more than 256 distinct colors")
    size_field = max(0, (colors.shape[0] - 1).bit_length() - 1)
    n = 2 << size_field
    palette = np.zeros((n, 3), dtype=np.uint8)
    palette[:colors.shape[0]] = colors
    sw, sh = screen if screen is not None else (w, h)
    left, top = offset
    if left + w > sw or top + h > sh:
        raise ValueError("frame outside logical screen")

    out = bytearray(b"GIF" + version)
    out += sw.to_bytes(2, "little") + sh.to_bytes(2, "little")
    out += bytes([0x80 | size_field, 0, 0])  # GCT flag, bg index 0
    out += palette.tobytes()
    tr_index = None
    if transparent_rgb is not None:
        want = np.array(transparent_rgb, dtype=np.uint8)
        hits = np.nonzero((colors == want).all(axis=1))[0]
        if hits.size == 0:
            raise ValueError("transparent color not in image")
        tr_index = int(hits[0])
        if version != b"89a":
            raise ValueError("transparency needs GIF89a")
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, tr_index, 0])

    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        idx = idx[_interlace_order(h)]
    out += bytes([0x2C])
    out += left.to_bytes(2, "little") + top.to_bytes(2, "little")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0])  # no LCT
    mcs = max(2, size_field + 1)
    out += bytes([mcs])
    lzw = _lzw_encode(mcs, idx.tobytes())
    for i in range(0, len(lzw), 255):
        chunk = lzw[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += bytes([0, 0x3B])
    return bytes(out)
