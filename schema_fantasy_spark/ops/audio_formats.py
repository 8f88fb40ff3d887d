"""FLAC and Ogg (Opus/Vorbis) metadata parsing + stub encoders.

``parse_flac_metadata`` walks the METADATA_BLOCK chain (STREAMINFO,
VORBIS_COMMENT, PADDING, anything else — last-flag terminated) and
reads the STREAMINFO bitfields: sample rate (20 bits), channels-1
(3 bits), bits-per-sample-1 (5 bits), total samples (36 bits).

``parse_ogg_metadata`` walks Ogg pages (RFC 3533) with CRC32
verification (poly 0x04C11DB7, MSB-first, CRC field zeroed), reads the
first packet's identification header — OpusHead (RFC 7845 §5.1:
channels, pre-skip, input rate) or ``\\x01vorbis`` (channels, rate) —
and takes the stream duration from the final page's granule position
(Opus: (granule - pre_skip) / 48000, the decode rate; Vorbis:
granule / rate).

Both are header walks (no audio-frame decode — the same stance as the
MP3 path: full codec decode of FLAC's Rice/LPC or Opus's CELT needs a
codec library at a deployment, but validation-grade metadata and
duration accounting do not). Corrupt/truncated containers return None
— the per-row quarantine contract (reference: one bad document is one
violation, src/index.js:56-63).

The stub encoders exist for tests and the deterministic oracle-gate
corpus: spec-correct headers and page framing with zeroed/fake audio
payload bytes.
"""

from __future__ import annotations

from typing import Optional, Tuple

# ----------------------------------------------------------------- FLAC


def parse_flac_metadata(
    payload: bytes,
) -> Optional[Tuple[int, int, int, float]]:
    """(sample_rate, n_channels, total_samples, duration_sec) from the
    STREAMINFO block; None if not FLAC / truncated / malformed."""
    try:
        if payload[:4] != b"fLaC":
            return None
        off = 4
        info = None
        while True:
            if off + 4 > len(payload):
                return None  # chain truncated before the last block
            hdr = payload[off]
            blen = int.from_bytes(payload[off + 1:off + 4], "big")
            body = payload[off + 4:off + 4 + blen]
            if len(body) < blen:
                return None
            if hdr & 0x7F == 0:  # STREAMINFO
                if blen != 34:
                    return None
                bits = int.from_bytes(body[10:18], "big")
                sr = bits >> 44
                nch = ((bits >> 41) & 0x7) + 1
                total = bits & ((1 << 36) - 1)
                if sr == 0:
                    return None
                info = (sr, nch, total, total / sr)
            off += 4 + blen
            if hdr & 0x80:  # last-metadata-block flag
                return info
    except (IndexError, ValueError):
        return None


def encode_flac_stub(
    sample_rate: int,
    n_channels: int,
    total_samples: int,
    bits_per_sample: int = 16,
    comment: bytes = b"schema-fantasy-spark",
) -> bytes:
    """fLaC + STREAMINFO + VORBIS_COMMENT + PADDING metadata chain and
    a fake frame region (sync-coded, zero payload) — enough container
    for the metadata walk; not a decodable audio stream."""
    bits = (sample_rate << 44) | ((n_channels - 1) << 41) \
        | ((bits_per_sample - 1) << 36) | (total_samples & ((1 << 36) - 1))
    streaminfo = (
        (4096).to_bytes(2, "big") * 2          # min/max block size
        + (0).to_bytes(3, "big") * 2           # min/max frame size unknown
        + bits.to_bytes(8, "big")
        + bytes(16)                            # md5 of samples: unset
    )
    vc_body = ((len(comment)).to_bytes(4, "little") + comment
               + (0).to_bytes(4, "little"))
    out = bytearray(b"fLaC")
    out += bytes([0x00]) + len(streaminfo).to_bytes(3, "big") + streaminfo
    out += bytes([0x04]) + len(vc_body).to_bytes(3, "big") + vc_body
    out += bytes([0x81]) + (8).to_bytes(3, "big") + bytes(8)  # last: PADDING
    out += b"\xff\xf8" + bytes(30)  # fake frame bytes past the chain
    return bytes(out)


# ------------------------------------------------------------------ Ogg

_OGG_CRC_TABLE = []


def _ogg_crc(data: bytes) -> int:
    """RFC 3533 appendix A CRC: poly 0x04C11DB7, MSB-first, init 0, no
    final xor (NOT the reflected zlib crc32)."""
    if not _OGG_CRC_TABLE:
        for i in range(256):
            r = i << 24
            for _ in range(8):
                r = ((r << 1) ^ 0x04C11DB7) if r & 0x80000000 else (r << 1)
            _OGG_CRC_TABLE.append(r & 0xFFFFFFFF)
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _OGG_CRC_TABLE[(crc >> 24) ^ b]
    return crc


def _ogg_pages(payload: bytes):
    """Yield (header_type, granule, packet_data) per page; raises on a
    bad capture pattern, truncation, or a CRC mismatch."""
    off = 0
    while off < len(payload):
        if payload[off:off + 4] != b"OggS":
            raise ValueError("bad capture pattern")
        if off + 27 > len(payload):
            raise ValueError("truncated page header")
        version = payload[off + 4]
        if version != 0:
            raise ValueError("unknown ogg version")
        htype = payload[off + 5]
        granule = int.from_bytes(payload[off + 6:off + 14], "little",
                                 signed=True)
        crc_stored = int.from_bytes(payload[off + 22:off + 26], "little")
        nseg = payload[off + 26]
        lace_end = off + 27 + nseg
        if lace_end > len(payload):
            raise ValueError("truncated lacing")
        body_len = sum(payload[off + 27:lace_end])
        end = lace_end + body_len
        if end > len(payload):
            raise ValueError("truncated page body")
        page = bytearray(payload[off:end])
        page[22:26] = bytes(4)
        if _ogg_crc(bytes(page)) != crc_stored:
            raise ValueError("page CRC mismatch")
        yield htype, granule, payload[lace_end:end]
        off = end


def parse_ogg_metadata(
    payload: bytes,
) -> Optional[Tuple[str, int, int, int, float]]:
    """(codec, sample_rate, n_channels, n_samples, duration_sec) for an
    Ogg stream whose first packet is OpusHead or a Vorbis id header.
    Opus reports the 48 kHz decode rate and subtracts pre-skip per
    RFC 7845 §4; Vorbis divides the final granule by the id-header
    rate. None on non-Ogg / corrupt / CRC-failing input."""
    try:
        first = None
        last_granule = None
        saw_eos = False
        for htype, granule, body in _ogg_pages(payload):
            if first is None:
                if not htype & 0x02:
                    return None  # first page must be BOS
                first = body
            if granule >= 0:
                last_granule = granule
            saw_eos = bool(htype & 0x04)
        if first is None or last_granule is None or not saw_eos:
            return None
        if first[:8] == b"OpusHead":
            if first[8] != 1:  # version
                return None
            nch = first[9]
            pre_skip = int.from_bytes(first[10:12], "little")
            n = max(0, last_granule - pre_skip)
            return "opus", 48000, nch, n, n / 48000.0
        if first[:7] == b"\x01vorbis":
            if int.from_bytes(first[7:11], "little") != 0:
                return None
            nch = first[11]
            sr = int.from_bytes(first[12:16], "little")
            if sr == 0 or nch == 0:
                return None
            return "vorbis", sr, nch, last_granule, last_granule / sr
        return None
    except (ValueError, IndexError):
        return None


def _ogg_page(serial: int, seq: int, htype: int, granule: int,
              packet: bytes) -> bytes:
    """One Ogg page carrying one packet (255-byte lacing)."""
    laces = []
    n = len(packet)
    while n >= 255:
        laces.append(255)
        n -= 255
    laces.append(n)  # terminal lace < 255 (0 for empty / multiple-of-255)
    hdr = bytearray(b"OggS")
    hdr += bytes([0, htype])
    hdr += granule.to_bytes(8, "little", signed=True)
    hdr += serial.to_bytes(4, "little")
    hdr += seq.to_bytes(4, "little")
    hdr += bytes(4)  # CRC placeholder
    hdr += bytes([len(laces)]) + bytes(laces)
    page = bytes(hdr) + packet
    crc = _ogg_crc(page)
    return page[:22] + crc.to_bytes(4, "little") + page[26:]


def encode_ogg_stub(
    codec: str,
    sample_rate: int,
    n_channels: int,
    n_samples: int,
    pre_skip: int = 312,
    serial: int = 0x5F5F,
) -> bytes:
    """Three-page Ogg stream: BOS identification header, comment
    header, one EOS data page whose granule encodes ``n_samples``
    (plus pre-skip for Opus per RFC 7845 §4). Audio payload bytes are
    fake — container-walk grade only."""
    if codec == "opus":
        ident = (b"OpusHead" + bytes([1, n_channels])
                 + pre_skip.to_bytes(2, "little")
                 + sample_rate.to_bytes(4, "little")
                 + bytes(3))  # gain 0, mapping family 0
        comment = (b"OpusTags" + (4).to_bytes(4, "little") + b"sfsk"
                   + (0).to_bytes(4, "little"))
        granule = pre_skip + n_samples
    elif codec == "vorbis":
        ident = (b"\x01vorbis" + (0).to_bytes(4, "little")
                 + bytes([n_channels]) + sample_rate.to_bytes(4, "little")
                 + (0).to_bytes(12, "little") + bytes([0xB8, 0x01]))
        comment = (b"\x03vorbis" + (4).to_bytes(4, "little") + b"sfsk"
                   + (0).to_bytes(4, "little") + bytes([1]))
        granule = n_samples
    else:
        raise ValueError(f"unknown codec {codec!r}")
    return (_ogg_page(serial, 0, 0x02, -1 if codec == "opus" else 0, ident)
            + _ogg_page(serial, 1, 0x00, -1 if codec == "opus" else 0,
                        comment)
            + _ogg_page(serial, 2, 0x04, granule, bytes(64)))
