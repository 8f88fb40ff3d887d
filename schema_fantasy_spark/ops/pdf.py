"""PDF text extraction in pure Python + stdlib zlib — the crawl's
document-corpus workhorse (PDFs are a large share of non-HTML web
content; a training-data pipeline that can't read them loses the
corpus's densest text).

Parser (`extract_pdf_text`): a real object-level parse — indirect
objects located by header scan (crawl PDFs routinely carry broken
xref tables, so the xref is used when it parses and ignored when it
doesn't), a full tokenizer for the object syntax (dicts, arrays,
names, literal strings with all §7.3.4.2 escapes, hex strings,
references, numbers), /Length-aware stream capture (direct or
indirect lengths), FlateDecode via stdlib zlib, page discovery
through the catalog's /Pages tree with a /Type /Page object-order
fallback, and content-stream text operators: Tj, ' , " , TJ (arrays
with kerning numbers — a shift ≤ -180 thousandths reads as a word
space), with Td/TD/T* starting new lines. String decoding is
FONT-AWARE (Tf tracked through the page's /Resources /Font dict):

* simple fonts (Type1/TrueType) decode byte-wise — through their
  /ToUnicode CMap when present, latin-1 (the WinAnsi-compatible
  approximation) otherwise;
* composite Type0 fonts — the shape CJK and most modern
  tool-generated PDFs use — decode as big-endian CIDs (2-byte for
  /Identity-H) through their /ToUnicode CMap (§9.10.3), parsed with
  full begincodespacerange / beginbfchar / beginbfrange support
  (both range destination forms, UTF-16BE incl. surrogate pairs);
* a Type0 font WITHOUT a usable ToUnicode CMap cannot be mapped to
  text: showing a string with it quarantines the page rather than
  emitting garbage (glyph-id soup).

Corrupt/truncated files return None — the per-row quarantine
contract (reference: one bad document is one violation,
src/index.js:56-63).

Writer (`encode_pdf`): spec-correct PDFs (xref with real byte
offsets, catalog → pages → kids, optional FlateDecode, literal or
hex strings, and a `cid=True` mode writing Type0/Identity-H +
CIDFontType2 + a generated ToUnicode CMap exercising both bfrange
and bfchar) for tests and the deterministic oracle-gate corpus.
"""

from __future__ import annotations

import re
import zlib
from typing import Any, Dict, List, Optional, Tuple


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Tokenizer:
    """PDF object-syntax tokenizer over a bytes buffer."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            c = d[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == 0x25:  # % comment to EOL
                while self.pos < n and d[self.pos] not in b"\r\n":
                    self.pos += 1
            else:
                return

    def peek_bytes(self, n: int) -> bytes:
        self._skip_ws()
        return self.data[self.pos:self.pos + n]

    def parse_object(self) -> Any:
        self._skip_ws()
        d = self.data
        if self.pos >= len(d):
            raise ValueError("eof in object")
        c = d[self.pos]
        if d[self.pos:self.pos + 2] == b"<<":
            return self._parse_dict()
        if c == 0x3C:  # <hex string>
            return self._parse_hex_string()
        if c == 0x28:  # (literal string)
            return self._parse_literal_string()
        if c == 0x2F:  # /Name
            return self._parse_name()
        if c == 0x5B:  # [ array
            self.pos += 1
            arr = []
            while True:
                self._skip_ws()
                if self.pos >= len(d):
                    raise ValueError("eof in array")
                if d[self.pos] == 0x5D:
                    self.pos += 1
                    return arr
                arr.append(self.parse_object())
        # number / ref / keyword
        start = self.pos
        while self.pos < len(d) and d[self.pos] not in _WS \
                and d[self.pos] not in _DELIM:
            self.pos += 1
        tok = d[start:self.pos]
        if tok in (b"true", b"false"):
            return tok == b"true"
        if tok == b"null":
            return None
        if re.fullmatch(rb"[+-]?\d+", tok):
            # "n g R" indirect-reference lookahead (R must be a bare
            # token: RG/other keywords fail the trailing check)
            save = self.pos
            self._skip_ws()
            m = re.match(rb"(\d+)[\x00\t\n\x0c\r ]+R(?![0-9A-Za-z])",
                         d[self.pos:self.pos + 32])
            if m and not tok.startswith((b"+", b"-")):
                self.pos += m.end()
                return _Ref(int(tok))
            self.pos = save
            return int(tok)
        if re.fullmatch(rb"[+-]?(\d+\.\d*|\.\d+|\d+)", tok):
            return float(tok)
        return tok  # operator keyword (content streams)

    def _parse_name(self) -> str:
        d = self.data
        self.pos += 1
        start = self.pos
        out = bytearray()
        while self.pos < len(d) and d[self.pos] not in _WS \
                and d[self.pos] not in _DELIM:
            self.pos += 1
        raw = d[start:self.pos]
        i = 0
        while i < len(raw):
            if raw[i] == 0x23 and i + 2 < len(raw):  # #xx escape
                out.append(int(raw[i + 1:i + 3], 16))
                i += 3
            else:
                out.append(raw[i])
                i += 1
        return "/" + out.decode("latin-1")

    def _parse_dict(self) -> Dict[str, Any]:
        self.pos += 2
        out: Dict[str, Any] = {}
        d = self.data
        while True:
            self._skip_ws()
            if d[self.pos:self.pos + 2] == b">>":
                self.pos += 2
                return out
            key = self.parse_object()
            if not isinstance(key, str) or not key.startswith("/"):
                raise ValueError("dict key is not a name")
            out[key] = self.parse_object()

    def _parse_hex_string(self) -> bytes:
        d = self.data
        self.pos += 1
        digits = []
        while True:
            if self.pos >= len(d):
                raise ValueError("eof in hex string")
            c = d[self.pos]
            self.pos += 1
            if c == 0x3E:
                break
            if c in _WS:
                continue
            digits.append(chr(c))
        if len(digits) % 2:
            digits.append("0")
        return bytes.fromhex("".join(digits))

    def _parse_literal_string(self) -> bytes:
        d = self.data
        self.pos += 1
        out = bytearray()
        depth = 1
        while True:
            if self.pos >= len(d):
                raise ValueError("eof in string")
            c = d[self.pos]
            self.pos += 1
            if c == 0x5C:  # backslash
                if self.pos >= len(d):
                    raise ValueError("eof in escape")
                e = d[self.pos]
                self.pos += 1
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                                0x62: 8, 0x66: 12}[e])
                elif e in b"()\\":
                    out.append(e)
                elif 0x30 <= e <= 0x37:  # \ooo (1-3 octal digits)
                    oct_digits = [e - 0x30]
                    for _ in range(2):
                        if self.pos < len(d) and 0x30 <= d[self.pos] <= 0x37:
                            oct_digits.append(d[self.pos] - 0x30)
                            self.pos += 1
                        else:
                            break
                    v = 0
                    for dd in oct_digits:
                        v = v * 8 + dd
                    out.append(v & 0xFF)
                elif e in b"\r\n":  # line continuation
                    if e == 0x0D and self.pos < len(d) \
                            and d[self.pos] == 0x0A:
                        self.pos += 1
                else:
                    out.append(e)  # spec: stray backslash is dropped
            elif c == 0x28:
                depth += 1
                out.append(c)
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    return bytes(out)
                out.append(c)
            else:
                out.append(c)


# ----------------------------------------------------- stream filters


def _ahx_decode(data: bytes) -> bytes:
    """ASCIIHexDecode (§7.4.2): hex pairs, ws ignored, `>` EOD, odd
    trailing digit pads with 0."""
    end = data.find(b">")
    if end >= 0:
        data = data[:end]
    digits = bytes(c for c in data if c not in _WS)
    if not re.fullmatch(rb"[0-9A-Fa-f]*", digits):
        raise ValueError("bad ASCIIHex data")
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii"))


def _a85_decode(data: bytes) -> bytes:
    """ASCII85Decode (§7.4.3): base-85 groups, `z` = 4 zero bytes,
    `~>` EOD, partial final group of n chars yields n-1 bytes."""
    end = data.find(b"~>")
    if end >= 0:
        data = data[:end]
    out = bytearray()
    group: List[int] = []
    for c in data:
        if c in _WS:
            continue
        if c == 0x7A:  # z
            if group:
                raise ValueError("z inside ASCII85 group")
            out += b"\x00\x00\x00\x00"
            continue
        if not 0x21 <= c <= 0x75:
            raise ValueError("bad ASCII85 char")
        group.append(c - 0x21)
        if len(group) == 5:
            v = 0
            for g in group:
                v = v * 85 + g
            if v > 0xFFFFFFFF:
                raise ValueError("ASCII85 group overflow")
            out += v.to_bytes(4, "big")
            group = []
    if group:
        if len(group) == 1:
            raise ValueError("1-char ASCII85 tail")
        n = len(group)
        v = 0
        for g in group + [84] * (5 - n):  # pad with 'u'
            v = v * 85 + g
        out += v.to_bytes(4, "big")[:n - 1]
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """LZWDecode (§7.4.4): MSB-first variable-width (9-12 bit) codes,
    256 = clear, 257 = EOD; /EarlyChange 1 (default) widens one code
    early, exactly as TIFF/PDF readers expect."""
    out = bytearray()
    table: Dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    next_code, width = 258, 9
    prev: Optional[bytes] = None
    bitbuf = nbits = 0
    for byte in data:
        bitbuf = (bitbuf << 8) | byte
        nbits += 8
        while nbits >= width:
            nbits -= width
            code = (bitbuf >> nbits) & ((1 << width) - 1)
            if code == 256:
                table = {i: bytes([i]) for i in range(256)}
                next_code, width, prev = 258, 9, None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= 256:
                    raise ValueError("lzw: first code not literal")
                entry = table[code]
            elif code in table:
                entry = table[code]
            elif code == next_code:
                entry = prev + prev[:1]
            else:
                raise ValueError("lzw: code out of range")
            if prev is not None and next_code < 4096:
                table[next_code] = prev + entry[:1]
                next_code += 1
            out += entry
            prev = entry
            if next_code + early >= (1 << width) and width < 12:
                width += 1
    return bytes(out)  # missing EOD: emit what decoded (crawl tolerance)


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """LZW encoder (writer/tests counterpart of `_lzw_decode`)."""
    table: Dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code, width = 258, 9
    bits: List[Tuple[int, int]] = [(256, 9)]
    w = b""
    for i in range(len(data)):
        c = data[i:i + 1]
        if w + c in table:
            w += c
            continue
        bits.append((table[w], width))
        if next_code < 4096:
            table[w + c] = next_code
            next_code += 1
            if next_code + early > (1 << width) and width < 12:
                width += 1
        w = c
    if w:
        bits.append((table[w], width))
    bits.append((257, width))
    out = bytearray()
    bitbuf = nbits = 0
    for code, wd in bits:
        bitbuf = (bitbuf << wd) | code
        nbits += wd
        while nbits >= 8:
            nbits -= 8
            out.append((bitbuf >> nbits) & 0xFF)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _unpredict(data: bytes, parms: Dict[str, Any]) -> bytes:
    """/Predictor post-filter (§7.4.4.4): 2 = TIFF horizontal,
    10-15 = PNG row filters (None/Sub/Up/Average/Paeth per row)."""
    pred = parms.get("/Predictor", 1)
    if not isinstance(pred, int) or pred <= 1:
        return data
    colors = parms.get("/Colors", 1)
    bpc = parms.get("/BitsPerComponent", 8)
    columns = parms.get("/Columns", 1)
    if bpc != 8:
        raise ValueError("predictor with BitsPerComponent != 8")
    bpp = colors
    rowlen = columns * colors
    if pred == 2:  # TIFF
        out = bytearray(data)
        for r in range(0, len(out) - rowlen + 1, rowlen):
            for i in range(bpp, rowlen):
                out[r + i] = (out[r + i] + out[r + i - bpp]) & 0xFF
        return bytes(out)
    # PNG: each row prefixed by a filter-type byte
    if len(data) % (rowlen + 1):
        raise ValueError("png predictor: ragged rows")
    out = bytearray()
    prior = bytearray(rowlen)
    for r in range(0, len(data), rowlen + 1):
        ft = data[r]
        row = bytearray(data[r + 1:r + 1 + rowlen])
        for i in range(rowlen):
            left = row[i - bpp] if i >= bpp else 0
            up = prior[i]
            ul = prior[i - bpp] if i >= bpp else 0
            if ft == 0:
                v = row[i]
            elif ft == 1:
                v = row[i] + left
            elif ft == 2:
                v = row[i] + up
            elif ft == 3:
                v = row[i] + (left + up) // 2
            elif ft == 4:
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pr = left if pa <= pb and pa <= pc else \
                    (up if pb <= pc else ul)
                v = row[i] + pr
            else:
                raise ValueError(f"png filter type {ft}")
            row[i] = v & 0xFF
        out += row
        prior = row
    return bytes(out)


# ------------------------------------------------------- object scan


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _scan_objects(data: bytes) -> Dict[int, Tuple[Dict[str, Any], Optional[bytes]]]:
    """objnum -> (object dict, raw stream bytes or None). Header-scan
    based (works with broken xrefs); /Length resolves direct ints
    immediately and indirect refs in a second pass."""
    objs: Dict[int, Tuple[Any, Optional[Tuple[int, Any]]]] = {}
    for m in _OBJ_RE.finditer(data):
        num = int(m.group(1))
        tk = _Tokenizer(data, m.end())
        try:
            body = tk.parse_object()
        except (ValueError, IndexError):
            continue
        stream_info = None
        if isinstance(body, dict):
            tk._skip_ws()
            if data[tk.pos:tk.pos + 6] == b"stream":
                p = tk.pos + 6
                if data[p:p + 2] == b"\r\n":
                    p += 2
                elif data[p:p + 1] in (b"\n", b"\r"):
                    p += 1
                stream_info = (p, body.get("/Length"))
        objs[num] = (body, stream_info)

    out: Dict[int, Tuple[Dict[str, Any], Optional[bytes]]] = {}
    for num, (body, sinfo) in objs.items():
        raw = None
        if sinfo is not None:
            p, length = sinfo
            if isinstance(length, _Ref):
                ref_body = objs.get(length.num, (None, None))[0]
                length = ref_body if isinstance(ref_body, int) else None
            if isinstance(length, int) and 0 <= length <= len(data) - p:
                raw = data[p:p + length]
            else:  # damaged Length: fall back to endstream scan
                end = data.find(b"endstream", p)
                if end < 0:
                    continue
                raw = data[p:end].rstrip(b"\r\n")
        out[num] = (body if isinstance(body, dict) else {}, raw)
    return out


def _resolve(objs, v):
    seen = 0
    while isinstance(v, _Ref):
        v = objs.get(v.num, ({}, None))[0]
        seen += 1
        if seen > 32:
            raise ValueError("reference cycle")
    return v


def _decode_stream(body: Dict[str, Any], raw: bytes, objs) -> bytes:
    filt = _resolve(objs, body.get("/Filter"))
    if filt is None:
        return raw
    filters = filt if isinstance(filt, list) else [filt]
    parms = _resolve(objs, body.get("/DecodeParms", body.get("/DP")))
    parms_list = parms if isinstance(parms, list) else [parms]
    for i, f in enumerate(filters):
        f = _resolve(objs, f)
        p = _resolve(objs, parms_list[i]) if i < len(parms_list) else None
        p = p if isinstance(p, dict) else {}
        if f == "/FlateDecode" or f == "/Fl":
            raw = _unpredict(zlib.decompress(raw), p)
        elif f == "/LZWDecode" or f == "/LZW":
            early = p.get("/EarlyChange", 1)
            raw = _unpredict(
                _lzw_decode(raw, early if isinstance(early, int) else 1), p)
        elif f == "/ASCIIHexDecode" or f == "/AHx":
            raw = _ahx_decode(raw)
        elif f == "/ASCII85Decode" or f == "/A85":
            raw = _a85_decode(raw)
        else:
            # DCT/JPX/JBIG2/CCITT are image filters (never text
            # content); Crypt needs the (unsupported) decryptor
            raise ValueError(f"unsupported stream filter {f}")
    return raw


def _expand_object_streams(objs) -> None:
    """PDF 1.5 /ObjStm expansion (§7.5.7): modern writers pack the
    non-stream objects — the catalog, the pages tree, every page dict —
    into compressed object streams, so a header scan alone sees no
    pages at all. Parses each ObjStm's (objnum, offset) header pairs
    and tokenizes the contained objects at /First + offset. Direct
    definitions win on conflict; a damaged container quarantines only
    its own objects."""
    packed: Dict[int, Tuple[Dict[str, Any], Optional[bytes]]] = {}
    for _num, (body, raw) in list(objs.items()):
        if body.get("/Type") != "/ObjStm" or raw is None:
            continue
        try:
            data = _decode_stream(body, raw, objs)
            n = _resolve(objs, body.get("/N"))
            first = _resolve(objs, body.get("/First"))
            if not (isinstance(n, int) and isinstance(first, int)):
                continue
            tk = _Tokenizer(data, 0)
            pairs: List[Tuple[int, int]] = []
            for _ in range(n):
                onum = tk.parse_object()
                ooff = tk.parse_object()
                if not (isinstance(onum, int) and isinstance(ooff, int)):
                    raise ValueError("bad ObjStm header pair")
                pairs.append((onum, ooff))
            for onum, ooff in pairs:
                otk = _Tokenizer(data, first + ooff)
                obody = otk.parse_object()
                packed[onum] = (
                    obody if isinstance(obody, dict) else {}, None)
        except (ValueError, IndexError, KeyError, zlib.error):
            continue
    for num, v in packed.items():
        objs.setdefault(num, v)


def _is_encrypted(payload: bytes, objs) -> bool:
    """/Encrypt lives in the trailer dict (classic xref) or the
    cross-reference stream dict (PDF 1.5+). Encrypted strings/streams
    would extract as garbage — quarantine instead."""
    for m in re.finditer(rb"trailer", payload):
        tk = _Tokenizer(payload, m.end())
        try:
            t = tk.parse_object()
        except (ValueError, IndexError):
            continue
        if isinstance(t, dict) and "/Encrypt" in t:
            return True
    for _num, (body, _raw) in objs.items():
        if body.get("/Type") == "/XRef" and "/Encrypt" in body:
            return True
    return False


def _page_objects(objs) -> List[int]:
    """Page object numbers via the catalog's /Pages tree; object-order
    /Type /Page scan when the tree is missing/broken."""
    root_pages = None
    for num, (body, _raw) in objs.items():
        if isinstance(body, dict) and body.get("/Type") == "/Catalog":
            root_pages = body.get("/Pages")
            break
    pages: List[int] = []
    if root_pages is not None:
        def walk(ref, depth=0):
            if depth > 64:
                raise ValueError("pages tree too deep")
            num = ref.num if isinstance(ref, _Ref) else None
            node = _resolve(objs, ref)
            if not isinstance(node, dict):
                raise ValueError("bad pages node")
            if node.get("/Type") == "/Page":
                pages.append(num)
            else:
                for kid in node.get("/Kids") or []:
                    walk(kid, depth + 1)
        try:
            walk(root_pages)
        except (ValueError, IndexError):
            pages = []
    if not pages:
        pages = [num for num in sorted(objs)
                 if objs[num][0].get("/Type") == "/Page"]
    return pages


def _parse_tounicode(data: bytes) -> Tuple[Dict[int, str], int]:
    """(code -> unicode string, code byte length) from a /ToUnicode
    CMap stream (PDF 32000 §9.10.3; the CMap syntax is Adobe CMap/
    PostScript — the object tokenizer already reads its hex strings,
    names, numbers and bare keywords). Handles ``begincodespacerange``
    (code width), ``beginbfchar`` (src/dst pairs) and ``beginbfrange``
    in both destination forms (incrementing start string, or an array
    of per-code strings). Destinations decode as UTF-16BE, surrogate
    pairs included."""
    tk = _Tokenizer(data, 0)
    mapping: Dict[int, str] = {}
    codelen = 2
    toks: List[Any] = []
    while True:
        tk._skip_ws()
        if tk.pos >= len(data):
            break
        start = tk.pos
        try:
            toks.append(tk.parse_object())
        except (ValueError, IndexError):
            break
        if tk.pos == start:
            break
    i = 0
    while i < len(toks):
        t = toks[i]
        if t == b"begincodespacerange":
            j = toks.index(b"endcodespacerange", i)
            pairs = toks[i + 1:j]
            if pairs and isinstance(pairs[0], bytes):
                codelen = max(1, len(pairs[0]))
            i = j + 1
        elif t == b"beginbfchar":
            j = toks.index(b"endbfchar", i)
            seq = toks[i + 1:j]
            for k in range(0, len(seq) - 1, 2):
                src, dst = seq[k], seq[k + 1]
                if isinstance(src, bytes) and isinstance(dst, bytes):
                    mapping[int.from_bytes(src, "big")] = dst.decode("utf-16-be")
            i = j + 1
        elif t == b"beginbfrange":
            j = toks.index(b"endbfrange", i)
            seq = toks[i + 1:j]
            for k in range(0, len(seq) - 2, 3):
                lo, hi, dst = seq[k], seq[k + 1], seq[k + 2]
                if not (isinstance(lo, bytes) and isinstance(hi, bytes)):
                    continue
                lo_i, hi_i = int.from_bytes(lo, "big"), int.from_bytes(hi, "big")
                if isinstance(dst, list):
                    for off, d in enumerate(dst):
                        if isinstance(d, bytes) and lo_i + off <= hi_i:
                            mapping[lo_i + off] = d.decode("utf-16-be")
                elif isinstance(dst, bytes):
                    base = int.from_bytes(dst, "big")
                    for off in range(hi_i - lo_i + 1):
                        mapping[lo_i + off] = (
                            (base + off).to_bytes(len(dst), "big")
                            .decode("utf-16-be")
                        )
            i = j + 1
        else:
            i += 1
    return mapping, codelen


def _font_decoders(page_body: Dict[str, Any], objs) -> Dict[str, Tuple[str, Any, int]]:
    """Per-page font map: resource name -> (mode, cmap, codelen).
    Modes: ``simple`` (1-byte codes; cmap optional, latin-1 fallback),
    ``cid`` (Type0/Identity-H with a ToUnicode CMap — multi-byte
    codes), ``quarantine`` (a Type0 font we cannot map to text:
    showing a string with it raises, ending the document at the prior
    page — the per-page salvage contract)."""
    out: Dict[str, Tuple[str, Any, int]] = {}
    res = _resolve(objs, page_body.get("/Resources"))
    fonts = _resolve(objs, (res or {}).get("/Font"))
    if not isinstance(fonts, dict):
        return out
    for name, ref in fonts.items():
        f = _resolve(objs, ref)
        if not isinstance(f, dict):
            continue
        cmap = codelen = None
        tou = f.get("/ToUnicode")
        if isinstance(tou, _Ref):
            cbody, craw = objs.get(tou.num, ({}, None))
            if craw is not None:
                try:
                    cmap, codelen = _parse_tounicode(
                        _decode_stream(cbody, craw, objs))
                except (ValueError, IndexError, KeyError, zlib.error):
                    cmap = None
        if f.get("/Subtype") == "/Type0":
            if f.get("/Encoding") == "/Identity-H" and cmap:
                out[name] = ("cid", cmap, 2)  # Identity-H: 2-byte CIDs
            elif cmap:
                out[name] = ("cid", cmap, codelen or 2)
            else:
                out[name] = ("quarantine", None, 0)
        else:
            out[name] = ("simple", cmap, 1)
    return out


def _extract_page_text(
    content: bytes, fonts: Optional[Dict[str, Tuple[str, Any, int]]] = None
) -> List[str]:
    """Content-stream interpreter: tracks operands, emits lines on
    Td/TD (with a vertical move)/T*/'/" and text on Tj/'/"/TJ. String
    bytes decode through the CURRENT FONT (selected by Tf): simple
    fonts byte-wise (ToUnicode entry, else latin-1), Type0/Identity-H
    fonts as big-endian CIDs through their ToUnicode CMap (unmapped
    CIDs -> U+FFFD; a Type0 font WITHOUT one raises = page
    quarantine)."""
    fonts = fonts or {}
    tk = _Tokenizer(content, 0)
    lines: List[str] = []
    cur: List[str] = []
    operands: List[Any] = []
    started = False
    mode, cmap, codelen = "simple", None, 1  # before any Tf

    def dec(bs: bytes) -> str:
        if mode == "quarantine":
            raise ValueError("string shown with an unmappable Type0 font")
        if mode == "cid":
            if len(bs) % codelen:
                raise ValueError("CID string not a whole number of codes")
            return "".join(
                cmap.get(int.from_bytes(bs[i:i + codelen], "big"), "�")
                for i in range(0, len(bs), codelen)
            )
        if cmap:
            return "".join(cmap.get(b, chr(b)) for b in bs)
        return bs.decode("latin-1")

    def flush_line():
        lines.append("".join(cur))
        cur.clear()

    while True:
        tk._skip_ws()
        if tk.pos >= len(content):
            break
        start = tk.pos
        c = content[tk.pos]
        if c in b"(</[" or c in b"+-.0123456789" \
                or content[tk.pos:tk.pos + 2] == b"<<":
            try:
                operands.append(tk.parse_object())
            except (ValueError, IndexError):
                break
            continue
        # bare keyword = operator
        try:
            op = tk.parse_object()
        except (ValueError, IndexError):
            break
        if not isinstance(op, bytes) or tk.pos == start:
            break  # safety: tokenizer made no progress
        if op == b"Tj" and operands and isinstance(operands[-1], bytes):
            cur.append(dec(operands[-1]))
            started = True
        elif op in (b"'", b'"') and operands \
                and isinstance(operands[-1], bytes):
            if started:
                flush_line()
            cur.append(dec(operands[-1]))
            started = True
        elif op == b"TJ" and operands and isinstance(operands[-1], list):
            for el in operands[-1]:
                if isinstance(el, bytes):
                    cur.append(dec(el))
                elif isinstance(el, (int, float)) and el <= -180:
                    cur.append(" ")  # kerning gap wide enough to be a space
            started = True
        elif op == b"Tf" and len(operands) >= 2 \
                and isinstance(operands[-2], str):
            mode, cmap, codelen = fonts.get(
                operands[-2], ("simple", None, 1))
        elif op in (b"Td", b"TD"):
            ty = operands[-1] if operands else 0
            if started and isinstance(ty, (int, float)) and ty != 0:
                flush_line()
        elif op == b"T*":
            if started:
                flush_line()
        operands.clear()
    if cur or started:
        flush_line()
    return lines


def parse_pdf(payload: bytes) -> Optional[Tuple[int, str]]:
    """(n_pages, extracted_text) — pages' lines joined with ``\\n``,
    pages joined with ``\\n`` as well. None on non-PDF / corrupt input."""
    try:
        if not payload.startswith(b"%PDF-"):
            return None
        objs = _scan_objects(payload)
        if not objs:
            return None
        if _is_encrypted(payload, objs):
            return None
        _expand_object_streams(objs)
        pages = _page_objects(objs)
        if not pages:
            return None
        all_lines: List[str] = []
        ok_pages = 0
        for pnum in pages:
            body, _raw = objs[pnum]
            try:
                contents = body.get("/Contents")
                refs = contents if isinstance(contents, list) \
                    else [contents]
                parts = []
                for ref in refs:
                    if not isinstance(ref, _Ref):
                        raise ValueError(
                            "page /Contents is not a stream ref")
                    cbody, craw = objs.get(ref.num, ({}, None))
                    if craw is None:
                        raise ValueError("missing content stream")
                    parts.append(_decode_stream(cbody, craw, objs))
                page_lines = _extract_page_text(
                    b"\n".join(parts), _font_decoders(body, objs))
            except (ValueError, IndexError, KeyError, zlib.error):
                # salvage: a truncated/damaged page ends the document
                # at the last complete page (crawl PDFs are routinely
                # cut mid-transfer); nothing readable -> quarantine
                break
            all_lines.extend(page_lines)
            ok_pages += 1
        if ok_pages == 0:
            return None
        return ok_pages, "\n".join(all_lines)
    except (ValueError, IndexError, KeyError, zlib.error, RecursionError):
        return None


def extract_pdf_text(payload: bytes) -> Optional[str]:
    got = parse_pdf(payload)
    return got[1] if got is not None else None


# ------------------------------------------------------------- writer


def _pdf_escape(s: bytes) -> bytes:
    return (s.replace(b"\\", b"\\\\").replace(b"(", b"\\(")
            .replace(b")", b"\\)"))


def _cid_of(ch: str, extra: Dict[str, int]) -> int:
    """Deterministic CID assignment for the cid=True writer: printable
    ASCII sits at ord+0x100 (covered by ONE bfrange), anything else
    gets a sequential CID from 0x2000 (a bfchar entry each)."""
    o = ord(ch)
    if 0x20 <= o <= 0x7E:
        return o + 0x100
    if ch not in extra:
        extra[ch] = 0x2000 + len(extra)
    return extra[ch]


def encode_pdf(
    pages: List[List[str]],
    compress: bool = False,
    hex_strings: bool = False,
    version: str = "1.4",
    lzw: bool = False,
    objstm: bool = False,
    cid: bool = False,
    tounicode: bool = True,
) -> bytes:
    """Valid PDF: catalog -> pages -> one page object + one content
    stream per page (Helvetica, 12pt, one Tj per line with T* line
    advances). ``compress`` filters the content streams (FlateDecode,
    or LZWDecode when ``lzw``); ``hex_strings`` writes text as <hex>
    strings. ``objstm`` writes the modern PDF 1.5 layout: all
    non-stream objects packed into a Flate ObjStm and a binary
    cross-reference STREAM (/Type /XRef, W [1 4 2], type-2 entries)
    instead of a classic xref table + trailer. ``cid`` writes a
    COMPOSITE font instead: Type0 /Identity-H over a CIDFontType2
    descendant, text as 2-byte-CID hex strings, and a generated
    /ToUnicode CMap (one bfrange for ASCII + bfchar entries for the
    rest — both parser paths exercised); ``tounicode=False`` omits
    the CMap, producing the unmappable-Type0 shape that must
    QUARANTINE on read."""
    if objstm and version == "1.4":
        version = "1.5"  # ObjStm/xref streams are PDF 1.5 features
    dict_objs: Dict[int, bytes] = {}    # non-stream bodies
    stream_objs: Dict[int, bytes] = {}  # full "<<..>>\nstream\n..endstream"

    n = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    dict_objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    dict_objs[2] = f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    font_obj = 3 + 2 * n
    extra_cids: Dict[str, int] = {}
    for i, lines in enumerate(pages):
        page_num = 3 + 2 * i
        content_num = page_num + 1
        dict_objs[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 {font_obj} 0 R >> >> "
            f"/Contents {content_num} 0 R >>").encode()
        ops = [b"BT", b"/F1 12 Tf", b"14 TL", b"72 720 Td"]
        for j, line in enumerate(lines):
            if cid:
                codes = b"".join(
                    _cid_of(ch, extra_cids).to_bytes(2, "big") for ch in line
                )
                s = b"<" + codes.hex().encode() + b">"
            elif hex_strings:
                s = b"<" + line.encode("latin-1").hex().encode() + b">"
            else:
                s = b"(" + _pdf_escape(line.encode("latin-1")) + b")"
            if j > 0:
                ops.append(b"T*")
            ops.append(s + b" Tj")
        ops.append(b"ET")
        stream = b"\n".join(ops)
        extra = b""
        if compress:
            if lzw:
                stream = _lzw_encode(stream)
                extra = b" /Filter /LZWDecode"
            else:
                stream = zlib.compress(stream)
                extra = b" /Filter /FlateDecode"
        stream_objs[content_num] = (
            b"<< /Length " + str(len(stream)).encode() + extra
            + b" >>\nstream\n" + stream + b"\nendstream")
    if cid:
        desc_obj, tou_obj = font_obj + 1, font_obj + 2
        font = (f"<< /Type /Font /Subtype /Type0 /BaseFont /SFSNOTO+Noto "
                f"/Encoding /Identity-H /DescendantFonts [{desc_obj} 0 R]")
        if tounicode:
            font += f" /ToUnicode {tou_obj} 0 R"
        dict_objs[font_obj] = (font + " >>").encode()
        dict_objs[desc_obj] = (
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /SFSNOTO+Noto"
            b" /CIDSystemInfo << /Registry (Adobe) /Ordering (Identity)"
            b" /Supplement 0 >> /CIDToGIDMap /Identity >>")
        if tounicode:
            bfchars = "".join(
                f"<{cid_v:04x}> <{ch.encode('utf-16-be').hex()}>\n"
                for ch, cid_v in sorted(extra_cids.items(), key=lambda kv: kv[1])
            )
            cmap = (
                "/CIDInit /ProcSet findresource begin\n"
                "12 dict begin\nbegincmap\n"
                "/CMapName /SFS-Identity-UCS def\n/CMapType 2 def\n"
                "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
                "1 beginbfrange\n<0120> <017e> <0020>\nendbfrange\n"
                + (f"{len(extra_cids)} beginbfchar\n{bfchars}endbfchar\n"
                   if extra_cids else "")
                + "endcmap\nCMapName currentdict /CMap defineresource pop\n"
                "end\nend"
            ).encode("latin-1")
            stream_objs[tou_obj] = (
                b"<< /Length " + str(len(cmap)).encode()
                + b" >>\nstream\n" + cmap + b"\nendstream")
    else:
        dict_objs[font_obj] = \
            b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"

    out = bytearray(f"%PDF-{version}\n".encode())
    out += b"%\xe2\xe3\xcf\xd3\n"  # binary marker comment
    size = max(dict_objs | stream_objs) + (3 if objstm else 1)
    offsets: Dict[int, int] = {}

    if not objstm:
        for num in sorted(dict_objs | stream_objs):
            body = dict_objs.get(num) or stream_objs[num]
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_off = len(out)
        out += f"xref\n0 {size}\n".encode()
        out += b"0000000000 65535 f \n"
        for num in range(1, size):
            out += f"{offsets[num]:010d} 00000 n \n".encode()
        out += (f"trailer\n<< /Size {size} /Root 1 0 R >>\n"
                f"startxref\n{xref_off}\n%%EOF\n").encode()
        return bytes(out)

    # ---- PDF 1.5 layout: ObjStm + cross-reference stream
    top = max(dict_objs | stream_objs)
    objstm_num, xref_num = top + 1, top + 2
    packed = sorted(dict_objs)
    header, body = [], bytearray()
    for num in packed:
        header.append(f"{num} {len(body)}")
        body += dict_objs[num] + b"\n"
    head = (" ".join(header) + "\n").encode()
    payload = zlib.compress(head + bytes(body))
    stream_objs[objstm_num] = (
        f"<< /Type /ObjStm /N {len(packed)} /First {len(head)} "
        f"/Filter /FlateDecode /Length {len(payload)} >>".encode()
        + b"\nstream\n" + payload + b"\nendstream")
    for num in sorted(stream_objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + stream_objs[num] + b"\nendobj\n"
    # xref stream entries, W [1 4 2]: free / type-1 offset / type-2
    xref_off = len(out)
    rows = {0: (0, 0, 65535)}
    for idx, num in enumerate(packed):
        rows[num] = (2, objstm_num, idx)
    for num in stream_objs:
        rows[num] = (1, offsets[num], 0)
    rows[xref_num] = (1, xref_off, 0)
    xdata = b"".join(
        bytes([t]) + f2.to_bytes(4, "big") + f3.to_bytes(2, "big")
        for t, f2, f3 in (rows[i] for i in range(size)))
    out += (f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} "
            f"/Root 1 0 R /W [1 4 2] /Length {len(xdata)} >>"
            ).encode() + b"\nstream\n" + xdata + b"\nendstream\nendobj\n"
    out += f"startxref\n{xref_off}\n%%EOF\n".encode()
    return bytes(out)


# ------------------------------------------------------ spark operator


def pdf_text(df, binary_col: str = "payload", id_col: str = "doc_id"):
    """(doc_id, n_pages, text) per parseable PDF — mapInPandas,
    partition-preserving: bodies never shuffle, the per-row parse is
    the unavoidable per-container loop (same seam as image decode; at
    a deployment a C-backed extractor drops into this exact spot).
    Unparseable rows are quarantined (absent, never a stage failure);
    a truncated tail salvages the complete leading pages, like any
    production extractor."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ])

    def run(batches):
        for pdf_batch in batches:
            ids, npages, texts = [], [], []
            for i, payload in zip(pdf_batch[id_col], pdf_batch[binary_col]):
                if payload is None:
                    continue
                got = parse_pdf(bytes(payload))
                if got is None:
                    continue
                ids.append(i)
                npages.append(got[0])
                texts.append(got[1])
            yield pd.DataFrame({
                "doc_id": pd.Series(ids, dtype="int64"),
                "n_pages": pd.Series(npages, dtype="int32"),
                "text": pd.Series(texts, dtype="object"),
            })

    return df.select(id_col, binary_col).mapInPandas(run, schema)
