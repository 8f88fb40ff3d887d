"""MIME sniffing by magic bytes — WHATWG §6 "matching a resource
header" (https://mimesniff.spec.whatwg.org/), the routing step a crawl
pipeline runs on EVERY payload before anything else: transport
Content-Type headers lie constantly (servers label PNGs text/html and
tarballs text/plain), so the bytes decide which lane a record enters —
html -> charset sniff + extraction (ops/charset.py, ops/html.py),
image -> decode (ops/multimodal.py), audio/video -> metadata walks,
archives -> decompression, everything else -> opaque binary.

Pure Column expressions over hex prefixes: one ``F.hex(substring)``
per distinct anchor offset, then literal prefix matches — whole-stage
codegen, no Python, no shuffle; at 10^12 rows this is scan-bandwidth
work exactly like the validation kernels.

Scope: the spec's binary signature table (images, audio/video, fonts,
archives) plus its two pattern families that need more than a fixed
prefix — the tag-sniff for text/html (optional UTF-8 BOM + leading
whitespace + a known tag, case-insensitive) and the UTF-16/UTF-8 BOM
text rules. Signatures the spec ties to scriptable-content protection
(``application/octet-stream`` fallbacks) return the generic type here
too. PPM and other non-web formats deliberately sniff as octet-stream:
the table IS the spec's, not an extension.

Reference analogue: getPred's unknown-keyword elision — bytes that
match no signature degrade to the generic type rather than erroring
(/root/reference/src/schema.js:75-86 returns no predicate for unknown
keywords; here unknown magic returns application/octet-stream).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: (hex_prefix, mime) — matched against the payload's leading bytes,
#: first match wins; longer prefixes listed before their prefixes.
_PREFIX_SIGS = [
    # images
    ("89504E470D0A1A0A", "image/png"),
    ("474946383761", "image/gif"),
    ("474946383961", "image/gif"),
    ("FFD8FF", "image/jpeg"),
    ("424D", "image/bmp"),
    ("00000100", "image/x-icon"),
    ("00000200", "image/x-icon"),  # cursor, spec maps to x-icon too
    # audio/video (non-RIFF)
    ("1A45DFA3", "video/webm"),  # EBML: webm/matroska share the anchor
    ("494433", "audio/mpeg"),    # ID3v2-tagged mp3
    ("FFFB", "audio/mpeg"),      # bare MPEG-1 L3 frame sync
    ("FFF3", "audio/mpeg"),
    ("FFF2", "audio/mpeg"),
    ("4F676753", "application/ogg"),
    ("4D54686400000006", "audio/midi"),
    # fonts
    ("774F4646", "font/woff"),
    ("774F4632", "font/woff2"),
    ("00010000", "font/ttf"),
    ("4F54544F", "font/otf"),
    # archives
    ("1F8B08", "application/x-gzip"),
    ("504B0304", "application/zip"),
    ("526172201A07", "application/x-rar-compressed"),
    # documents
    ("255044462D", "application/pdf"),
    ("252150532D41646F62652D", "application/postscript"),
]

#: RIFF containers: 'RIFF' anchor, discriminated by bytes 9-12
_RIFF_SIGS = [("57454250", "image/webp"), ("57415645", "audio/wave"),
              ("41564920", "video/avi")]

#: tag-sniff tokens for text/html (WHATWG: case-insensitive, each must
#: be followed by space or '>'), after optional BOM + whitespace
_HTML_TAGS = ["<!doctype html", "<html", "<head", "<script", "<iframe",
              "<h1", "<div", "<font", "<table", "<a", "<style", "<title",
              "<b", "<body", "<br", "<p", "<!--"]


def _re_escape(s: str) -> str:
    out = []
    for ch in s:
        out.append("\\" + ch if ch in r"\.^$*+?()[]{}|" else ch)
    return "".join(out)


def sniff_mime(b: Column) -> Column:
    """The sniffed MIME type of a binary payload column (pure Column).

    Order per the spec: BOM text rules, then the binary signature
    table (RIFF discriminated at offset 8, ISO-BMFF ``ftyp`` at offset
    4), then the text/html tag sniff, then application/octet-stream.
    """
    head = F.hex(F.substring(b, 1, 12))

    def pre(hexs: str) -> Column:
        return head.startswith(hexs)

    # ISO-BMFF: size box then 'ftyp' at offset 4; brand picks audio/video
    ftyp = F.hex(F.substring(b, 5, 8))
    brand = F.hex(F.substring(b, 9, 4))
    is_bmff = ftyp.startswith("66747970")
    # lifted ASCII view for the html tag sniff: trim leading whitespace,
    # lowercase (latin-1 lift never throws; BOM'd payloads were already
    # routed to text/plain by the BOM rules above, matching the spec's
    # rules-for-text-or-binary ordering)
    lifted = F.lower(F.decode(F.substring(b, 1, 64), "ISO-8859-1"))
    # leading whitespace is the WHATWG class (tab/LF/FF/CR/space — ltrim
    # strips spaces only); each tag needs a tag-terminating byte
    ws = "^[\\t\\n\\x0C\\r ]*"
    tag_re = ws + "(?:" + "|".join(_re_escape(t) for t in _HTML_TAGS) + ")[ >]"
    looks_html = lifted.rlike(tag_re)
    looks_xml = lifted.rlike(ws + "<\\?xml")

    out = F.when(pre("EFBBBF"), F.lit("text/plain;charset=utf-8"))
    out = out.when(pre("FFFE") | pre("FEFF"), F.lit("text/plain;charset=utf-16"))
    for hexs, mime in _PREFIX_SIGS:
        out = out.when(pre(hexs), F.lit(mime))
    riff = F.lit("application/octet-stream")
    for hexs, mime in _RIFF_SIGS:
        riff = F.when(brand == hexs, F.lit(mime)).otherwise(riff)
    out = out.when(pre("52494646"), riff)
    out = out.when(
        is_bmff,
        F.when(brand == "71742020", F.lit("video/quicktime"))
        .when(brand.startswith("4D3441"), F.lit("audio/mp4"))  # M4A
        .otherwise(F.lit("video/mp4")),
    )
    out = out.when(looks_html, F.lit("text/html"))
    out = out.when(looks_xml, F.lit("text/xml"))
    return out.otherwise(F.lit("application/octet-stream"))


def with_sniffed_mime(df, binary_col: str = "html", out_col: str = "mime"):
    """Attach the sniffed MIME column — the routing key for a mixed
    crawl: ``df.groupBy("mime")`` partitions the corpus into decode
    lanes with zero Python and zero shuffle beyond the router's own."""
    return df.withColumn(out_col, sniff_mime(F.col(binary_col)))
