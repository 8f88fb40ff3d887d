"""HTML -> text extraction in pure Column expressions — the step that
produces the north-star table's ``text`` column from its ``html`` one
(BASELINE input_hint: pages arrive as ``html:binary`` and the per-row
invariant is byte-identical extracted text per url).

Runs entirely in whole-stage codegen (regexp chains + one split/
transform fold for numeric entities): no Python, no shuffle — at
10^12 documents extraction is scan-bandwidth work, exactly like the
validation kernels.

Extraction contract (the standard crawl-pipeline cleaning subset, NOT
a browser-grade HTML5 parser — scope documented per step):

1. ``<script>``/``<style>`` elements removed wholesale (non-greedy,
   case-insensitive, dotall — a ``</p>`` inside script text does not
   terminate it), then the whole ``<head>`` element (title/meta are
   metadata, not page text; script/style removal runs FIRST so a
   script containing a literal ``</head>`` cannot truncate it);
2. comments ``<!-- ... -->`` removed;
3. tags stripped, honoring quoted attribute values (``<div
   data-x="a>b">`` is one tag);
4. entities decoded: the five standard named ones (``&amp; &lt; &gt;
   &quot; &apos;``), ``&nbsp;`` (to a PLAIN SPACE — the crawl-pipeline
   convention, so it participates in whitespace collapse), and numeric
   character references, decimal and hex, for EVERY valid Unicode
   scalar value 1..0x10FFFF — BMP code points via a two-byte UTF-16BE
   decode built in-expression, supplementary-plane ones via an
   in-expression surrogate pair (``&#128512;`` -> 😀). Invalid
   references (``&#0;``, surrogates, > 0x10FFFF, malformed) pass
   through unchanged. ``&amp;`` decodes LAST so ``&amp;lt;`` yields
   the literal ``&lt;``;
5. whitespace runs collapse to a single space, trimmed.

CDATA sections, conditional comments, and the extended named-entity
table (``&eacute;`` etc. — numeric refs cover the decode machinery;
the name table is data, not mechanism) are out of scope (each passes
through recognizably rather than being silently mangled)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: tag token: honors double- and single-quoted attribute values
_TAG = r"(?s)<(?:[^>\"']|\"[^\"]*\"|'[^']*')*>"


def _codepoint_char(dv: Column) -> Column:
    """The character for a scalar code point, built in-expression: the
    UTF-16BE byte string of the code point (one unit for the BMP, a
    surrogate pair above it) decoded back to a string — no Python, no
    dictionary, full Unicode range."""
    cpp = dv - 0x10000  # supplementary-plane offset
    hi = F.lit(0xD800) + F.floor(cpp / 1024).cast("int")
    lo = F.lit(0xDC00) + F.pmod(cpp, F.lit(1024))
    units = F.when(
        dv < 0x10000, F.lpad(F.hex(dv), 4, "0")
    ).otherwise(F.concat(F.lpad(F.hex(hi), 4, "0"), F.lpad(F.hex(lo), 4, "0")))
    return F.decode(F.unhex(units), "UTF-16BE")


def _decode_numeric_entities(s: Column) -> Column:
    """Decode ``&#NNN;`` / ``&#xHH;`` for every valid Unicode scalar
    value (1..0x10FFFF excluding the surrogate block — invalid refs,
    including ``&#0;``, pass through recognizably), with the same
    split/transform shape as the url percent decoder: split on '&#',
    each later token starts at a reference."""
    parts = F.split(s, "&#", -1)

    def _tok(t: Column) -> Column:
        dec = F.regexp_extract(t, r"^([0-9]{1,7});", 1)
        hexd = F.regexp_extract(t, r"^[xX]([0-9A-Fa-f]{1,6});", 1)
        dv = F.when(dec != "", dec.cast("int")).otherwise(
            F.when(hexd != "", F.conv(hexd, 16, 10).cast("int"))
        )
        ref_len = (
            F.when(dec != "", F.length(dec) + 1)
            .when(hexd != "", F.length(hexd) + 2)
            .otherwise(F.lit(0))
        )
        tail = F.substring(t, ref_len + 1, F.lit(1 << 30))
        bad = (
            dv.isNull()
            | (dv < 1)
            | (dv > 0x10FFFF)
            | ((dv >= 0xD800) & (dv <= 0xDFFF))
        )
        return (
            F.when(bad, F.concat(F.lit("&#"), t))
            .otherwise(F.concat(_codepoint_char(dv), tail))
        )

    return F.array_join(
        F.transform(parts, lambda t, i: F.when(i == F.lit(0), t).otherwise(_tok(t))),
        "",
    )


def decode_entities(s: Column) -> Column:
    """Entity decoding shared by text extraction and metadata extraction:
    numeric references first (full Unicode range), then the five standard
    named entities plus ``&nbsp;`` (to a plain space), ``&amp;`` LAST so
    ``&amp;lt;`` yields the literal ``&lt;``."""
    s = _decode_numeric_entities(s)
    for ent, rep in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
        ("&apos;", "'"), ("&nbsp;", " "), ("&amp;", "&"),  # &amp; LAST
    ):
        s = F.replace(s, F.lit(ent), F.lit(rep))
    return s


def extract_text(html: Column) -> Column:
    """Extracted text of an HTML document column (see module contract)."""
    s = F.regexp_replace(html, r"(?is)<script\b.*?</script\s*>", " ")
    s = F.regexp_replace(s, r"(?is)<style\b.*?</style\s*>", " ")
    s = F.regexp_replace(s, r"(?is)<head\b.*?</head\s*>", " ")
    s = F.regexp_replace(s, r"(?s)<!--.*?-->", " ")
    s = F.regexp_replace(s, _TAG, " ")
    s = decode_entities(s)
    return F.trim(F.regexp_replace(s, r"\s+", " "))


def with_extracted_text(
    df: DataFrame, html_col: str = "html", out_col: str = "text"
) -> DataFrame:
    """Append the extracted-text column (html may be binary or string)."""
    col = F.col(html_col)
    return df.withColumn(out_col, extract_text(col.cast("string")))
