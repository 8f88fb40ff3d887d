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
4. entities decoded in ONE left-to-right pass (split on ``&``; a
   decode's output is never rescanned, matching the single-pass
   semantics of the WHATWG algorithm and Python's ``html.unescape``):

   * the FULL WHATWG named-character-reference table (2,231 names,
     generated from the public spec table by tools/gen_html_entities.py
     into ops/html_entities.py) — both the ``&eacute;`` spellings and
     the ~106 legacy bare spellings (``&eacute``, ``&amp``) with the
     spec's longest-prefix matching (``&notit;`` -> ``¬it;``,
     ``&copy=2`` -> ``©=2``, exactly as ``html.unescape``). Lookups
     are single ``instr`` probes into a packed literal string — no
     2k-entry map literal, no Python;
   * numeric character references, decimal and hex, for EVERY valid
     Unicode scalar value 1..0x10FFFF — BMP code points via a two-byte
     UTF-16BE decode built in-expression, supplementary-plane ones via
     an in-expression surrogate pair (``&#128512;`` -> 😀).

   ``&amp;lt;`` therefore yields the literal ``&lt;``. Documented
   divergences from ``html.unescape`` (asserted in tests): numeric
   references REQUIRE the terminating ``;`` and invalid ones (``&#0;``,
   surrogates, > 0x10FFFF, malformed) pass through unchanged rather
   than becoming U+FFFD / windows-1252 remaps, and entity-produced
   U+00A0 (``&nbsp;`` and friends) becomes a PLAIN SPACE — the
   crawl-pipeline convention, so it participates in whitespace
   collapse;
5. whitespace runs collapse to a single space, trimmed.

CDATA sections and conditional comments are out of scope (each passes
through recognizably rather than being silently mangled)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from schema_fantasy_spark.ops import html_entities as _ENT

#: tag token: honors double- and single-quoted attribute values
_TAG = r"(?s)<(?:[^>\"']|\"[^\"]*\"|'[^']*')*>"

def _BIG() -> Column:  # F.lit needs a live SparkContext — keep it lazy
    return F.lit(1 << 30)


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


def _tbl_lookup(table: str, key: Column) -> Column:
    """Exact-match lookup of ``key`` in a packed ``\\x01key\\x02value``
    literal table (ops/html_entities.py): ONE intrinsified ``instr``
    scan, NULL on miss. The ``\\x01`` anchor makes false positives
    impossible (every record holds exactly one ``\\x02`` between
    anchors) and the common-first packing means frequent entities
    (&amp; &nbsp; &lt; ...) resolve within the first few hundred
    bytes. A Catalyst map literal would be a linear scan of 2k boxed
    entries per probe AND a giant expression tree; this is one
    SIMD-vectorized indexOf."""
    pos = F.nullif(
        F.instr(F.lit(table), F.concat(F.lit("\x01"), key, F.lit("\x02"))),
        F.lit(0),
    )
    return F.substring_index(
        F.substr(F.lit(table), pos + F.length(key) + 2, _BIG()), "\x01", 1
    )


def _decode_token(x: Column) -> Column:
    """Decode one post-``&`` token (a struct of precomputed fields —
    HOF lambdas get no common-subexpression elimination, so the regex
    extractions and the full-table probe are materialized ONCE per
    token in :func:`decode_entities` and referenced here as struct
    field accesses)."""
    t, span, dec, hexd, vf = (
        x["t"], x["span"], x["dec"], x["hexd"], x["vf"]
    )
    # --- numeric reference: &#NNN; / &#xHH; (semicolon required;
    # invalid scalars pass through recognizably — module contract)
    dv = F.when(dec != "", dec.cast("int")).otherwise(
        F.when(hexd != "", F.conv(hexd, 16, 10).cast("int"))
    )
    bad = (
        dv.isNull()
        | (dv < 1)
        | (dv > 0x10FFFF)
        | ((dv >= 0xD800) & (dv <= 0xDFFF))
    )
    num_next = F.when(dec != "", F.length(dec) + 3).otherwise(F.length(hexd) + 4)
    numeric = F.when(bad, F.concat(F.lit("&"), t)).otherwise(
        F.concat(_codepoint_char(dv), F.substr(t, num_next, _BIG()))
    )
    # --- named reference: exact span first ('&eacute;', and bare
    # legacy '&eacute' when the span IS the whole name), then the
    # spec's longest-prefix fallback over the legacy table ('&notit;'
    # -> '¬it;'), longest first, strict prefixes only — mirrors
    # html.unescape. The legacy probes run only on a full-table miss.
    named = F.when(
        vf.isNotNull(), F.concat(vf, F.substr(t, F.length(span) + 1, _BIG()))
    )
    for L in range(_ENT.MAX_LEGACY, _ENT.MIN_LEGACY - 1, -1):
        vL = _tbl_lookup(_ENT.LEGACY, F.substring(span, 1, L))
        named = named.when(
            (F.length(span) > F.lit(L)) & vL.isNotNull(),
            F.concat(vL, F.substr(t, F.lit(L + 1), _BIG())),
        )
    named = named.otherwise(F.concat(F.lit("&"), t))
    return F.when(F.startswith(t, F.lit("#")), numeric).otherwise(named)


def decode_entities(s: Column) -> Column:
    """Entity decoding shared by text extraction and metadata
    extraction: ONE left-to-right pass over the string — split on
    ``&``, decode each token's head (numeric reference, full WHATWG
    named table, or legacy longest-prefix), restore ``&`` on misses.
    Because tokens are decoded independently and joined, a decode's
    output is never rescanned: ``&amp;lt;`` -> ``&lt;`` and
    ``&#38;#97;`` -> ``&#97;``, exactly like ``html.unescape``'s
    single pass. See the module contract for the three documented
    divergences from ``html.unescape``."""
    parts = F.split(s, "&", -1)
    # stage 1: per-token field extraction, evaluated once per token
    toks = F.transform(
        parts,
        lambda t: F.struct(
            t.alias("t"),
            F.regexp_extract(t, r"^([a-zA-Z][a-zA-Z0-9]{0,31};?)", 1).alias("span"),
            F.regexp_extract(t, r"^#([0-9]{1,7});", 1).alias("dec"),
            F.regexp_extract(t, r"^#[xX]([0-9A-Fa-f]{1,6});", 1).alias("hexd"),
        ),
    )
    # stage 2: the one full-table probe per token (skipped for spans
    # shorter than the shortest name — covers '&', '& ', '&b=2' fast)
    toks = F.transform(
        toks,
        lambda x: F.struct(
            x["t"].alias("t"),
            x["span"].alias("span"),
            x["dec"].alias("dec"),
            x["hexd"].alias("hexd"),
            F.when(
                F.length(x["span"]) >= _ENT.MIN_LEGACY,
                _tbl_lookup(_ENT.TABLE, x["span"]),
            ).alias("vf"),
        ),
    )
    out = F.transform(
        toks,
        lambda x, i: F.when(i == F.lit(0), x["t"]).otherwise(_decode_token(x)),
    )
    return F.array_join(out, "")


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
