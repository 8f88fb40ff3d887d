"""Sitemap parsing (sitemaps.org protocol) — the crawl-governance
companion to ops/robots.py: robots.txt says what MAY be fetched, the
sitemap says what the host WANTS fetched (URL inventory + lastmod
freshness). A validation engine over a crawl corpus uses both: coverage
checks (corpus vs sitemap inventory) and staleness checks (warc_ts vs
lastmod) are per-host table checks like any other.

Pure Column work (regexp extraction over the XML body + a transform per
``<url>`` block): codegen, no Python, no shuffle — per-host sitemap
bodies are small (the protocol caps one file at 50k URLs / 50 MB) so the
heavy side is the JOIN of parsed inventories against the corpus, which
is host-keyed like every other per-host check here.

Scope (deliberate, documented): well-formed ``<urlset>`` / single-level
``<sitemapindex>`` documents; ``<loc>`` / ``<lastmod>`` / ``<priority>``
children (``<changefreq>`` is ignored); XML entities in loc decoded
(``&amp;`` is REQUIRED escaping for query strings per the protocol);
CDATA sections and gzipped bodies are out of scope at this layer (gzip
is a transport concern — sources/warc.py already owns member-gzip).
Index expansion is data-driven: ``children()`` returns child sitemap
URLs for the caller to join against fetched bodies (the engine does not
fetch; same stance as ops/robots.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from schema_fantasy_spark.ops.html import decode_entities

_URL_BLOCK = r"(?is)<url\b[^>]*>.*?</url\s*>"
_SM_BLOCK = r"(?is)<sitemap\b[^>]*>.*?</sitemap\s*>"


def _tag_text(block: Column, tag: str) -> Column:
    """Trimmed, entity-decoded text of the first <tag> child; NULL when
    absent (regexp_extract returns '' for no-match; a genuinely empty
    <loc></loc> also yields NULL — an empty loc is no loc)."""
    v = F.regexp_extract(block, rf"(?is)<{tag}\b[^>]*>\s*(.*?)\s*</{tag}\s*>", 1)
    return F.when(v != "", decode_entities(v))


def sitemap_kind(xml: Column) -> Column:
    """'urlset' | 'index' | 'invalid' by root element."""
    return (
        F.when(F.regexp_like(xml, F.lit(r"(?is)<sitemapindex\b")), F.lit("index"))
        .when(F.regexp_like(xml, F.lit(r"(?is)<urlset\b")), F.lit("urlset"))
        .otherwise(F.lit("invalid"))
    )


def sitemap_urls(xml: Column) -> Column:
    """``array<struct<loc,lastmod,priority>>`` of a urlset document, in
    document order; entries without a <loc> are dropped (protocol: loc
    is required)."""
    blocks = F.regexp_extract_all(xml, F.lit(_URL_BLOCK), F.lit(0))
    entries = F.transform(
        blocks,
        lambda b: F.struct(
            _tag_text(b, "loc").alias("loc"),
            _tag_text(b, "lastmod").alias("lastmod"),
            _tag_text(b, "priority").alias("priority"),
        ),
    )
    return F.filter(entries, lambda e: e["loc"].isNotNull())


def sitemap_children(xml: Column) -> Column:
    """``array<string>`` of child sitemap URLs of a sitemapindex
    document, in document order."""
    blocks = F.regexp_extract_all(xml, F.lit(_SM_BLOCK), F.lit(0))
    locs = F.transform(blocks, lambda b: _tag_text(b, "loc"))
    return F.filter(locs, lambda x: x.isNotNull())


def parse_sitemaps(
    df: DataFrame, xml_col: str = "sitemap_xml", key_cols: tuple = ("host",)
) -> DataFrame:
    """Parse a table of sitemap bodies: keeps ``key_cols``, adds ``kind``,
    ``urls`` (array, empty for an index) and ``children`` (array, empty
    for a urlset). One projection — callers explode whichever side they
    need and, for indexes, join ``children`` back against fetched child
    bodies and re-parse (single-level by protocol)."""
    x = F.col(xml_col).cast("string")
    return df.select(
        *key_cols,
        sitemap_kind(x).alias("kind"),
        F.when(sitemap_kind(x) == "urlset", sitemap_urls(x))
        .otherwise(F.expr("array()").cast("array<struct<loc:string,lastmod:string,priority:string>>"))
        .alias("urls"),
        F.when(sitemap_kind(x) == "index", sitemap_children(x))
        .otherwise(F.expr("array()").cast("array<string>"))
        .alias("children"),
    )
