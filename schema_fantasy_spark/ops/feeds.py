"""RSS 2.0 / Atom 1.0 feed parsing — the third crawl-governance surface
after robots.txt (ops/robots.py) and sitemaps (ops/sitemap.py): feeds
announce NEW content with timestamps, so a freshness check (corpus
warc_ts vs feed entry time) is a per-host table check like any other.

Pure Column work, same machinery as ops/sitemap.py: block extraction by
regexp, per-block tag/attribute extraction, entity decoding on text
fields (feed titles routinely carry ``&amp;``).

Scope (deliberate): well-formed RSS 2.0 ``<rss><channel><item>`` and
Atom ``<feed><entry>`` documents; RSS item fields title/link/pubDate/
guid, Atom entry fields title/link[@href]/updated/id (the FIRST
``<link>`` with an href — rel-alternate preference is out of scope, as
are RSS 0.9x/1.0 RDF feeds and CDATA sections, each failing
recognizably: unknown roots report kind='invalid', absent fields are
NULL)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from schema_fantasy_spark.ops.html import decode_entities
from schema_fantasy_spark.ops.sitemap import _tag_text

_ITEM_BLOCK = r"(?is)<item\b[^>]*>.*?</item\s*>"
_ENTRY_BLOCK = r"(?is)<entry\b[^>]*>.*?</entry\s*>"
#: tag-interior token that cannot terminate the tag early (shared shape
#: with ops/html_meta)
_IN = "(?:[^>\"']|\"[^\"]*\"|'[^']*')"


def feed_kind(xml: Column) -> Column:
    """'rss' | 'atom' | 'invalid' by root element."""
    return (
        F.when(F.regexp_like(xml, F.lit(r"(?is)<rss\b")), F.lit("rss"))
        .when(F.regexp_like(xml, F.lit(r"(?is)<feed\b")), F.lit("atom"))
        .otherwise(F.lit("invalid"))
    )


def feed_title(xml: Column) -> Column:
    """Channel/feed title: the first <title> OUTSIDE any item/entry —
    extracted by looking before the first item/entry block."""
    head = F.regexp_extract(xml, r"(?is)^(.*?)(<item\b|<entry\b|$)", 1)
    return _tag_text(head, "title")


def _atom_link_raw(block: Column) -> Column:
    """RAW href of the first <link> in an Atom entry, either quote
    style (decoding happens at the array level in parse_feeds)."""
    pat = rf"(?is)<link\b{_IN}*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)')"
    hit = F.regexp_like(block, F.lit(pat))
    g1 = F.regexp_extract(block, pat, 1)
    g2 = F.regexp_extract(block, pat, 2)
    return F.when(hit, F.when(g1 != "", g1).otherwise(g2))


def _atom_link(block: Column) -> Column:
    """href of the first <link> in an Atom entry, either quote style."""
    v = _atom_link_raw(block)
    return F.when(v.isNotNull(), decode_entities(v))


def feed_entries(xml: Column) -> Column:
    """``array<struct<title,link,ts,guid>>`` of a feed document, in
    document order: RSS items (ts = pubDate, guid = guid) or Atom
    entries (ts = updated, guid = id, link from the href attribute).
    Entries without a link are kept (title-only announcements exist);
    fully empty blocks drop."""
    def _parse(block_re: str, link_fn, ts_tag: str, guid_tag: str) -> Column:
        blocks = F.regexp_extract_all(xml, F.lit(block_re), F.lit(0))
        entries = F.transform(
            blocks,
            lambda b: F.struct(
                _tag_text(b, "title").alias("title"),
                link_fn(b).alias("link"),
                _tag_text(b, ts_tag).alias("ts"),
                _tag_text(b, guid_tag).alias("guid"),
            ),
        )
        return F.filter(
            entries,
            lambda e: e["title"].isNotNull() | e["link"].isNotNull(),
        )

    rss = _parse(_ITEM_BLOCK, lambda b: _tag_text(b, "link"), "pubDate", "guid")
    atom = _parse(_ENTRY_BLOCK, _atom_link, "updated", "id")
    empty = F.expr("array()").cast(
        "array<struct<title:string,link:string,ts:string,guid:string>>"
    )
    k = feed_kind(xml)
    return F.when(k == "rss", rss).when(k == "atom", atom).otherwise(empty)


def parse_feeds(
    df: DataFrame, xml_col: str = "feed_xml", key_cols: tuple = ("host",)
) -> DataFrame:
    """Parse a table of feed bodies: keeps ``key_cols``, adds ``kind``,
    ``feed_title`` and ``entries``.

    Staged like ops/sitemap.parse_sitemaps: raw per-block fields
    evaluate once behind a Generate barrier, entity decoding runs as
    four ARRAY-level SQL-decoder calls at the top level (per-field
    decode inside the block lambda would build the slow Column twin)."""
    from schema_fantasy_spark.ops.dedup import _assert_staging_free, _barrier
    from schema_fantasy_spark.ops.html import decode_entities_array
    from schema_fantasy_spark.ops.sitemap import _tag_raw

    _assert_staging_free(
        df.select(*key_cols), "kind", "feed_title", "__x", "__raw",
        *(f"__{f}{sfx}" for f in ("title", "link", "ts", "guid")
          for sfx in ("", "_raw")),
    )
    x = F.col(xml_col).cast("string")
    base = df.select(
        *key_cols,
        feed_kind(x).alias("kind"),
        feed_title(x).alias("feed_title"),
        x.alias("__x"),
    )

    def _raw(block_re: str, link_fn, ts_tag: str, guid_tag: str) -> Column:
        return F.transform(
            F.regexp_extract_all(F.col("__x"), F.lit(block_re), F.lit(0)),
            lambda b: F.struct(
                _tag_raw(b, "title").alias("title"),
                link_fn(b).alias("link"),
                _tag_raw(b, ts_tag).alias("ts"),
                _tag_raw(b, guid_tag).alias("guid"),
            ),
        )

    empty = F.expr("array()").cast(
        "array<struct<title:string,link:string,ts:string,guid:string>>"
    )
    raw = (
        F.when(F.col("kind") == "rss",
               _raw(_ITEM_BLOCK, lambda b: _tag_raw(b, "link"),
                    "pubDate", "guid"))
        .when(F.col("kind") == "atom",
              _raw(_ENTRY_BLOCK, _atom_link_raw, "updated", "id"))
        .otherwise(empty)
    )
    base = _barrier(base, raw, "__raw")

    def _getter(f):  # closure factory — a `f=field` default would make
        return lambda e: e[f]  # a TWO-param lambda = (element, INDEX)

    # Raw field arrays under bare names first: the SQL array decoder only
    # engages for plain column references (a transform(...) argument
    # carries bound lambda vars and falls back to the interpreted twin —
    # the round-7 regression). Each raw column is consumed exactly once.
    base = base.select(
        "*",
        *(F.transform(F.col("__raw"), _getter(f)).alias(f"__{f}_raw")
          for f in ("title", "link", "ts", "guid")),
    )
    # Decode in a plain Project (a SQL UDF inside Generate is
    # UNSUPPORTED_SQL_UDF_USAGE), then pin each decoded array behind a
    # Generate barrier so downstream lambda references don't re-inline it.
    base = base.select(
        "*",
        *(decode_entities_array(F.col(f"__{f}_raw")).alias(f"__{f}_dec")
          for f in ("title", "link", "ts", "guid")),
    )
    for field in ("title", "link", "ts", "guid"):
        base = _barrier(base, F.col(f"__{field}_dec"), f"__{field}")
    entries = F.filter(
        F.transform(
            F.col("__title"),
            lambda v, i: F.struct(
                v.alias("title"),
                F.get(F.col("__link"), i).alias("link"),
                F.get(F.col("__ts"), i).alias("ts"),
                F.get(F.col("__guid"), i).alias("guid"),
            ),
        ),
        lambda e: e["title"].isNotNull() | e["link"].isNotNull(),
    )
    return base.select(
        *key_cols, "kind", "feed_title", entries.alias("entries")
    )
