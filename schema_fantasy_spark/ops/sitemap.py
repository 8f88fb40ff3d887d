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

Scope (deliberate, documented): well-formed ``<urlset>`` /
``<sitemapindex>`` documents; ``<loc>`` / ``<lastmod>`` / ``<priority>``
children (``<changefreq>`` is ignored); XML entities in loc decoded
(``&amp;`` is REQUIRED escaping for query strings per the protocol);
CDATA sections are out of scope. Gzipped bodies (the protocol-sanctioned
``.xml.gz`` delivery — most real sitemaps) gunzip at this source seam
via :func:`with_gunzipped_sitemaps` (Arrow lane, partition-preserving,
like sources/warc.py member-gzip). Index expansion is data-driven and
handles NESTED indexes to a bounded depth: the engine does not fetch
(same stance as ops/robots.py), so :func:`expand_sitemap_indexes` joins
each level's child URLs against a caller-supplied table of fetched
bodies and re-parses, ``max_depth`` capping protocol-violating cycles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from schema_fantasy_spark.ops.html import decode_entities

_URL_BLOCK = r"(?is)<url\b[^>]*>.*?</url\s*>"
_SM_BLOCK = r"(?is)<sitemap\b[^>]*>.*?</sitemap\s*>"


def _tag_raw(block: Column, tag: str) -> Column:
    """Trimmed RAW text of the first <tag> child; NULL when absent
    (regexp_extract returns '' for no-match; a genuinely empty
    <loc></loc> also yields NULL — an empty loc is no loc). Entity
    decoding happens at the ARRAY level (decode_entities_array) so the
    fast SQL decoder applies — decode_entities inside this per-block
    lambda would force the Column twin per field."""
    v = F.regexp_extract(block, rf"(?is)<{tag}\b[^>]*>\s*(.*?)\s*</{tag}\s*>", 1)
    return F.when(v != "", v)


def _tag_text(block: Column, tag: str) -> Column:
    """Trimmed, entity-decoded text of the first <tag> child (the
    Column-level convenience form; the DataFrame path in
    parse_sitemaps uses _tag_raw + array decoding instead)."""
    v = _tag_raw(block, tag)
    return F.when(v.isNotNull(), decode_entities(v))


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
    for a urlset). Callers explode whichever side they need and, for
    indexes, join ``children`` back against fetched child bodies and
    re-parse (single-level by protocol).

    Staged with Generate barriers: the raw per-block field structs
    evaluate ONCE (CollapseProject would otherwise re-inline the block
    regexes into each of the three field projections), and entity
    decoding runs as THREE array-level SQL-decoder calls at the top
    level — per-field decode_entities inside the block lambda would
    build the slow Column twin per field (driver py4j cost) and
    evaluate interpreted."""
    from schema_fantasy_spark.ops.dedup import _assert_staging_free, _barrier
    from schema_fantasy_spark.ops.html import decode_entities_array

    _assert_staging_free(
        df.select(*key_cols), "kind", "__x", "__raw", "__locs_raw",
        "__lms_raw", "__prs_raw", "__ch_raw", "__locs_dec", "__lms_dec",
        "__prs_dec", "__locs", "__lms", "__prs",
    )
    x = F.col(xml_col).cast("string")
    empty_struct = (
        "array()"  # typed empty for the non-matching kind
    )
    base = df.select(*key_cols, sitemap_kind(x).alias("kind"), x.alias("__x"))
    raw = F.when(
        F.col("kind") == "urlset",
        F.transform(
            F.regexp_extract_all(F.col("__x"), F.lit(_URL_BLOCK), F.lit(0)),
            lambda b: F.struct(
                _tag_raw(b, "loc").alias("loc"),
                _tag_raw(b, "lastmod").alias("lastmod"),
                _tag_raw(b, "priority").alias("priority"),
            ),
        ),
    ).otherwise(
        F.expr(empty_struct).cast(
            "array<struct<loc:string,lastmod:string,priority:string>>"
        )
    )
    ch_raw = F.when(
        F.col("kind") == "index",
        F.transform(
            F.regexp_extract_all(F.col("__x"), F.lit(_SM_BLOCK), F.lit(0)),
            lambda b: _tag_raw(b, "loc"),
        ),
    ).otherwise(F.expr(empty_struct).cast("array<string>"))
    base = _barrier(base, raw, "__raw")
    # Project the per-field RAW arrays under bare names BEFORE decoding:
    # decode_entities_array must receive a plain column reference for the
    # SQL decoder to engage — a transform(...) argument carries BOUND
    # lambda variables, which the conservative free-variable guard cannot
    # distinguish from free ones, so it would silently fall back to the
    # interpreted Column twin (the round-7 regression). Each raw column
    # is referenced exactly once (by its decode barrier), so CollapseProject
    # inlining it there evaluates the cheap field-extraction transform once.
    base = base.select(
        "*",
        F.transform(F.col("__raw"), lambda e: e["loc"]).alias("__locs_raw"),
        F.transform(F.col("__raw"), lambda e: e["lastmod"]).alias("__lms_raw"),
        F.transform(F.col("__raw"), lambda e: e["priority"]).alias("__prs_raw"),
        ch_raw.alias("__ch_raw"),
    )
    # Decode in a plain Project (a SQL UDF inside Generate is
    # UNSUPPORTED_SQL_UDF_USAGE), then pin each decoded array behind a
    # Generate barrier — Generate does not inline Project aliases, so the
    # decode evaluates once even though downstream lambdas reference it.
    base = base.select(
        "*",
        decode_entities_array(F.col("__locs_raw")).alias("__locs_dec"),
        decode_entities_array(F.col("__lms_raw")).alias("__lms_dec"),
        decode_entities_array(F.col("__prs_raw")).alias("__prs_dec"),
    )
    base = _barrier(base, F.col("__locs_dec"), "__locs")
    base = _barrier(base, F.col("__lms_dec"), "__lms")
    base = _barrier(base, F.col("__prs_dec"), "__prs")
    urls = F.filter(
        F.transform(
            F.col("__locs"),
            lambda v, i: F.struct(
                v.alias("loc"),
                F.get(F.col("__lms"), i).alias("lastmod"),
                F.get(F.col("__prs"), i).alias("priority"),
            ),
        ),
        lambda e: e["loc"].isNotNull(),
    )
    children = F.filter(
        decode_entities_array(F.col("__ch_raw")), lambda v: v.isNotNull()
    )
    return base.select(
        *key_cols, "kind", urls.alias("urls"), children.alias("children")
    )


def with_gunzipped_sitemaps(
    df: DataFrame, body_col: str = "sitemap_body", out_col: str = "sitemap_xml",
) -> DataFrame:
    """Gunzip protocol-sanctioned ``.xml.gz`` sitemap bodies at the
    source seam: ``body_col`` (binary or string) becomes the XML text
    ``out_col`` — gzip members (1F 8B magic) decompress, anything else
    passes through as text unchanged, undecodable rows yield NULL (the
    per-row quarantine contract).

    Arrow lane (no codec in Catalyst — same reasoning as
    ops/text.with_compression_ratio): one vectorized pandas_udf,
    partition-preserving, no shuffle; the protocol caps one sitemap at
    50 MB uncompressed, so per-row decompression is bounded. At 10^12
    docs this runs inside the scan stage like WARC member-gzip."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # explicit PandasUDFType: this module's `from __future__ import
    # annotations` stringifies type hints, which breaks pandas_udf
    # signature inference (CLAUDE.md trap 5)
    @pandas_udf("string", PandasUDFType.SCALAR)
    def _gunzip(s):
        import gzip
        import zlib

        import pandas as pd

        def one(v):
            if v is None:
                return None
            b = bytes(v) if isinstance(v, (bytes, bytearray)) else None
            if b is None:
                # already text: pass through (mixed corpora are normal)
                return v
            if b[:2] == b"\x1f\x8b":
                try:
                    b = gzip.decompress(b)
                except (OSError, EOFError, zlib.error):
                    return None  # truncated/corrupt member: quarantine
            try:
                return b.decode("utf-8")
            except UnicodeDecodeError:
                return b.decode("latin-1")

        return pd.Series([one(v) for v in s])

    return df.withColumn(out_col, _gunzip(F.col(body_col)))


def expand_sitemap_indexes(
    df: DataFrame,
    bodies: DataFrame,
    xml_col: str = "sitemap_xml",
    key_cols: tuple = ("host",),
    child_url_col: str = "child_url",
    body_col: str = "body",
    max_depth: int = 3,
) -> DataFrame:
    """Data-driven NESTED sitemapindex expansion: parse ``df``'s bodies,
    then repeatedly join each level's child sitemap URLs against the
    caller-supplied ``bodies`` table (``child_url_col`` -> ``body_col``,
    the fetched child documents — the engine does not fetch) and
    re-parse, up to ``max_depth`` levels of indexes. Returns one row per
    discovered url: ``key_cols + (loc, lastmod, priority, depth)`` where
    depth counts index hops (0 = url listed directly in a urlset).

    The protocol forbids nested indexes but the wild ignores that;
    ``max_depth`` bounds both the wild's nesting and malicious cycles
    (a child body whose children point back up stops contributing once
    the depth budget is spent). Shape: every fetched body is parsed
    exactly ONCE (one parse of ``bodies`` up front — parsing is the
    expensive plan, the full entity-decoder tree), then the bounded
    driver-side loop is pure reachability joins over the parsed frame —
    a body referenced by many hosts or many levels never re-parses, and
    lineage grows by one url-keyed join per level, like
    ops/linkgraph.pagerank's fixed iterations."""
    key_cols = tuple(key_cols)
    # materialize both parsed frames ONCE: the per-level union branches
    # each reference them, and without a boundary every branch would
    # re-instantiate the full parse plan (the entity-decoder tree) —
    # measured ~2x the whole query. r9: eager localCheckpoint instead of
    # the r8 bare .persist() — same one-parse guarantee, PLUS lineage
    # truncation (the per-level joins no longer replay the decoder tree
    # through the analyzer; the query plan shrank ~4x) and automatic
    # GC-driven cleanup, closing the unpersist leak a long-lived driver
    # accumulated (ADVICE r8: repeated calls pinned dead cache forever).
    parsed = parse_sitemaps(df, xml_col, key_cols=key_cols).localCheckpoint()
    pbodies = parse_sitemaps(
        bodies.withColumnRenamed(body_col, "__body_xml"),
        "__body_xml",
        key_cols=(child_url_col,),
    ).localCheckpoint()

    def urls_of(p: DataFrame, depth: int) -> DataFrame:
        return (
            p.filter(F.col("kind") == "urlset")
            .select(*key_cols, F.explode("urls").alias("__u"))
            .select(
                *key_cols,
                F.col("__u")["loc"].alias("loc"),
                F.col("__u")["lastmod"].alias("lastmod"),
                F.col("__u")["priority"].alias("priority"),
                F.lit(depth).cast("int").alias("depth"),
            )
        )

    out = urls_of(parsed, 0)
    frontier = parsed.filter(F.col("kind") == "index").select(
        *key_cols, F.explode("children").alias(child_url_col)
    )
    for depth in range(1, max_depth + 1):
        level = frontier.join(pbodies, child_url_col).select(
            *key_cols, "kind", "urls", "children"
        )
        out = out.unionByName(urls_of(level, depth))
        if depth == max_depth:
            break
        frontier = level.filter(F.col("kind") == "index").select(
            *key_cols, F.explode("children").alias(child_url_col)
        )
    return out
