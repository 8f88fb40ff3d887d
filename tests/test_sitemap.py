"""ops/sitemap.py — sitemaps.org urlset / sitemapindex parsing."""

from pyspark.sql import functions as F

from schema_fantasy_spark.ops.sitemap import (
    parse_sitemaps,
    sitemap_children,
    sitemap_kind,
    sitemap_urls,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc> https://e.com/a?x=1&amp;y=2 </loc>
    <lastmod>2026-02-03</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>https://e.com/b</loc></url>
  <url><lastmod>2026-01-01</lastmod></url>
</urlset>"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://e.com/sm/0.xml</loc><lastmod>2026-02-01</lastmod></sitemap>
  <sitemap><loc>https://e.com/sm/1.xml</loc></sitemap>
</sitemapindex>"""


def _one(spark, xml, col):
    df = spark.createDataFrame([(xml,)], "x: string")
    return df.select(col(F.col("x")).alias("v")).collect()[0]["v"]


def test_kind(spark):
    assert _one(spark, URLSET, sitemap_kind) == "urlset"
    assert _one(spark, INDEX, sitemap_kind) == "index"
    assert _one(spark, "<html>nope</html>", sitemap_kind) == "invalid"


def test_urlset_entries(spark):
    urls = _one(spark, URLSET, sitemap_urls)
    # entity decoded, whitespace trimmed; loc-less entry dropped
    assert [(u["loc"], u["lastmod"], u["priority"]) for u in urls] == [
        ("https://e.com/a?x=1&y=2", "2026-02-03", "0.8"),
        ("https://e.com/b", None, None),
    ]


def test_index_children(spark):
    assert _one(spark, INDEX, sitemap_children) == [
        "https://e.com/sm/0.xml", "https://e.com/sm/1.xml",
    ]
    assert _one(spark, URLSET, sitemap_children) == []


def test_parse_sitemaps_frame_and_plan(spark):
    df = spark.createDataFrame(
        [("h0", URLSET), ("h1", INDEX)], "host: string, sitemap_xml: string"
    )
    out = parse_sitemaps(df)
    rows = {r["host"]: r for r in out.collect()}
    assert rows["h0"]["kind"] == "urlset" and len(rows["h0"]["urls"]) == 2
    assert rows["h0"]["children"] == []
    assert rows["h1"]["kind"] == "index" and rows["h1"]["urls"] == []
    assert len(rows["h1"]["children"]) == 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    # node names, not bare substrings (entity-table literal contains
    # names like DoubleDownArrow)
    assert "EvalPython" not in plan


def test_with_gunzipped_sitemaps(spark):
    """Protocol-sanctioned .xml.gz bodies gunzip at the source seam:
    gzip members decompress, plain text passes through, corrupt members
    quarantine to NULL; the lane is Arrow-batched (no row-Python)."""
    import gzip

    from schema_fantasy_spark.ops.sitemap import with_gunzipped_sitemaps

    gz = gzip.compress(URLSET.encode("utf-8"))
    rows = [
        ("h0", bytearray(gz)),
        ("h1", bytearray(URLSET.encode("utf-8"))),      # plain bytes
        ("h2", bytearray(b"\x1f\x8b\x08corrupt")),       # truncated member
    ]
    df = spark.createDataFrame(rows, "host: string, sitemap_body: binary")
    got = {r["host"]: r["sitemap_xml"]
           for r in with_gunzipped_sitemaps(df).collect()}
    assert got["h0"] == URLSET
    assert got["h1"] == URLSET
    assert got["h2"] is None
    # and the gunzipped frame parses end to end
    parsed = parse_sitemaps(with_gunzipped_sitemaps(df))
    kinds = {r["host"]: r["kind"] for r in parsed.collect()}
    assert kinds == {"h0": "urlset", "h1": "urlset", "h2": "invalid"}


def test_expand_sitemap_indexes_nested(spark):
    """Two-level sitemapindex nesting: root index -> child index ->
    grandchild urlsets, urls surfaced with their index depth; a cyclic
    child pointing back at itself stops at max_depth instead of looping."""
    from schema_fantasy_spark.ops.sitemap import expand_sitemap_indexes

    def urlset(*locs):
        body = "".join(f"<url><loc>{u}</loc></url>" for u in locs)
        return f"<urlset>{body}</urlset>"

    def index(*children):
        body = "".join(f"<sitemap><loc>{c}</loc></sitemap>" for c in children)
        return f"<sitemapindex>{body}</sitemapindex>"

    root = index("https://e.com/sm/a.xml", "https://e.com/sm/b.xml")
    bodies = [
        # a.xml is itself an index (protocol-violating nesting)
        ("https://e.com/sm/a.xml", index("https://e.com/sm/a0.xml")),
        ("https://e.com/sm/b.xml", urlset("https://e.com/b/1",
                                          "https://e.com/b/2")),
        ("https://e.com/sm/a0.xml", urlset("https://e.com/a0/1")),
        # self-cycle: must be cut off by the depth budget
        ("https://e.com/sm/cyc.xml", index("https://e.com/sm/cyc.xml")),
    ]
    df = spark.createDataFrame(
        [("h0", root), ("h1", urlset("https://e.com/direct")),
         ("h2", index("https://e.com/sm/cyc.xml"))],
        "host: string, sitemap_xml: string",
    )
    bd = spark.createDataFrame(bodies, "child_url: string, body: string")
    got = expand_sitemap_indexes(df, bd, max_depth=3).collect()
    by_loc = {(r["host"], r["loc"]): r["depth"] for r in got}
    assert by_loc == {
        ("h1", "https://e.com/direct"): 0,
        ("h0", "https://e.com/b/1"): 1,
        ("h0", "https://e.com/b/2"): 1,
        ("h0", "https://e.com/a0/1"): 2,
    }
