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
