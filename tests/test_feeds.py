"""ops/feeds.py — RSS 2.0 / Atom 1.0 parsing."""

from pyspark.sql import functions as F

from schema_fantasy_spark.ops.feeds import (
    feed_entries,
    feed_kind,
    feed_title,
    parse_feeds,
)

RSS = """<?xml version="1.0"?>
<rss version="2.0"><channel>
  <title>News &amp; Views</title>
  <link>https://e.com/</link>
  <item>
    <title> First &#233;tude </title>
    <link>https://e.com/1?a=1&amp;b=2</link>
    <pubDate>Mon, 02 Feb 2026 10:00:00 GMT</pubDate>
    <guid>tag:e.com,1</guid>
  </item>
  <item><title>Second</title></item>
  <item><guid>orphan-guid-only</guid></item>
</channel></rss>"""

ATOM = """<?xml version="1.0" encoding="utf-8"?>
<feed xmlns="http://www.w3.org/2005/Atom">
  <title>Atom Feed</title>
  <link href="https://a.com/"/>
  <entry>
    <title>E1 &amp; co</title>
    <link href='https://a.com/e1'/>
    <updated>2026-02-03T10:00:00Z</updated>
    <id>urn:a1</id>
  </entry>
  <entry><title>E2</title><link href="https://a.com/e2"/></entry>
</feed>"""


def _one(spark, xml, col):
    df = spark.createDataFrame([(xml,)], "x: string")
    return df.select(col(F.col("x")).alias("v")).collect()[0]["v"]


def test_kind_and_title(spark):
    assert _one(spark, RSS, feed_kind) == "rss"
    assert _one(spark, ATOM, feed_kind) == "atom"
    assert _one(spark, "<html/>", feed_kind) == "invalid"
    # channel title, not the first ITEM title; entities decoded
    assert _one(spark, RSS, feed_title) == "News & Views"
    assert _one(spark, ATOM, feed_title) == "Atom Feed"


def test_rss_entries(spark):
    got = _one(spark, RSS, feed_entries)
    assert [(e["title"], e["link"], e["ts"], e["guid"]) for e in got] == [
        ("First étude", "https://e.com/1?a=1&b=2",
         "Mon, 02 Feb 2026 10:00:00 GMT", "tag:e.com,1"),
        ("Second", None, None, None),
    ]  # the title-less, link-less guid-only block drops


def test_atom_entries(spark):
    got = _one(spark, ATOM, feed_entries)
    assert [(e["title"], e["link"], e["ts"], e["guid"]) for e in got] == [
        ("E1 & co", "https://a.com/e1", "2026-02-03T10:00:00Z", "urn:a1"),
        ("E2", "https://a.com/e2", None, None),
    ]


def test_parse_feeds_frame_and_plan(spark):
    df = spark.createDataFrame(
        [("h0", RSS), ("h1", ATOM)], "host: string, feed_xml: string"
    )
    out = parse_feeds(df)
    rows = {r["host"]: r for r in out.collect()}
    assert rows["h0"]["kind"] == "rss" and len(rows["h0"]["entries"]) == 2
    assert rows["h1"]["kind"] == "atom" and len(rows["h1"]["entries"]) == 2
    plan = out._jdf.queryExecution().executedPlan().toString()
    # node names, not bare substrings (entity-table literal contains
    # names like DoubleDownArrow)
    assert "EvalPython" not in plan
