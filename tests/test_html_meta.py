"""ops/html_meta.py — metadata + outlink extraction in pure Columns."""

from pyspark.sql import functions as F

from schema_fantasy_spark.ops.html_meta import (
    html_canonical,
    html_meta_content,
    html_outlinks,
    html_title,
    resolve_href,
    with_html_metadata,
)


def _one(spark, html, col):
    df = spark.createDataFrame([(html,)], "html: string")
    return df.select(col(F.col("html")).alias("v")).collect()[0]["v"]


def test_title(spark):
    assert _one(spark, "<html><head><title>A &amp; B</title></head></html>",
                html_title) == "A & B"
    # whitespace collapse + inner tag strip + numeric entity
    assert _one(spark, "<title>\n  caf&#233;   <b>x</b>\t</title>", html_title) == "café x"
    # first title wins; attributes on the tag allowed
    assert _one(spark, "<title id='t'>one</title><title>two</title>", html_title) == "one"
    assert _one(spark, "<p>no title</p>", html_title) is None
    # empty title is "" (present), not NULL
    assert _one(spark, "<title></title>", html_title) == ""


def test_meta_both_orders_and_quotes(spark):
    for h in (
        '<meta name="description" content="hello world">',
        "<meta name='description' content='hello world'/>",
        '<meta content="hello world" name="description">',
        "<meta charset='x'><META CONTENT='hello world' NAME='description'>",
    ):
        assert _one(spark, h, lambda c: html_meta_content(c, "description")) == \
            "hello world", h
    # wrong key does not match; og: goes through property=
    assert _one(spark, '<meta name="keywords" content="k">',
                lambda c: html_meta_content(c, "description")) is None
    assert _one(spark, '<meta property="og:title" content="OG &amp; T">',
                lambda c: html_meta_content(c, "og:title", attr="property")) == "OG & T"
    # name="description" must not be satisfied by property="description"
    assert _one(spark, '<meta property="description" content="x">',
                lambda c: html_meta_content(c, "description")) is None


def test_canonical(spark):
    assert _one(spark, '<link rel="canonical" href="https://e.com/a?x=1&amp;y=2">',
                html_canonical) == "https://e.com/a?x=1&y=2"
    assert _one(spark, "<link href='https://e.com/b' rel='canonical'>",
                html_canonical) == "https://e.com/b"
    assert _one(spark, '<link rel="stylesheet" href="s.css">', html_canonical) is None


def test_outlinks_order_and_cleanup(spark):
    html = (
        '<a href="https://a.com/1">first</a> text '
        "<a href='/rel'> <b>bold</b>\nanchor </a>"
        '<a name="no-href">skipped</a>'
        '<a href="mailto:x@y.z">mail &amp; such</a>'
        '<a data-x="v>w" href="https://b.com/2?q=1&amp;r=2">q</a>'
        '<a rel="NoFollow sponsored" href="https://paid.com/x">ad</a>'
        "<a rel='author' href='https://f.com/y'>f</a>"
    )
    links = _one(spark, html, html_outlinks)
    assert [(l["href"], l["anchor"], l["nofollow"]) for l in links] == [
        ("https://a.com/1", "first", False),
        ("/rel", "bold anchor", False),
        ("mailto:x@y.z", "mail & such", False),
        ("https://b.com/2?q=1&r=2", "q", False),
        ("https://paid.com/x", "ad", True),   # token match, case-insensitive
        ("https://f.com/y", "f", False),      # rel present but not nofollow
    ]


def test_resolve_href(spark):
    df = spark.createDataFrame(
        [("https://x.com/p", ), ("HTTP://UP.com/q",), ("//cdn.com/r",),
         ("/root/s",), ("rel/t",), ("#frag",), ("mailto:a@b.c",), ("javascript:void(0)",)],
        "href: string",
    )
    got = [
        r["v"]
        for r in df.select(
            resolve_href(F.col("href"), F.lit("https"), F.lit("base.com")).alias("v")
        ).collect()
    ]
    assert got == [
        "https://x.com/p", "HTTP://UP.com/q", "https://cdn.com/r",
        "https://base.com/root/s", None, None, None, None,
    ]


def test_with_html_metadata_end_to_end(spark):
    html = (
        "<html><head><title>T</title>"
        '<meta name="description" content="D">'
        '<link rel="canonical" href="/canon"></head>'
        '<body><a href="/a">x</a><a href="rel">y</a>'
        '<a href="https://other.com/b">z</a></body></html>'
    )
    df = spark.createDataFrame([(1, html, "https", "h.com")],
                               "id: long, html: string, scheme: string, host: string")
    row = with_html_metadata(df, base_scheme_col="scheme", base_host_col="host").collect()[0]
    assert row["title"] == "T" and row["description"] == "D"
    assert row["og_title"] is None and row["canonical"] == "/canon"
    assert [l["href"] for l in row["outlinks"]] == ["/a", "rel", "https://other.com/b"]
    assert [l["href"] for l in row["resolved_outlinks"]] == [
        "https://h.com/a", "https://other.com/b",
    ]
    # binary html works too (input_hint: html arrives as binary)
    dfb = spark.createDataFrame([(1, html.encode(),)], "id: long, html: binary")
    assert with_html_metadata(dfb).collect()[0]["title"] == "T"


def test_jsonld_blocks(spark):
    from schema_fantasy_spark.ops.html_meta import jsonld_blocks

    html = (
        '<script type="text/javascript">var x = {"@type":"Nope"};</script>'
        '<script type="application/ld+json">\n {"@type":"Article","name":"A"} '
        "</script><p>body</p>"
        "<script data-x='type=\"application/ld+json\"' type='module'>no</script>"
        "<SCRIPT TYPE='application/ld+json'>{\"@type\":\"Product\"}</SCRIPT>"
    )
    got = _one(spark, html, jsonld_blocks)
    assert got == ['{"@type":"Article","name":"A"}', '{"@type":"Product"}']
    assert _one(spark, "<p>none</p>", jsonld_blocks) == []


def test_plan_is_python_free(spark):
    df = spark.createDataFrame([("<p>x</p>", "https", "h.com")],
                               "html: string, scheme: string, host: string")
    out = with_html_metadata(df, base_scheme_col="scheme", base_host_col="host")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # node names, not bare substrings: the WHATWG entity table
    # literal legitimately contains names like DoubleDownArrow
    assert "EvalPython" not in plan
