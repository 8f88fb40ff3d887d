"""ops/boilerplate.py — block segmentation + link-density classification."""

from pyspark.sql import functions as F

from schema_fantasy_spark.ops.boilerplate import (
    block_stats,
    remove_boilerplate,
    with_boilerplate_removed,
)

NAV = '<div><a href="/1">Home</a> <a href="/2">About</a> <a href="/3">Contact</a></div>'
PARA = "<p>Real content paragraph with plenty of characters café &amp; friends.</p>"
SHORT = "<p>Tiny</p>"
FOOTER = '<div>© 2026 <a href="/t">Terms</a> <a href="/p">Privacy</a></div>'


def _run(spark, html, expr):
    df = spark.createDataFrame([(html,)], ["html"])
    return df.select(expr.alias("v")).collect()[0].v


def test_classification_and_join(spark):
    html = f"<html><body>{NAV}{PARA}{SHORT}{FOOTER}</body></html>"
    stats = _run(spark, html, block_stats(F.col("html")))
    assert [s.text for s in stats] == [
        "Home About Contact",
        "Real content paragraph with plenty of characters café & friends.",
        "Tiny",
        "© 2026 Terms Privacy",
    ]
    assert [s.content for s in stats] == [False, True, False, False]
    # nav: fully anchors; footer: 13*2 > 20; short: < min_len
    assert stats[0].anchor_len == stats[0].text_len == 18
    assert (stats[3].text_len, stats[3].anchor_len) == (20, 13)
    out = _run(spark, html, remove_boilerplate(F.col("html")))
    assert out == "Real content paragraph with plenty of characters café & friends."


def test_inline_anchor_in_long_paragraph_is_content(spark):
    html = ("<p>Long paragraph mentioning <a href='/x'>one link</a> inside "
            "sixty characters of text to stay content.</p>")
    stats = _run(spark, html, block_stats(F.col("html")))
    assert len(stats) == 1 and stats[0].content
    assert stats[0].anchor_len == len("one link")


def test_quoted_gt_in_attr_and_script_inside_block(spark):
    html = ('<div data-q="a>b"><script>var x = "</div>";</script>'
            "A sufficiently long sentence of plain visible text here.</div>")
    out = _run(spark, html, remove_boilerplate(F.col("html")))
    assert out == "A sufficiently long sentence of plain visible text here."


def test_min_len_parameter_and_empty_result(spark):
    html = f"<html><body>{NAV}{SHORT}</body></html>"
    assert _run(spark, html, remove_boilerplate(F.col("html"))) == ""
    # with a tiny threshold the short paragraph qualifies
    assert _run(spark, html, remove_boilerplate(F.col("html"), min_len=3)) == "Tiny"


def test_with_boilerplate_removed_binary_and_plan(spark):
    df = spark.createDataFrame(
        [(1, f"<body>{NAV}{PARA}</body>".encode(),)], ["doc_id", "html"]
    )
    out = with_boilerplate_removed(df)
    assert out.collect()[0].content_text.startswith("Real content")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # pure Column work


def test_with_block_stats_equals_column_form(spark):
    """The df-level fast path (array-level SQL entity decode behind
    Generate barriers) must return exactly what the Column-form
    block_stats returns, row for row, struct for struct."""
    from schema_fantasy_spark.ops.boilerplate import with_block_stats
    from schema_fantasy_spark.ops.dedup import _barrier

    htmls = [
        "<html><body><p>a long enough content paragraph with words "
        "and caf&eacute; &amp; entities</p>"
        '<div><a href="/x">nav one</a> <a href="/y">nav two</a></div>'
        "<p>short</p><footer>f &copy; 2026</footer></body></html>",
        "<p></p>",
        "<div>exactly at the density boundary "
        '<a href="q">half of everything here is anchor text ok</a>'
        " trailing words</div>",
    ]
    df = spark.createDataFrame([(i, h) for i, h in enumerate(htmls)],
                               "i long, html string")
    fast = {r["i"]: [tuple(b) for b in r["stats"]]
            for r in with_block_stats(df, html_col="html").collect()}
    slow = {r["i"]: [tuple(b) for b in r["stats"]]
            for r in _barrier(df, block_stats(F.col("html")), "stats").collect()}
    assert fast == slow and len(fast) == 3
