"""robots.txt parse + allow/deny evaluation (ops/robots.py, RFC 9309)."""

from pyspark.sql import functions as F

from schema_fantasy_spark.ops.robots import parse_robots, robots_allowed


def _rules(spark, txt, host="h.com"):
    df = spark.createDataFrame([(host, txt)], "host: string, robots_txt: string")
    return parse_robots(df)


def _verdicts(spark, rules, paths, agent, host="h.com"):
    urls = spark.createDataFrame(
        [(host, p) for p in paths], "host: string, path: string"
    )
    return {
        r["path"]: r["allowed"]
        for r in robots_allowed(urls, rules, agent).collect()
    }


def test_parse_groups_and_hygiene(spark):
    """Stacked User-agent lines share one group; comments, blank lines,
    unknown directives (Sitemap, Crawl-delay) and the RFC empty-Disallow
    form all drop; directives and agents are case-insensitive; CRLF ok."""
    txt = ("# policy\r\n"
           "User-Agent: GoogleBot\r\n"
           "USER-AGENT: sfsbot\r\n"
           "Disallow: /private/   # trailing comment\r\n"
           "Allow: /private/ok\r\n"
           "Crawl-delay: 10\r\n"
           "\r\n"
           "User-agent: *\r\n"
           "Disallow:\r\n"
           "Disallow: /tmp/\r\n"
           "Sitemap: https://h.com/s.xml\r\n")
    rows = _rules(spark, txt).collect()
    got = sorted((r["agent"], r["rule"], r["pattern"]) for r in rows)
    assert got == [
        ("*", "disallow", "/tmp/"),
        ("googlebot", "allow", "/private/ok"),
        ("googlebot", "disallow", "/private/"),
        ("sfsbot", "allow", "/private/ok"),
        ("sfsbot", "disallow", "/private/"),
    ]


def test_longest_match_allow_ties_and_groups(spark):
    txt = ("User-agent: sfsbot\n"
           "Disallow: /private/\n"
           "Allow: /private/ok\n"
           "\n"
           "User-agent: *\n"
           "Disallow: /tmp/\n")
    rules = _rules(spark, txt)
    v = _verdicts(spark, rules, ["/private/a", "/private/ok.html",
                                 "/tmp/x", "/pub"], "SfsBot")
    # exact group: longest match wins; /tmp only lives in the shadowed *
    assert v == {"/private/a": False, "/private/ok.html": True,
                 "/tmp/x": True, "/pub": True}
    v = _verdicts(spark, rules, ["/private/a", "/tmp/x"], "otherbot")
    assert v == {"/private/a": True, "/tmp/x": False}
    # equal-length patterns: Allow wins the tie (RFC 9309 §2.2.2)
    tie = _rules(spark, "User-agent: *\nDisallow: /dir/\nAllow: /dir*\n")
    assert _verdicts(spark, tie, ["/dir/x"], "any") == {"/dir/x": True}


def test_wildcards_and_anchor(spark):
    txt = ("User-agent: *\n"
           "Disallow: /*.pdf$\n"
           "Disallow: /a/*/deep\n"
           "Allow: /\n")
    rules = _rules(spark, txt)
    v = _verdicts(spark, rules, [
        "/doc.pdf", "/doc.pdf?x=1", "/sub/doc.pdf",
        "/a/b/deep", "/a/b/deeper", "/a/deep",
    ], "bot")
    assert v["/doc.pdf"] is False            # $ anchors the end
    assert v["/doc.pdf?x=1"] is True         # query tail breaks the anchor
    assert v["/sub/doc.pdf"] is False        # leading * spans dirs
    assert v["/a/b/deep"] is False
    assert v["/a/b/deeper"] is False         # prefix semantics past the match
    assert v["/a/deep"] is True              # * needs its own segment here?
    # no: '*' may match empty — /a/*/deep vs /a/deep: '/a/' + '' + '/deep'
    # needs '/a//deep'; '/a/deep' lacks the second slash -> allowed


def test_no_rules_and_unknown_host(spark):
    rules = _rules(spark, "User-agent: *\nDisallow: /x\n", host="h.com")
    urls = spark.createDataFrame(
        [("h.com", "/x1"), ("nohost.com", "/x1")],
        "host: string, path: string",
    )
    got = {(r["host"], r["path"]): r["allowed"]
           for r in robots_allowed(urls, rules, "b").collect()}
    assert got == {("h.com", "/x1"): False, ("nohost.com", "/x1"): True}


def test_plan_broadcasts_rules(spark):
    """The rules side broadcasts; the url side takes no exchange —
    verdicts are a map over the broadcast-joined row."""
    rules = _rules(spark, "User-agent: *\nDisallow: /x\n")
    urls = spark.createDataFrame([("h.com", "/x")], "host: string, path: string")
    plan = robots_allowed(urls, rules, "b")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_robots_sitemaps_group_independent(spark):
    from schema_fantasy_spark.ops.robots import robots_sitemaps

    txt = (
        "Sitemap: https://e.com/sm0.xml\n"
        "User-agent: *\nDisallow: /tmp/\n"
        "sitemap: https://e.com/sm1.xml  # trailing comment\n"
        "User-agent: bot\nAllow: /\n"
        "SITEMAP: https://e.com/sm2.xml\n"
        "Sitemap:\n"  # empty value drops
    )
    df = spark.createDataFrame([("e.com", txt), ("f.com", "User-agent: *\n")],
                               "host: string, robots_txt: string")
    got = sorted((r["host"], r["sitemap_url"]) for r in robots_sitemaps(df).collect())
    assert got == [
        ("e.com", "https://e.com/sm0.xml"),
        ("e.com", "https://e.com/sm1.xml"),
        ("e.com", "https://e.com/sm2.xml"),
    ]
