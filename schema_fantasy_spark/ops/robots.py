"""robots.txt parsing + allow/deny evaluation (RFC 9309) — the crawl-
governance operator: before a page enters the corpus, the crawler had
to be allowed to fetch it, and re-validating that against the host's
robots rules is a standard compliance check over crawl output.

Both halves stay in DataFrame operators:

* ``parse_robots`` turns a (host, robots_txt) table into a RULES table
  — one row per (host, agent, rule, pattern) — entirely in Column
  expressions: lines explode with ``posexplode``, consecutive
  ``User-agent`` lines form a group (RFC 9309 §2.2.1 "start-of-group"),
  and every rule line joins to ALL agents of its group via a running
  group id (two window functions over the line index, partitioned by
  host — robots files are KB-sized, so the per-host window state is
  trivial).
* ``robots_allowed`` evaluates urls against the rules: pick the url
  agent's group (exact agent match if it has any rules, else ``*`` —
  the RFC's most-specific-match collapsed to the two levels crawl
  pipelines actually use), then longest-match wins with Allow winning
  ties (§2.2.2). ``*`` wildcards and the ``$`` end anchor compile to
  an anchored regex per rule at evaluation time; specificity is the
  pattern's octet length, the RFC measure. A url whose host has no
  robots rows is allowed (the no-robots default).

Scale shape: rules tables are tiny (one site's robots is KB; even the
full Common Crawl host set is ~10^8 rows of short strings) — the rules
side BROADCASTS and the 10^12-row url side never shuffles. The regex
per (url, candidate-rule) pair runs inside codegen after the broadcast
hash join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _pattern_regex(pattern: Column) -> Column:
    """robots path pattern -> anchored Java regex, in Column exprs:
    regex metachars escaped, ``*`` -> ``.*``, trailing ``$`` -> end
    anchor (a ``$`` anywhere else is literal, per the RFC)."""
    ends_anchor = pattern.endswith("$")
    body = F.when(
        ends_anchor, F.substring(pattern, 1, F.length(pattern) - 1)
    ).otherwise(pattern)
    esc = F.regexp_replace(body, r"([\\.\[\]\{\}\(\)\+\?\^\$\|])", r"\\$1")
    esc = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), esc, F.when(ends_anchor, F.lit("$")).otherwise(F.lit(""))
    )


def parse_robots(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, agent, rule, pattern, specificity) rules table from raw
    robots.txt bodies. ``rule`` is 'allow' or 'disallow'; agents are
    lowercased; comments (#) and unknown directives drop; an EMPTY
    Disallow (``Disallow:``) is the RFC allow-everything form and drops
    (no pattern can match less than everything). Pure Column exprs:
    posexplode + two per-host windows."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(text_col), "\r?\n")).alias("ln", "line"),
    )
    # strip comments + whitespace
    body = F.trim(F.regexp_replace(F.col("line"), "#.*$", ""))
    directive = F.lower(F.regexp_extract(body, r"^([A-Za-z-]+)\s*:", 1))
    value = F.trim(F.regexp_extract(body, r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
    lines = lines.select(
        "host", "ln", directive.alias("d"), value.alias("v")
    ).filter(F.col("d").isin("user-agent", "allow", "disallow"))

    w = Window.partitionBy("host").orderBy("ln")
    is_ua = F.col("d") == "user-agent"
    # start-of-group: a user-agent line NOT preceded by another one
    starts = is_ua & (F.lag("d").over(w) != "user-agent") | (
        is_ua & F.lag("d").over(w).isNull()
    )
    lines = lines.withColumn(
        "grp", F.sum(starts.cast("int")).over(w)
    )
    agents = lines.filter(is_ua).select(
        "host", "grp", F.lower(F.col("v")).alias("agent")
    )
    rules = lines.filter(~is_ua & (F.col("v") != "")).select(
        "host", "grp", F.col("d").alias("rule"), F.col("v").alias("pattern"),
        F.length("v").alias("specificity"),
    )
    return agents.join(rules, ["host", "grp"]).drop("grp")


def robots_sitemaps(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, sitemap_url) rows from ``Sitemap:`` directives — the
    discovery link between crawl governance (this module) and the
    sitemap inventory (ops/sitemap.py). Per RFC 9309 §2.2.4 / the
    sitemaps.org protocol the directive is GROUP-INDEPENDENT (valid
    anywhere in the file, any number of times), so this is a flat line
    scan: no group windows, no shuffle beyond the explode."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(text_col), "\r?\n")).alias("line"),
    )
    body = F.trim(F.regexp_replace(F.col("line"), "#.*$", ""))
    directive = F.lower(F.regexp_extract(body, r"^([A-Za-z-]+)\s*:", 1))
    # the value is a URL: split on the FIRST colon only (https:// has one)
    value = F.trim(F.regexp_extract(body, r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
    return (
        lines.select("host", directive.alias("d"), value.alias("sitemap_url"))
        .filter((F.col("d") == "sitemap") & (F.col("sitemap_url") != ""))
        .drop("d")
    )


def robots_crawl_delays(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, crawl_delay) from ``Crawl-delay:`` directives —
    integer seconds, the politeness input to
    ops/frontier.schedule_fetches. Crawl-delay is NOT part of RFC 9309
    (it's the de-facto extension most crawlers honor); group
    attribution varies by crawler, so this takes the CONSERVATIVE
    reading: the MAX delay named anywhere in the host's file
    (politeness can only err slow). Fractional values round up; hosts
    without the directive are absent (callers coalesce a default).
    Flat line scan, same shape as robots_sitemaps."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(text_col), "\r?\n")).alias("line"),
    )
    body = F.trim(F.regexp_replace(F.col("line"), "#.*$", ""))
    directive = F.lower(F.regexp_extract(body, r"^([A-Za-z-]+)\s*:", 1))
    value = F.regexp_extract(body, r"^[A-Za-z-]+\s*:\s*([0-9]+(?:\.[0-9]+)?)\s*$", 1)
    return (
        lines.select("host", directive.alias("d"), value.alias("v"))
        .filter((F.col("d") == "crawl-delay") & (F.col("v") != ""))
        .groupBy("host")
        .agg(F.ceil(F.max(F.col("v").cast("double"))).cast("int")
             .alias("crawl_delay"))
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    agent: str,
    host_col: str = "host",
    path_col: str = "path",
) -> DataFrame:
    """urls + an ``allowed`` boolean for ``agent``: exact agent group if
    it has rules for the host, else the ``*`` group, longest pattern
    wins, Allow wins length ties, no rules -> allowed (RFC 9309 §2.2).

    Shape: the rules collapse to ONE row per host (an array of rule
    structs) and broadcast; each url row evaluates its own host's array
    with higher-order functions — no shuffle, no window, no fan-out on
    the 10^12-row url side. The per-rule regex evaluates per row
    (robots rules per host number in the tens, and a pattern without
    wildcards short-circuits to a plain prefix test).
    """
    agent = agent.lower()
    r = rules.filter(F.col("agent").isin(agent, "*")).withColumn(
        "exact", (F.col("agent") == agent).cast("int")
    )
    # most specific agent level per host: the exact group if it exists
    best = r.groupBy("host").agg(F.max("exact").alias("best_exact"))
    r = r.join(best, "host").filter(F.col("exact") == F.col("best_exact"))
    per_host = r.groupBy("host").agg(
        F.collect_list(
            F.struct(
                F.col("rule"),
                F.col("specificity"),
                _pattern_regex(F.col("pattern")).alias("rx"),
                (~F.col("pattern").rlike(r"[*$]")).alias("plain"),
                F.col("pattern"),
            )
        ).alias("_rules")
    )

    j = urls.join(
        F.broadcast(per_host), urls[host_col] == per_host["host"], "left"
    ).drop(per_host["host"])
    path = F.col(path_col)
    hit = lambda x: F.when(  # noqa: E731 — bound per-element predicate
        x["plain"], path.startswith(x["pattern"])
    ).otherwise(F.regexp_like(path, x["rx"]))
    scores = F.transform(
        F.filter(F.col("_rules"), hit),
        lambda x: x["specificity"] * 2 + (x["rule"] == "allow").cast("int"),
    )
    win = F.array_max(scores)
    allowed = F.when(win.isNull(), F.lit(True)).otherwise(
        F.pmod(win, F.lit(2)) == 1
    )
    return j.withColumn("allowed", allowed).select(
        *[c for c in urls.columns], "allowed"
    )
