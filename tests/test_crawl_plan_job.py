"""jobs/crawl_plan_job.py — sitemap inventory -> robots governance ->
politeness-sharded fetch plan, with exact funnel accounting."""

import io
import json
import sys
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def test_crawl_plan_job_end_to_end(spark, tmp_path, monkeypatch):
    sys.path.insert(0, "jobs")
    import crawl_plan_job

    def urlset(locs):
        body = "".join(f"<url><loc>{u}</loc></url>" for u in locs)
        return f'<?xml version="1.0"?><urlset>{body}</urlset>'

    # h0: 6 urls, two of which are variant spellings of the same page
    # (upper-case host + default port) -> 5 distinct; 2 already crawled
    # -> 3 new; /private/* disallowed for our agent kills 1 -> 2
    # scheduled; crawl-delay 3 spaces its queue.
    # h1: 4 urls, none crawled, all allowed, cap=2 drops 2.
    # h2: listed but its single url is already crawled -> contributes 0.
    sm_rows = [
        ("h0.example.com", urlset([
            "https://h0.example.com/a",
            "https://H0.EXAMPLE.COM:443/a",      # variant spelling of /a
            "https://h0.example.com/b",
            "https://h0.example.com/c",
            "https://h0.example.com/private/x",  # robots-disallowed
            "https://h0.example.com/d",
        ])),
        ("h1.example.com", urlset([
            f"https://h1.example.com/p/{i}" for i in range(4)
        ])),
        ("h2.example.com", urlset(["https://h2.example.com/only"])),
    ]
    robots_rows = [
        ("h0.example.com",
         "User-agent: sfs-bot\nDisallow: /private/\nCrawl-delay: 3\n"),
        ("h1.example.com", "User-agent: *\nDisallow:\n"),
    ]
    crawled_rows = [
        ("https://h0.example.com/c",),
        ("https://h0.example.com/d?",),   # variant spelling of /d
        ("https://h2.example.com/only",),
    ]
    smp, rbp, crp, out = (str(tmp_path / n) for n in
                          ("sm", "rb", "cr", "plan"))
    spark.createDataFrame(sm_rows, "host string, sitemap_xml string") \
        .write.parquet(smp)
    spark.createDataFrame(robots_rows, "host string, robots_txt string") \
        .write.parquet(rbp)
    spark.createDataFrame(crawled_rows, "url string").write.parquet(crp)

    monkeypatch.setattr(sys, "argv", [
        "crawl_plan_job.py", "--sitemaps", smp, "--robots", rbp,
        "--crawled", crp, "--output", out, "--agent", "SFS-Bot",
        "--num-shards", "8", "--per-host-cap", "2",
    ])
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = crawl_plan_job.main()
    assert rc == 0
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    # funnel: 11 listed -> 10 distinct, 3 crawled away -> 7 new,
    # 1 robots-killed -> 6 allowed, cap 2/host -> 4 scheduled, 2 capped
    assert stats["n_listed"] == 11
    assert stats["n_distinct"] == 10
    assert stats["n_new"] == 7
    assert stats["n_allowed"] == 6
    assert stats["n_scheduled"] == 4
    assert stats["n_capped_out"] == 2
    assert stats["max_queue_depth"] == 4  # h1's pre-cap queue

    plan = spark.read.parquet(out)
    rows = plan.collect()
    assert len(rows) == 4
    # politeness invariant: one shard per host
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], set()).add(r["shard"])
    assert all(len(s) == 1 for s in by_host.values())
    # h0's two survivors honor Crawl-delay: 3 (offsets 0, 3)
    h0 = sorted(r["fetch_offset_s"] for r in rows
                if r["host"] == "h0.example.com")
    assert h0 == [0, 3]
    # h1 uses the default delay (offsets 0, 1) and lost its tail to the cap
    h1 = sorted(r["fetch_offset_s"] for r in rows
                if r["host"] == "h1.example.com")
    assert h1 == [0, 1]
    # the disallowed url never appears
    assert not [r for r in rows if "/private/" in r["url"]]


def test_robots_crawl_delays(spark):
    from schema_fantasy_spark.ops.robots import robots_crawl_delays

    df = spark.createDataFrame(
        [("a.com", "User-agent: *\nCrawl-delay: 2\n"
                   "User-agent: x\nCrawl-delay: 7.2\n# Crawl-delay: 99"),
         ("b.com", "User-agent: *\nDisallow: /\n"),
         ("c.com", "crawl-DELAY:  4  \n")],
        "host string, robots_txt string",
    )
    got = {r["host"]: r["crawl_delay"]
           for r in robots_crawl_delays(df).collect()}
    # conservative: MAX delay in the file, fractional rounds UP;
    # comments stripped; hosts without the directive absent
    assert got == {"a.com": 8, "c.com": 4}


def test_crawl_plan_job_gz_and_nested_indexes(spark, tmp_path, monkeypatch):
    """The inventory stage's protocol edges inside the job: .xml.gz
    delivery (binary sitemap_body column, gunzipped at the source seam)
    and index-type sitemaps expanding through fetched child bodies —
    including one protocol-violating NESTED index — with the funnel
    counting every discovered url."""
    import gzip

    sys.path.insert(0, "jobs")
    import crawl_plan_job

    def urlset(locs):
        body = "".join(f"<url><loc>{u}</loc></url>" for u in locs)
        return f"<urlset>{body}</urlset>"

    def index(children):
        body = "".join(f"<sitemap><loc>{c}</loc></sitemap>"
                       for c in children)
        return f"<sitemapindex>{body}</sitemapindex>"

    # h0 ships a GZIPPED urlset of 2 urls; h1 ships an index whose first
    # child is itself an index (depth 2) over one grandchild urlset
    sm_rows = [
        ("h0.example.com", bytearray(gzip.compress(urlset([
            "https://h0.example.com/a", "https://h0.example.com/b",
        ]).encode(), mtime=0))),
        ("h1.example.com", bytearray(index([
            "https://h1.example.com/sm/nested.xml",
            "https://h1.example.com/sm/flat.xml",
        ]).encode())),
    ]
    body_rows = [
        ("https://h1.example.com/sm/nested.xml",
         index(["https://h1.example.com/sm/deep.xml"])),
        ("https://h1.example.com/sm/flat.xml",
         urlset(["https://h1.example.com/f/1"])),
        ("https://h1.example.com/sm/deep.xml",
         urlset(["https://h1.example.com/d/1",
                 "https://h1.example.com/d/2"])),
    ]
    smp, bdp, out = (str(tmp_path / n) for n in ("sm", "bodies", "plan"))
    spark.createDataFrame(sm_rows, "host string, sitemap_body binary") \
        .write.parquet(smp)
    spark.createDataFrame(body_rows, "child_url string, body string") \
        .write.parquet(bdp)

    monkeypatch.setattr(sys, "argv", [
        "crawl_plan_job.py", "--sitemaps", smp,
        "--sitemap-bodies", bdp, "--output", out,
        "--num-shards", "4",
    ])
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert crawl_plan_job.main() == 0
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    # 2 gz urls + 1 flat child + 2 nested grandchildren = 5 listed
    assert stats["n_listed"] == 5
    assert stats["n_distinct"] == 5
    assert stats["n_scheduled"] == 5
    plan = spark.read.parquet(out)
    urls = sorted(r["url"] for r in plan.collect())
    assert urls == [
        "https://h0.example.com/a", "https://h0.example.com/b",
        "https://h1.example.com/d/1", "https://h1.example.com/d/2",
        "https://h1.example.com/f/1",
    ]
