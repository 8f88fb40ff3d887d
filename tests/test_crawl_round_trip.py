"""End-to-end crawl cycle: plan -> fetch -> publish -> index lookup ->
validate. Every stage is a gated operator or spark-submit job; this test
exercises their SEAMS against each other — the frontier's plan feeds the
publisher, the publisher's index serves a Wayback-style lookup, and the
published WARCs round-trip through the validation ingest — the way
jobs/dedup_job.py already composes the cleaning ops.

Funnel exactness at every stage: the planned url set is derived by hand
from the sitemap/robots/crawled fixtures, the release record count must
equal the plan, the cluster.idx lookup must locate the exact WARC extent
of a chosen url, and validation must flag exactly the one deliberately
empty page."""

import io
import json
import pathlib
import sys
from contextlib import redirect_stdout

import pyspark.sql.functions as F


def _run_job(monkeypatch, module, argv):
    monkeypatch.setattr(sys, "argv", argv)
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = module.main()
    assert rc == 0
    return json.loads(buf.getvalue().strip().splitlines()[-1])


def test_crawl_cycle_round_trip(spark, tmp_path, monkeypatch):
    sys.path.insert(0, "jobs")
    import crawl_plan_job
    import publish_job
    import validate_job

    # ---- fixtures: 2 hosts, 6 listed urls; one already crawled, one
    # robots-blocked, one (h0/b) destined to fetch an EMPTY page
    def urlset(*locs):
        body = "".join(f"<url><loc>{u}</loc></url>" for u in locs)
        return f"<urlset>{body}</urlset>"

    sitemaps = [
        ("h0.example.com", urlset("https://h0.example.com/a",
                                  "https://h0.example.com/b",
                                  "https://h0.example.com/c")),
        ("h1.example.com", urlset("https://h1.example.com/a",
                                  "https://h1.example.com/private/x",
                                  "https://h1.example.com/b")),
    ]
    sm_p = str(tmp_path / "sitemaps")
    spark.createDataFrame(sitemaps, "host string, sitemap_xml string") \
        .write.parquet(sm_p)
    rb_p = str(tmp_path / "robots")
    spark.createDataFrame(
        [("h1.example.com", "User-agent: *\nDisallow: /private/\n")],
        "host string, robots_txt string",
    ).write.parquet(rb_p)
    cr_p = str(tmp_path / "crawled")
    spark.createDataFrame(
        [("https://h0.example.com/c",)], "url string"
    ).write.parquet(cr_p)

    # ---- stage 1: plan (funnel: 6 listed -> 6 distinct -> 5 new ->
    # 4 allowed -> 4 scheduled)
    plan_p = str(tmp_path / "plan")
    stats = _run_job(monkeypatch, crawl_plan_job, [
        "crawl_plan_job", "--sitemaps", sm_p, "--robots", rb_p,
        "--crawled", cr_p, "--output", plan_p, "--agent", "sfs-bot",
        "--num-shards", "4",
    ])
    assert (stats["n_listed"], stats["n_distinct"], stats["n_new"],
            stats["n_allowed"], stats["n_scheduled"]) == (6, 6, 5, 4, 4)
    plan = spark.read.parquet(plan_p)
    planned = sorted(r["url"] for r in plan.select("url").collect())
    assert planned == [
        "https://h0.example.com/a", "https://h0.example.com/b",
        "https://h1.example.com/a", "https://h1.example.com/b",
    ]

    # ---- stage 2: synthetic fetch of exactly the planned urls. Bodies
    # carry English marker words (lang ID must land in the schema enum);
    # h0/b deliberately fetches an EMPTY body -> its extracted text is
    # '' and validation must flag exactly that url.
    page = F.when(
        F.col("url") == "https://h0.example.com/b",
        F.lit("<html><head><title>empty</title></head><body></body></html>"),
    ).otherwise(F.concat(
        F.lit("<html><head><title>T</title></head><body><p>the page at "),
        F.col("url"),
        F.lit(" is a fine page and the words are of the usual kind"
              "</p></body></html>"),
    ))
    docs_p = str(tmp_path / "fetched")
    (
        plan.select("url")
        .withColumn("doc_id", F.xxhash64("url"))
        .withColumn("html", page)
        .withColumn(
            "text",
            F.trim(F.regexp_replace(
                F.regexp_replace(page, r"(?is)<head\b.*?</head\s*>", " "),
                r"<[^>]*>|\s+", " ",
            )),
        )
        .withColumn("warc_ts", F.lit("2026-05-01 00:00:00").cast("timestamp"))
        .write.parquet(docs_p)
    )

    # ---- stage 3: publish the fetched corpus as a CC-style release
    rel_p = str(tmp_path / "release")
    pub = _run_job(monkeypatch, publish_job, [
        "publish_job", "--input", docs_p, "--output", rel_p,
        "--html-col", "html", "--ts-col", "warc_ts",
        "--num-shards", "1", "--prefix", "cycle",
    ])
    assert pub["n_records"] == 4
    rel = pathlib.Path(rel_p)
    cdxj = next(iter(sorted(rel.glob("*.cdxj"))))

    # ---- stage 4: Wayback-style lookup through the secondary index:
    # cluster.idx binary search -> one CDXJ block -> one WARC extent
    from schema_fantasy_spark.ops.urls import surt_key
    from schema_fantasy_spark.sources.cdx import lookup_via_cluster_idx
    from schema_fantasy_spark.sources.warc import parse_warc

    target = "https://h1.example.com/a"
    surt = spark.range(1).select(
        surt_key(F.lit(target)).alias("s")
    ).collect()[0]["s"]
    cluster = (rel / "cluster.idx").read_text()
    lines = lookup_via_cluster_idx(cluster, cdxj.read_bytes(), surt)
    assert len(lines) == 1
    meta = json.loads(lines[0].split(" ", 2)[2])
    assert meta["url"] == target
    archive = (rel / meta["filename"]).read_bytes()
    extent = archive[int(meta["offset"]): int(meta["offset"]) + int(meta["length"])]
    recs = parse_warc(extent)
    assert len(recs) == 1 and recs[0]["url"] == target
    assert b"is a fine page" in recs[0]["body"]

    # ---- stage 5: validate the published WARCs through the full crawl
    # ingest (charset sniff -> text extraction -> lang ID -> schema)
    summary = _run_job(monkeypatch, validate_job, [
        "validate_job", "--input", rel_p, "--input-format", "warc",
        "--manifest-dir", str(tmp_path / "manifest"),
        "--violations-dir", str(tmp_path / "violations"),
        "--derive-day-from", "warc_ts",
    ])
    assert summary["processed"] == ["2026-05-01"]
    viol = spark.read.parquet(str(tmp_path / "violations")).collect()
    assert {r["url"] for r in viol} == {"https://h0.example.com/b"}
    assert any(r["keyword"] == "minLength" for r in viol)
