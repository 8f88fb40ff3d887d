"""spark-submit entry point: plan the next crawl cycle, end to end.

    /opt/spark/bin/spark-submit --master local[8] \
        --py-files dist/schema_fantasy_spark.zip \
        jobs/crawl_plan_job.py \
        --sitemaps /in/sitemaps --robots /in/robots \
        --crawled /in/crawled --agent sfs-bot --output /out/plan

The crawl-planning composition — every stage an operator this engine
ships and gates:

    1. INVENTORY   — parse each host's sitemap XML into candidate urls
                     (ops.sitemap.parse_sitemaps, entry 55's operator);
                     .xml.gz bodies gunzip at the source seam
                     (with_gunzipped_sitemaps), and with
                     --sitemap-bodies index sitemaps expand through the
                     fetched child documents to --max-index-depth
                     (expand_sitemap_indexes — nested indexes, each
                     body parsed once);
    2. CANONICALIZE— collapse crawl-variant spellings to one canonical
                     url per candidate (ops.urls.canonicalize_url, the
                     text_consistency key), keep one row per key;
    3. NOVELTY     — drop urls already crawled (canonical-key left-anti
                     join against --crawled; --recrawl keeps them);
    4. GOVERNANCE  — RFC 9309: parse each host's robots.txt, keep urls
                     the --agent may fetch (ops.robots.parse_robots +
                     robots_allowed, entry 51's operator; rules
                     broadcast, urls never shuffle for this), and read
                     Crawl-delay politeness budgets
                     (ops.robots.robots_crawl_delays);
    5. SCHEDULE    — politeness-partitioned fetch plan
                     (ops.frontier.schedule_fetches, entry 67's
                     operator): all of one host on ONE shard, per-host
                     sequence + delay offsets, --per-host-cap bounding
                     mega-hosts;
    6. write the plan parquet (partitioned by shard — each fetcher
       reads exactly its own files) + ONE JSON stats line on stdout
       with the full funnel: n_listed -> n_distinct -> n_new ->
       n_allowed -> n_scheduled (plus capped-out count and max queue
       depth). Candidate accounting is ONE aggregation pass over the
       annotated frame (per-key spelling counts fold n_listed in,
       novelty and governance are per-row flags — the filter_funnel
       discipline, no rescans of earlier stages); queue stats are one
       further bounded pass over the scheduled plan, which only exists
       after the host window.

100 TB shape: the url side shuffles exactly twice (the canonical-key
dedup and the host window inside schedule_fetches) plus the final
shard repartition that materializes fetcher queues; robots rules and
crawl delays are per-host (tiny) and broadcast. No Python in the row
path.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sitemaps", required=True,
                    help="parquet of (host, sitemap_xml)")
    ap.add_argument("--robots", default=None,
                    help="parquet of (host, robots_txt); absent = all allowed")
    ap.add_argument("--crawled", default=None,
                    help="parquet with a url column of already-crawled pages")
    ap.add_argument("--output", required=True, help="fetch-plan parquet path")
    ap.add_argument("--agent", default="sfs-bot",
                    help="user-agent token for robots group matching")
    ap.add_argument("--num-shards", type=int, default=256)
    ap.add_argument("--per-host-cap", type=int, default=10000,
                    help="max urls scheduled per host this cycle (0 = none)")
    ap.add_argument("--default-delay", type=int, default=1,
                    help="seconds between fetches for hosts without Crawl-delay")
    ap.add_argument("--recrawl", action="store_true",
                    help="keep already-crawled urls in the plan")
    ap.add_argument("--sitemap-body-col", default="sitemap_body",
                    help="binary body column when --sitemaps carries "
                         ".xml.gz payloads instead of a sitemap_xml "
                         "string column (gunzipped at the source seam)")
    ap.add_argument("--sitemap-bodies", default=None,
                    help="parquet of (child_url, body): fetched child "
                         "sitemap documents — index-type sitemaps expand "
                         "through them (nested indexes supported)")
    ap.add_argument("--max-index-depth", type=int, default=3,
                    help="bound on sitemapindex nesting during expansion")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from schema_fantasy_spark.ops.frontier import schedule_fetches
    from schema_fantasy_spark.ops.robots import (
        parse_robots,
        robots_allowed,
        robots_crawl_delays,
    )
    from schema_fantasy_spark.ops.sitemap import parse_sitemaps
    from schema_fantasy_spark.ops.urls import canonicalize_url

    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("sfs-crawl-plan").getOrCreate()

    # 1. inventory. Bodies may arrive as .xml.gz binary (the protocol's
    # usual delivery) — the gunzip seam recovers XML per row; with
    # --sitemap-bodies, index-type sitemaps expand through the fetched
    # child bodies to a bounded depth (nested indexes exist in the
    # wild), each body parsed exactly once.
    sm = spark.read.parquet(args.sitemaps)
    if "sitemap_xml" not in sm.columns:
        from schema_fantasy_spark.ops.sitemap import with_gunzipped_sitemaps

        sm = with_gunzipped_sitemaps(sm, args.sitemap_body_col)
    elif dict(sm.dtypes).get("sitemap_xml") == "binary":
        from schema_fantasy_spark.ops.sitemap import with_gunzipped_sitemaps

        sm = with_gunzipped_sitemaps(
            sm.withColumnRenamed("sitemap_xml", "__sm_body"), "__sm_body"
        ).drop("__sm_body")
    if args.sitemap_bodies:
        from schema_fantasy_spark.ops.sitemap import expand_sitemap_indexes

        bodies = spark.read.parquet(args.sitemap_bodies)
        listed = (
            expand_sitemap_indexes(
                sm, bodies, key_cols=("host",),
                max_depth=args.max_index_depth,
            )
            .select("host", F.col("loc").alias("url"))
            .filter(F.col("url").isNotNull() & (F.col("url") != ""))
        )
    else:
        listed = (
            parse_sitemaps(sm, "sitemap_xml", key_cols=("host",))
            .select("host", F.explode("urls").alias("u"))
            .select("host", F.col("u")["loc"].alias("url"))
            .filter(F.col("url").isNotNull() & (F.col("url") != ""))
        )

    # 2. one row per canonical url (min spelling is the stable pick);
    # the per-key spelling count folds n_listed into the candidate frame
    # so funnel accounting never rescans the parse output
    cand = (
        listed.withColumn("url_key", canonicalize_url(F.col("url")))
        .groupBy("url_key")
        .agg(F.min("url").alias("url"), F.min("host").alias("host"),
             F.count(F.lit(1)).alias("n_spellings"))
    )

    # 3. novelty — ANNOTATE rather than drop (the filter-funnel
    # discipline: each stage is a per-row flag so one aggregation pass
    # yields every funnel count; already-crawled urls wait for
    # --recrawl cycles via the is_new filter before scheduling)
    if args.crawled and not args.recrawl:
        crawled = (
            spark.read.parquet(args.crawled)
            .select(canonicalize_url(F.col("url")).alias("url_key"))
            .distinct()
            .withColumn("__seen", F.lit(True))
        )
        cand = cand.join(crawled, "url_key", "left").withColumn(
            "is_new", F.col("__seen").isNull()
        ).drop("__seen")
    else:
        cand = cand.withColumn("is_new", F.lit(True))

    # 4. governance
    if args.robots:
        rb = spark.read.parquet(args.robots)
        rules = parse_robots(rb)
        path = F.regexp_extract(F.col("url"), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*(/.*)?$", 1)
        cand = cand.withColumn(
            "path", F.when(path == "", F.lit("/")).otherwise(path)
        )
        cand = robots_allowed(cand, rules, args.agent,
                              host_col="host", path_col="path")
        delays = robots_crawl_delays(rb)
        cand = cand.join(F.broadcast(delays), "host", "left")
    else:
        cand = cand.withColumn("allowed", F.lit(True)).withColumn(
            "crawl_delay", F.lit(None).cast("int")
        )

    plan = schedule_fetches(
        cand.filter(F.col("is_new") & F.col("allowed")),
        host_col="host", url_col="url", delay_col="crawl_delay",
        default_delay=args.default_delay, num_shards=args.num_shards,
        per_host_cap=None,  # cap accounted below, then applied
    )
    cap = args.per_host_cap if args.per_host_cap > 0 else None
    in_cap = F.lit(True) if cap is None else (F.col("seq") < F.lit(cap))
    plan = plan.withColumn("in_cap", in_cap)

    # ONE accounting pass over the annotated candidate frame: listed/
    # distinct/new/allowed all come from per-row annotations (spelling
    # counts, is_new, allowed), never from rescans of earlier stages
    stats_row = (
        cand.agg(
            F.sum("n_spellings").alias("n_listed"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.sum(F.col("is_new").cast("long")).alias("n_new"),
            F.sum((F.col("is_new") & F.col("allowed")).cast("long"))
            .alias("n_allowed"),
        ).collect()[0]
    )
    sched = (
        plan.agg(
            F.sum(F.col("in_cap").cast("long")).alias("n_scheduled"),
            F.sum((~F.col("in_cap")).cast("long")).alias("n_capped_out"),
            F.max(F.col("seq") + 1).alias("max_queue_depth"),
            F.count_distinct("shard").alias("n_shards_used"),
        ).collect()[0]
    )
    final = plan.filter(F.col("in_cap")).select(
        "shard", "host", "url", "url_key", "seq", "fetch_offset_s"
    )
    # each fetcher reads exactly its own shard's files
    final.repartition(args.num_shards, F.col("shard")).write.mode(
        "overwrite"
    ).partitionBy("shard").parquet(args.output)

    print(json.dumps({
        "n_listed": int(stats_row["n_listed"] or 0),
        "n_distinct": int(stats_row["n_distinct"]),
        "n_new": int(stats_row["n_new"] or 0),
        "n_allowed": int(stats_row["n_allowed"] or 0),
        "n_scheduled": int(sched["n_scheduled"] or 0),
        "n_capped_out": int(sched["n_capped_out"] or 0),
        "max_queue_depth": int(sched["max_queue_depth"] or 0),
        "n_shards_used": int(sched["n_shards_used"] or 0),
        "agent": args.agent,
        "output": args.output,
    }))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
