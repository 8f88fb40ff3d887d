"""spark-submit entry point: clean a documents table, end to end.

    /opt/spark/bin/spark-submit --master local[8] \
        --py-files dist/schema_fantasy_spark.zip \
        jobs/dedup_job.py \
        --input /path/to/documents_parquet \
        --output /out/cleaned --method xxhash64 --threshold 0.8

The standard corpus-cleaning composition, each stage an operator this
engine ships and gates:

   -1. HTML EXTRACTION    — (--html-col) derive the text column from
                            raw html via ops.html.extract_text (pure
                            codegen, scan-bandwidth); --boilerplate
                            swaps in ops.boilerplate.remove_boilerplate
                            (link-density block filter, same shape);
    0. SAMPLE (optional)  — deterministic content-hash slice, the SAME
                            rows on any engine/partitioning
                            (scale.deterministic_sample,
                            --sample-sixteenths < 16 enables);
    0b. URL COLLAPSE      — (--url-col) canonicalize urls (ops.urls)
                            and keep ONE row per canonical url
                            (min id): recrawl spellings collapse
                            before any content work;
    1. FILTER FUNNEL      — sequential quality rules with per-rule drop
                            accounting in ONE aggregation pass
                            (ops.text.filter_funnel); the surviving
                            predicate then gates the data path;
                            --blocklist-file appends the C4 term-list
                            rule (ops.text.blocklist_hits);
    2. EXACT dedup        — keep one row per byte-identical text
                            (ops.dedup.distinct_by_content);
    3. NEAR-DUP pairs     — MinHash+LSH candidates, exact-Jaccard verify
                            (ops.dedup.minhash_near_duplicates);
    4. CLUSTERS           — connected components over verified pairs
                            (ops.dedup.duplicate_clusters);
    5. KEEP-BEST          — one survivor per cluster, highest
                            quality_score (ties -> min id)
                            (ops.dedup.keep_cluster_representatives);
    5b. DECONTAMINATE     — (--benchmark) drop docs sharing any word
                            8-gram with the eval set
                            (ops.decontaminate, broadcast join);
    5c. PII SCRUB         — (--scrub-pii) redact emails/IPs/cards/
                            phones in the surviving text (ops.pii);
    5d. QUALITY MODEL     — (--label-col) train the integer-exact
                            fastText-style classifier on the labeled
                            slice, drop survivors scoring <= --min-score
                            (ops.classifier);
    5e. SUBSTRING DEDUP   — (--substring-dedup) trim cross-doc duplicate
                            word windows to their canonical occurrence
                            (ops.dedup.substring_dedup);
    5f. DOMAIN CAP        — (--domain-cap, with --url-col) at most N
                            docs per registered domain
                            (ops.urls.registered_domain +
                            scale.balance_by_domain);
    6. write the cleaned table + ONE JSON stats line on stdout
       (including the per-rule funnel rows).

Every stage is shaped for 10^12 docs (digest-only shuffles, banded
candidate generation, pair-graph-only component iterations); see the
operator docstrings. The job is deterministic for a fixed input.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="cleaned parquet path")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--method", default="xxhash64", choices=["xxhash64", "md5"],
                    help="hash family: xxhash64 = scale path, md5 = oracle-replayable")
    ap.add_argument("--threshold", type=float, default=0.8,
                    help="Jaccard threshold for near-duplicate pairs")
    ap.add_argument("--num-hashes", type=int, default=64)
    ap.add_argument("--bands", type=int, default=16)
    ap.add_argument("--sample-sixteenths", type=int, default=16,
                    help="deterministic content-hash sample rate n/16 "
                         "(16 = whole corpus)")
    ap.add_argument("--html-col", default=None,
                    help="derive the text column from this raw-html column "
                         "first (ops.html.extract_text)")
    ap.add_argument("--boilerplate", action="store_true",
                    help="with --html-col: drop link-dense/short blocks "
                         "(ops.boilerplate.remove_boilerplate) instead of "
                         "whole-page extract_text")
    ap.add_argument("--url-col", default=None,
                    help="canonicalize this url column and keep one row per "
                         "canonical url before content dedup")
    ap.add_argument("--benchmark", default=None,
                    help="parquet path of eval texts: drop docs sharing any "
                         "8-gram with it (train/test decontamination)")
    ap.add_argument("--scrub-pii", action="store_true",
                    help="redact emails/IPs/cards/phones in surviving text")
    ap.add_argument("--label-col", default=None,
                    help="boolean quality-label column: train the integer-"
                         "exact token classifier (ops/classifier.py) on the "
                         "labeled slice and drop survivors scoring <= "
                         "--min-score")
    ap.add_argument("--classifier-vocab", type=int, default=64)
    ap.add_argument("--min-score", type=int, default=0,
                    help="classifier score threshold (millionths)")
    ap.add_argument("--blocklist-file", default=None,
                    help="term list (one per line, '#' comments): pages "
                         "containing ANY listed term drop in the funnel "
                         "(ops.text.blocklist_hits, the C4 stage)")
    ap.add_argument("--substring-dedup", action="store_true",
                    help="after keep-best: remove cross-doc duplicate "
                         "word windows (ops.dedup.substring_dedup)")
    ap.add_argument("--substring-gram", type=int, default=50)
    ap.add_argument("--substring-sample-mod", type=int, default=1,
                    help="content-defined window sampling dial (shuffle "
                         "volume ~1/mod)")
    ap.add_argument("--domain-cap", type=int, default=0,
                    help="with --url-col: keep at most N docs per "
                         "registered domain (quality-ordered; "
                         "scale.balance_by_domain)")
    ap.add_argument("--min-words", type=int, default=5,
                    help="funnel rule: minimum whitespace-token count")
    ap.add_argument("--max-chars", type=int, default=1_000_000,
                    help="funnel rule: maximum text length")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from schema_fantasy_spark import scale
    from schema_fantasy_spark.ops import dedup
    from schema_fantasy_spark.ops import text as tx
    from schema_fantasy_spark.ops.text import quality_score

    # only stop a session this job itself created (spark-submit); an
    # in-process caller (tests, notebooks) keeps its session
    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("sfs-dedup").getOrCreate()

    df = spark.read.parquet(args.input)

    # -1. html -> text (codegen; the north-star table ships html:binary).
    # Binary pages go through charset sniff + transcode first (WHATWG
    # order, ops/charset.py) — crawl bytes are NOT all UTF-8 and a blind
    # cast mangles every cp1252/CJK page; string columns are already
    # decoded upstream.
    if args.html_col:
        from pyspark.sql.types import BinaryType

        from schema_fantasy_spark.ops.html import extract_text

        extractor = extract_text
        if args.boilerplate:
            from schema_fantasy_spark.ops.boilerplate import remove_boilerplate

            extractor = remove_boilerplate

        if isinstance(df.schema[args.html_col].dataType, BinaryType):
            from schema_fantasy_spark.ops.charset import transcode

            df = transcode(df, binary_col=args.html_col, id_col=args.id_col)
            df = df.withColumn(args.text_col, extractor(F.col("text")))
            if args.text_col != "text":
                df = df.drop("text")
        else:
            df = df.withColumn(
                args.text_col, extractor(F.col(args.html_col).cast("string"))
            )

    # 0. deterministic sample — a pure pushed filter, same rows anywhere
    if args.sample_sixteenths < 16:
        df = scale.deterministic_sample(
            df, args.id_col, args.sample_sixteenths, method=args.method
        )
    n_in = df.count()

    # 0b. canonical-url collapse: one row per canonical url (min id) —
    # only (url_key, id) shuffles, the winning ids semi-join back
    n_url_collapsed = 0
    if args.url_col:
        from schema_fantasy_spark.ops.urls import canonicalize_url

        keyed = df.withColumn("__uk", canonicalize_url(F.col(args.url_col)))
        winners = keyed.groupBy("__uk").agg(F.min(args.id_col).alias(args.id_col))
        df = keyed.join(
            winners.select(args.id_col), args.id_col, "left_semi"
        ).drop("__uk")
        n_url_collapsed = n_in - df.count()

    # 1. quality funnel: stats in ONE aggregation pass, then the same
    # chained predicate gates the data path (both are cheap scan passes)
    t = F.col(args.text_col)
    rules = [
        ("text_present", t.isNotNull()),
        ("min_words", tx.token_count(t) >= args.min_words),
        ("max_chars", F.length(t) <= args.max_chars),
    ]
    if args.blocklist_file:
        with open(args.blocklist_file) as fh:
            terms = [
                ln.strip() for ln in fh
                if ln.strip() and not ln.startswith("#")
            ]
        if terms:
            rules.append(("blocklist", tx.blocklist_hits(t, terms) == 0))
    funnel_rows = [r.asDict() for r in tx.filter_funnel(df, rules).collect()]
    keep = F.lit(True)
    for _, cond in rules:
        keep = keep & F.coalesce(cond, F.lit(False))
    df = df.filter(keep)
    n_funnel = funnel_rows[-1]["n_out"]

    # 2. exact dedup (digest-only shuffle). Persist: four downstream
    # actions (count, pair generation, scoring, final write) would each
    # recompute the semi-join otherwise.
    distinct = dedup.distinct_by_content(df, args.text_col, args.id_col).persist()
    n_distinct = distinct.count()

    # 2-3. near-dup pairs -> clusters (pair graph only)
    pairs = dedup.minhash_near_duplicates(
        distinct,
        text_col=args.text_col,
        id_col=args.id_col,
        threshold=args.threshold,
        num_hashes=args.num_hashes,
        bands=args.bands,
        method=args.method,
    ).select("id_a", "id_b")
    clusters = dedup.duplicate_clusters(pairs).localCheckpoint()
    n_clusters = clusters.select("cluster_rep").distinct().count()

    # 4. keep the highest-quality member of each cluster
    scored = quality_score(distinct, args.text_col).select(
        args.id_col, "quality_score"
    )
    cleaned = dedup.keep_cluster_representatives(
        distinct.join(scored, args.id_col),
        clusters,
        id_col=args.id_col,
        score_col="quality_score",
    ).drop("quality_score")

    # 5b. decontamination against the eval set (broadcast join)
    n_contaminated = 0
    if args.benchmark:
        from schema_fantasy_spark.ops import decontaminate as dc

        bench = spark.read.parquet(args.benchmark)
        hits = dc.contamination_hits(
            cleaned, bench, id_col=args.id_col, text_col=args.text_col,
            bench_text_col=args.text_col, n=8, method=args.method,
        )
        before = cleaned.count()
        # NO broadcast hint: hits is a full-corpus aggregate (unbounded
        # when contamination is widespread) — AQE picks the strategy
        # from the real size at runtime (VERDICT r5 finding, same fix
        # as ops/decontaminate.with_contamination)
        cleaned = cleaned.join(
            hits.select(args.id_col), args.id_col, "left_anti"
        )
        n_contaminated = before - cleaned.count()

    # 5c. PII redaction on the survivors
    if args.scrub_pii:
        from schema_fantasy_spark.ops.pii import pii_scrub

        cleaned = cleaned.withColumn(
            args.text_col, pii_scrub(F.col(args.text_col))["scrubbed"]
        )

    # 5d. model-based quality filter (ops/classifier.py): train the
    # integer-exact fastText-style classifier on the labeled slice of
    # the INPUT corpus, drop survivors scoring <= --min-score. Training
    # is 3 bounded driver reads; scoring is a shuffle-free fold.
    n_model_filtered = 0
    if args.label_col:
        from schema_fantasy_spark.ops.classifier import (
            train_token_classifier,
            with_classifier_score,
        )

        model = train_token_classifier(
            df,
            args.label_col,
            text_col=args.text_col,
            id_col=args.id_col,
            max_vocab=args.classifier_vocab,
        )
        before = cleaned.count()
        cleaned = (
            with_classifier_score(cleaned, model, args.text_col, "__cls")
            .filter(F.col("__cls") > args.min_score)
            .drop("__cls")
        )
        n_model_filtered = before - cleaned.count()

    # 5e. cross-document exact-substring dedup: text is TRIMMED, not
    # dropped — the duplicated passages survive only in their canonical
    # (min id, offset) positions
    n_substring_words = 0
    if args.substring_dedup:
        trimmed = dedup.substring_dedup(
            cleaned,
            id_col=args.id_col,
            text_col=args.text_col,
            gram_words=args.substring_gram,
            sample_mod=args.substring_sample_mod,
        ).persist()
        n_substring_words = (
            trimmed.agg(F.sum("n_removed_words")).collect()[0][0] or 0
        )
        cleaned = (
            trimmed.withColumn(args.text_col, F.col("clean_text"))
            .drop("clean_text", "n_removed_words")
        )

    # 5f. registered-domain cap (corpus balancing — the C4/mC4 stage)
    n_domain_capped = 0
    if args.domain_cap and args.url_col:
        from schema_fantasy_spark.ops.urls import registered_domain

        keyed = cleaned.withColumn(
            "__dom",
            F.coalesce(
                registered_domain(scale.host_of(F.col(args.url_col))),
                F.lit("__unregistered"),
            ),
        )
        before = cleaned.count()
        cleaned = scale.balance_by_domain(
            keyed, "__dom", id_col=args.id_col, cap=args.domain_cap
        ).drop("__dom")
        n_domain_capped = before - cleaned.count()

    cleaned.write.mode("overwrite").parquet(args.output)
    distinct.unpersist()
    if args.substring_dedup:
        trimmed.unpersist()
    n_out = spark.read.parquet(args.output).count()

    print(json.dumps({
        "n_in": n_in,
        "sample_sixteenths": args.sample_sixteenths,
        "removed_url_collapse": n_url_collapsed,
        "removed_contaminated": n_contaminated,
        "removed_model_filter": n_model_filtered,
        "removed_substring_words": int(n_substring_words),
        "removed_domain_cap": n_domain_capped,
        "funnel": funnel_rows,
        "n_after_funnel": n_funnel,
        "n_after_exact": n_distinct,
        "n_near_dup_clusters": n_clusters,
        "n_out": n_out,
        "removed_funnel": (n_in - n_url_collapsed) - n_funnel,
        "removed_exact": n_funnel - n_distinct,
        "removed_near_dup": n_distinct - n_out,
    }))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
