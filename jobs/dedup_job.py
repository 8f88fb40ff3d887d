"""spark-submit entry point: clean a documents table, end to end.

    /opt/spark/bin/spark-submit --master local[8] \
        --py-files dist/schema_fantasy_spark.zip \
        jobs/dedup_job.py \
        --input /path/to/documents_parquet \
        --output /out/cleaned --method xxhash64 --threshold 0.8

The standard corpus-cleaning composition, each stage an operator this
engine ships and gates:

    1. EXACT dedup        — keep one row per byte-identical text
                            (ops.dedup.distinct_by_content);
    2. NEAR-DUP pairs     — MinHash+LSH candidates, exact-Jaccard verify
                            (ops.dedup.minhash_near_duplicates);
    3. CLUSTERS           — connected components over verified pairs
                            (ops.dedup.duplicate_clusters);
    4. KEEP-BEST          — one survivor per cluster, highest
                            quality_score (ties -> min id)
                            (ops.dedup.keep_cluster_representatives);
    5. write the cleaned table + ONE JSON stats line on stdout.

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
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from schema_fantasy_spark.ops import dedup
    from schema_fantasy_spark.ops.text import quality_score

    # only stop a session this job itself created (spark-submit); an
    # in-process caller (tests, notebooks) keeps its session
    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("sfs-dedup").getOrCreate()

    df = spark.read.parquet(args.input)
    n_in = df.count()

    # 1. exact dedup (digest-only shuffle). Persist: four downstream
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

    cleaned.write.mode("overwrite").parquet(args.output)
    distinct.unpersist()
    n_out = spark.read.parquet(args.output).count()

    print(json.dumps({
        "n_in": n_in,
        "n_after_exact": n_distinct,
        "n_near_dup_clusters": n_clusters,
        "n_out": n_out,
        "removed_exact": n_in - n_distinct,
        "removed_near_dup": n_distinct - n_out,
    }))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
