"""spark-submit entry point: publish a documents table as a
Common-Crawl-style release — WARC payload archives, WET (text) and WAT
(metadata) sidecars, a sorted CDXJ index, and the cluster.idx
secondary index.

    /opt/spark/bin/spark-submit --master local[8] \
        --py-files dist/schema_fantasy_spark.zip \
        jobs/publish_job.py \
        --input /path/to/documents_parquet --output /out/release \
        --num-shards 16

The inverse of ingestion (validate_job --input-format warc): whatever
this engine cleans, it can hand back to every existing Common Crawl
consumer.

Composition, each stage a gated operator:

    1. surt keys (ops.urls.surt_key, native) + WAT envelopes
       (sources.wat.wat_envelope over ops.html_meta extraction when an
       html column exists — all to_json/struct work JVM-side);
    2. repartitionByRange(num_shards) on (surt, ts) + sortWithin-
       Partitions — shard k holds a CONTIGUOUS key range, so the
       per-shard CDXJ files concatenate into one globally sorted
       index (the CC index layout); one shuffle, the only one in the
       job;
    3. per shard, ONE pass packs the WARC archive (build_cdx: index
       extents ride the archive write), the WET and WAT sidecars, and
       the shard's cluster.idx lines — bodies never leave the
       partition; executors write the archive files directly (an
       object-store put on a real cluster) and ship only byte-counts
       + the tiny cluster.idx text to the driver;
    4. the driver concatenates per-shard cluster.idx lines in shard
       (= key-range) order and prints ONE JSON stats line.
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="documents parquet path")
    ap.add_argument("--output", required=True, help="release directory")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--url-col", default="url")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--html-col", default=None,
                    help="raw-html column: enables WAT metadata envelopes")
    ap.add_argument("--ts-col", default=None,
                    help="capture-timestamp column; default a fixed epoch")
    ap.add_argument("--num-shards", type=int, default=16)
    ap.add_argument("--prefix", default="release")
    ap.add_argument("--no-compress", action="store_true")
    args = ap.parse_args()

    import os

    import pandas as pd
    from pyspark.sql import SparkSession, functions as F

    from schema_fantasy_spark.ops.urls import surt_key

    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("sfs-publish").getOrCreate()

    df = spark.read.parquet(args.input)
    url = F.col(args.url_col)
    ts = (
        F.date_format(F.col(args.ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'")
        if args.ts_col
        else F.lit("2026-01-01T00:00:00Z")
    )
    cols = [
        F.col(args.id_col).alias("_id"),
        url.alias("_url"),
        F.coalesce(surt_key(url), F.lower(url)).alias("_surt"),
        ts.alias("_date"),
        F.coalesce(F.col(args.text_col).cast("string"), F.lit(""))
        .alias("_text"),
    ]
    if args.html_col:
        from schema_fantasy_spark.ops.html_meta import with_html_metadata
        from schema_fantasy_spark.sources.wat import wat_envelope

        pages = df.withColumn(
            "_h", F.col(args.html_col).cast("string")
        ).withColumn(
            "_host", F.regexp_extract(url, r"^[a-z]+://([^/:?#]+)", 1)
        ).withColumn("_scheme", F.regexp_extract(url, r"^([a-z]+)://", 1))
        meta = with_html_metadata(
            pages, html_col="_h", base_scheme_col="_scheme",
            base_host_col="_host",
        )
        metas = F.filter(
            F.array(
                F.struct(
                    F.lit("description").alias("name"),
                    F.lit(None).cast("string").alias("property"),
                    F.col("description").alias("content"),
                ),
                F.struct(
                    F.lit(None).cast("string").alias("name"),
                    F.lit("og:title").alias("property"),
                    F.col("og_title").alias("content"),
                ),
            ),
            lambda x: x["content"].isNotNull(),
        )
        links = F.transform(
            F.col("resolved_outlinks"),
            lambda l: F.struct(l["href"].alias("url"),
                               l["anchor"].alias("text")),
        )
        refers = F.concat(
            F.lit("<urn:uuid:00000000-0000-0000-0000-"),
            F.lpad(F.col(args.id_col).cast("string"), 12, "0"), F.lit(">"),
        )
        env = wat_envelope(url, ts, refers, F.col("title"), metas,
                           F.col("canonical"), links)
        df = meta.select(*cols, env.alias("_env"), refers.alias("_refers"))
    else:
        df = df.select(
            *cols,
            F.lit(None).cast("string").alias("_env"),
            F.concat(
                F.lit("<urn:uuid:00000000-0000-0000-0000-"),
                F.lpad(F.col(args.id_col).cast("string"), 12, "0"),
                F.lit(">"),
            ).alias("_refers"),
        )

    sharded = df.repartitionByRange(
        args.num_shards, "_surt", "_date"
    ).sortWithinPartitions("_surt", "_date")

    out_dir, prefix, compress = args.output, args.prefix, not args.no_compress

    def pack(batches):
        from schema_fantasy_spark.sources.cdx import (
            build_cdx, build_cluster_idx,
        )
        from schema_fantasy_spark.sources.wat import build_wat
        from schema_fantasy_spark.sources.wet import build_wet

        from pyspark import TaskContext

        shard = TaskContext.get().partitionId()
        chunks = [p for p in batches if len(p)]
        if not chunks:
            return  # empty range partition: no shard files, no stats row
        rows = pd.concat(chunks, ignore_index=True)
        ext = ".warc.gz" if compress else ".warc"
        fname = f"{prefix}-{shard:05d}{ext}"
        entries, wet_entries, wat_entries = [], [], []
        for _id, _url, _surt, _date, _text, _env, _refers in rows.itertuples(
            index=False, name=None
        ):
            ts14 = "".join(c for c in _date if c.isdigit())
            entries.append(
                {
                    "surt": _surt, "ts14": ts14, "url": _url,
                    "date": _date, "body": _text.encode("utf-8"),
                }
            )
            wet_entries.append((_url, _date, _refers, _text))
            if _env is not None:
                wat_entries.append((_url, _date, _refers, _env))
        archive, cdxj = build_cdx(entries, fname, compress=compress)
        wet = build_wet(wet_entries, info_fields={"job": "publish"},
                        compress=compress)
        wat = (
            build_wat(wat_entries, info_fields={"job": "publish"},
                      compress=compress)
            if wat_entries else b""
        )
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, fname), "wb") as f:
            f.write(archive)
        wet_name = f"{prefix}-{shard:05d}.warc.wet" + (".gz" if compress else "")
        with open(os.path.join(out_dir, wet_name), "wb") as f:
            f.write(wet)
        if wat:
            wat_name = (f"{prefix}-{shard:05d}.warc.wat"
                        + (".gz" if compress else ""))
            with open(os.path.join(out_dir, wat_name), "wb") as f:
                f.write(wat)
        cdxj_name = f"{prefix}-{shard:05d}.cdxj"
        with open(os.path.join(out_dir, cdxj_name), "w") as f:
            f.write(cdxj + "\n")
        yield pd.DataFrame(
            {
                "shard": [shard],
                "n_records": [len(entries)],
                "warc_bytes": [len(archive)],
                "wet_bytes": [len(wet)],
                "wat_bytes": [len(wat)],
                "cdxj_bytes": [len(cdxj) + 1],
                "cluster_idx": [build_cluster_idx(cdxj, cdxj_name)],
            }
        )

    stats = sharded.mapInPandas(
        pack,
        "shard int, n_records long, warc_bytes long, wet_bytes long,"
        " wat_bytes long, cdxj_bytes long, cluster_idx string",
    ).collect()

    stats.sort(key=lambda r: r.shard)
    cluster = "\n".join(r.cluster_idx for r in stats if r.cluster_idx)
    with open(os.path.join(out_dir, "cluster.idx"), "w") as f:
        f.write(cluster + ("\n" if cluster else ""))

    summary = {
        "n_shards": len(stats),
        "n_records": int(sum(r.n_records for r in stats)),
        "warc_bytes": int(sum(r.warc_bytes for r in stats)),
        "wet_bytes": int(sum(r.wet_bytes for r in stats)),
        "wat_bytes": int(sum(r.wat_bytes for r in stats)),
        "cdxj_bytes": int(sum(r.cdxj_bytes for r in stats)),
        "cluster_idx_lines": cluster.count("\n") + (1 if cluster else 0),
    }
    print(json.dumps(summary))
    if owns_session:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
