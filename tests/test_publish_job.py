"""jobs/publish_job.py — WARC + WET + WAT + CDXJ + cluster.idx release."""

import json
import sys


def test_publish_job_end_to_end(spark, tmp_path, monkeypatch):
    import io
    from contextlib import redirect_stdout

    sys.path.insert(0, "jobs")
    import publish_job

    from schema_fantasy_spark.sources import cdx as C
    from schema_fantasy_spark.sources import wet as WT
    from schema_fantasy_spark.sources import wat as WAT

    rows = [
        (
            i,
            f"https://h{i % 5}.example.com/p/{i}",
            f"text of page {i} café",
            f"<html><head><title>T{i}</title></head><body>"
            f'<a href="/r/{i}">go {i}</a></body></html>',
        )
        for i in range(24)
    ]
    inp = str(tmp_path / "in")
    out = str(tmp_path / "rel")
    spark.createDataFrame(
        rows, "doc_id long, url string, text string, html string"
    ).write.parquet(inp)
    monkeypatch.setattr(sys, "argv", [
        "publish_job.py", "--input", inp, "--output", out,
        "--html-col", "html", "--num-shards", "4", "--prefix", "rel",
    ])
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = publish_job.main()
    assert rc == 0
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["n_records"] == 24 and 1 <= stats["n_shards"] <= 4

    import pathlib

    rel = pathlib.Path(out)
    cdxjs = sorted(rel.glob("*.cdxj"))
    warcs = sorted(p for p in rel.glob("rel-*.warc.gz"))
    wets = sorted(rel.glob("*.warc.wet.gz"))
    wats = sorted(rel.glob("*.warc.wat.gz"))
    assert len(cdxjs) == len(warcs) == len(wets) == len(wats) == stats["n_shards"]

    # the concatenated per-shard indexes are globally sorted (range
    # partitioning on the surt key) and every extent fetches its record
    all_lines = []
    for p in cdxjs:
        lines = p.read_text().strip("\n").split("\n")
        archive = (rel / json.loads(lines[0].split(" ", 2)[2])["filename"]
                   ).read_bytes()
        for ln in lines:
            m = json.loads(ln.split(" ", 2)[2])
            rec = C.fetch_record(archive, int(m["offset"]), int(m["length"]))
            assert rec is not None and rec["url"] == m["url"]
        all_lines += lines
    assert all_lines == sorted(all_lines) and len(all_lines) == 24

    # WET carries the text, WAT the native JSON envelope
    texts, titles = {}, {}
    for p in wets:
        for r in WT.parse_wet(p.read_bytes()):
            texts[r["url"]] = r["text"]
    for p in wats:
        for r in WAT.parse_wat(p.read_bytes()):
            env = json.loads(r["envelope"])
            titles[r["url"]] = env["Envelope"]["Payload-Metadata"][
                "HTTP-Response-Metadata"]["HTML-Metadata"]["Head"]["Title"]
    for i, url, text, _ in rows:
        assert texts[url] == text
        assert titles[url] == f"T{i}"

    # cluster.idx covers every shard in key order
    cl = (rel / "cluster.idx").read_text().strip("\n").split("\n")
    assert len(cl) == stats["cluster_idx_lines"]
    assert [r.split("\t")[0] for r in cl] == sorted(r.split("\t")[0] for r in cl)


def test_lookup_release_multi_shard(spark, tmp_path, monkeypatch):
    """lookup_release resolves urls across a MULTI-shard release: the
    cluster.idx rows name their shard file, the block range-read lands
    in the right one, and every line's WARC extent fetches the exact
    record — the full three-bounded-reads Wayback path."""
    import json as _json
    import pathlib

    import pyspark.sql.functions as F

    sys.path.insert(0, "jobs")
    import publish_job

    from schema_fantasy_spark.ops.urls import surt_key
    from schema_fantasy_spark.sources.cdx import lookup_release
    from schema_fantasy_spark.sources.warc import parse_warc

    rows = [
        (i, f"https://h{i % 7}.example.com/page/{i}",
         f"text for page {i} with several words")
        for i in range(60)
    ]
    inp = str(tmp_path / "in")
    out = str(tmp_path / "rel")
    spark.createDataFrame(rows, "doc_id long, url string, text string") \
        .write.parquet(inp)
    monkeypatch.setattr(sys, "argv", [
        "publish_job.py", "--input", inp, "--output", out,
        "--num-shards", "3", "--prefix", "ms",
    ])
    import io as _io
    from contextlib import redirect_stdout

    buf = _io.StringIO()
    with redirect_stdout(buf):
        assert publish_job.main() == 0
    stats = _json.loads(buf.getvalue().strip().splitlines()[-1])
    assert stats["n_shards"] == 3  # the multi-shard premise

    surts = {r["url"]: r["s"] for r in spark.createDataFrame(
        [(u,) for _, u, _ in rows], "url string"
    ).select("url", surt_key(F.col("url")).alias("s")).collect()}
    rel = pathlib.Path(out)
    for i in (0, 17, 35, 59):  # spread across shards
        url = rows[i][1]
        lines = lookup_release(out, surts[url])
        assert len(lines) == 1, url
        meta = _json.loads(lines[0].split(" ", 2)[2])
        assert meta["url"] == url
        archive = (rel / meta["filename"]).read_bytes()
        extent = archive[int(meta["offset"]):
                         int(meta["offset"]) + int(meta["length"])]
        recs = parse_warc(extent)
        assert len(recs) == 1 and recs[0]["url"] == url
    # a surt absent from the corpus returns nothing
    assert lookup_release(out, "zzz,nonexistent)/x") == []
