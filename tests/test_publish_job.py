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
