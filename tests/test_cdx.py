"""CDXJ index (sources/cdx.py) + SURT keys (ops/urls.surt_key).

Index build/sort, random-access fetch via stored extents, tail-truncation
independence, native CDXJ parsing, and the surt_key Column contract.
"""

import gzip

import pytest

from schema_fantasy_spark.sources import cdx as C
from schema_fantasy_spark.sources.warc import build_warc_indexed, build_record


def _entries(n=4):
    out = []
    for i in range(n):
        out.append(
            {
                "surt": f"com,example,h{9 - i})/p/{i}",
                "ts14": f"2026010100000{i}",
                "url": f"https://h{9 - i}.example.com/p/{i}",
                "date": f"2026-01-01T00:00:0{i}Z",
                "body": f"body {i} café".encode(),
                "status": 200 + i,
            }
        )
    return out


@pytest.mark.parametrize("compress", [False, True])
def test_fetch_every_record_by_extent(compress):
    archive, cdxj = C.build_cdx(_entries(), "a.warc.gz", compress=compress)
    lines = cdxj.split("\n")
    assert len(lines) == 4
    # sorted by (surt, ts14): surt keys were built descending by host
    assert lines == sorted(lines)
    import json

    for ln in lines:
        surt, ts, meta = ln.split(" ", 2)
        m = json.loads(meta)
        rec = C.fetch_record(archive, int(m["offset"]), int(m["length"]))
        assert rec is not None and rec["url"] == m["url"]
        assert rec["http_status"] == int(m["status"])
        i = int(m["url"].rsplit("/", 1)[1])
        assert rec["body"] == f"body {i} café".encode()
        # the extent is independently decodable: a whole gzip member
        # or a whole plain record
        sl = archive[int(m["offset"]) : int(m["offset"]) + int(m["length"])]
        if compress:
            assert sl[:2] == b"\x1f\x8b" and gzip.decompress(sl)
        else:
            assert sl.startswith(b"WARC/1.0\r\n")


def test_truncated_archive_keeps_earlier_extents():
    archive, cdxj = C.build_cdx(_entries(), "a.warc.gz", compress=True)
    import json

    metas = [json.loads(ln.split(" ", 2)[2]) for ln in cdxj.split("\n")]
    by_off = sorted(metas, key=lambda m: int(m["offset"]))
    cut = archive[: int(by_off[-1]["offset"]) + 5]  # tail member mangled
    for m in by_off[:-1]:
        assert C.fetch_record(cut, int(m["offset"]), int(m["length"]))
    assert C.fetch_record(cut, int(by_off[-1]["offset"]), int(by_off[-1]["length"])) is None


def test_indexed_archive_reproducible():
    recs = [
        build_record("https://e.com/1", "2026-01-01T00:00:00Z", b"x")
        for _ in range(2)
    ]
    a1, i1 = build_warc_indexed(recs, compress=True)
    a2, i2 = build_warc_indexed(recs, compress=True)
    assert a1 == a2 and i1 == i2  # mtime pinned -> stable published index


def test_read_cdxj_native(spark, tmp_path):
    d = tmp_path / "idx"
    d.mkdir()
    _, cdxj = C.build_cdx(_entries(3), "part-0.warc.gz")
    (d / "part-0.cdxj").write_text(cdxj + "\nnot a cdxj line\n")
    df = C.read_cdxj(spark, str(d))
    rows = sorted(
        df.filter("url IS NOT NULL").collect(), key=lambda r: r.url
    )
    assert len(rows) == 3
    assert rows[0].surt.startswith("com,example,h7)")
    assert rows[0].ts14 == "20260101000002"
    assert rows[0].mime == "text/html" and rows[0].status == "202"
    assert rows[0].digest.startswith("md5:")
    assert rows[0].offset >= 0 and rows[0].length > 0
    assert rows[0].filename == "part-0.warc.gz"
    # no Python in the read plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "BatchEvalPython" not in plan


def test_surt_key_contract(spark):
    from pyspark.sql import functions as F
    from schema_fantasy_spark.ops.urls import surt_key

    cases = [
        ("https://WWW.Example.COM/A/b?b=2&a=1", "com,example)/a/b?a=1&b=2"),
        ("http://example.com:80/x", "com,example)/x"),
        ("https://example.com:443/x", "com,example)/x"),
        ("https://sub.example.com:8443/p/", "com,example,sub:8443)/p/"),
        ("https://example.com", "com,example)/"),
        ("https://u:p@example.com/q#frag", "com,example)/q"),
        ("http://www2.example.com/", "com,example)/"),
        ("ftp://example.com/x", None),
        ("not a url", None),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r.k for r in df.select(surt_key(F.col("url")).alias("k")).collect()]
    assert got == [want for _, want in cases]


def test_cluster_idx_lookup():
    import json

    # 10 hosts × 3 captures, sorted shard; every=4 -> 8 blocks
    entries = []
    for h in range(10):
        for t in range(3):
            entries.append(
                {
                    "surt": f"com,h{h:02d})/p",
                    "ts14": f"2026010100000{t}",
                    "url": f"https://h{h:02d}.com/p",
                    "date": f"2026-01-01T00:00:0{t}Z",
                    "body": f"b{h}-{t}".encode(),
                }
            )
    _, cdxj = C.build_cdx(entries, "s.warc.gz")
    shard = (cdxj + "\n").encode("utf-8")
    idx = C.build_cluster_idx(cdxj, "shard-00000.gz", every=4)
    rows = [ln.split("\t") for ln in idx.split("\n")]
    assert len(rows) == 8 and rows[0][2] == "0"
    # extents tile the shard exactly
    assert sum(int(r[3]) for r in rows) == len(shard)
    assert [r[1] for r in rows] == ["shard-00000.gz"] * 8
    # every key, incl. ones spanning block boundaries, resolves fully
    for h in range(10):
        hits = C.lookup_via_cluster_idx(idx, shard, f"com,h{h:02d})/p")
        assert len(hits) == 3
        assert all(json.loads(x.split(" ", 2)[2])["url"] == f"https://h{h:02d}.com/p"
                   for x in hits)
    # ts-narrowed lookup
    hits = C.lookup_via_cluster_idx(idx, shard, "com,h03)/p", "20260101000001")
    assert len(hits) == 1
    assert C.lookup_via_cluster_idx(idx, shard, "com,zz)/nope") == []


def test_write_cdx_table_prunes(spark, tmp_path):
    entries = []
    for tld, host in (("com", "a"), ("com", "b"), ("org", "c"), ("net", "d")):
        for p in range(3):
            entries.append(
                {
                    "surt": f"{tld},{host})/p/{p}",
                    "ts14": "20260101000000",
                    "url": f"https://{host}.{tld}/p/{p}",
                    "date": "2026-01-01T00:00:00Z",
                    "body": b"x",
                }
            )
    _, cdxj = C.build_cdx(entries, "s.warc.gz")
    d = tmp_path / "idx"
    d.mkdir()
    (d / "s.cdxj").write_text(cdxj)
    df = C.read_cdxj(spark, str(d))
    out = str(tmp_path / "table")
    C.write_cdx_table(df, out, sort_partitions=2)
    back = spark.read.parquet(out)
    assert back.count() == 12
    q = back.filter("tld = 'org' AND surt LIKE 'org,c)/p/%'")
    assert q.count() == 3
    plan = q._jdf.queryExecution().executedPlan().toString()
    # tld is a partition column: the filter must prune directories,
    # not scan-and-filter
    assert "PartitionFilters: [" in plan and "tld" in plan.split(
        "PartitionFilters", 1)[1][:200]


def test_lookup_exact_url_does_not_prefix_match_longer_keys(tmp_path):
    """ADVICE r8: with an empty ts14, lookups must match through the
    key/ts delimiter — '.../page/5' must NOT return '.../page/56'."""
    from schema_fantasy_spark.sources.cdx import (
        lookup_release,
        lookup_via_cluster_idx,
    )

    shard = (
        'com,example)/page/5 20260101000000 {"url": "u5"}\n'
        'com,example)/page/56 20260101000000 {"url": "u56"}\n'
    ).encode()
    (tmp_path / "part-00000.cdx").write_bytes(shard)
    (tmp_path / "cluster.idx").write_text(
        "com,example)/page/5 20260101000000\tpart-00000.cdx\t0\t%d\n"
        % len(shard)
    )
    got = lookup_release(str(tmp_path), "com,example)/page/5")
    assert [ln.split(" ")[0] for ln in got] == ["com,example)/page/5"]
    got2 = lookup_via_cluster_idx(
        "com,example)/page/5 20260101000000\tpart-00000.cdx\t0\t%d\n"
        % len(shard),
        shard,
        "com,example)/page/5",
    )
    assert [ln.split(" ")[0] for ln in got2] == ["com,example)/page/5"]
