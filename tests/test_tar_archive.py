"""sources/tar_archive.py — TAR/tar.gz ingestion (stdlib format, Spark seam)."""

from schema_fantasy_spark.sources.tar_archive import build_tar, parse_tar, read_tar


def test_round_trip_plain_and_gz():
    members = {"a/doc1.txt": b"hello world", "doc2.bin": bytes(range(256)) * 4}
    for gz in (False, True):
        rows = {r["member"]: r for r in parse_tar(build_tar(members, gz))}
        assert set(rows) == set(members)
        for name, payload in members.items():
            assert rows[name]["content"] == payload
            assert rows[name]["size"] == len(payload)
            assert rows[name]["gzipped"] is gz and rows[name]["error"] is None


def test_deterministic_writer_including_gz():
    members = {"x.txt": b"abc", "y.txt": b"def"}
    rev = dict(reversed(list(members.items())))
    assert build_tar(members) == build_tar(rev)
    assert build_tar(members, gz=True) == build_tar(rev, gz=True)


def test_truncated_tail_salvages_leading_members():
    members = {"aa.txt": b"first " * 200, "zz.txt": b"last " * 200}
    data = build_tar(members)
    cut = data.index(b"zz.txt")  # header offset of the last member
    # case 1: cut inside the last member's PAYLOAD (full header present)
    # case 2: cut inside the last member's HEADER itself
    for end in (cut + 512 + 100, cut + 100):
        rows = parse_tar(data[:end])
        by = {r["member"]: r for r in rows if r["member"]}
        assert by["aa.txt"]["content"] == b"first " * 200
        errs = [r for r in rows if r["error"]]
        assert len(errs) == 1 and "truncated" in errs[0]["error"], (end, rows)


def test_bad_gzip_quarantines():
    rows = parse_tar(b"\x1f\x8bnot really gzip at all")
    assert len(rows) == 1 and rows[0]["error"].startswith("bad gzip")


def test_read_tar_spark_seam(spark, tmp_path):
    docs = {f"d{i}.txt": f"tar document {i}".encode() for i in range(6)}
    half = dict(list(docs.items())[:3])
    rest = dict(list(docs.items())[3:])
    (tmp_path / "t").mkdir()
    (tmp_path / "t" / "a.tar").write_bytes(build_tar(half))
    (tmp_path / "t" / "b.tar.gz").write_bytes(build_tar(rest, gz=True))
    df = read_tar(spark, str(tmp_path / "t"))
    rows = df.collect()
    assert {r["member"]: bytes(r["content"]) for r in rows} == docs
    assert all(r["error"] is None for r in rows)
    assert {r["gzipped"] for r in rows} == {True, False}
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
