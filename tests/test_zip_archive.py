"""sources/zip_archive.py — ZIP ingestion (stdlib format, Spark seam)."""

import hashlib
import os
import zlib

from schema_fantasy_spark.sources.zip_archive import build_zip, parse_zip, read_zip


def test_round_trip_plain():
    members = {"a/doc1.txt": b"hello world", "doc2.bin": bytes(range(256)) * 10}
    for compress in (True, False):
        rows = {r["member"]: r for r in parse_zip(build_zip(members, compress))}
        assert set(rows) == set(members)
        for name, payload in members.items():
            assert rows[name]["content"] == payload
            assert rows[name]["size"] == len(payload)
            assert rows[name]["error"] is None
            assert rows[name]["method"] == ("deflate" if compress else "stored")


def test_deterministic_writer():
    members = {"x.txt": b"abc", "y.txt": b"def"}
    assert build_zip(members) == build_zip(dict(reversed(list(members.items()))))


def test_not_a_zip_quarantines():
    rows = parse_zip(b"definitely not a zip", zip_name="f.zip")
    assert len(rows) == 1
    assert rows[0]["error"].startswith("bad archive") and rows[0]["content"] is None


def test_corrupt_member_quarantines_others_survive():
    members = {"good.txt": b"fine " * 100, "bad.txt": b"broken " * 100}
    data = bytearray(build_zip(members, compress=True))
    # flip a byte inside bad.txt's deflate stream (local header for
    # 'bad.txt' comes first: names sort b < g)
    at = data.index(b"bad.txt") + len("bad.txt") + 5
    data[at] ^= 0xFF
    rows = {r["member"]: r for r in parse_zip(bytes(data))}
    assert rows["good.txt"]["error"] is None
    assert rows["good.txt"]["content"] == b"fine " * 100
    assert rows["bad.txt"]["error"] is not None
    assert rows["bad.txt"]["content"] is None


def test_read_zip_spark_seam(spark, tmp_path):
    docs = {f"d{i}.txt": f"document {i} body".encode() for i in range(6)}
    half = {k: v for k, v in list(docs.items())[:3]}
    rest = {k: v for k, v in list(docs.items())[3:]}
    (tmp_path / "z").mkdir()
    (tmp_path / "z" / "a.zip").write_bytes(build_zip(half))
    (tmp_path / "z" / "b.zip").write_bytes(build_zip(rest, compress=False))
    df = read_zip(spark, str(tmp_path / "z"))
    rows = df.collect()
    got = {r["member"]: bytes(r["content"]) for r in rows}
    assert got == docs
    assert all(r["error"] is None for r in rows)
    # lossless: content hashes match the inputs
    for r in rows:
        assert hashlib.md5(bytes(r["content"])).hexdigest() == \
            hashlib.md5(docs[r["member"]]).hexdigest()
    # the parse is partition-preserving: no Exchange in the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
