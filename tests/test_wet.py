"""WET (Common Crawl extracted-text sidecar) — sources/wet.py.

Writer/parser round-trip, warcinfo provenance, refers-to linkage,
UTF-8 text, truncation tail-loss, and the read_wet Spark edge.
"""

from schema_fantasy_spark.sources import wet as WT
from schema_fantasy_spark.sources import warc as W


def _entries(n=3):
    return [
        (
            f"https://h{i}.example.com/p/{i}",
            f"2026-01-0{i + 1}T00:00:00Z",
            f"<urn:uuid:00000000-0000-0000-0000-{i:012d}>",
            f"doc {i} café 中\U0001f600",
        )
        for i in range(n)
    ]


def test_build_parse_roundtrip_plain_and_gzip():
    entries = _entries()
    for compress in (False, True):
        wet = WT.build_wet(entries, info_fields={"run": "t"}, compress=compress)
        recs = WT.parse_wet(wet)
        assert [(r["url"], r["date"], r["refers_to"], r["text"]) for r in recs] == entries
        # warcinfo provenance attaches to every conversion record
        assert all(r["info"]["run"] == "t" for r in recs)
        assert all(r["info"]["software"] == "schema-fantasy-spark" for r in recs)


def test_wet_is_valid_warc():
    # a WET file IS a WARC file: the generic parser sees warcinfo +
    # typed conversion records with text/plain bodies
    wet = WT.build_wet(_entries(2), compress=False)
    recs = W.parse_warc(wet)
    assert [r["type"] for r in recs] == ["warcinfo", "conversion", "conversion"]
    assert recs[1]["headers"]["content-type"] == "text/plain"
    assert recs[1]["headers"]["warc-refers-to"].endswith("000000000000>")
    assert recs[1]["body"].decode("utf-8") == _entries(2)[0][3]


def test_truncation_quarantines_tail_only():
    wet = WT.build_wet(_entries(3), compress=True)
    cut = WT.parse_wet(wet[: len(wet) - 40])
    assert 1 <= len(cut) < 3
    assert cut[0]["text"] == _entries(3)[0][3]


def test_read_wet_spark_edge(spark, tmp_path):
    d = str(tmp_path / "wet")
    (tmp_path / "wet").mkdir()
    (tmp_path / "wet" / "a.warc.wet.gz").write_bytes(WT.build_wet(_entries(2)))
    (tmp_path / "wet" / "b.warc.wet.gz").write_bytes(
        WT.build_wet(_entries(3)[2:])
    )
    rows = sorted(WT.read_wet(spark, d).collect(), key=lambda r: r.url)
    assert [r.url for r in rows] == [e[0] for e in _entries(3)]
    assert rows[0].text == _entries(1)[0][3]
    assert rows[0].refers_to == _entries(1)[0][2]
    assert rows[0].warc_ts.isoformat() == "2026-01-01T00:00:00"
    assert rows[2].wet_file.endswith("b.warc.wet.gz")


def test_validate_job_wet_end_to_end(spark, tmp_path, capsys, monkeypatch):
    """WET sidecar ingestion: extracted text arrives decoded, so the
    chain is read_wet -> lang-ID -> validation via the CLI."""
    import json as _json
    import sys as _sys

    from jobs.validate_job import main

    d = tmp_path / "wetarc"
    d.mkdir()
    entries = [
        (
            f"https://h{i}.example.com/p/{i}",
            "2026-01-02T03:04:05Z",
            f"<urn:uuid:00000000-0000-0000-0000-{i:012d}>",
            f"the café page number {i} with plenty of real words here",
        )
        for i in range(5)
    ]
    (d / "cc.warc.wet.gz").write_bytes(WT.build_wet(entries))
    argv = ["validate_job", "--input", str(d), "--input-format", "wet",
            "--manifest-dir", str(tmp_path / "m"),
            "--violations-dir", str(tmp_path / "v"),
            "--derive-day-from", "warc_ts"]
    monkeypatch.setattr(_sys, "argv", argv)
    assert main() == 0
    summary = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["processed"] == ["2026-01-02"]
