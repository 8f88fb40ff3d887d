"""WAT metadata sidecar (sources/wat.py).

Writer/parser round-trip, warcinfo provenance, the native
to_json-envelope / from_json re-parse pair, and the read_wat edge.
"""

import json

from pyspark.sql import functions as F

from schema_fantasy_spark.sources import wat as WAT
from schema_fantasy_spark.sources import warc as W


def _entries(n=3):
    return [
        (
            f"https://h{i}.example.com/p/{i}",
            f"2026-01-0{i + 1}T00:00:00Z",
            f"<urn:uuid:00000000-0000-0000-0000-{i:012d}>",
            json.dumps({"Envelope": {"n": i, "t": f"café {i}"}}),
        )
        for i in range(n)
    ]


def test_build_parse_roundtrip_plain_and_gzip():
    entries = _entries()
    for compress in (False, True):
        wat = WAT.build_wat(entries, info_fields={"run": "t"}, compress=compress)
        recs = WAT.parse_wat(wat)
        assert [
            (r["url"], r["date"], r["refers_to"], r["envelope"]) for r in recs
        ] == entries
        assert all(r["info"]["run"] == "t" for r in recs)


def test_wat_is_valid_warc_with_json_metadata_records():
    wat = WAT.build_wat(_entries(2), compress=False)
    recs = W.parse_warc(wat)
    assert [r["type"] for r in recs] == ["warcinfo", "metadata", "metadata"]
    assert recs[1]["headers"]["content-type"] == "application/json"
    assert json.loads(recs[1]["body"])["Envelope"]["n"] == 0


def test_native_envelope_roundtrip(spark):
    df = spark.createDataFrame(
        [
            ("https://e.com/1", "T1", "desc1", "https://e.com/c",
             [("https://e.com/a", "anchor")]),
            ("https://e.com/2", None, None, None, []),
        ],
        "url string, title string, description string, canonical string,"
        " links array<struct<url string, text string>>",
    )
    metas = F.filter(
        F.array(
            F.struct(
                F.lit("description").alias("name"),
                F.lit(None).cast("string").alias("property"),
                F.col("description").alias("content"),
            )
        ),
        lambda x: x["content"].isNotNull(),
    )
    env = WAT.wat_envelope(
        F.col("url"), F.lit("2026-01-01T00:00:00Z"), F.lit("<urn:uuid:0>"),
        F.col("title"), metas, F.col("canonical"), F.col("links"),
    )
    out = df.select("url", env.alias("j"))
    # null fields are OMITTED from the JSON (the WAT convention)
    raw = {r.url: r.j for r in out.collect()}
    assert '"Title":"T1"' in raw["https://e.com/1"]
    assert "Title" not in raw["https://e.com/2"]
    assert '"Link":' not in raw["https://e.com/2"]  # Links:[] stays
    # and the from_json re-parse recovers every field
    md = F.from_json(F.col("j"), WAT.envelope_schema())["Envelope"][
        "Payload-Metadata"]["HTTP-Response-Metadata"]["HTML-Metadata"]
    back = out.select(
        "url",
        md["Head"]["Title"].alias("title"),
        F.try_element_at(md["Head"]["Metas"], F.lit(1))["content"].alias("d"),
        F.try_element_at(md["Head"]["Link"], F.lit(1))["url"].alias("c"),
        F.size(md["Links"]).alias("n"),
        F.try_element_at(md["Links"], F.lit(1))["path"].alias("p"),
    )
    rows = {r.url: r for r in back.collect()}
    r1 = rows["https://e.com/1"]
    assert (r1.title, r1.d, r1.c, r1.n, r1.p) == (
        "T1", "desc1", "https://e.com/c", 1, "A@/href")
    r2 = rows["https://e.com/2"]
    assert (r2.title, r2.d, r2.c, r2.n) == (None, None, None, 0)


def test_read_wat_spark_edge(spark, tmp_path):
    d = tmp_path / "wat"
    d.mkdir()
    (d / "a.warc.wat.gz").write_bytes(WAT.build_wat(_entries(2)))
    rows = sorted(WAT.read_wat(spark, str(d)).collect(), key=lambda r: r.url)
    assert [r.url for r in rows] == [e[0] for e in _entries(2)]
    assert json.loads(rows[1].envelope)["Envelope"]["t"] == "café 1"
    assert rows[0].refers_to.endswith("000000000000>")
    assert rows[0].warc_ts.isoformat() == "2026-01-01T00:00:00"
