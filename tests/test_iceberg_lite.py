"""sources/avro_lite + sources/iceberg_lite — the no-jar Iceberg path:
Avro container round trips, snapshot semantics, time travel,
incremental reads, unsupported-feature rejections."""

import json
import os
import zlib

import pytest
from pyspark.sql import functions as F

from schema_fantasy_spark.sources import avro_lite as al
from schema_fantasy_spark.sources import iceberg_lite as il


SCHEMA = {
    "type": "record", "name": "e", "fields": [
        {"name": "status", "type": "int"},
        {"name": "sid", "type": ["null", "long"]},
        {"name": "f", "type": {"type": "record", "name": "df", "fields": [
            {"name": "path", "type": "string"},
            {"name": "n", "type": "long"},
            {"name": "tags", "type": {"type": "map", "values": "string"}},
            {"name": "ids", "type": {"type": "array", "items": "long"}},
        ]}},
    ],
}


def test_avro_container_roundtrip():
    recs = [
        {"status": 1, "sid": 9007199254740993, "f": {
            "path": "a/b.parquet", "n": 42, "tags": {"k": "v", "u": "w"},
            "ids": [0, -1, 1, 2 ** 62, -(2 ** 62)]}},
        {"status": 0, "sid": None, "f": {
            "path": "", "n": 0, "tags": {}, "ids": []}},
    ]
    blob = al.write_container(SCHEMA, recs)
    schema, got = al.read_container(blob)
    assert got == recs
    assert schema["name"] == "e"
    # determinism: identical bytes on re-serialization
    assert al.write_container(SCHEMA, recs) == blob


def test_avro_deflate_and_errors():
    recs = [{"status": 2, "sid": 7, "f": {"path": "x", "n": 1, "tags": {},
                                          "ids": [5]}}]
    # rebuild the container with a deflate-compressed block
    import io

    body = io.BytesIO()
    for r in recs:
        al._encode(body, SCHEMA, r)
    block = body.getvalue()
    c = zlib.compressobj(9, zlib.DEFLATED, -15)
    comp = c.compress(block) + c.flush()
    meta = {"avro.schema": json.dumps(SCHEMA).encode(), "avro.codec": b"deflate"}
    out = io.BytesIO()
    out.write(al.MAGIC)
    al._encode(out, {"type": "map", "values": "bytes"}, meta)
    out.write(b"S" * 16)
    out.write(al._zigzag(1) + al._zigzag(len(comp)) + comp + b"S" * 16)
    _, got = al.read_container(out.getvalue())
    assert got == recs
    with pytest.raises(ValueError):
        al.read_container(b"not avro at all......")


def test_iceberg_lite_snapshots(spark, tmp_path):
    tp = str(tmp_path / "tbl")
    df = spark.range(0, 100).select(F.col("id").alias("doc_id"),
                                    (F.col("id") % 5).alias("v"))
    s1 = il.append(spark, df.filter(F.col("doc_id") < 40), tp)
    s2 = il.append(spark, df.filter((F.col("doc_id") >= 40)
                                    & (F.col("doc_id") < 70)), tp)
    s3 = il.overwrite(spark, df.filter(F.col("doc_id") >= 70), tp)
    assert [s["snapshot-id"] for s in il.snapshots(tp)] == [s1, s2, s3]
    # append accumulates, overwrite replaces
    assert il.read_snapshot(spark, tp, snapshot_id=s1).count() == 40
    assert il.read_snapshot(spark, tp, snapshot_id=s2).count() == 70
    assert il.read_snapshot(spark, tp).count() == 30          # current = s3
    # as-of-timestamp resolution (logical clock == snapshot id)
    assert il.read_snapshot(spark, tp, as_of_timestamp_ms=s2).count() == 70
    # incremental read = the appended delta only
    inc = il.read_incremental(spark, tp, s1, s2)
    assert inc.count() == 30
    assert inc.agg(F.min("doc_id")).first()[0] == 40
    # content equality against the source, not just counts
    got = sorted(r["doc_id"] for r in il.read_snapshot(spark, tp, snapshot_id=s2).collect())
    assert got == list(range(70))
    with pytest.raises(il.IcebergLiteError):
        il.read_snapshot(spark, tp, snapshot_id=999)
    with pytest.raises(il.IcebergLiteError):
        il.read_incremental(spark, tp, s2, s1)  # no delta backwards


def test_iceberg_lite_deleted_entries_and_v2_rejection(spark, tmp_path):
    tp = str(tmp_path / "tbl2")
    df = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    s1 = il.append(spark, df, tp)
    files = il.snapshot_files(tp, s1)
    assert files and all(os.path.isfile(f) for f in files)
    # hand-edit the manifest: mark every entry DELETED -> no live files
    mpath = os.path.join(tp, "metadata", f"manifest-{s1}.avro")
    schema, entries = al.read_container(open(mpath, "rb").read())
    for e in entries:
        e["status"] = 2
    open(mpath, "wb").write(al.write_container(il._MANIFEST_SCHEMA, entries))
    assert il.snapshot_files(tp, s1) == []
    # a v2 delete MANIFEST must raise, not misread
    lpath = os.path.join(tp, "metadata", f"snap-{s1}.avro")
    lschema = {
        "type": "record", "name": "manifest_file", "fields":
        il._MANIFEST_LIST_SCHEMA["fields"] + [{"name": "content", "type": "int"}],
    }
    _, rows = al.read_container(open(lpath, "rb").read())
    for r in rows:
        r["content"] = 1
    open(lpath, "wb").write(al.write_container(lschema, rows))
    with pytest.raises(il.IcebergLiteError):
        il.snapshot_files(tp, s1)
