"""WAT (Web Archive Transformation) metadata sidecar — Common Crawl's
per-record metadata format (``*.warc.wat.gz``). A WAT file is a WARC
archive of ``metadata`` records (Content-Type ``application/json``):
one JSON envelope per source record carrying the WARC headers plus the
extracted HTTP/HTML metadata (title, metas, canonical link, outlinks),
with a ``WARC-Refers-To`` pointer at the source response. The leading
record is a ``warcinfo`` block describing the extraction run.

Together with WET (sources/wet.py) this completes the Common Crawl
sidecar pair: WET ships the extracted text, WAT ships the extracted
structure — the input of every link-graph / metadata consumer.

Envelope shape (the CC layout, simplified to the fields this engine
extracts — ops/html_meta.py — and documented as the contract):

    {"Envelope": {
       "WARC-Header-Metadata": {"WARC-Target-URI", "WARC-Date",
                                "WARC-Refers-To"},
       "Payload-Metadata": {"HTTP-Response-Metadata": {"HTML-Metadata": {
          "Head":  {"Title", "Metas": [{"name"|"property", "content"}],
                    "Link": [{"rel", "url"}]},
          "Links": [{"path": "A@/href", "url", "text"}]}}}}}

Scale shape: envelope SERIALIZATION is native ``to_json(struct(...))``
over the native extraction columns — the whole build plan before the
archive pack is JVM codegen; packing/parsing archives rides the same
``applyInPandas``/``mapInPandas`` seams as WARC/WET (bodies never
shuffle); envelope RE-PARSE is native ``from_json`` against
:func:`envelope_schema` — a 100 TB WAT scan does its JSON work
JVM-side.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, functions as F, types as T

from schema_fantasy_spark.sources.warc import (
    build_record,
    build_warc,
    parse_warc,
)

#: warcinfo fields of a WAT extraction run
_DEFAULT_INFO = {
    "software": "schema-fantasy-spark",
    "format": "WARC File Format 1.0",
    "extractedFrom": "warc",
}


def build_wat(
    entries: Sequence[Tuple[str, str, str, str]],
    info_fields: Optional[Dict[str, str]] = None,
    compress: bool = True,
) -> bytes:
    """A WAT archive from ``(url, date, refers_to, envelope_json)``
    tuples: leading warcinfo record, then one ``metadata`` record per
    entry with the JSON envelope as its ``application/json`` body and
    ``refers_to`` as WARC-Refers-To."""
    fields = dict(_DEFAULT_INFO)
    fields.update(info_fields or {})
    info_body = "".join(f"{k}: {v}\r\n" for k, v in fields.items()).encode()
    first = entries[0][1] if entries else "2026-01-01T00:00:00Z"
    records = [build_record(None, first, info_body, warc_type="warcinfo")]
    for url, date, refers_to, envelope in entries:
        records.append(
            build_record(
                url,
                date,
                envelope.encode("utf-8"),
                warc_type="metadata",
                extra_fields={"WARC-Refers-To": refers_to},
                content_type="application/json",
            )
        )
    return build_warc(records, compress=compress)


def parse_wat(payload: bytes) -> List[Dict[str, Any]]:
    """Metadata records of a WAT archive: dicts with ``url``, ``date``,
    ``refers_to``, ``envelope`` (the raw JSON string — parse it
    Spark-side with :func:`envelope_schema`, not here), plus ``info``
    (the warcinfo fields map, attached to every record)."""
    info: Dict[str, str] = {}
    out: List[Dict[str, Any]] = []
    for rec in parse_warc(payload):
        if rec["type"] == "warcinfo":
            info = rec["fields"]
        elif (
            rec["type"] == "metadata"
            and rec["headers"].get("content-type") == "application/json"
        ):
            out.append(
                {
                    "url": rec["url"],
                    "date": rec["date"],
                    "refers_to": rec["headers"].get("warc-refers-to"),
                    "envelope": rec["body"].decode("utf-8", errors="replace"),
                    "info": info,
                }
            )
    return out


# ----------------------------------------------------- native envelope


def wat_envelope(
    url: Column,
    date: Column,
    refers_to: Column,
    title: Column,
    metas: Column,
    canonical: Column,
    links: Column,
) -> Column:
    """The envelope JSON as a native Column (``to_json(struct(...))`` —
    null fields are omitted, the WAT convention). ``metas`` is
    ``array<struct<name,property,content>>`` (null-content entries
    should be pre-filtered); ``links`` is ``array<struct<url,text>>``
    (resolved outlinks)."""
    head = F.struct(
        title.alias("Title"),
        metas.alias("Metas"),
        F.when(
            canonical.isNotNull(),
            F.array(
                F.struct(
                    F.lit("canonical").alias("rel"), canonical.alias("url")
                )
            ),
        ).alias("Link"),
    )
    html_md = F.struct(
        head.alias("Head"),
        F.transform(
            links,
            lambda l: F.struct(
                F.lit("A@/href").alias("path"),
                l["url"].alias("url"),
                l["text"].alias("text"),
            ),
        ).alias("Links"),
    )
    env = F.struct(
        F.struct(
            url.alias("WARC-Target-URI"),
            date.alias("WARC-Date"),
            refers_to.alias("WARC-Refers-To"),
        ).alias("WARC-Header-Metadata"),
        F.struct(
            F.struct(html_md.alias("HTML-Metadata")).alias(
                "HTTP-Response-Metadata"
            )
        ).alias("Payload-Metadata"),
    )
    return F.to_json(F.struct(env.alias("Envelope")))


def envelope_schema() -> T.StructType:
    """from_json schema of the envelope (hyphenated CC field names)."""
    meta = T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("property", T.StringType()),
            T.StructField("content", T.StringType()),
        ]
    )
    link = T.StructType(
        [
            T.StructField("rel", T.StringType()),
            T.StructField("url", T.StringType()),
        ]
    )
    outlink = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("url", T.StringType()),
            T.StructField("text", T.StringType()),
        ]
    )
    head = T.StructType(
        [
            T.StructField("Title", T.StringType()),
            T.StructField("Metas", T.ArrayType(meta)),
            T.StructField("Link", T.ArrayType(link)),
        ]
    )
    html_md = T.StructType(
        [
            T.StructField("Head", head),
            T.StructField("Links", T.ArrayType(outlink)),
        ]
    )
    return T.StructType(
        [
            T.StructField(
                "Envelope",
                T.StructType(
                    [
                        T.StructField(
                            "WARC-Header-Metadata",
                            T.StructType(
                                [
                                    T.StructField(
                                        "WARC-Target-URI", T.StringType()
                                    ),
                                    T.StructField("WARC-Date", T.StringType()),
                                    T.StructField(
                                        "WARC-Refers-To", T.StringType()
                                    ),
                                ]
                            ),
                        ),
                        T.StructField(
                            "Payload-Metadata",
                            T.StructType(
                                [
                                    T.StructField(
                                        "HTTP-Response-Metadata",
                                        T.StructType(
                                            [
                                                T.StructField(
                                                    "HTML-Metadata", html_md
                                                )
                                            ]
                                        ),
                                    )
                                ]
                            ),
                        ),
                    ]
                ),
            )
        ]
    )


# ------------------------------------------------------------ spark edge


def read_wat(spark, path: str):
    """DataFrame over ``path``'s WAT archives: (url, warc_ts, refers_to,
    envelope, wat_file) — envelope left as the raw JSON string for
    native ``from_json(envelope_schema())`` downstream. binaryFile +
    mapInPandas, partition-preserving."""
    import pandas as pd

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("refers_to", T.StringType()),
            T.StructField("envelope", T.StringType()),
            T.StructField("wat_file", T.StringType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            rows: Dict[str, list] = {f.name: [] for f in schema.fields}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_wat(bytes(content)):
                    rows["url"].append(rec["url"])
                    rows["warc_ts"].append(
                        pd.Timestamp(rec["date"].rstrip("Z"))
                        if rec["date"] else None
                    )
                    rows["refers_to"].append(rec["refers_to"])
                    rows["envelope"].append(rec["envelope"])
                    rows["wat_file"].append(fpath)
            out = {
                "warc_ts": pd.Series(rows["warc_ts"], dtype="datetime64[ns]")
            }
            for f in schema.fields:
                if f.name != "warc_ts":
                    out[f.name] = pd.Series(rows[f.name], dtype="object")
            yield pd.DataFrame(out)[[f.name for f in schema.fields]]

    binfiles = (
        spark.read.format("binaryFile").load(path).select("path", "content")
    )
    return binfiles.mapInPandas(run, schema)
