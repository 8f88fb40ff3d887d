"""WET (WARC Encapsulated Text) reader/writer — Common Crawl's
extracted-text sidecar format (``*.warc.wet.gz``). A WET file is a WARC
archive whose records are ``conversion`` records: the plain-text
extraction of each response, carrying the original URL, the WARC-Date,
and a ``WARC-Refers-To`` pointer at the source response record. The
first record is a ``warcinfo`` block describing the extraction run.

This is the PUBLISHING edge of the north-star pipeline: pages flow in as
WARC (sources/warc.py), text extraction is ops/html.extract_text, and
the extracted corpus ships back out as WET — the format every
Common-Crawl text consumer already reads. A user of the reference
validates documents they are handed (index.js entry points); producing
and consuming the interchange files around those documents is this
engine's ingestion/egress seam.

Scale shape: writing packs each output partition's records into one
archive inside ``applyInPandas``/``mapInPandas`` (bodies never shuffle
beyond the explicit partitioning); reading lists archives with the
binaryFile source and parses inside ``mapInPandas`` — partition-
preserving, same as read_warc. Per-record gzip members mean a truncated
archive loses only its tail.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, List, Optional, Sequence, Tuple

from schema_fantasy_spark.sources.warc import (
    build_record,
    build_warc,
    parse_warc,
)

#: warcinfo fields of a WET extraction run (the Common Crawl layout)
_DEFAULT_INFO = {
    "software": "schema-fantasy-spark",
    "format": "WARC File Format 1.0",
    "extractedFrom": "warc",
}


def build_wet(
    entries: Sequence[Tuple[str, str, str, str]],
    info_fields: Optional[Dict[str, str]] = None,
    compress: bool = True,
) -> bytes:
    """A WET archive from ``(url, date, refers_to, text)`` tuples:
    leading warcinfo record, then one ``conversion`` record per entry —
    text stored as UTF-8 bytes, ``refers_to`` as WARC-Refers-To (the
    source response's record id). ``date`` is the ISO-8601 WARC-Date."""
    fields = dict(_DEFAULT_INFO)
    fields.update(info_fields or {})
    info_body = "".join(f"{k}: {v}\r\n" for k, v in fields.items()).encode()
    first = entries[0][1] if entries else "2026-01-01T00:00:00Z"
    records = [build_record(None, first, info_body, warc_type="warcinfo")]
    for url, date, refers_to, text in entries:
        records.append(
            build_record(
                url,
                date,
                text.encode("utf-8"),
                warc_type="conversion",
                extra_fields={"WARC-Refers-To": refers_to},
            )
        )
    return build_warc(records, compress=compress)


def parse_wet(payload: bytes) -> List[Dict[str, Any]]:
    """Conversion records of a WET archive: dicts with ``url``, ``date``,
    ``refers_to``, ``text`` (UTF-8 decoded; WET bodies are text/plain
    UTF-8 by convention — undecodable bytes are replaced, never raise),
    plus ``info`` (the warcinfo fields map, attached to every record of
    its archive so downstream rows keep their run provenance)."""
    info: Dict[str, str] = {}
    out: List[Dict[str, Any]] = []
    for rec in parse_warc(payload):
        if rec["type"] == "warcinfo":
            info = rec["fields"]
        elif rec["type"] == "conversion":
            out.append(
                {
                    "url": rec["url"],
                    "date": rec["date"],
                    "refers_to": rec["headers"].get("warc-refers-to"),
                    "text": rec["body"].decode("utf-8", errors="replace"),
                    "info": info,
                }
            )
    return out


def read_wet(spark, path: str):
    """DataFrame over ``path``'s WET archives: (url, warc_ts, text,
    refers_to, wet_file). binaryFile listing + mapInPandas parse —
    partition-preserving, text never shuffles on read."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("url", T.StringType()),
            T.StructField("warc_ts", T.TimestampType()),
            T.StructField("text", T.StringType()),
            T.StructField("refers_to", T.StringType()),
            T.StructField("wet_file", T.StringType()),
        ]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows: Dict[str, list] = {f.name: [] for f in schema.fields}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_wet(bytes(content)):
                    rows["url"].append(rec["url"])
                    rows["warc_ts"].append(
                        pd.Timestamp(rec["date"].rstrip("Z"))
                        if rec["date"] else None
                    )
                    rows["text"].append(rec["text"])
                    rows["refers_to"].append(rec["refers_to"])
                    rows["wet_file"].append(fpath)
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
