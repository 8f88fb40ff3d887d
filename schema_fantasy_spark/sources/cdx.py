"""CDXJ web-archive index — write, read, and random-access fetch.

A CDX(J) index is how a consumer finds ONE record inside a petabyte of
WARC without reading any archive end-to-end: one line per record,

    <surt-key> <timestamp14> {"url": ..., "offset": ..., "length": ...}

sorted by (surt, timestamp), where ``offset``/``length`` are the
record's extent in the archive AS STORED (a whole gzip member when the
archive is member-gzipped), so ``archive[offset : offset+length]`` is
independently decodable — exactly the contract of
``warc.build_warc_indexed``. The Common Crawl / OpenWayback access
pattern is a binary search (or range scan) over the sorted index
followed by a ranged GET of one member.

Divergence from Common Crawl's columnar index, documented: record
digests here are ``md5:<hex>`` over the payload bytes (CC publishes
SHA-1/base32); md5 keeps the digest recomputable by both engines of the
oracle gate. The framing — key layout, sort order, extent semantics —
is the interchange contract and is preserved.

Scale shape: index WRITE rides the archive write (`build_cdx` packs one
partition's records and derives the lines from the same
``build_warc_indexed`` call — no second pass over bodies); index READ
is `spark.read.text` plus pure Column parsing (`cdxj_struct`), JVM-side
whole-stage codegen, no Python; record FETCH is a byte-range slice, no
archive scan. SURT keys come from ``ops.urls.surt_key`` (native Column
expr), so the partition/sort key of a 100 TB index build never touches
Python either.
"""

from __future__ import annotations

import hashlib
import json
from typing import Any, Dict, List, Optional, Sequence, Tuple

from pyspark.sql import Column, functions as F

from schema_fantasy_spark.sources.warc import (
    build_record,
    build_warc_indexed,
    parse_warc,
)

#: JSON fields of a CDXJ line, in emission order
_FIELDS = ("url", "mime", "status", "digest", "length", "offset", "filename")


def build_cdx(
    entries: Sequence[Dict[str, Any]],
    filename: str,
    compress: bool = True,
) -> Tuple[bytes, str]:
    """``(archive_bytes, cdxj_text)`` for one archive's records.

    Each entry: ``surt``, ``ts14`` (14-digit YYYYMMDDhhmmss), ``url``,
    ``date`` (ISO WARC-Date), ``body`` (payload bytes), optional
    ``status`` (default 200) and ``mime`` (default text/html). Records
    are written in the given order; index lines come out sorted by
    (surt, ts14) — the CDX contract — with offsets/lengths straight
    from the stored member extents and ``md5:<hex>`` payload digests."""
    records = [
        build_record(
            e["url"],
            e["date"],
            e["body"],
            warc_type="response",
            status=int(e.get("status", 200)),
        )
        for e in entries
    ]
    archive, index = build_warc_indexed(records, compress=compress)
    lines = []
    for e, (off, length) in zip(entries, index):
        meta = {
            "url": e["url"],
            "mime": e.get("mime", "text/html"),
            "status": str(e.get("status", 200)),
            "digest": "md5:" + hashlib.md5(e["body"]).hexdigest(),
            "length": str(length),
            "offset": str(off),
            "filename": filename,
        }
        lines.append(
            "%s %s %s"
            % (
                e["surt"],
                e["ts14"],
                json.dumps(meta, separators=(",", ":")),
            )
        )
    lines.sort(key=lambda ln: tuple(ln.split(" ", 2)[:2]))
    return archive, "\n".join(lines)


def fetch_record(
    archive: bytes, offset: int, length: int
) -> Optional[Dict[str, Any]]:
    """The ONE record at an index extent — ``archive[offset:offset+
    length]`` decoded standalone (gzip member or plain record), never
    touching the rest of the archive. None when the slice does not
    frame a whole record (stale index / truncated fetch)."""
    recs = parse_warc(archive[offset : offset + length])
    return recs[0] if len(recs) == 1 else None


# ------------------------------------------------------------ spark edge


def cdxj_struct(line: Column) -> Column:
    """Typed struct from a CDXJ line, pure Column exprs (codegen, no
    Python): ``surt``, ``ts14``, then the JSON fields with ``offset``/
    ``length`` cast to LONG. Malformed JSON yields NULL fields (text
    indexes in the wild carry stray lines); the caller filters."""
    parts = F.split(line, " ", 3)
    meta = F.from_json(
        F.element_at(parts, 3),
        ", ".join(f"{f} string" for f in _FIELDS),
    )
    return F.struct(
        F.element_at(parts, 1).alias("surt"),
        F.element_at(parts, 2).alias("ts14"),
        meta["url"].alias("url"),
        meta["mime"].alias("mime"),
        meta["status"].alias("status"),
        meta["digest"].alias("digest"),
        meta["length"].cast("long").alias("length"),
        meta["offset"].cast("long").alias("offset"),
        meta["filename"].alias("filename"),
    )


def read_cdxj(spark, path: str):
    """DataFrame over ``path``'s CDXJ index files: (surt, ts14, url,
    mime, status, digest, length, offset, filename). `spark.read.text`
    plus native parsing — a 100 TB crawl's index reads at scan
    bandwidth with zero Python, and a filter on ``surt`` prefix pushes
    into the scan."""
    lines = spark.read.text(path)
    s = cdxj_struct(F.col("value"))
    return lines.select(s.alias("r")).select("r.*")
