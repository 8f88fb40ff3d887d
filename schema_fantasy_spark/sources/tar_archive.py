"""TAR (+ .tar.gz) archive ingestion — the other half of the bundle
story next to sources/zip_archive.py: research corpora and site dumps
ship as tarballs as often as zips. Format work is the stdlib's
(``tarfile``: ustar/pax headers, sparse members); the engine
contribution is the same Spark seam as WARC/ZIP — binaryFile listing +
``mapInPandas`` extraction, partition-preserving, member bytes never
shuffle, one archive per task (tar has no central directory at all, so
mid-stream byte ranges cannot even be enumerated independently).

Gzip wrapping is transparent on read (magic-byte sniff) and
deterministic on write (``gzip.compress(mtime=0)`` — ``tarfile``'s own
``w:gz`` stamps wall-clock time into the gzip header, which would break
identical-input-identical-bytes). Writer members carry fixed zeroed
metadata (mtime/uid/gid) for the same reason.

Damaged archives quarantine as a single error row; a truncated tail
quarantines while complete leading members survive (the WARC stance)."""

from __future__ import annotations

import gzip
import io
import tarfile
from typing import Iterator

MEMBER_SCHEMA = (
    "tar_file string, member string, content binary, size long, "
    "gzipped boolean, error string"
)


def parse_tar(payload: bytes, tar_name: str = ""):
    """Members of one (optionally gzipped) tar as plain dict rows.
    Complete leading members survive a truncated tail; the tail itself
    quarantines."""
    gz = payload[:2] == b"\x1f\x8b"
    rows = []
    try:
        data = gzip.decompress(payload) if gz else payload
    except Exception as e:
        return [{
            "tar_file": tar_name, "member": None, "content": None,
            "size": None, "gzipped": gz, "error": f"bad gzip: {e}",
        }]
    tf = None
    try:
        tf = tarfile.open(fileobj=io.BytesIO(data), mode="r:")
        while True:
            info = tf.next()
            if info is None:
                # next() also returns None on a PARTIAL trailing header
                # (tarfile treats short reads at a block boundary as
                # end-of-archive) — leftover non-padding bytes mean a
                # truncated tail, not a clean end marker
                if data[tf.offset:].strip(b"\x00"):
                    rows.append({
                        "tar_file": tar_name, "member": None,
                        "content": None, "size": None, "gzipped": gz,
                        "error": "truncated or damaged tar: partial "
                                 "trailing header",
                    })
                break
            if not info.isreg():
                continue
            rows.append({
                "tar_file": tar_name,
                "member": info.name,
                "content": tf.extractfile(info).read(),
                "size": info.size,
                "gzipped": gz,
                "error": None,
            })
    except Exception as e:
        rows.append({
            "tar_file": tar_name, "member": None, "content": None,
            "size": None, "gzipped": gz,
            "error": f"truncated or damaged tar: {e}",
        })
    finally:
        if tf is not None:
            tf.close()
    return rows


def build_tar(members: dict, gz: bool = False) -> bytes:
    """Archive bytes from {member_name: payload} — deterministic
    (sorted names, zeroed mtime/uid/gid, mtime=0 gzip header)."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w:") as tf:
        for name in sorted(members):
            info = tarfile.TarInfo(name)
            info.size = len(members[name])
            info.mtime = 0
            tf.addfile(info, io.BytesIO(members[name]))
    data = buf.getvalue()
    return gzip.compress(data, mtime=0) if gz else data


def read_tar(spark, path: str):
    """DataFrame of every member of every archive under ``path``:
    (tar_file, member, content, size, gzipped, error)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = [f.split()[0] for f in MEMBER_SCHEMA.split(", ")]
        for pdf in batches:
            rows = {c: [] for c in cols}
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for r in parse_tar(bytes(content), tar_name=fpath):
                    for c in cols:
                        rows[c].append(r[c])
            yield pd.DataFrame(rows)

    binfiles = spark.read.format("binaryFile").load(path).select("path", "content")
    return binfiles.mapInPandas(run, MEMBER_SCHEMA)
