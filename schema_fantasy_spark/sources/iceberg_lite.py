"""Iceberg table access WITHOUT the iceberg runtime jar: a pure-metadata
implementation of the public Apache Iceberg table spec (v2 layout,
including row-level deletes; v1 tables read unchanged), built on the
pure-Python Avro codec in ``avro_lite``.

Why this exists: the north rule reads "Iceberg tables of Common-Crawl
pages ... resumable, incremental across snapshots", and this container
ships no iceberg-spark-runtime. Iceberg's data plane IS parquet — the
table format is ~KBs of driver-side metadata (a JSON pointer tree plus
Avro manifest files). So the reader resolves snapshots from
``metadata/*.metadata.json``, walks the manifest list -> manifests ->
live data files, and hands the file list to ``spark.read.parquet`` —
planning cost is O(metadata), the scan is the same columnar parquet
scan as any other source, and snapshot time travel / incremental reads
become pure metadata operations. ``sources/iceberg.py`` remains the
catalog-based path for real clusters with the runtime jar.

Row-level deletes (spec v2) — the shape production tables actually
have (reference analogue: the linker must resolve EVERY reachable ref
or error, src/linker.js:96-103; here a snapshot's closure includes its
delete files, and skipping them would silently resurrect rows):

* POSITIONAL deletes — parquet files of ``(file_path, pos)`` — are
  applied distributed: the data scan projects the hidden parquet
  metadata columns ``_metadata.file_path`` / ``_metadata.row_index``
  (computed by the vectorized reader, no Python) and LEFT-ANTI joins
  the delete set on (file, pos) with the spec's sequence-number gate
  ``data_seq <= delete_seq``. The delete side is NOT unconditionally
  broadcast — at 10^12 rows a table can carry billions of delete rows,
  so the join is a plain equi anti join and AQE broadcasts it only
  when its runtime size allows.
* EQUALITY deletes — parquet files of values for ``equality_ids``
  columns — anti-join on null-safe equality (``<=>``; spec: null
  matches null) gated ``data_seq < delete_seq`` (strict, per spec:
  an equality delete never applies to files of its own commit).
* Sequence numbers follow v2 inheritance: an entry without an explicit
  ``sequence_number`` inherits its manifest-list row's; v1 metadata
  (no sequence numbers anywhere) reads as sequence 0 everywhere,
  which preserves the old all-deletes-apply-to-nothing behavior
  (v1 tables cannot carry delete files).

Supported: snapshot listing, current/by-id/as-of-timestamp resolution,
live-file listing (ADDED + EXISTING, DELETED dropped), positional +
equality delete application, incremental file diffs between snapshots,
and a writer producing spec-layout v2 append / overwrite /
row-level-delete snapshots (unpartitioned, local filesystem).
Malformed mixes (a delete file listed in a data manifest or vice
versa, unknown manifest content) raise rather than misread.
"""

from __future__ import annotations

import glob
import json
import os
import re
import uuid
from typing import Any, Dict, List, Optional, Tuple

from schema_fantasy_spark.sources.avro_lite import read_container, write_container


class IcebergLiteError(RuntimeError):
    pass


# --------------------------------------------------------------- reading


def _metadata_path(table_path: str) -> str:
    mdir = os.path.join(table_path, "metadata")
    hint = os.path.join(mdir, "version-hint.text")
    if os.path.isfile(hint):
        v = open(hint).read().strip()
        cand = os.path.join(mdir, f"v{v}.metadata.json")
        if os.path.isfile(cand):
            return cand
    cands = glob.glob(os.path.join(mdir, "*.metadata.json"))
    if not cands:
        raise IcebergLiteError(f"no metadata json under {mdir}")

    def version_of(p: str) -> int:
        m = re.match(r"v(\d+)\.metadata\.json$", os.path.basename(p))
        return int(m.group(1)) if m else -1

    return max(cands, key=lambda p: (version_of(p), p))


def table_metadata(table_path: str) -> Dict[str, Any]:
    with open(_metadata_path(table_path)) as fh:
        return json.load(fh)


def snapshots(table_path: str) -> List[Dict[str, Any]]:
    return list(table_metadata(table_path).get("snapshots") or [])


def _resolve_snapshot(
    md: Dict[str, Any],
    snapshot_id: Optional[int] = None,
    as_of_timestamp_ms: Optional[int] = None,
) -> Dict[str, Any]:
    snaps = md.get("snapshots") or []
    if not snaps:
        raise IcebergLiteError("table has no snapshots")
    if snapshot_id is not None:
        for s in snaps:
            if s["snapshot-id"] == snapshot_id:
                return s
        raise IcebergLiteError(f"snapshot {snapshot_id} not found")
    if as_of_timestamp_ms is not None:
        eligible = [s for s in snaps if s["timestamp-ms"] <= as_of_timestamp_ms]
        if not eligible:
            raise IcebergLiteError("no snapshot at or before the timestamp")
        return max(eligible, key=lambda s: s["timestamp-ms"])
    cur = md.get("current-snapshot-id")
    for s in snaps:
        if s["snapshot-id"] == cur:
            return s
    return snaps[-1]


def _local(path: str) -> str:
    # `file:///x`, `file://x`, and Spark's `file:/x` all normalize to /x
    return re.sub(r"^file:/*", "/", path) if path.startswith("file:") else path


def _entry_seq(entry: Dict[str, Any], mrow: Dict[str, Any]) -> int:
    """v2 sequence-number inheritance: explicit entry value, else the
    manifest-list row's; v1 metadata (neither present) -> 0."""
    s = entry.get("sequence_number")
    if s is None:
        s = mrow.get("sequence_number")
    return int(s) if s is not None else 0


def _scan_plan(
    md: Dict[str, Any],
    snap: Dict[str, Any],
) -> Dict[str, Any]:
    """The snapshot's full file closure: live data files, positional
    delete files, and equality delete files, each with its data
    sequence number. O(metadata) — nothing here touches the data
    plane."""
    mlist_path = _local(snap["manifest-list"])
    _, manifest_rows = read_container(open(mlist_path, "rb").read())
    data: List[Tuple[str, int]] = []
    pos_del: List[Tuple[str, int]] = []
    eq_del: List[Tuple[str, int, Tuple[int, ...]]] = []
    for mrow in manifest_rows:
        mcontent = int(mrow.get("content") or 0)
        if mcontent not in (0, 1):
            raise IcebergLiteError(f"unknown manifest content {mcontent}")
        _, entries = read_container(open(_local(mrow["manifest_path"]), "rb").read())
        for e in entries:
            if e.get("status") == 2:  # DELETED manifest entry
                continue
            dfile = e["data_file"]
            fcontent = int(dfile.get("content") or 0)
            seq = _entry_seq(e, mrow)
            path = _local(dfile["file_path"])
            if mcontent == 0:
                if fcontent != 0:
                    raise IcebergLiteError(
                        f"delete file (content={fcontent}) listed in a DATA manifest"
                    )
                data.append((path, seq))
            elif fcontent == 1:
                pos_del.append((path, seq))
            elif fcontent == 2:
                ids = dfile.get("equality_ids") or []
                if not ids:
                    raise IcebergLiteError("equality delete file without equality_ids")
                eq_del.append((path, seq, tuple(int(i) for i in ids)))
            else:
                raise IcebergLiteError(
                    f"data file (content={fcontent}) listed in a DELETE manifest"
                )
    return {
        "data": sorted(set(data)),
        "pos": sorted(set(pos_del)),
        "eq": sorted(set(eq_del)),
    }


def _field_names_by_id(md: Dict[str, Any]) -> Dict[int, str]:
    """Current iceberg schema's field-id -> name map (equality_ids are
    FIELD IDS, not names)."""
    schema = None
    schemas = md.get("schemas")
    if schemas:
        cur = md.get("current-schema-id")
        schema = next(
            (s for s in schemas if s.get("schema-id") == cur), schemas[-1]
        )
    if schema is None:
        schema = md.get("schema")
    if not schema:
        raise IcebergLiteError("table metadata has no schema")
    return {int(f["id"]): f["name"] for f in schema["fields"]}


def snapshot_files(
    table_path: str,
    snapshot_id: Optional[int] = None,
    as_of_timestamp_ms: Optional[int] = None,
) -> List[str]:
    """Live DATA-file paths of a snapshot (ADDED + EXISTING entries
    across its data manifests; DELETED entries dropped). Delete files
    are part of the scan plan, not of this list — use
    ``read_snapshot`` for delete-applied rows."""
    md = table_metadata(table_path)
    snap = _resolve_snapshot(md, snapshot_id, as_of_timestamp_ms)
    return [p for p, _ in _scan_plan(md, snap)["data"]]


def read_snapshot(
    spark,
    table_path: str,
    snapshot_id: Optional[int] = None,
    as_of_timestamp_ms: Optional[int] = None,
):
    """DataFrame over a snapshot's live rows — time travel is a pure
    metadata operation; the scan is a plain pruned parquet scan, and
    v2 row-level deletes are applied as distributed anti joins (see
    module docstring for the join shapes)."""
    from pyspark.sql import functions as F

    md = table_metadata(table_path)
    snap = _resolve_snapshot(md, snapshot_id, as_of_timestamp_ms)
    plan = _scan_plan(md, snap)
    if not plan["data"]:
        raise IcebergLiteError("snapshot has no data files")
    df = spark.read.parquet(*[p for p, _ in plan["data"]])
    if not plan["pos"] and not plan["eq"]:
        return df  # fast path: no metadata columns materialized

    out_cols = df.columns
    norm = lambda c: F.regexp_replace(c, "^file:/*", "/")  # noqa: E731
    d = df.select(
        "*",
        norm(F.col("_metadata.file_path")).alias("__sfs_file"),
        F.col("_metadata.row_index").alias("__sfs_pos"),
    )
    # per-FILE sequence numbers: one row per data file — metadata-sized
    # (the driver already holds this list), so broadcasting is safe
    seq_df = spark.createDataFrame(
        list(plan["data"]), "__sfs_file string, __sfs_seq long"
    )
    d = d.join(F.broadcast(seq_df), "__sfs_file", "left")

    if plan["pos"]:
        # one read per delete COMMIT (files sharing a sequence number),
        # not per file — bounds the union width by commit count
        by_seq: Dict[int, List[str]] = {}
        for p, s in plan["pos"]:
            by_seq.setdefault(s, []).append(p)
        parts = [
            spark.read.parquet(*paths).select(
                norm(F.col("file_path")).alias("__del_file"),
                F.col("pos").cast("long").alias("__del_pos"),
                F.lit(s).cast("long").alias("__del_seq"),
            )
            for s, paths in sorted(by_seq.items())
        ]
        dels = parts[0]
        for p in parts[1:]:
            dels = dels.unionAll(p)
        # plain anti join (equi on file+pos, seq gate as a filter):
        # the delete side is unbounded at scale, so no forced broadcast
        d = d.join(
            dels,
            (F.col("__sfs_file") == F.col("__del_file"))
            & (F.col("__sfs_pos") == F.col("__del_pos"))
            & (F.col("__sfs_seq") <= F.col("__del_seq")),
            "left_anti",
        )

    if plan["eq"]:
        names = _field_names_by_id(md)
        groups: Dict[Tuple[int, Tuple[int, ...]], List[str]] = {}
        for p, s, ids in plan["eq"]:
            groups.setdefault((s, ids), []).append(p)
        for (s, ids), paths in sorted(groups.items()):
            try:
                eq_cols = [names[i] for i in ids]
            except KeyError as exc:
                raise IcebergLiteError(
                    f"equality_ids {ids} not in the table schema"
                ) from exc
            dels = (
                spark.read.parquet(*paths)
                .select(*[F.col(c).alias(f"__eq_{c}") for c in eq_cols])
                .distinct()
            )
            cond = F.col("__sfs_seq") < F.lit(s).cast("long")  # STRICT, per spec
            for c in eq_cols:
                # <=> is an equi-join key for Spark, so this stays a
                # hash anti join, not a nested-loop join
                cond = cond & F.col(c).eqNullSafe(F.col(f"__eq_{c}"))
            d = d.join(dels, cond, "left_anti")

    return d.select(*out_cols)


def incremental_files(
    table_path: str, from_snapshot_id: int, to_snapshot_id: int
) -> List[str]:
    """DATA files present in ``to`` but not in ``from`` — the append
    delta an incremental validation run scans (resume-from-snapshot).
    A delete-only commit appends no data files, so its delta is empty."""
    a = set(snapshot_files(table_path, from_snapshot_id))
    b = set(snapshot_files(table_path, to_snapshot_id))
    return sorted(b - a)


def read_incremental(spark, table_path: str, from_snapshot_id: int,
                     to_snapshot_id: int):
    files = incremental_files(table_path, from_snapshot_id, to_snapshot_id)
    if not files:
        raise IcebergLiteError("no appended files between the snapshots")
    return spark.read.parquet(*files)


# --------------------------------------------------------------- writing

_MANIFEST_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {"name": "data_file", "type": {"type": "record", "name": "r2", "fields": [
            {"name": "content", "type": "int"},
            {"name": "file_path", "type": "string"},
            {"name": "file_format", "type": "string"},
            {"name": "partition", "type": {
                "type": "record", "name": "r102", "fields": []}},
            {"name": "record_count", "type": "long"},
            {"name": "file_size_in_bytes", "type": "long"},
            {"name": "equality_ids",
             "type": ["null", {"type": "array", "items": "int"}]},
        ]}},
    ],
}

_MANIFEST_LIST_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": ["null", "long"]},
    ],
}


def _spark_schema_to_iceberg(schema) -> Dict[str, Any]:
    fields = []
    for i, f in enumerate(schema.fields, start=1):
        fields.append({
            "id": i, "name": f.name, "required": False,
            "type": str(f.dataType.simpleString()),
        })
    return {"type": "struct", "schema-id": 0, "fields": fields}


def _norm_mrow(r: Dict[str, Any]) -> Dict[str, Any]:
    """Fill v2 manifest-list fields when carrying forward rows written
    by the older v1 writer (logical clock: snapshot id == sequence
    number, so added_snapshot_id is the correct backfill)."""
    seq = r.get("sequence_number")
    if seq is None:
        seq = r.get("added_snapshot_id") or 0
    return {
        "manifest_path": r["manifest_path"],
        "manifest_length": r["manifest_length"],
        "partition_spec_id": int(r.get("partition_spec_id") or 0),
        "content": int(r.get("content") or 0),
        "sequence_number": int(seq),
        "min_sequence_number": int(r.get("min_sequence_number") or seq),
        "added_snapshot_id": r.get("added_snapshot_id"),
    }


def _load_state(table_path: str):
    try:
        md = table_metadata(table_path)
        version = max(
            int(re.match(r"v(\d+)\.metadata\.json$", os.path.basename(p)).group(1))
            for p in glob.glob(os.path.join(table_path, "metadata", "v*.metadata.json"))
        )
    except IcebergLiteError:
        md, version = None, 0
    prior = (md.get("snapshots") or []) if md else []
    snap_id = max((s["snapshot-id"] for s in prior), default=0) + 1
    return md, version, prior, snap_id


def _count_written(spark, data_dir: str) -> Dict[str, int]:
    from pyspark.sql import functions as F

    if not glob.glob(os.path.join(data_dir, "*.parquet")):
        return {}  # empty write (e.g. a delete predicate matching 0 rows)
    return {
        _local(r["f"]): r["n"]
        for r in spark.read.parquet(data_dir)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def _write_manifest(
    spark, table_path: str, snap_id: int, data_dir: str,
    content: int, equality_ids: Optional[List[int]] = None,
) -> Dict[str, Any]:
    """Write one manifest over the parquet files just produced under
    ``data_dir``; returns its manifest-list row."""
    entries = []
    for fpath, n in sorted(_count_written(spark, data_dir).items()):
        entries.append({
            "status": 1, "snapshot_id": snap_id, "sequence_number": snap_id,
            "data_file": {
                "content": content, "file_path": fpath,
                "file_format": "PARQUET", "partition": {},
                "record_count": n, "file_size_in_bytes": os.path.getsize(fpath),
                "equality_ids": equality_ids,
            },
        })
    tag = "manifest" if content == 0 else f"manifest-del{content}"
    manifest_path = os.path.join(
        table_path, "metadata", f"{tag}-{snap_id}.avro"
    )
    with open(manifest_path, "wb") as fh:
        fh.write(write_container(_MANIFEST_SCHEMA, entries))
    return {
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": 0,
        "content": 0 if content == 0 else 1,
        "sequence_number": snap_id,
        "min_sequence_number": snap_id,
        "added_snapshot_id": snap_id,
    }


def _finish_commit(
    table_path: str, md, version: int, prior: List[Dict[str, Any]],
    snap_id: int, mrows: List[Dict[str, Any]], operation: str,
    schema: Dict[str, Any], n_fields: int,
) -> int:
    mlist_path = os.path.join(table_path, "metadata", f"snap-{snap_id}.avro")
    with open(mlist_path, "wb") as fh:
        fh.write(write_container(_MANIFEST_LIST_SCHEMA, mrows))
    new_md = {
        "format-version": 2,
        "table-uuid": (md or {}).get("table-uuid") or str(uuid.uuid5(
            uuid.NAMESPACE_URL, table_path)),
        "location": table_path,
        # deterministic logical clock (documented): real writers stamp
        # wall-clock ms; the harness needs reproducible metadata bytes
        "last-updated-ms": snap_id,
        "last-sequence-number": snap_id,
        "last-column-id": n_fields,
        "schema": schema,
        "schemas": [schema],
        "current-schema-id": schema.get("schema-id", 0),
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "snapshots": prior + [{
            "snapshot-id": snap_id,
            "sequence-number": snap_id,
            "timestamp-ms": snap_id,
            "manifest-list": mlist_path,
            "summary": {"operation": operation},
        }],
        "current-snapshot-id": snap_id,
    }
    with open(os.path.join(table_path, "metadata",
                           f"v{version + 1}.metadata.json"), "w") as fh:
        json.dump(new_md, fh, indent=1)
    with open(os.path.join(table_path, "metadata", "version-hint.text"), "w") as fh:
        fh.write(str(version + 1))
    return snap_id


def _prior_mrows(md) -> List[Dict[str, Any]]:
    cur = _resolve_snapshot(md)
    _, rows = read_container(open(_local(cur["manifest-list"]), "rb").read())
    return [_norm_mrow(r) for r in rows]


def _commit(spark, df, table_path: str, operation: str) -> int:
    os.makedirs(os.path.join(table_path, "metadata"), exist_ok=True)
    md, version, prior, snap_id = _load_state(table_path)
    data_dir = os.path.join(table_path, "data", f"snap-{snap_id}")
    df.write.mode("overwrite").parquet(data_dir)
    mrows = [_write_manifest(spark, table_path, snap_id, data_dir, content=0)]
    if operation == "append" and prior:
        mrows = _prior_mrows(md) + mrows
    schema = _spark_schema_to_iceberg(df.schema)
    return _finish_commit(table_path, md, version, prior, snap_id, mrows,
                          operation, schema, len(df.schema.fields))


def append(spark, df, table_path: str) -> int:
    """Commit a new snapshot whose file set = prior live set + df's
    files (prior DELETE manifests carry forward; their sequence
    numbers are below the new data's, so they do not apply to it).
    Returns the new snapshot id."""
    return _commit(spark, df, table_path, "append")


def overwrite(spark, df, table_path: str) -> int:
    """Commit a new snapshot whose file set REPLACES the prior one
    (prior delete files drop with the data they applied to)."""
    return _commit(spark, df, table_path, "overwrite")


def delete_where(spark, table_path: str, condition) -> int:
    """Commit a POSITIONAL-delete snapshot (spec v2): rows of the
    current snapshot matching ``condition`` (a boolean Column over the
    table's columns) are marked deleted as (file_path, pos) parquet
    rows — no data file is rewritten. The position scan projects the
    parquet metadata columns and never collects rows to the driver."""
    from pyspark.sql import functions as F

    md, version, prior, snap_id = _load_state(table_path)
    if md is None:
        raise IcebergLiteError("cannot delete from a table with no snapshots")
    snap = _resolve_snapshot(md)
    plan = _scan_plan(md, snap)
    if not plan["data"]:
        raise IcebergLiteError("snapshot has no data files")
    norm = lambda c: F.regexp_replace(c, "^file:/*", "/")  # noqa: E731
    # raw scan (existing deletes NOT re-applied: a duplicate positional
    # delete of an already-dead row is a spec-legal no-op)
    pos_rows = (
        spark.read.parquet(*[p for p, _ in plan["data"]])
        .where(condition)
        .select(
            norm(F.col("_metadata.file_path")).alias("file_path"),
            F.col("_metadata.row_index").cast("long").alias("pos"),
        )
        # spec: positional delete files are sorted by (file_path, pos)
        .sortWithinPartitions("file_path", "pos")
    )
    data_dir = os.path.join(table_path, "data", f"delete-{snap_id}")
    pos_rows.write.mode("overwrite").parquet(data_dir)
    mrows = _prior_mrows(md) + [
        _write_manifest(spark, table_path, snap_id, data_dir, content=1)
    ]
    schema = (md or {}).get("schema") or _spark_schema_to_iceberg(
        spark.read.parquet(plan["data"][0][0]).schema
    )
    return _finish_commit(table_path, md, version, prior, snap_id, mrows,
                          "delete", schema, len(schema.get("fields", [])))


def delete_equality(spark, table_path: str, values_df, eq_cols: List[str]) -> int:
    """Commit an EQUALITY-delete snapshot (spec v2): every current or
    FUTURE-until-rewritten row whose ``eq_cols`` values match a row of
    ``values_df`` is deleted (null-safe equality, strict sequence
    gate — it applies only to data committed BEFORE this snapshot)."""
    md, version, prior, snap_id = _load_state(table_path)
    if md is None:
        raise IcebergLiteError("cannot delete from a table with no snapshots")
    names = _field_names_by_id(md)
    by_name = {v: k for k, v in names.items()}
    try:
        eq_ids = [by_name[c] for c in eq_cols]
    except KeyError as exc:
        raise IcebergLiteError(f"equality column not in table schema: {exc}")
    data_dir = os.path.join(table_path, "data", f"delete-{snap_id}")
    values_df.select(*eq_cols).distinct().write.mode("overwrite").parquet(data_dir)
    mrows = _prior_mrows(md) + [
        _write_manifest(spark, table_path, snap_id, data_dir,
                        content=2, equality_ids=eq_ids)
    ]
    schema = md.get("schema")
    return _finish_commit(table_path, md, version, prior, snap_id, mrows,
                          "delete", schema, len(schema.get("fields", [])))
