"""Iceberg-compatible metadata export for :class:`SnapshotCatalog`.

The reference's catalog sink commits seals into DuckLake/Iceberg catalogs
that any engine can read (reference: src/otlp_server.cpp:1109-1271,
site/src/content/docs/guides/serve.md:199-213).  The Spark-side
:class:`~duckdb_otlp_spark.catalog.SnapshotCatalog` gives the same
transactional guarantees over its own JSON snapshot log; this module
closes the *ecosystem* gap: it renders any catalog snapshot as an
**Apache Iceberg v1 table** (``metadata.json`` + Avro manifest list +
Avro manifests, per the public Iceberg table spec), so Trino, DuckDB's
``iceberg_scan``, or Spark-with-Iceberg-jars can read the live tables
directly.

No Iceberg or Avro libraries ship in this environment, so the Avro
object-container files are written by a from-scratch encoder
(:func:`write_avro_ocf`) that implements the subset of the Avro 1.11
spec the Iceberg manifest schemas need (records, unions with null,
string/int/long, arrays, empty records).  Tests decode the output with
the *bundled, independent* Apache Avro **Java** implementation
(``avro-1.12.1.jar`` inside PySpark) via py4j, so spec compliance is
checked against a third-party decoder, not this encoder's own reader.
DuckDB's ``iceberg_scan`` itself cannot run here (extension download
needs network — documented environment boundary); the test instead
walks metadata.json → manifest list → manifests with the Java decoder
and reads the listed parquet through DuckDB.

Scale: the export is **incremental** — every catalog JSON manifest maps
1:1 to an immutable Avro twin (cached by name), so exporting after a
seal costs O(newly added files), not O(table).  At 100 TB / 400k files
that is the difference between re-rendering 400k manifest entries per
seal and rendering one new manifest.
"""

from __future__ import annotations

import json
import os
import struct
import time
import uuid
from pathlib import Path
from typing import Any

from pyspark.sql import types as T

from duckdb_otlp_spark.catalog import FileEntry, SnapshotCatalog

# ---------------------------------------------------------------------------
# Minimal Avro binary encoder + object container file writer (Avro spec
# https://avro.apache.org/docs/1.11.1/specification/ — public).
# ---------------------------------------------------------------------------

_MAGIC = b"Obj\x01"


def _zigzag(n: int) -> bytes:
    """Avro long/int: zigzag then base-128 varint, little-endian groups."""
    u = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_bytes(b: bytes) -> bytes:
    return _zigzag(len(b)) + b


def _enc_str(s: str) -> bytes:
    return _enc_bytes(s.encode("utf-8"))


def _encode(schema: Any, value: Any) -> bytes:
    """Encode ``value`` per an (already-parsed) Avro schema fragment."""
    if isinstance(schema, list):  # union: branch index, then value
        for i, branch in enumerate(schema):
            tag = branch if isinstance(branch, str) else branch.get("type")
            if value is None and tag == "null":
                return _zigzag(i)
            if value is not None and tag != "null":
                return _zigzag(i) + _encode(branch, value)
        raise ValueError(f"no union branch for {value!r} in {schema!r}")
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            out = bytearray()
            for f in schema["fields"]:
                out += _encode(f["type"], value.get(f["name"]))
            return bytes(out)
        if t == "array":
            if not value:
                return _zigzag(0)
            out = bytearray(_zigzag(len(value)))
            for item in value:
                out += _encode(schema["items"], item)
            out += _zigzag(0)
            return bytes(out)
        if t == "map":
            if not value:
                return _zigzag(0)
            out = bytearray(_zigzag(len(value)))
            for k, v in value.items():
                out += _enc_str(k) + _encode(schema["values"], v)
            out += _zigzag(0)
            return bytes(out)
        t_name = t  # {"type": "string"} primitive-in-dict form
        schema = t_name
    if schema == "null":
        return b""
    if schema in ("long", "int"):
        return _zigzag(int(value))
    if schema == "string":
        return _enc_str(value)
    if schema == "bytes":
        return _enc_bytes(value)
    if schema == "boolean":
        return b"\x01" if value else b"\x00"
    if schema == "double":
        return struct.pack("<d", value)
    if schema == "float":
        return struct.pack("<f", value)
    raise ValueError(f"unsupported avro type {schema!r}")


def write_avro_ocf(path: Path, schema: dict[str, Any],
                   records: list[dict[str, Any]],
                   metadata: dict[str, str] | None = None) -> None:
    """Write an Avro object container file (null codec, one block)."""
    meta = {"avro.schema": json.dumps(schema, separators=(",", ":")),
            "avro.codec": "null"}
    meta.update(metadata or {})
    sync = os.urandom(16)
    body = b"".join(_encode(schema, r) for r in records)
    buf = bytearray(_MAGIC)
    buf += _zigzag(len(meta))
    for k, v in meta.items():
        buf += _enc_str(k) + _enc_bytes(v.encode("utf-8"))
    buf += _zigzag(0)       # end of metadata map
    buf += sync
    if records:
        buf += _zigzag(len(records)) + _zigzag(len(body)) + body + sync
    tmp = path.with_name(f"_tmp-{path.name}")
    tmp.write_bytes(bytes(buf))
    tmp.rename(path)


# ---------------------------------------------------------------------------
# Spark schema -> Iceberg schema (field-ids assigned depth-first, like
# Iceberg's own fresh-schema assignment)
# ---------------------------------------------------------------------------

def spark_to_iceberg_schema(schema: T.StructType) -> tuple[dict[str, Any], int]:
    """Returns (iceberg struct schema dict, last assigned column id)."""
    next_id = [0]

    def fresh() -> int:
        next_id[0] += 1
        return next_id[0]

    def conv(dt: T.DataType) -> Any:
        if isinstance(dt, T.StructType):
            fields = []
            for f in dt.fields:
                fid = fresh()
                fields.append({"id": fid, "name": f.name,
                               "required": False, "type": conv(f.dataType)})
            return {"type": "struct", "fields": fields}
        if isinstance(dt, T.ArrayType):
            eid = fresh()
            return {"type": "list", "element-id": eid,
                    "element": conv(dt.elementType), "element-required": False}
        if isinstance(dt, T.MapType):
            kid, vid = fresh(), fresh()
            return {"type": "map", "key-id": kid, "key": conv(dt.keyType),
                    "value-id": vid, "value": conv(dt.valueType),
                    "value-required": False}
        simple = {
            T.StringType: "string", T.LongType: "long", T.IntegerType: "int",
            T.ShortType: "int", T.ByteType: "int", T.DoubleType: "double",
            T.FloatType: "float", T.BooleanType: "boolean",
            T.BinaryType: "binary", T.DateType: "date",
            T.TimestampNTZType: "timestamp", T.TimestampType: "timestamptz",
        }
        for cls, name in simple.items():
            if isinstance(dt, cls):
                return name
        raise ValueError(f"no iceberg mapping for spark type {dt}")

    out = conv(schema)
    out["schema-id"] = 0
    return out, next_id[0]


# ---------------------------------------------------------------------------
# Iceberg v1 manifest schemas (field-ids per the public Iceberg table
# spec, "Manifests" / "Manifest Lists" tables).
# ---------------------------------------------------------------------------

def _f(name: str, typ: Any, fid: int, optional: bool = False) -> dict[str, Any]:
    t = ["null", typ] if optional else typ
    d = {"name": name, "type": t, "field-id": fid}
    if optional:
        d["default"] = None
    return d


_PARTITION_RECORD = {  # unpartitioned: empty record (spec-id 0, no fields)
    "type": "record", "name": "r102", "fields": []}

_DATA_FILE_SCHEMA = {
    "type": "record", "name": "r2", "fields": [
        _f("file_path", "string", 100),
        _f("file_format", "string", 101),
        {"name": "partition", "type": _PARTITION_RECORD, "field-id": 102},
        _f("record_count", "long", 103),
        _f("file_size_in_bytes", "long", 104),
        _f("block_size_in_bytes", "long", 105),
    ]}

MANIFEST_ENTRY_SCHEMA = {
    "type": "record", "name": "manifest_entry", "fields": [
        _f("status", "int", 0),
        _f("snapshot_id", "long", 1),
        {"name": "data_file", "type": _DATA_FILE_SCHEMA, "field-id": 2},
    ]}

MANIFEST_FILE_SCHEMA = {
    "type": "record", "name": "manifest_file", "fields": [
        _f("manifest_path", "string", 500),
        _f("manifest_length", "long", 501),
        _f("partition_spec_id", "int", 502),
        _f("added_snapshot_id", "long", 503),
        _f("added_data_files_count", "int", 504, optional=True),
        _f("existing_data_files_count", "int", 505, optional=True),
        _f("deleted_data_files_count", "int", 506, optional=True),
        _f("added_rows_count", "long", 512, optional=True),
        _f("existing_rows_count", "long", 513, optional=True),
        _f("deleted_rows_count", "long", 514, optional=True),
    ]}


# ---------------------------------------------------------------------------
# Exporter
# ---------------------------------------------------------------------------

class IcebergExporter:
    """Renders a :class:`SnapshotCatalog` table as an Iceberg v1 table.

    Layout (inside the catalog root, beside the data the manifests
    reference — data files are shared, never copied)::

        <root>/<table>/metadata/v<N>.metadata.json
        <root>/<table>/metadata/version-hint.text
        <root>/<table>/metadata/snap-<id>-*.avro      (manifest list)
        <root>/<table>/metadata/<catalog-manifest>.avro  (1:1 twins)
    """

    def __init__(self, catalog: SnapshotCatalog):
        self.catalog = catalog

    def _meta_dir(self, table: str) -> Path:
        d = self.catalog.root / table / "metadata"
        d.mkdir(parents=True, exist_ok=True)
        return d

    def _manifest_avro(self, table: str, name: str, snapshot_id: int,
                       entries: list[FileEntry]) -> tuple[Path, int]:
        """The Avro twin of catalog manifest ``name`` (immutable; written
        once, reused by every later export — the incremental property)."""
        meta_dir = self._meta_dir(table)
        path = meta_dir / f"{Path(name).stem}.avro"
        if not path.exists():
            records = [{
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "data_file": {
                    "file_path": str(self.catalog.root / e.path),
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": e.rows,
                    "file_size_in_bytes": e.bytes,
                    "block_size_in_bytes": 64 * 1024 * 1024,
                },
            } for e in entries]
            part_spec = {"spec-id": 0, "fields": []}
            write_avro_ocf(path, MANIFEST_ENTRY_SCHEMA, records, metadata={
                "format-version": "1",
                "content": "data",
                "partition-spec": json.dumps(part_spec["fields"]),
                "partition-spec-id": "0",
            })
        return path, path.stat().st_size

    def export_table(self, table: str) -> Path | None:
        """Render the CURRENT catalog snapshot of ``table``; returns the
        metadata dir (None when the table does not exist yet)."""
        snap = self.catalog.snapshot()
        tbl = snap["tables"].get(table)
        if tbl is None:
            return None
        schema = self.catalog.table_schema(table)
        if schema is None:
            return None
        meta_dir = self._meta_dir(table)
        snapshot_id = snap["sequence"]

        rows = files = 0
        manifest_records = []
        for m in tbl["manifests"]:
            entries = self.catalog._read_manifest(m)
            path, length = self._manifest_avro(table, m, snapshot_id, entries)
            n_rows = sum(e.rows for e in entries)
            rows += n_rows
            files += len(entries)
            manifest_records.append({
                "manifest_path": str(path),
                "manifest_length": length,
                "partition_spec_id": 0,
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": len(entries),
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
                "added_rows_count": n_rows,
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            })

        list_path = meta_dir / f"snap-{snapshot_id}-{uuid.uuid4().hex}.avro"
        write_avro_ocf(list_path, MANIFEST_FILE_SCHEMA, manifest_records,
                       metadata={"format-version": "1"})

        ice_schema, last_col = spark_to_iceberg_schema(schema)
        now_ms = int(time.time() * 1000)
        snapshot = {
            "snapshot-id": snapshot_id,
            "timestamp-ms": now_ms,
            "summary": {"operation": "append",
                        "added-data-files": str(files),
                        "added-records": str(rows),
                        "total-records": str(rows),
                        "total-data-files": str(files)},
            "manifest-list": str(list_path),
            "schema-id": 0,
        }
        version = self._next_version(meta_dir)
        metadata = {
            "format-version": 1,
            "table-uuid": self._table_uuid(meta_dir),
            "location": str(self.catalog.root / table),
            "last-updated-ms": now_ms,
            "last-column-id": last_col,
            "schema": ice_schema,
            "schemas": [ice_schema],
            "current-schema-id": 0,
            "partition-spec": [],
            "partition-specs": [{"spec-id": 0, "fields": []}],
            "default-spec-id": 0,
            "last-partition-id": 999,
            "default-sort-order-id": 0,
            "sort-orders": [{"order-id": 0, "fields": []}],
            "properties": {"write.format.default": "parquet"},
            "current-snapshot-id": snapshot_id,
            "snapshots": [snapshot],
            "snapshot-log": [{"snapshot-id": snapshot_id,
                              "timestamp-ms": now_ms}],
            "metadata-log": [],
        }
        meta_path = meta_dir / f"v{version}.metadata.json"
        tmp = meta_dir / f"_tmp-{meta_path.name}"
        tmp.write_text(json.dumps(metadata, indent=1))
        tmp.rename(meta_path)
        hint = meta_dir / "version-hint.text"
        tmp = meta_dir / "_tmp-version-hint.text"
        tmp.write_text(str(version))
        tmp.rename(hint)
        return meta_dir

    def export_all(self) -> dict[str, Path]:
        out: dict[str, Path] = {}
        for table in self.catalog.snapshot()["tables"]:
            p = self.export_table(table)
            if p is not None:
                out[table] = p
        return out

    @staticmethod
    def _next_version(meta_dir: Path) -> int:
        best = 0
        for p in meta_dir.glob("v*.metadata.json"):
            try:
                best = max(best, int(p.name[1:].split(".")[0]))
            except ValueError:
                continue
        return best + 1

    @staticmethod
    def _table_uuid(meta_dir: Path) -> str:
        """Stable per-table uuid, persisted next to the metadata."""
        p = meta_dir / "table-uuid.text"
        if p.exists():
            return p.read_text().strip()
        u = str(uuid.uuid4())
        p.write_text(u)
        return u
