"""Local Iceberg v1 table reader — the read-back half of
``iceberg_export``: version-hint -> metadata.json -> manifest list
(Avro) -> manifests (Avro) -> live data files -> Spark DataFrame, with
version/snapshot time travel.

The Avro object-container decoder is from scratch (zigzag varints,
unions, records, arrays, maps; null + deflate codecs), mirroring the
encoder in ``iceberg_export`` — the same external-engine walk the
reference's catalog sink promises any engine can perform
(reference: site/reference/serve.md:199-213). ``iceberg_scan`` via the
DuckDB extension needs a network download (environment boundary), so
this module IS the in-repo engine for that walk; its decoding is pinned
against the independent Apache Avro Java implementation in
tests/test_iceberg_scan.py.

Scale note: the reader is driver-side METADATA work only — O(manifests
+ entries), exactly what an Iceberg engine does before planning the
scan. The data files themselves are handed to ``spark.read.parquet``
untouched, so the actual scan distributes like any parquet read
(partition pruning, pushdown, and column projection all still apply).
"""

from __future__ import annotations

import json
import struct
import zlib
from pathlib import Path
from typing import Any

_MAGIC = b"Obj\x01"


class _Buf:
    __slots__ = ("b", "i")

    def __init__(self, b: bytes):
        self.b = b
        self.i = 0

    def take(self, n: int) -> bytes:
        out = self.b[self.i:self.i + n]
        if len(out) != n:
            raise ValueError("truncated avro data")
        self.i += n
        return out


def _read_long(buf: _Buf) -> int:
    """Base-128 varint then zigzag — inverse of iceberg_export._zigzag."""
    u = shift = 0
    while True:
        byte = buf.take(1)[0]
        u |= (byte & 0x7F) << shift
        if not byte & 0x80:
            break
        shift += 7
    return (u >> 1) ^ -(u & 1)


def _read_bytes(buf: _Buf) -> bytes:
    return buf.take(_read_long(buf))


def _decode(schema: Any, buf: _Buf) -> Any:
    """Decode one value per an (already-parsed) Avro schema fragment —
    structure-directed, the inverse of iceberg_export._encode."""
    if isinstance(schema, list):            # union: branch index first
        return _decode(schema[_read_long(buf)], buf)
    if isinstance(schema, dict):
        t = schema["type"]
        if t == "record":
            return {f["name"]: _decode(f["type"], buf)
                    for f in schema["fields"]}
        if t == "array":
            out = []
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:                   # block byte-size follows
                    _read_long(buf)
                    n = -n
                out.extend(_decode(schema["items"], buf) for _ in range(n))
        if t == "map":
            out = {}
            while True:
                n = _read_long(buf)
                if n == 0:
                    return out
                if n < 0:
                    _read_long(buf)
                    n = -n
                for _ in range(n):
                    k = _read_bytes(buf).decode("utf-8")
                    out[k] = _decode(schema["values"], buf)
        schema = t                          # {"type": "string"} form
    if schema == "null":
        return None
    if schema in ("long", "int"):
        return _read_long(buf)
    if schema == "string":
        return _read_bytes(buf).decode("utf-8")
    if schema == "bytes":
        return _read_bytes(buf)
    if schema == "boolean":
        return buf.take(1) == b"\x01"
    if schema == "double":
        return struct.unpack("<d", buf.take(8))[0]
    if schema == "float":
        return struct.unpack("<f", buf.take(4))[0]
    raise ValueError(f"unsupported avro type {schema!r}")


def read_avro_ocf(path: str | Path) -> tuple[dict[str, bytes], list[dict]]:
    """Read an Avro object container file; returns (file metadata,
    decoded records). Supports the null and deflate codecs."""
    buf = _Buf(Path(path).read_bytes())
    if buf.take(4) != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_long(buf)
        if n == 0:
            break
        if n < 0:
            _read_long(buf)
            n = -n
        for _ in range(n):
            k = _read_bytes(buf).decode("utf-8")
            meta[k] = _read_bytes(buf)
    sync = buf.take(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode()
    records: list[dict] = []
    while buf.i < len(buf.b):
        count = _read_long(buf)
        block = buf.take(_read_long(buf))
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        elif codec != "null":
            raise ValueError(f"unsupported avro codec {codec!r}")
        bbuf = _Buf(block)
        records.extend(_decode(schema, bbuf) for _ in range(count))
        if buf.take(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return meta, records


# ---------------------------------------------------------------------------
# Iceberg v1 metadata walk
# ---------------------------------------------------------------------------

def load_table_metadata(meta_dir: str | Path,
                        version: int | None = None) -> dict:
    """Load v<N>.metadata.json — the version-hint's N by default."""
    meta_dir = Path(meta_dir)
    if version is None:
        version = int((meta_dir / "version-hint.text").read_text().strip())
    p = meta_dir / f"v{version}.metadata.json"
    if not p.exists():
        raise FileNotFoundError(f"no metadata version v{version} under "
                                f"{meta_dir}")
    return json.loads(p.read_text())


def _snapshot(meta_dir: Path, version: int | None,
              snapshot_id: int | None) -> dict:
    if snapshot_id is None:
        md = load_table_metadata(meta_dir, version)
        sid = md.get("current-snapshot-id")
        for s in md.get("snapshots", []):
            if s["snapshot-id"] == sid:
                return s
        # e.g. an empty table (current-snapshot-id = -1, no snapshots):
        # a descriptive error, not a bare StopIteration (r8 ADVICE)
        raise LookupError(
            f"current snapshot {sid} not found in {meta_dir} "
            f"({len(md.get('snapshots', []))} snapshot(s) present)")
    # snapshot addressing: each export writes one snapshot per metadata
    # version. With an explicit version the search is RESTRICTED to it
    # (silently widening to other versions would hand back data the
    # caller explicitly excluded); otherwise search newest-first.
    if version is not None:
        versions = [version]
    else:
        versions = sorted((int(p.name[1:].split(".")[0])
                           for p in meta_dir.glob("v*.metadata.json")),
                          reverse=True)
    for v in versions:
        md = load_table_metadata(meta_dir, v)
        for s in md["snapshots"]:
            if s["snapshot-id"] == snapshot_id:
                return s
    where = f"metadata version v{version} of " if version is not None else ""
    raise LookupError(
        f"snapshot {snapshot_id} not found in {where}{meta_dir}")


def iceberg_data_files(meta_dir: str | Path, *,
                       version: int | None = None,
                       snapshot_id: int | None = None) -> list[dict]:
    """The engine walk: snapshot -> manifest list -> manifests -> live
    data-file entries (status != DELETED). Returns the data_file dicts
    (file_path, record_count, file_size_in_bytes, ...)."""
    meta_dir = Path(meta_dir)
    snap = _snapshot(meta_dir, version, snapshot_id)
    _, manifests = read_avro_ocf(snap["manifest-list"])
    out: list[dict] = []
    for m in manifests:
        _, entries = read_avro_ocf(m["manifest_path"])
        out.extend(e["data_file"] for e in entries
                   if e["status"] != 2)     # 2 = DELETED
    return out


def read_iceberg(spark, meta_dir: str | Path, *,
                 version: int | None = None,
                 snapshot_id: int | None = None):
    """Open an exported Iceberg v1 table as a Spark DataFrame — latest
    snapshot by default, or time-travel by metadata ``version`` /
    ``snapshot_id``."""
    files = iceberg_data_files(meta_dir, version=version,
                               snapshot_id=snapshot_id)
    if not files:
        raise ValueError(f"iceberg table at {meta_dir} has no data files")
    return spark.read.parquet(*[f["file_path"] for f in files])
