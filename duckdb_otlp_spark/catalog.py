"""Transactional snapshot catalog: all-or-nothing multi-table commits
over parquet — the Spark-side analog of the reference's DuckLake/Iceberg
catalog sink (``SealCatalog``, reference: src/otlp_server.cpp:1109-1271;
serve.md:199-213).

No Delta/Iceberg jars are assumed (none ship in this environment), so
the catalog is self-contained: an append-only log of JSON *snapshot*
files, each enumerating — via immutable *manifest* files — exactly the
parquet data files live in every table. One atomic rename publishes a
snapshot, which gives the reference's catalog-mode guarantees:

- a seal is **all-or-nothing across every table it touches**: the
  metrics fan-out lands in up to four shape tables in ONE commit, the
  same ``BEGIN … append per signal … COMMIT`` contract as the
  reference (otlp_server.cpp:1176-1259);
- writers stage data files first, commit last — a crash leaves only
  unreferenced files (reclaimed by ``vacuum``), never a partial table;
- readers plan from the manifest, never from directory listing, so
  they get **snapshot isolation** and time travel (pin a snapshot id)
  for free;
- per-file min/max column stats in the manifest give planning-time
  **file pruning** (the catalog analog of DuckLake partition pruning /
  parquet zone maps, performance.md:11-68) before Spark ever lists or
  opens a file.

Scale design (100 TB / ~256 MiB files ≈ 400k live files):

- commits are **O(new files)**, not O(table): an append writes one new
  manifest and re-links the parent's manifests by name (the Iceberg
  manifest-list idea). Only compaction/expiry rewrites manifests, and
  only for the table it touches.
- concurrency is optimistic, like DuckLake (architecture.md:110-113):
  the commit publishes ``snap-<seq+1>.json`` via an exclusive
  hard-link; losing a race raises ``FileExistsError`` and the commit
  replays against the new parent. No writer mutex needed.
- reads of one table never parse other tables' manifests, and
  manifests are immutable so their parsed form is cached per process.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from pathlib import Path
from typing import Any, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_EPOCH = datetime(1970, 1, 1)
_FORMAT_VERSION = 1
_SNAP_PREFIX = "snap-"
_COMMIT_RETRIES = 20

# columns whose per-file min/max are recorded in the manifest; pruning
# keys follow the reference's probe findings: time range + service
# (otlp-compaction-probe/README.md:16-25)
DEFAULT_STATS_COLS = ("time_unix_nano", "start_time_unix_nano", "service_name")


class CommitConflict(RuntimeError):
    """A concurrent commit removed files this commit also removes."""


def _ts_to_us(v: Any) -> int:
    """Exact µs-since-epoch for a naive datetime (integer arithmetic —
    float seconds would round above 2**53 µs)."""
    return (v - _EPOCH) // timedelta(microseconds=1)


def _us_bound(v: Any) -> int:
    """Normalize a pruning bound (datetime | int µs) to int µs."""
    return _ts_to_us(v) if isinstance(v, datetime) else int(v)


@dataclass
class FileEntry:
    path: str          # relative to catalog root
    rows: int
    bytes: int
    # col -> [min, max]; timestamps as int µs, strings as-is
    stats: dict[str, list[Any]] = field(default_factory=dict)

    def to_json(self) -> dict[str, Any]:
        return {"path": self.path, "rows": self.rows, "bytes": self.bytes,
                "stats": self.stats}

    @classmethod
    def from_json(cls, d: dict[str, Any]) -> "FileEntry":
        return cls(d["path"], d["rows"], d["bytes"], d.get("stats", {}))


def _footer_entry(abs_path: Path, rel_path: str,
                  stats_cols: Iterable[str]) -> FileEntry:
    """Build a FileEntry from the parquet footer (no data read)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(str(abs_path)).metadata
    wanted = set(stats_cols)
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    for rg in range(md.num_row_groups):
        row_group = md.row_group(rg)
        for ci in range(row_group.num_columns):
            col = row_group.column(ci)
            name = col.path_in_schema
            st = col.statistics
            if name not in wanted or st is None or not st.has_min_max:
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, datetime):
                lo, hi = _ts_to_us(lo), _ts_to_us(hi)
            elif isinstance(lo, bytes):
                try:
                    lo, hi = lo.decode(), hi.decode()
                except UnicodeDecodeError:
                    continue
            if name not in mins or lo < mins[name]:
                mins[name] = lo
            if name not in maxs or hi > maxs[name]:
                maxs[name] = hi
    stats = {c: [mins[c], maxs[c]] for c in mins if c in maxs}
    return FileEntry(rel_path, md.num_rows, abs_path.stat().st_size, stats)


class SnapshotCatalog:
    """One catalog rooted at a directory; any number of tables inside."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.meta_dir = self.root / "_catalog"
        self.meta_dir.mkdir(parents=True, exist_ok=True)
        self._manifest_cache: dict[str, list[FileEntry]] = {}

    # ---- snapshot log ----------------------------------------------------

    def _snap_path(self, seq: int) -> Path:
        return self.meta_dir / f"{_SNAP_PREFIX}{seq:010d}.json"

    def current_snapshot_id(self) -> int:
        """0 = empty catalog."""
        best = 0
        for p in self.meta_dir.glob(f"{_SNAP_PREFIX}*.json"):
            try:
                best = max(best, int(p.stem[len(_SNAP_PREFIX):]))
            except ValueError:
                continue
        return best

    def snapshot(self, snapshot_id: int | None = None) -> dict[str, Any]:
        seq = self.current_snapshot_id() if snapshot_id is None else snapshot_id
        if seq == 0:
            return {"format_version": _FORMAT_VERSION, "sequence": 0,
                    "parent": None, "unix_ms": 0, "operation": "empty",
                    "tables": {}}
        return json.loads(self._snap_path(seq).read_text())

    def snapshots(self) -> list[dict[str, Any]]:
        out = []
        for p in sorted(self.meta_dir.glob(f"{_SNAP_PREFIX}*.json")):
            out.append(json.loads(p.read_text()))
        return out

    # ---- manifests -------------------------------------------------------

    def _write_manifest(self, table: str, entries: list[FileEntry]) -> str:
        name = f"m-{uuid.uuid4().hex}.json"
        tmp = self.meta_dir / f"_tmp-{name}"
        tmp.write_text(json.dumps(
            {"table": table, "entries": [e.to_json() for e in entries]},
            separators=(",", ":")))
        tmp.rename(self.meta_dir / name)
        self._manifest_cache[name] = entries
        return name

    def _read_manifest(self, name: str) -> list[FileEntry]:
        if name not in self._manifest_cache:
            doc = json.loads((self.meta_dir / name).read_text())
            self._manifest_cache[name] = [
                FileEntry.from_json(e) for e in doc["entries"]]
        return self._manifest_cache[name]

    def table_files(self, table: str,
                    snapshot_id: int | None = None) -> list[FileEntry]:
        snap = self.snapshot(snapshot_id)
        tbl = snap["tables"].get(table)
        if not tbl:
            return []
        out: list[FileEntry] = []
        for m in tbl["manifests"]:
            out.extend(self._read_manifest(m))
        return out

    def table_schema(self, table: str,
                     snapshot_id: int | None = None) -> T.StructType | None:
        tbl = self.snapshot(snapshot_id)["tables"].get(table)
        if not tbl or not tbl.get("schema"):
            return None
        return T.StructType.fromJson(json.loads(tbl["schema"]))

    # ---- staging ---------------------------------------------------------

    def stage_dataframe(self, df: DataFrame, table: str, *,
                        sort_cols: tuple[str, ...] = (),
                        bloom_cols: tuple[str, ...] = (),
                        compression: str = "zstd",
                        stats_cols: Iterable[str] = DEFAULT_STATS_COLS,
                        ) -> list[FileEntry]:
        """Write ``df`` as parquet data files for ``table`` WITHOUT
        committing them. Returns manifest entries for a later
        :meth:`commit` — the staging half of the reference's
        ``StageCollectionToTempTable`` (otlp_server.cpp:952-961).

        Files land under ``<root>/<table>/data/`` with unique names;
        until a snapshot references them they are invisible to readers
        and reclaimable by :meth:`vacuum`. Sorting before write keeps
        per-file min/max tight, which is what makes manifest pruning
        effective (the tier-2 clustering lever,
        otlp-compaction-probe/README.md:63-69)."""
        data_dir = self.root / table / "data"
        data_dir.mkdir(parents=True, exist_ok=True)
        stage = self.root / table / f"_stage-{uuid.uuid4().hex}"
        if sort_cols:
            present = [c for c in sort_cols if c in df.columns]
            if present:
                df = df.sortWithinPartitions(*present)
        writer = df.write.mode("overwrite").option("compression", compression)
        for c in bloom_cols:
            writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
        writer.parquet(str(stage))
        entries: list[FileEntry] = []
        try:
            present_stats = [c for c in stats_cols if c in df.columns]
            for f in sorted(stage.glob("*.parquet")):
                rel = f"{table}/data/part-{uuid.uuid4().hex}.parquet"
                dst = self.root / rel
                f.rename(dst)
                e = _footer_entry(dst, rel, present_stats)
                if e.rows == 0:  # empty task output: drop, don't track
                    dst.unlink()
                    continue
                entries.append(e)
        finally:
            shutil.rmtree(stage, ignore_errors=True)
        return entries

    # ---- commit ----------------------------------------------------------

    def commit(self,
               add: dict[str, list[FileEntry]] | None = None,
               remove: dict[str, Iterable[str]] | None = None,
               schemas: dict[str, str] | None = None,
               operation: str = "append") -> int:
        """Publish one snapshot adding/removing files across any number
        of tables atomically. Returns the new snapshot id.

        Optimistic-concurrency loop: build against the current
        snapshot, publish via exclusive hard-link; if another writer
        won the sequence number, replay. A remove of a path the new
        parent no longer lists raises :class:`CommitConflict`
        (compaction racing compaction), mirroring DuckLake conflicts
        the reference documents (architecture.md:110-113)."""
        add = add or {}
        remove = {t: set(v) for t, v in (remove or {}).items()}
        schemas = schemas or {}
        if not add and not remove and not schemas:
            return self.current_snapshot_id()
        for _ in range(_COMMIT_RETRIES):
            parent = self.snapshot()
            tables: dict[str, Any] = {
                t: {"schema": v.get("schema"), "manifests": list(v["manifests"])}
                for t, v in parent["tables"].items()}
            for t, gone in remove.items():
                if t not in tables:
                    raise CommitConflict(f"remove from unknown table {t}")
                kept_manifests: list[str] = []
                seen: set[str] = set()
                for m in tables[t]["manifests"]:
                    entries = self._read_manifest(m)
                    hit = [e for e in entries if e.path in gone]
                    if not hit:
                        kept_manifests.append(m)
                        continue
                    seen.update(e.path for e in hit)
                    kept = [e for e in entries if e.path not in gone]
                    if kept:
                        kept_manifests.append(self._write_manifest(t, kept))
                missing = gone - seen
                if missing:
                    raise CommitConflict(
                        f"files no longer in table {t}: {sorted(missing)[:3]}")
                tables[t]["manifests"] = kept_manifests
            for t, entries in add.items():
                if not entries:
                    continue
                tbl = tables.setdefault(t, {"schema": None, "manifests": []})
                tbl["manifests"].append(self._write_manifest(t, entries))
            for t, schema_json in schemas.items():
                tbl = tables.setdefault(t, {"schema": None, "manifests": []})
                tbl["schema"] = schema_json
            seq = parent["sequence"] + 1
            snap = {"format_version": _FORMAT_VERSION, "sequence": seq,
                    "parent": parent["sequence"] or None,
                    "unix_ms": int(time.time() * 1000),
                    "operation": operation, "tables": tables}
            tmp = self.meta_dir / f"_tmp-snap-{uuid.uuid4().hex}.json"
            tmp.write_text(json.dumps(snap, separators=(",", ":")))
            try:
                os.link(tmp, self._snap_path(seq))  # atomic publish
                return seq
            except FileExistsError:
                continue  # lost the race; replay against new parent
            finally:
                tmp.unlink(missing_ok=True)
        raise RuntimeError(f"commit failed after {_COMMIT_RETRIES} retries")

    # ---- read path -------------------------------------------------------

    def read_table(self, spark: SparkSession, table: str, *,
                   snapshot_id: int | None = None,
                   time_range: tuple[Any, Any] | None = None,
                   time_col: str = "time_unix_nano",
                   equals: dict[str, Any] | None = None) -> DataFrame:
        """Plan a scan from the manifest. ``time_range``/``equals``
        prune files driver-side from manifest stats BEFORE Spark lists
        anything — at 100 TB this is the difference between opening
        400k footers and opening the ~N files that can match. The same
        predicates still need to be (and are) applied by the query;
        pruning only narrows the file set, exactly like partition
        pruning."""
        entries = self.table_files(table, snapshot_id)
        schema = self.table_schema(table, snapshot_id)
        if time_range is not None:
            lo = _us_bound(time_range[0])
            hi = _us_bound(time_range[1])
            entries = [e for e in entries
                       if self._overlaps(e.stats.get(time_col), lo, hi)]
        for col, v in (equals or {}).items():
            entries = [e for e in entries
                       if self._contains(e.stats.get(col), v)]
        if schema is None:
            schema = T.StructType([])
        if not entries:
            return spark.createDataFrame([], schema=schema)
        paths = [str(self.root / e.path) for e in entries]
        return spark.read.schema(schema).parquet(*paths)

    @staticmethod
    def _overlaps(stat: list[Any] | None, lo: Any, hi: Any) -> bool:
        if not stat:
            return True  # no stats -> cannot prune
        return not (stat[1] < lo or stat[0] > hi)

    @staticmethod
    def _contains(stat: list[Any] | None, v: Any) -> bool:
        if not stat:
            return True
        return stat[0] <= v <= stat[1]

    # ---- maintenance -----------------------------------------------------

    def compact(self, spark: SparkSession, table: str, *,
                target_file_bytes: int = 256 * 1024 * 1024,
                sort_cols: tuple[str, ...] = (),
                bloom_cols: tuple[str, ...] = (),
                compression: str = "zstd") -> dict[str, int]:
        """Merge under-target files into ~target-size files and publish
        the swap as ONE snapshot (readers see old files or new files,
        never both) — tier-1 bounded merge with snapshot isolation the
        parquet-export tree can't give (reference: CHECKPOINT +
        target_file_size, otlp_server.cpp:1273-1387). At-target files
        are untouched, so steady-state cost is O(new small files)."""
        entries = self.table_files(table)
        small = [e for e in entries if e.bytes < target_file_bytes]
        if len(small) < 2:
            return {"files_in": 0, "files_out": 0, "snapshot": 0}
        total = sum(e.bytes for e in small)
        n_out = max(1, (total + target_file_bytes - 1) // target_file_bytes)
        df = spark.read.parquet(*[str(self.root / e.path) for e in small]) \
                       .coalesce(int(n_out))
        new_entries = self.stage_dataframe(
            df, table, sort_cols=sort_cols, bloom_cols=bloom_cols,
            compression=compression)
        seq = self.commit(add={table: new_entries},
                          remove={table: [e.path for e in small]},
                          operation="compact")
        return {"files_in": len(small), "files_out": len(new_entries),
                "snapshot": seq}

    def expire_files(self, table: str, older_than: Any, *,
                     time_col: str = "time_unix_nano") -> dict[str, int]:
        """Retention: drop whole files whose max(time) < cutoff — a
        metadata-only commit, no data read (reference:
        maintenance_retention_ms / DuckLake expire_older_than,
        otlp_server.cpp:53-58)."""
        cutoff = _us_bound(older_than)
        dead = [e for e in self.table_files(table)
                if e.stats.get(time_col) and e.stats[time_col][1] < cutoff]
        if not dead:
            return {"files_expired": 0, "snapshot": 0}
        seq = self.commit(remove={table: [e.path for e in dead]},
                          operation="expire")
        return {"files_expired": len(dead), "snapshot": seq}

    def expire_snapshots(self, keep_last: int = 100) -> int:
        """Bound the snapshot log (time travel keeps only the newest
        ``keep_last`` snapshots). Returns snapshots removed."""
        current = self.current_snapshot_id()
        n = 0
        for p in self.meta_dir.glob(f"{_SNAP_PREFIX}*.json"):
            try:
                seq = int(p.stem[len(_SNAP_PREFIX):])
            except ValueError:
                continue
            if seq <= current - keep_last:
                p.unlink()
                n += 1
        return n

    def vacuum(self, grace_seconds: float = 3600) -> dict[str, int]:
        """Delete data files and manifests referenced by NO retained
        snapshot (aborted stages, compacted-away files, expired data)
        once older than the grace period — grace prevents deleting a
        concurrent writer's not-yet-committed staging output."""
        live_files: set[str] = set()
        live_manifests: set[str] = set()
        for snap in self.snapshots():
            for t, tbl in snap["tables"].items():
                for m in tbl["manifests"]:
                    live_manifests.add(m)
                    live_files.update(e.path for e in self._read_manifest(m))
        now = time.time()
        removed_data = removed_meta = 0
        for table_dir in self.root.iterdir():
            data_dir = table_dir / "data"
            if table_dir.name.startswith("_") or not data_dir.is_dir():
                continue
            for f in data_dir.glob("*.parquet"):
                rel = str(f.relative_to(self.root))
                if rel not in live_files and now - f.stat().st_mtime > grace_seconds:
                    f.unlink()
                    removed_data += 1
        for m in self.meta_dir.glob("m-*.json"):
            if (m.name not in live_manifests
                    and now - m.stat().st_mtime > grace_seconds):
                m.unlink()
                self._manifest_cache.pop(m.name, None)
                removed_meta += 1
        return {"data_files_removed": removed_data,
                "manifests_removed": removed_meta}
