"""Layout maintenance for the partitioned parquet export tree.

The reference runs two tiers (reference: src/otlp_server.cpp:1273-1387;
benchmark/otlp-compaction-probe/README.md:16-91):

1. **Bounded merge** — post-seal ``CHECKPOINT`` with ``target_file_size``
   merges adjacent small files, O(new) per cycle because at-target files
   are skipped. Here: per (table, y/m/d) partition, merge only when the
   partition holds more than one under-target file, rewriting just those
   files — partitions already at target are untouched.
2. **Sort-cluster + bloom rewrite** — the probe measured ~3.2x on
   single-service queries from (service, time) clustering and ~8x fewer
   bytes from a trace_id bloom filter, but pinned DuckDB could not write
   blooms (otlp-compaction-probe/README.md:16-41). Spark's parquet
   writer can: ``parquet.bloom.filter.enabled#<col>`` — so tier 2 ships
   here as a sorted rewrite with bloom filters on the id columns.
   Note parquet-mr only materializes the bloom once the column falls
   back from dictionary encoding — i.e. precisely the high-cardinality
   id columns the filter is for; low-cardinality columns keep their
   dictionary (exact membership) and skip the bloom bytes.

Retention mirrors ``maintenance_retention_ms``: whole y/m/d partition
directories older than the cutoff are dropped (partition pruning makes
the cutoff a directory comparison, no data read).

All rewrites go through a temp directory + atomic rename per partition,
preserving the at-least-once read contract of the export tree (a reader
sees either the old files or the new ones, never a partial mix).
"""

from __future__ import annotations

import shutil
import uuid
from dataclasses import dataclass, field
from datetime import date, timedelta
from pathlib import Path

from pyspark.sql import SparkSession

DEFAULT_TARGET_FILE_BYTES = 256 * 1024 * 1024  # reference: serve.md target_file_size

# Below this total, a merge batch is driver-side pyarrow instead of a
# Spark job: scheduling a distributed job over a few MB of tiny files
# costs ~500 ms of fixed overhead for ~10 ms of IO (the reference's
# native merge does 80 files in 150-250 ms — BASELINE.md). At 100 TB
# the threshold routes real partitions through Spark and only the
# pathological many-tiny-files case (exactly what post-seal compaction
# exists to fix) through the fast path, one leaf at a time.
PYARROW_MERGE_MAX_BYTES = 64 * 1024 * 1024

# reference's tier-2 cluster keys per signal (otlp-compaction-probe/README.md:63-69)
SORT_KEYS = {
    "otlp_traces": ("service_name", "start_time_unix_nano"),
    "otlp_logs": ("service_name", "time_unix_nano"),
}
BLOOM_COLS = {
    "otlp_traces": ("trace_id",),
    "otlp_logs": ("trace_id",),
}


@dataclass
class CompactionResult:
    table: str
    partitions_examined: int = 0
    partitions_compacted: int = 0
    files_before: int = 0
    files_after: int = 0
    partitions_expired: int = 0
    details: list[str] = field(default_factory=list)


def _leaf_partitions(table_root: Path) -> list[Path]:
    """year=Y/month=M/day=D leaf dirs (or the root itself if unpartitioned)."""
    leaves = [d for d in table_root.glob("year=*/month=*/day=*") if d.is_dir()]
    if leaves:
        return sorted(leaves)
    return [table_root] if any(table_root.glob("*.parquet")) else []


def _data_files(part: Path) -> list[Path]:
    return sorted(p for p in part.glob("*.parquet") if p.is_file())


def _swap_in(spark: SparkSession, df, part: Path, old_files: list[Path],
             compression: str, sort_cols=(), bloom_cols=()) -> int:
    """Write df into ``part`` replacing ``old_files``; returns new file count.

    The rewrite lands in a temp dir first; new files are renamed in
    BEFORE the old ones are unlinked, so a concurrent reader can briefly
    see duplicated rows but never missing ones — the same at-least-once
    direction as the reference's export contract
    (reference: otlp_server.cpp:963-1107)."""
    tmp = part / f"_compact_{uuid.uuid4().hex}"
    if sort_cols:
        df = df.sortWithinPartitions(*sort_cols)
    writer = df.write.mode("overwrite").option("compression", compression)
    for c in bloom_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
    writer.parquet(str(tmp))
    new_files = sorted(p for p in tmp.glob("*.parquet"))
    n = 0
    for nf in new_files:
        nf.rename(part / f"compact_{uuid.uuid4().hex}.parquet")
        n += 1
    for old in old_files:
        old.unlink()
    shutil.rmtree(tmp, ignore_errors=True)
    return n


def _merge_small_pyarrow(part: Path, small: list[Path],
                         compression: str) -> int:
    """Driver-side merge of one tiny-file batch into one file. Same
    swap discipline as _swap_in: the merged file lands under a temp
    name and renames in before the originals unlink (at-least-once
    for concurrent readers)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = part / f"_compact_{uuid.uuid4().hex}.tmp"
    try:
        merged = pa.concat_tables([pq.read_table(str(f)) for f in small])
        pq.write_table(merged, str(tmp), compression=compression)
    except Exception:
        tmp.unlink(missing_ok=True)
        raise
    tmp.rename(part / f"compact_{uuid.uuid4().hex}.parquet")
    for old in small:
        old.unlink()
    return 1


def compact_table(spark: SparkSession, export_root: str | Path, table: str,
                  target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
                  compression: str = "zstd") -> CompactionResult:
    """Tier-1 bounded merge: per leaf partition, coalesce files under
    target/2 into ~target-size outputs. Files above target/2 are
    permanently GRADUATED — never re-selected — so a steady-state
    partition costs nothing to re-examine (O(new) per cycle, reference:
    otlp-compaction-probe/README.md:44-48). The graduation threshold
    means steady-state files settle in (target/2, target]; the table may
    carry up to ~2x the ideal file count in exchange for never rewriting
    a file twice (see the selection comment below for the rationale).

    Merge batches whose TOTAL is under PYARROW_MERGE_MAX_BYTES skip
    Spark entirely (see the constant's comment) — that's the common
    post-seal shape and the one the reference's 150-250 ms probe
    number measures."""
    root = Path(export_root) / table
    res = CompactionResult(table=table)
    if not root.exists():
        return res
    for part in _leaf_partitions(root):
        res.partitions_examined += 1
        files = _data_files(part)
        # graduation threshold target/2, NOT target: an output lands
        # anywhere in (target/2, target] and must never be re-selected,
        # or every cycle re-merges the partition's entire accumulated
        # data — O(table) per cycle instead of O(new). On the live
        # server that unbounded rewrite runs concurrently with seals,
        # starves them of executor threads, and backs admission up to
        # its 512 MiB cap (503 storms ~3 minutes into a 175k logs/s
        # run). Files under target/2 still merge, so steady state per
        # cycle is the new seals plus at most one sub-half residual.
        small = [f for f in files
                 if f.stat().st_size < target_file_bytes // 2]
        if len(small) < 2:
            continue
        total = sum(f.stat().st_size for f in small)
        res.files_before += len(files)
        n_new = None
        if total <= PYARROW_MERGE_MAX_BYTES:
            try:
                n_new = _merge_small_pyarrow(part, small, compression)
            except Exception:  # noqa: BLE001
                # concat_tables needs byte-identical Arrow schemas; a
                # leaf mixing files from before/after a promoted-column
                # config change (or prior Spark-written files with a
                # different field layout) falls back to the Spark merge,
                # which schema-merges instead of crashing the cycle
                n_new = None
        if n_new is None:
            n_out = max(1, total // target_file_bytes
                        + (1 if total % target_file_bytes else 0))
            # mergeSchema: without it the reader picks ONE file's schema
            # and silently drops columns the other files carry (e.g. a
            # promoted column added between seals)
            df = (spark.read.option("mergeSchema", "true")
                  .parquet(*[str(f) for f in small])
                  .coalesce(int(n_out)))
            n_new = _swap_in(spark, df, part, small, compression)
        res.files_after += len(files) - len(small) + n_new
        res.partitions_compacted += 1
        res.details.append(f"{part.relative_to(root)}: {len(small)} -> {n_new}")
    return res


def rewrite_clustered(spark: SparkSession, export_root: str | Path, table: str,
                      sort_cols: tuple[str, ...] | None = None,
                      bloom_cols: tuple[str, ...] | None = None,
                      compression: str = "zstd") -> CompactionResult:
    """Tier-2 layout rewrite: re-sort every leaf partition by the cluster
    keys and write parquet bloom filters on the id columns — the two
    levers the reference's probe measured (~3.2x scan cut from
    clustering, ~8x byte cut from blooms) but could not ship natively."""
    if sort_cols is None:
        sort_cols = SORT_KEYS.get(table, ())
    if bloom_cols is None:
        bloom_cols = BLOOM_COLS.get(table, ())
    root = Path(export_root) / table
    res = CompactionResult(table=table)
    if not root.exists():
        return res
    for part in _leaf_partitions(root):
        res.partitions_examined += 1
        files = _data_files(part)
        if not files:
            continue
        df = spark.read.parquet(*[str(f) for f in files]).coalesce(1)
        res.files_before += len(files)
        n_new = _swap_in(spark, df, part, files, compression,
                         sort_cols=sort_cols, bloom_cols=bloom_cols)
        res.files_after += n_new
        res.partitions_compacted += 1
    return res


def expire_partitions(export_root: str | Path, table: str,
                      older_than_days: int, today: date | None = None) -> CompactionResult:
    """Retention: drop whole y/m/d partition directories older than the
    cutoff (reference: maintenance_retention_ms / DuckLake
    expire_older_than, otlp_server.cpp:53-58)."""
    root = Path(export_root) / table
    res = CompactionResult(table=table)
    if not root.exists():
        return res
    cutoff = (today or date.today()) - timedelta(days=older_than_days)
    for part in _leaf_partitions(root):
        res.partitions_examined += 1
        try:
            parts = dict(seg.split("=") for seg in part.relative_to(root).parts)
            d = date(int(parts["year"]), int(parts["month"]), int(parts["day"]))
        except (ValueError, KeyError):
            continue
        if d < cutoff:
            shutil.rmtree(part)
            res.partitions_expired += 1
            res.details.append(str(part.relative_to(root)))
    # prune now-empty month/year dirs
    for sub in sorted(root.glob("year=*/month=*"), reverse=True):
        if sub.is_dir() and not any(sub.iterdir()):
            sub.rmdir()
    for sub in sorted(root.glob("year=*"), reverse=True):
        if sub.is_dir() and not any(sub.iterdir()):
            sub.rmdir()
    return res
