"""Live-ingest engine: the ``otlp_serve`` / ``otlp_flush`` / ``otlp_stop`` /
``otlp_server_list`` / ``otlp_seal_list`` surface re-expressed on
Structured Streaming (reference: src/otlp_start_stop.cpp:41-573).

Mapping (SURVEY.md §3.2): the reference's group-commit "seal" — a single
writer thread swapping buffers on a 128 MiB / 5 s trigger — becomes a
micro-batch: ``readStream`` tails the receiver's spool directory,
``foreachBatch`` parses + flattens with the exact file-reader plan and
appends to the six signal tables; the micro-batch transaction is the
seal. ``otlp_flush`` = ``processAllAvailable``; the parquet-export sink
is at-least-once per signal (blind append), same contract as the
reference's COPY path (reference: otlp_server.cpp:963-1107).

A metrics request fans out to <=4 shape tables from ONE parse — the
envelope frame is cached for the four flattens, mirroring
``otlp_transform_metrics_all`` (reference: read_otlp.cpp:261-304).

Scale notes: each signal is an independent streaming query (the
reference's single-writer mutex exists because DuckLake needs one
writer; Spark sinks are per-table, so signal queries run concurrently).
Partitioned year/month/day layout matches the reference's export tree
and gives partition pruning to every time-bounded query.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from duckdb_otlp_spark.catalog import SnapshotCatalog
from duckdb_otlp_spark.functions.promote import sanitize_key as _sanitize
from duckdb_otlp_spark.functions.uri import OtlpUri, parse_otlp_uri
from duckdb_otlp_spark.schemas import TARGET_TABLES
from duckdb_otlp_spark.sources.otlp_json import (
    FLATTEN,
    envelopes_from_lines,
    flatten_metrics_exp_histogram,
    flatten_metrics_gauge,
    flatten_metrics_histogram,
    flatten_metrics_sum,
)
from duckdb_otlp_spark.streaming.maintenance import (
    BLOOM_COLS,
    SORT_KEYS,
    compact_table,
)
from duckdb_otlp_spark.streaming.receiver import OtlpHttpReceiver

# reference: src/include/otlp_ingest_limits.hpp
DEFAULT_SEAL_MAX_AGE_MS = 5000
# reference: otlp_server.cpp:310-317 stall detection window
STALL_SEAL_CYCLES = 3
# reference: otlp_server.cpp seal history bound
SEAL_HISTORY_LIMIT = 4096
# reference: otlp_server.cpp:53-58 maintenance cadence (every 32 seals)
DEFAULT_MAINTENANCE_EVERY_SEALS = 32

_PARTITION_TS = {  # reference: otlp_server.cpp:105-110
    "otlp_traces": "start_time_unix_nano",
}


@dataclass
class SealEvent:
    """One per-table seal record. ``append_ms`` is the data-file write
    (staging) time; ``commit_ms`` is the metadata-commit time — zero for
    the parquet sink, whose blind append has no separate commit. The
    split mirrors the reference's seal history append-vs-commit timing
    columns (reference: otlp_start_stop.cpp:348-521)."""
    seal_sequence: int
    table: str
    rows: int
    batch_id: int
    append_ms: float
    commit_ms: float
    status: str
    error: str = ""
    unix_ms: int = field(default_factory=lambda: int(time.time() * 1000))


class OtlpSparkServer:
    """One live listener: HTTP receiver + per-signal streaming seal jobs."""

    def __init__(self, spark: SparkSession, uri: str, *,
                 work_dir: str | Path | None = None,
                 export_root: str | Path | None = None,
                 auth_token: str | None = None,
                 disable_auth: bool = False,
                 seal_max_age_ms: int = DEFAULT_SEAL_MAX_AGE_MS,
                 promote_resource: list[str] | None = None,
                 promote_scope: list[str] | None = None,
                 maintenance_every_seals: int = DEFAULT_MAINTENANCE_EVERY_SEALS,
                 zstd: bool = True,
                 sink: str = "parquet",
                 iceberg_export: bool = True,
                 warm_start: bool = True,
                 accept_workers: int = 2,
                 create_tables: bool = True,
                 transport: str = "http",
                 scrub_body_pii: bool = False,
                 flag_near_dups: str | None = None,
                 near_dup_literal_max_keys: int | None = None,
                 flag_contamination_grams=None,
                 contamination_max_overlap: float = 0.5):
        self.spark = spark
        # port 0 = OS-assigned; resolved to the bound port in start()
        self.uri = parse_otlp_uri(uri, allow_ephemeral=True)
        # otap: accepts OTAP BatchArrowRecords messages on the same signal
        # paths. The reference's otap_serve speaks bidirectional Arrow
        # gRPC (reference: src/otlp_server_grpc.cpp:95-133); this server
        # matches it with a from-scratch gRPC-over-h2c transport
        # (streaming/h2c.py + receiver.py ArrowLogsService/etc. — real
        # HTTP/2 + HPACK, per-stream decoder state, BatchStatus acks,
        # tested end-to-end in tests/test_otap_grpc.py), plus an HTTP
        # POST framing of the same messages as a simpler second path
        # (per-message ack = the 202/4xx response).
        self.work_dir = Path(work_dir or f"/tmp/otlp_spark/{self.uri.host}_{self.uri.port}")
        self.spool_dir = self.work_dir / "spool"
        self.export_root = Path(export_root or (self.work_dir / "export"))
        self.seal_max_age_ms = seal_max_age_ms
        self.compression = "zstd" if zstd else "snappy"
        self.promote_resource = list(promote_resource or [])
        self.promote_scope = list(promote_scope or [])
        # opt-in at-seal PII redaction of log bodies (beyond-reference,
        # SURVEY C39's server integration): the same map-only chained
        # regexp_replace as operators.text.pii_scrub, applied inside the
        # seal's flatten plan so raw identifiers never reach the sealed
        # corpus. Zero extra jobs/shuffles — just more columns in the
        # existing projection.
        self.scrub_body_pii = bool(scrub_body_pii)
        # opt-in at-seal near-duplicate flagging (beyond-reference, the
        # server integration of the C41 screen): the value names a
        # persisted band index (operators.dedup.save_band_index) and
        # every sealed log row gets a near_dup_candidate boolean stamped
        # against it. The probe is built ONCE in start(); small indexes
        # compile to InSet literals so the seal plan stays a single
        # map-only job (pinned by tests/test_streaming_ingest.py),
        # larger ones fall back to persisted broadcast-join sides that
        # stop() releases.
        self.flag_near_dups = flag_near_dups
        # regime override: None = the probe's own threshold; 0 forces the
        # broadcast-join regime (useful when the index is known to grow
        # past the literal size between restarts, so the seal plan shape
        # stays stable)
        self.near_dup_literal_max_keys = near_dup_literal_max_keys
        self._near_dup_probe: Any = None
        # opt-in at-seal benchmark-contamination flagging (C28's server
        # integration): a set/frozenset of distinct eval n-grams (the
        # eval suite, small by construction) stamps a `contaminated`
        # boolean on every sealed log row via the same JVM-literal
        # column math as contamination_screen_stream's literal regime —
        # map-only, so the seal stays single-job. Sets beyond the
        # literal scale belong to the post-hoc batch equi-join over the
        # sealed table (pipeline.contamination_screen), not the seal
        # hot path — enforced below.
        self._contamination_col = None
        if flag_contamination_grams is not None:
            from duckdb_otlp_spark.streaming.operators import (
                LITERAL_MAX_GRAMS, contamination_mark)
            flag_contamination_grams = frozenset(flag_contamination_grams)
            if len(flag_contamination_grams) > LITERAL_MAX_GRAMS:
                raise ValueError(
                    f"flag_contamination_grams has "
                    f"{len(flag_contamination_grams)} grams, above the "
                    f"seal-plan literal ceiling ({LITERAL_MAX_GRAMS}); "
                    f"screen post-hoc with the batch equi-join "
                    f"(operators.pipeline.contamination_screen) instead")
            # precompiled ONCE: a Column is unbound, so the sorted-gram
            # py4j literal transfer happens here, not on every seal of
            # every micro-batch (the BandProbe does the same)
            self._contamination_col = contamination_mark(
                F.col("body"), flag_contamination_grams,
                max_overlap=contamination_max_overlap)
        self.flag_contamination_grams = flag_contamination_grams
        self.contamination_max_overlap = contamination_max_overlap
        if sink not in ("parquet", "catalog"):
            raise ValueError(f"unknown sink {sink!r}; use 'parquet' or 'catalog'")
        self.sink = sink
        # catalog mode = the reference's transactional SealCatalog path
        # (all signals of a seal commit in ONE snapshot, otlp_server.cpp:
        # 1109-1271); parquet mode = the at-least-once COPY export path
        self.catalog = SnapshotCatalog(self.export_root) if sink == "catalog" else None
        # catalog commits additionally publish Iceberg v1 metadata so any
        # Iceberg-speaking engine (Trino, DuckDB iceberg_scan, Spark with
        # jars) reads the live tables — the reference's DuckLake/Iceberg
        # ecosystem contract (reference: otlp_server.cpp:1109-1271,
        # serve.md:199-213). Incremental: O(new files) per seal.
        self.iceberg: Any = None
        if self.catalog is not None and iceberg_export:
            from duckdb_otlp_spark.iceberg_export import IcebergExporter
            self.iceberg = IcebergExporter(self.catalog)
        self.create_tables = create_tables
        self._target_schemas: dict[str, Any] = {}
        # transport='grpc' serves OTLP/gRPC unary Export over the
        # from-scratch h2c stack (reference: otlp_serve(transport:=
        # 'grpc'), serve.md:307-326) — a gRPC listener exposes no
        # /healthz//readyz HTTP endpoints, same as the reference
        self.receiver = OtlpHttpReceiver(
            self.uri.host, self.uri.port, self.spool_dir,
            auth_token=auth_token, disable_auth=disable_auth,
            formats="otap" if self.uri.scheme == "otap" else "otlp",
            transport=transport,
            accept_workers=accept_workers,
            stall_after_ms=STALL_SEAL_CYCLES * seal_max_age_ms)
        self.queries: dict[str, Any] = {}
        # observability log channel — the analog of the reference writing
        # server events through the duckdb_otlp log type into duckdb_logs
        # (reference: otlp_server.cpp:369-378, src/include/otlp_log.hpp);
        # queryable via otlp_server_log(), bounded like seal history
        self.server_log: list[dict[str, Any]] = []
        self.seal_history: list[SealEvent] = []
        self._seal_seq = 0
        self._lock = threading.Lock()
        self.last_seal_unix_ms: int | None = None
        self.seal_failures_total = 0
        self.seal_restarts_total = 0
        self.sealed_rows_total = 0
        # Lines 202-accepted at the edge but dropped by the seal's lax
        # parse (the edge validates only a '{' prefix by design — the
        # accept-path/parse-at-seal split).  Non-zero means a client's
        # exporter is sending broken JSON and its data is being lost;
        # surfaced per-seal in otlp_server_log and cumulatively in
        # otlp_server_list (reference parses at ingest and 400s:
        # otlp_server.cpp:596-602 — we trade that for edge throughput
        # but keep the loss observable).
        self.seal_malformed_total = 0
        self.warm_start = warm_start
        self.maintenance_every_seals = maintenance_every_seals
        self.maintenance_runs_total = 0
        self.maintenance_history: list[dict[str, Any]] = []
        self._maintenance_busy = threading.Lock()
        # async-maintenance quiescence: scheduled-but-unfinished runs.
        # flush() waits on this so "flush then inspect" stays
        # deterministic even though compaction runs off-thread.
        self._maintenance_cv = threading.Condition()
        self._maintenance_pending = 0
        # EWMA ingress rate (reference: otlp_start_stop.cpp EWMA column):
        # sampled from the admitted-bytes counter on every seal and on
        # every server_row read, tau = 10 s
        self._ewma_rate = 0.0
        self._ewma_last_t = time.monotonic()
        self._ewma_last_bytes = 0
        self._ewma_lock = threading.Lock()

    def _update_ewma(self) -> float:
        import math
        with self._ewma_lock:
            now = time.monotonic()
            dt = now - self._ewma_last_t
            if dt < 0.05:          # coalesce near-simultaneous samples
                return self._ewma_rate
            admitted = self.receiver.stats.admitted_bytes_total
            inst = (admitted - self._ewma_last_bytes) / dt
            alpha = 1.0 - math.exp(-dt / 10.0)
            self._ewma_rate += alpha * (inst - self._ewma_rate)
            self._ewma_last_t = now
            self._ewma_last_bytes = admitted
            return self._ewma_rate

    def _log_event(self, message: str, level: str = "INFO") -> None:
        """Append to the server's observability log channel
        (reference: OtlpServer::LogServerEvent, otlp_server.cpp:369-378)."""
        with self._lock:
            self.server_log.append({
                "unix_ms": int(time.time() * 1000),
                "level": level,
                "message": message,
            })
            if len(self.server_log) > SEAL_HISTORY_LIMIT:
                self.server_log = self.server_log[-SEAL_HISTORY_LIMIT:]

    # -- target tables (reference: otlp_server.cpp:455-526) --
    def _promoted_fields(self):
        from pyspark.sql import types as T
        seen: set[str] = set()
        out = []
        for prefix, keys in (("resource_attr_", self.promote_resource),
                             ("scope_attr_", self.promote_scope)):
            for key in keys:
                if not key:
                    continue
                target = prefix + _sanitize(key)
                if target not in seen:
                    seen.add(target)
                    out.append(T.StructField(target, T.StringType(), True))
        return out

    def _ensure_target_tables(self) -> None:
        """Create or validate every signal table before the listener
        opens — the analog of ``EnsureTargetTables``/``CreateOrValidate
        Table`` (reference: otlp_server.cpp:455-526). Parquet mode keeps
        no persistent destination table (the durable store IS the
        parquet dataset), so like the reference it only pre-creates the
        export root. Catalog mode requires the signal's base columns as
        a LEADING PREFIX (name + type, in order); extra trailing
        columns are allowed — attribute promotion widens tables, and a
        restart against an already-promoted catalog must validate
        cleanly. With ``create_tables=False`` a missing table is a
        fail-fast error instead of being registered."""
        from pyspark.sql import types as T

        if self.catalog is None:
            self.export_root.mkdir(parents=True, exist_ok=True)
            return
        from duckdb_otlp_spark.schemas import SIGNAL_SCHEMAS

        to_create: dict[str, str] = {}
        for signal_key, table in TARGET_TABLES.items():
            expected = SIGNAL_SCHEMAS[signal_key]
            desired = T.StructType(list(expected.fields) + self._promoted_fields())
            current = self.catalog.table_schema(table)
            if current is None:
                if not self.create_tables:
                    raise ValueError(
                        f"Target table {table} is not available and "
                        f"create_tables is false")
                to_create[table] = desired.json()
                self._target_schemas[table] = desired
                continue
            if len(current.fields) < len(expected.fields):
                raise ValueError(
                    f"Target table {table} has {len(current.fields)} columns, "
                    f"expected at least {len(expected.fields)}")
            for i, want in enumerate(expected.fields):
                got = current.fields[i]
                if got.name != want.name:
                    raise ValueError(
                        f"Target table {table} column {i} is {got.name}, "
                        f"expected {want.name}")
                if got.dataType != want.dataType:
                    raise ValueError(
                        f"Target table {table} column {got.name} has type "
                        f"{got.dataType.simpleString()}, expected "
                        f"{want.dataType.simpleString()}")
            self._target_schemas[table] = current
        if to_create:
            self.catalog.commit(schemas=to_create, operation="create_tables")

    def _align_to_table(self, table: str, df: DataFrame) -> DataFrame:
        """Column-targeting seal write: reorder ``df`` to the validated
        table schema, NULL-filling columns the seal does not populate
        (the reference's extra-column write path, otlp_server.cpp:525);
        genuinely new columns (fresh promotions) append trailing and
        widen the stored schema."""
        target = self._target_schemas.get(table)
        if target is None:
            return df
        have = {f.name for f in df.schema.fields}
        cols = [F.col(f.name) if f.name in have
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in target.fields]
        known = {f.name for f in target.fields}
        extras = [f.name for f in df.schema.fields if f.name not in known]
        out = df.select(*cols, *[F.col(c) for c in extras])
        if extras:
            self._target_schemas[table] = out.schema
        return out

    # -- promotion (reference: otlp_column_promote.cpp:53-127) --
    def _promote(self, df: DataFrame) -> DataFrame:
        seen: set[str] = set()
        for source, prefix, keys in (
                ("resource_attributes", "resource_attr_", self.promote_resource),
                ("scope_attributes", "scope_attr_", self.promote_scope)):
            for key in keys:
                if not key:
                    continue
                target = prefix + _sanitize(key)
                if target in seen:
                    continue
                seen.add(target)
                df = df.withColumn(
                    target, F.get_json_object(F.col(source), f"$['{key}']"))
        return df

    def _record_seal(self, table: str, rows: int, batch_id: int,
                     append_ms: float, status: str, error: str = "",
                     commit_ms: float = 0.0) -> None:
        with self._lock:
            self._seal_seq += 1
            seq = self._seal_seq
            self.seal_history.append(SealEvent(
                seq, table, rows, batch_id, round(append_ms, 3),
                round(commit_ms, 3), status, error))
            if len(self.seal_history) > SEAL_HISTORY_LIMIT:
                self.seal_history = self.seal_history[-SEAL_HISTORY_LIMIT:]
            self.last_seal_unix_ms = int(time.time() * 1000)
            if status == "ok":
                self.sealed_rows_total += rows
            else:
                self.seal_failures_total += 1
        # workers answer /readyz from shared memory — push seal state
        self.receiver.publish_seal_state(self.seal_failures_total,
                                         self.last_seal_unix_ms)
        self._update_ewma()
        if (status == "ok" and self.maintenance_every_seals
                and seq % self.maintenance_every_seals == 0):
            self._schedule_maintenance()

    def _schedule_maintenance(self) -> None:
        """Run cadence maintenance on a daemon thread, NOT inline in the
        seal: a synchronous compaction inside foreachBatch blocks the
        micro-batch loop for the whole rewrite, so every Nth seal would
        stall live ingest until the bounded buffer fills and the edge
        starts shedding 503s. Off-thread, the seal only pays the thread
        spawn; `_maintenance_busy` still guarantees single-flight, and
        `_wait_maintenance_idle` restores determinism where callers
        need it (flush)."""
        with self._maintenance_cv:
            self._maintenance_pending += 1
        threading.Thread(target=self._run_scheduled_maintenance,
                         name="otlp-maintenance", daemon=True).start()

    def _run_scheduled_maintenance(self) -> None:
        try:
            self._maybe_run_maintenance()
        finally:
            with self._maintenance_cv:
                self._maintenance_pending -= 1
                self._maintenance_cv.notify_all()

    def _wait_maintenance_idle(self, timeout: float = 300.0) -> bool:
        deadline = time.monotonic() + timeout
        with self._maintenance_cv:
            while self._maintenance_pending > 0:
                left = deadline - time.monotonic()
                if left <= 0:
                    return False
                self._maintenance_cv.wait(left)
        return True

    def _maybe_run_maintenance(self) -> None:
        """Post-seal best-effort compaction, cadence-gated like the
        reference's MaybeRunCatalogMaintenance (otlp_server.cpp:1273-1387):
        skipped entirely when a previous run is still in flight, and a
        failure never fails the seal."""
        if not self._maintenance_busy.acquire(blocking=False):
            return
        try:
            t0 = time.perf_counter()
            merged = 0
            for table in set(TARGET_TABLES.values()):
                if self.catalog is not None:
                    res = self.catalog.compact(
                        self.spark, table,
                        sort_cols=SORT_KEYS.get(table, ()),
                        bloom_cols=BLOOM_COLS.get(table, ()),
                        compression=self.compression)
                    merged += 1 if res["files_in"] else 0
                else:
                    merged += compact_table(
                        self.spark, self.export_root, table).partitions_compacted
            if self.catalog is not None:
                self.catalog.expire_snapshots()
                self.catalog.vacuum()
            with self._lock:
                self.maintenance_runs_total += 1
                self.maintenance_history.append({
                    "run": self.maintenance_runs_total,
                    "partitions_compacted": merged,
                    "duration_ms": round((time.perf_counter() - t0) * 1000, 3),
                    "unix_ms": int(time.time() * 1000),
                })
            self._log_event(f"maintenance: partitions_compacted={merged}")
        except Exception as e:  # noqa: BLE001 — best-effort, never fails the seal
            self._log_event(f"maintenance failed: {e}", "WARN")
        finally:
            self._maintenance_busy.release()

    def _write_table(self, df: DataFrame, table: str, batch_id: int) -> None:
        """One seal append: partitioned y/m/d zstd parquet, like the
        reference's COPY ... PARTITION_BY (year, month, day)
        (reference: otlp_server.cpp:112-129).

        The row count rides the write job as an Observation, so a seal
        is ONE Spark action (the old count-then-write ran the flatten
        twice or paid a persist): parse + flatten + write + count in a
        single pass."""
        ts = _PARTITION_TS.get(table, "time_unix_nano")
        obs = Observation()
        out = (df
               .withColumn("year", F.date_format(F.col(ts), "yyyy"))
               .withColumn("month", F.date_format(F.col(ts), "MM"))
               .withColumn("day", F.date_format(F.col(ts), "dd"))
               .observe(obs, F.count(F.lit(1)).alias("rows")))
        t0 = time.perf_counter()
        try:
            (out.write.mode("append")
             .partitionBy("year", "month", "day")
             .option("compression", self.compression)
             # seal hot path: zstd level 1 (files stay zstd — the
             # format parity that matters); compaction later rewrites
             # at the codec default, so steady-state files re-compress
             .option("parquet.compression.codec.zstd.level", "1")
             .parquet(str(self.export_root / table)))
            rows = int(obs.get["rows"])
            self._record_seal(table, rows, batch_id,
                              (time.perf_counter() - t0) * 1000, "ok")
            self._log_event(f"parquet seal: table={table} rows={rows} "
                            f"batch={batch_id}")
        except Exception as e:  # noqa: BLE001 — seal failures are recorded
            self._record_seal(table, 0, batch_id,
                              (time.perf_counter() - t0) * 1000, "error", str(e))
            self._log_event(f"parquet seal failed: table={table} "
                            f"batch={batch_id} error={e}", "WARN")
            raise

    def _seal_catalog(self, tables: list[tuple[str, DataFrame]],
                      batch_id: int) -> None:
        """Catalog-mode seal: stage every table's data files first, then
        publish ONE snapshot — all-or-nothing across the whole seal,
        the reference's BEGIN..append per signal..COMMIT contract
        (reference: otlp_server.cpp:1176-1259). A failure before commit
        leaves only unreferenced staged files (vacuumable), and the
        streaming retry replays the batch."""
        t0 = time.perf_counter()
        add: dict[str, list] = {}
        schemas: dict[str, str] = {}
        rows: dict[str, int] = {}
        try:
            for table, df in tables:
                df = self._align_to_table(table, df)
                entries = self.catalog.stage_dataframe(
                    df, table,
                    sort_cols=SORT_KEYS.get(table, ()),
                    bloom_cols=BLOOM_COLS.get(table, ()),
                    compression=self.compression)
                add[table] = entries
                schemas[table] = df.schema.json()
                rows[table] = sum(e.rows for e in entries)
            stage_ms = (time.perf_counter() - t0) * 1000
            t1 = time.perf_counter()
            self.catalog.commit(add=add, schemas=schemas)
            commit_ms = (time.perf_counter() - t1) * 1000
        except Exception as e:  # noqa: BLE001 — seal failures are recorded
            ms = (time.perf_counter() - t0) * 1000
            for table, _ in tables:
                self._record_seal(table, 0, batch_id, ms, "error", str(e))
            self._log_event(f"seal failed: batch={batch_id} error={e}", "WARN")
            raise
        for table, _ in tables:
            self._record_seal(table, rows[table], batch_id, stage_ms, "ok",
                              commit_ms=commit_ms)
        if self.iceberg is not None:
            try:
                for table, _ in tables:
                    self.iceberg.export_table(table)
            except Exception as e:  # noqa: BLE001 — metadata mirror only:
                # the catalog commit already succeeded; losing one Iceberg
                # render is recoverable (next seal re-renders), a failed
                # seal is not
                self._log_event(f"iceberg export failed: {e}", "WARN")
        self._log_event(f"seal: catalog={self.export_root} "
                        f"rows={sum(rows.values())} batch={batch_id}")

    def _seal_batch(self, signal: str):
        def seal(batch_df: DataFrame, batch_id: int) -> None:
            # Streaming triggers can hand over an empty batch (stream
            # start, or a signal with no traffic); short-circuit before
            # building four flatten plans + four parquet commits of
            # nothing — this was tens of seconds of dead work per drain.
            # (inputFiles() is NOT usable here: the micro-batch DF hides
            # its file list, returning [] even for non-empty batches —
            # isEmpty's limit-1 job is the cheapest correct check.)
            # The check is GATED on THIS signal's admission gauge: a
            # non-empty batch implies un-released spooled bytes for its
            # OWN signal, so per-signal buffered == 0 proves the batch
            # CAN be empty and is worth probing, while a busy signal
            # skips the probe — at a 2 s cadence the limit-1 job was
            # costing ~5% of the seal path's 175k logs/s capacity
            # budget. The gauge must be per-signal (not the global
            # sum): a logs-only sustained run would otherwise disable
            # the guard for the idle traces/metrics queries, whose
            # empty batches then pay the full dead-work path the guard
            # exists to skip. A raced empty batch on the busy path just
            # runs a sub-second empty plan.
            if (self.receiver.buffered_bytes_by_signal()[signal] == 0
                    and batch_df.isEmpty()):
                return
            # The streaming file source plans one scan task per spool
            # segment: coalesce packs a many-tiny-segment backlog into
            # at most one scan task per core. No repartition — receiver
            # segments are size-capped (3 MiB rotation, sized so one
            # seal-cadence batch fills the executor — receiver.py
            # DEFAULT_SEGMENT_ROTATE_BYTES), so scan tasks
            # are already balanced, and shuffling the raw spool lines
            # was measured to DOUBLE the seal wall time (15.5 s vs
            # 7.3 s for a 2M-row batch) versus parsing in place.
            # Edge co-location headroom: the accept workers are Python
            # processes sharing this host with the executor threads (in
            # local mode, and on any edge node running both roles). A
            # seal that schedules one scan task per core starves them —
            # measured: a seal overlapping the accept burst dragged
            # acceptance from 1.4 s to 10.9 s for the same 2M records,
            # a 3-task reservation restored it. Reserving a few cores
            # costs the seal <15% when uncontended and removes the
            # collapse entirely. On a real cluster where receivers run
            # on separate edge nodes, defaultParallelism counts executor
            # cores (not the edge host), so the reservation is noise.
            dp = self.spark.sparkContext.defaultParallelism
            par = max(8, dp - 2 - 2 * self.receiver.accept_workers)
            batch_df = batch_df.coalesce(par)
            # the spooled-byte sum rides the seal's write job as an
            # Observation instead of costing its own aggregation job
            obs = Observation()
            # +1 per line: admission reserved the newline terminator too,
            # so the release must match byte-for-byte or the per-signal
            # buffered gauges never return to zero
            batch_df = batch_df.observe(
                obs, F.coalesce(F.sum(F.octet_length("value") + F.lit(1)),
                                F.lit(0)).alias("nbytes"))
            drop_obs = Observation()
            env = envelopes_from_lines(batch_df,
                                       "metrics" if signal == "metrics" else signal,
                                       strict=False, drop_observation=drop_obs)
            if signal == "metrics":
                shapes = (
                    ("otlp_metrics_gauge", flatten_metrics_gauge),
                    ("otlp_metrics_sum", flatten_metrics_sum),
                    ("otlp_metrics_histogram", flatten_metrics_histogram),
                    ("otlp_metrics_exp_histogram", flatten_metrics_exp_histogram))
                env = env.persist()
                try:
                    tables = [(t, self._promote(fl(env))) for t, fl in shapes]
                    if self.catalog is not None:
                        self._seal_catalog(tables, batch_id)
                    else:
                        for table, df in tables:
                            self._write_table(df, table, batch_id)
                finally:
                    env.unpersist()
            else:
                table = TARGET_TABLES[signal]
                df = self._promote(FLATTEN[signal](env))
                if self.scrub_body_pii and signal == "logs":
                    from duckdb_otlp_spark.operators.text import pii_scrub
                    df = df.withColumn("body", pii_scrub(F.col("body")))
                if self._near_dup_probe is not None and signal == "logs":
                    # literal regime: map-only InSet columns in the same
                    # projection — the seal stays ONE job (pinned).
                    # Ordering contract: the stamp runs AFTER the PII
                    # scrub, so signatures are computed on the text that
                    # actually lands in the corpus — build the band index
                    # from scrubbed text for the keys to match
                    df = self._near_dup_probe.stamp(df, text_col="body")
                if self._contamination_col is not None and signal == "logs":
                    # same projection, zero extra jobs (stamps the
                    # scrubbed text, like the near-dup stamp above);
                    # the column was precompiled once in __init__
                    df = df.withColumn("contaminated",
                                       self._contamination_col)
                if self.catalog is not None:
                    self._seal_catalog([(table, df)], batch_id)
                else:
                    self._write_table(df, table, batch_id)
            self.receiver.release_sealed(int(obs.get["nbytes"]), signal)
            dropped = int(drop_obs.get["malformed"])
            if dropped:
                self.seal_malformed_total += dropped
                self._log_event(
                    f"seal dropped {dropped} malformed {signal} line(s) "
                    f"(accepted at edge, unparseable at seal) batch={batch_id}",
                    "WARN")
        return seal

    _WARM_SAMPLES = {
        "logs": ('{"resourceLogs":[{"scopeLogs":[{"logRecords":'
                 '[{"timeUnixNano":"1","body":{"stringValue":"w"}}]}]}]}'),
        "traces": ('{"resourceSpans":[{"scopeSpans":[{"spans":[{"traceId":"00",'
                   '"spanId":"00","name":"w","startTimeUnixNano":"1",'
                   '"endTimeUnixNano":"2"}]}]}]}'),
        "metrics": ('{"resourceMetrics":[{"scopeMetrics":[{"metrics":'
                    '[{"name":"w","gauge":{"dataPoints":[{"timeUnixNano":"1",'
                    '"asInt":"1"}]}}]}]}]}'),
    }

    def _warm_seal_plans(self) -> None:
        """Execute each seal's parse+flatten plan on a one-record sample
        before the listener opens: the expression build (~10 s of py4j
        tree construction, memoized per process) and the whole-stage
        codegen both compile here instead of inside the first seal —
        the analog of the reference creating/validating target tables at
        startup (reference: otlp_server.cpp:455-526).

        The three signals warm in parallel threads: the Python-side
        expression build interleaves py4j socket round-trips (GIL
        released while the JVM works), and the JVM compiles the three
        codegen units concurrently.

        After the plan warm, one *realistic* mini-seal runs for the logs
        signal: a spooled text scan -> lax parse -> flatten -> y/m/d
        partitioned parquet write of a few tens of thousands of rows to
        a scratch dir. A fresh JVM's first heavy seal was measured 2.5-4x
        slower than steady state (C2 JIT + the FileScan-variant codegen
        + parquet/zstd writer init all cold); tens of thousands of rows
        cross the JIT thresholds so the first real batch runs compiled
        code. This happens before the listener accepts, so it never
        counts against live ingest."""
        def warm(signal: str, line: str) -> None:
            df = self.spark.createDataFrame([(line,)], "value string")
            env = envelopes_from_lines(df, signal, strict=False)
            if signal == "metrics":
                for fl in (flatten_metrics_gauge, flatten_metrics_sum,
                           flatten_metrics_histogram,
                           flatten_metrics_exp_histogram):
                    fl(env).collect()
            else:
                FLATTEN[signal](env).collect()

        threads = [threading.Thread(target=warm, args=(s, ln), daemon=True)
                   for s, ln in self._WARM_SAMPLES.items()]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        self._warm_write_path()

    def _warm_write_path(self, files: int = 8, lines: int = 8,
                         records: int = 1000) -> None:
        """Replicate the live seal's EXACT plan shape on scratch data.

        Shape matters, not just the operators: the seal's
        coalesce-above-scan keeps scan -> parse -> flatten -> write in
        ONE whole-stage-codegen unit, so warming with a repartition
        (which splits the plan at an Exchange) compiles a *different*
        generated class and the first live batch still runs cold. This
        mirrors `_seal_batch` statement-for-statement — coalesce, both
        Observations, `_promote`, y/m/d append write — minus the
        telemetry side effects (seal events, byte release) that would
        pollute `otlp_seal_list` with a synthetic seal."""
        import json as _json
        import shutil
        import tempfile

        rec = {"timeUnixNano": "1700000000000000000", "severityNumber": 9,
               "severityText": "INFO", "body": {"stringValue": "warm line"},
               "attributes": [{"key": "k", "value": {"stringValue": "v"}}]}
        env = {"resourceLogs": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": "warm"}}]},
            "scopeLogs": [{"scope": {"name": "warm"},
                           "logRecords": [rec] * records}]}]}
        line = _json.dumps(env, separators=(",", ":")) + "\n"
        scratch = Path(tempfile.mkdtemp(prefix="otlp_warm_"))
        try:
            spool = scratch / "spool"
            spool.mkdir()
            for i in range(files):
                (spool / f"warm-{i}.ndjson").write_text(line * lines)
            dp = self.spark.sparkContext.defaultParallelism
            par = max(8, dp - 2 - 2 * self.receiver.accept_workers)
            src = (self.spark.read.format("text").load(str(spool))
                   .coalesce(par))
            obs = Observation()
            src = src.observe(
                obs, F.coalesce(F.sum(F.octet_length("value") + F.lit(1)),
                                F.lit(0)).alias("nbytes"))
            drop_obs = Observation()
            df = self._promote(FLATTEN["logs"](envelopes_from_lines(
                src, "logs", strict=False, drop_observation=drop_obs)))
            ts = _PARTITION_TS.get(TARGET_TABLES["logs"], "time_unix_nano")
            wobs = Observation()
            (df.withColumn("year", F.date_format(F.col(ts), "yyyy"))
               .withColumn("month", F.date_format(F.col(ts), "MM"))
               .withColumn("day", F.date_format(F.col(ts), "dd"))
               .observe(wobs, F.count(F.lit(1)).alias("rows"))
               .write.mode("append")
               .partitionBy("year", "month", "day")
               .option("compression", self.compression)
               .parquet(str(scratch / "out")))
            assert int(wobs.get["rows"]) == files * lines * records
        except Exception as e:  # noqa: BLE001 — warm-up is best-effort
            self._log_event(f"write-path warm failed: {e}", "WARN")
        finally:
            shutil.rmtree(scratch, ignore_errors=True)

    def start(self) -> None:
        self._ensure_target_tables()
        if self.flag_near_dups:
            from duckdb_otlp_spark.operators.dedup import load_band_index
            from duckdb_otlp_spark.streaming.operators import (
                LITERAL_MAX_KEYS, build_band_probe)
            self._near_dup_probe = build_band_probe(
                load_band_index(self.spark, self.flag_near_dups),
                literal_max_keys=(LITERAL_MAX_KEYS
                                  if self.near_dup_literal_max_keys is None
                                  else self.near_dup_literal_max_keys))
            self._log_event(
                f"near-dup flagging enabled: index={self.flag_near_dups} "
                f"regime={self._near_dup_probe.regime}")
        if self.warm_start:
            self._warm_seal_plans()
        self.receiver.start()
        if self.uri.port == 0:
            self.uri = OtlpUri(self.uri.scheme, self.uri.host,
                               self.receiver.port, self.uri.ipv6)
        for signal in ("logs", "traces", "metrics"):
            self.queries[signal] = self._start_query(signal)
        self._log_event(f"listening: uri={self.uri.canonical} "
                        f"transport={self.receiver.transport} sink={self.sink}")

    def _start_query(self, signal: str):
        # cleanSource=delete: sealed spool segments are deleted once
        # their micro-batch COMMITS (a failed batch replays from the
        # same files). Without it the spool directory grows for the
        # server's whole lifetime — the per-trigger source listing
        # becomes O(segments ever spooled) and a long-running edge
        # eventually exhausts the disk with data that's already in
        # parquet (observed: 2.2 GB of dead segments after a 90 s
        # 175k logs/s run).
        src = (self.spark.readStream
               .format("text")
               .option("cleanSource", "delete")
               .load(str(self.spool_dir / signal)))
        return (src.writeStream
                .queryName(f"otlp_seal_{signal}_{self.uri.port}")
                .foreachBatch(self._seal_batch(signal))
                .option("checkpointLocation",
                        str(self.work_dir / "checkpoints" / signal))
                .trigger(processingTime=f"{self.seal_max_age_ms} milliseconds")
                .start())

    def _revive_queries(self) -> None:
        """Rebuild any seal stream its last micro-batch killed — the
        analog of the reference restoring unsealed rows and rebuilding a
        wedged connection after a seal failure (reference:
        otlp_server.cpp:1389-1436). The new query resumes from the SAME
        checkpoint, so the failed batch replays: no spooled row is lost;
        the parquet sink's blind append stays at-least-once, the catalog
        sink's staged-then-commit stays all-or-nothing (a failed seal
        left only unreferenced staged files)."""
        for signal, q in list(self.queries.items()):
            if q.exception() is None:
                continue
            try:
                q.stop()
            except Exception:  # noqa: BLE001 — already dead
                pass
            self.queries[signal] = self._start_query(signal)
            with self._lock:
                self.seal_restarts_total += 1
            self._log_event(f"seal stream revived after failure: "
                            f"signal={signal}", "WARN")

    def _ready(self) -> bool:
        """Degrade /readyz when sealing stalls
        (reference: otlp_server.cpp:310-317)."""
        if self.seal_failures_total == 0 or self.receiver.buffered_bytes == 0:
            return True
        if self.last_seal_unix_ms is None:
            return False
        age = int(time.time() * 1000) - self.last_seal_unix_ms
        return age <= STALL_SEAL_CYCLES * self.seal_max_age_ms

    def flush(self) -> dict[str, Any]:
        """Synchronous seal of everything spooled (reference otlp_flush,
        otlp_start_stop.cpp:523-573).

        The three signal queries drain concurrently: each
        ``processAllAvailable`` blocks through at least one trigger
        cycle even when that signal's spool is empty, so a sequential
        drain pays ~2 trigger intervals of dead wait."""
        before = self.sealed_rows_total
        self.receiver.rotate_all()  # partial spool segments become sealable
        self._revive_queries()      # a failed seal must not strand its spool
        errors: list[BaseException] = []

        def drain(q) -> None:
            try:
                q.processAllAvailable()
            except BaseException as e:  # noqa: BLE001 — re-raised below
                errors.append(e)

        threads = [threading.Thread(target=drain, args=(q,), daemon=True)
                   for q in self.queries.values()]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            raise errors[0]
        # flush is the sync point: seals scheduled during the drain may
        # have kicked off async compaction — callers that flush-then-read
        # must see its result, not race it
        self._wait_maintenance_idle()
        return {"status": "ok", "sealed_rows": self.sealed_rows_total - before,
                "seals_total": self._seal_seq}

    def stop(self, drain: bool = True) -> dict[str, Any]:
        """Stop listener, drain spool (3 attempts), report dropped rows
        (reference otlp_stop, otlp_start_stop.cpp:304-346)."""
        self.receiver.stop()
        if drain:
            for _ in range(3):
                try:
                    self.flush()
                    break
                except Exception:  # noqa: BLE001 — retry the drain
                    continue
        dropped = self.receiver.buffered_bytes
        self._log_event(f"stopped: dropped_bytes={dropped}",
                        "WARN" if dropped else "INFO")
        for q in self.queries.values():
            try:
                q.stop()
            except Exception:  # noqa: BLE001 — JVM may already be gone at exit
                pass
        if self._near_dup_probe is not None:
            try:
                self._near_dup_probe.unpersist()
            except Exception:  # noqa: BLE001 — JVM may already be gone at exit
                pass
        return {"status": "ok", "dropped_bytes": dropped}

    def read_table(self, table: str, **prune) -> DataFrame:
        """Query a sealed table — the analog of the reference's lazily
        created read_parquet inspection view (otlp_server.cpp:1050-1053).
        Catalog mode plans from the snapshot manifest (and accepts its
        pruning kwargs: snapshot_id / time_range / equals); parquet mode
        reads the partitioned export tree."""
        if self.catalog is not None:
            return self.catalog.read_table(self.spark, table, **prune)
        if prune:
            raise ValueError("pruning kwargs require sink='catalog'")
        return self.spark.read.parquet(str(self.export_root / table))

    # -- status tables --
    def server_row(self) -> dict[str, Any]:
        st = self.receiver.stats
        buf = self.receiver.buffered_bytes_by_signal()
        return {
            "uri": self.uri.canonical,
            "url": self.uri.url,
            "transport": (f"otap/{self.receiver.transport}"
                          if self.receiver.formats == "otap"
                          else self.receiver.transport),
            "sink": self.sink,
            "accept_workers": self.receiver.accept_workers,
            "buffered_bytes": self.receiver.buffered_bytes,
            "logs_buffered_bytes": buf["logs"],
            "traces_buffered_bytes": buf["traces"],
            "metrics_buffered_bytes": buf["metrics"],
            "admitted_bytes_total": st.admitted_bytes_total,
            "logs_admitted_bytes": st.per_signal_admitted_bytes["logs"],
            "traces_admitted_bytes": st.per_signal_admitted_bytes["traces"],
            "metrics_admitted_bytes": st.per_signal_admitted_bytes["metrics"],
            "ingress_ewma_bytes_per_sec": round(self._update_ewma(), 1),
            "requests_total": st.requests_total,
            "accepted_requests": st.accepted_requests,
            "rejected_auth": st.rejected_auth,
            "rejected_413": st.rejected_413,
            "rejected_415": st.rejected_415,
            "rejected_503": st.rejected_503,
            "skipped_summary_points": st.skipped_summary_points,
            "skipped_nan_points": st.skipped_nan_points,
            "seal_malformed_lines": self.seal_malformed_total,
            "logs_requests": st.per_signal_requests["logs"],
            "traces_requests": st.per_signal_requests["traces"],
            "metrics_requests": st.per_signal_requests["metrics"],
            "seals_total": self._seal_seq,
            "seal_failures_total": self.seal_failures_total,
            "seal_restarts_total": self.seal_restarts_total,
            "sealed_rows_total": self.sealed_rows_total,
            "last_seal_unix_ms": self.last_seal_unix_ms,
            "maintenance_runs_total": self.maintenance_runs_total,
            "ready": self._ready(),
        }


# ---------------------------------------------------------------------------
# Registry surface (reference: src/otlp_storage.cpp:33-162)
# ---------------------------------------------------------------------------

_SERVERS: dict[str, OtlpSparkServer] = {}
_REG_LOCK = threading.Lock()

# explicit schema: server_row() has nullable fields (last_seal_unix_ms)
_SERVER_ROW_SCHEMA = (
    "uri string, url string, transport string, sink string, "
    "accept_workers long, buffered_bytes long, logs_buffered_bytes long, "
    "traces_buffered_bytes long, metrics_buffered_bytes long, "
    "admitted_bytes_total long, logs_admitted_bytes long, "
    "traces_admitted_bytes long, metrics_admitted_bytes long, "
    "ingress_ewma_bytes_per_sec double, "
    "requests_total long, accepted_requests long, "
    "rejected_auth long, rejected_413 long, rejected_415 long, "
    "rejected_503 long, skipped_summary_points long, skipped_nan_points long, "
    "seal_malformed_lines long, "
    "logs_requests long, traces_requests long, "
    "metrics_requests long, seals_total long, seal_failures_total long, "
    "seal_restarts_total long, sealed_rows_total long, last_seal_unix_ms long, "
    "maintenance_runs_total long, ready boolean")


def otlp_serve(spark: SparkSession, uri: str, **params) -> DataFrame:
    """Start a listener; one row back, like the reference's table function
    (reference: otlp_start_stop.cpp:41-298). Duplicate URIs are rejected."""
    server = OtlpSparkServer(spark, uri, **params)
    key = server.uri.canonical
    with _REG_LOCK:
        if key in _SERVERS:
            raise ValueError(f"listener already registered for {key}")
        _SERVERS[key] = server
    try:
        server.start()
    except Exception:
        with _REG_LOCK:
            _SERVERS.pop(key, None)
        raise
    if server.uri.canonical != key:  # port 0 resolved to the bound port
        with _REG_LOCK:
            _SERVERS[server.uri.canonical] = _SERVERS.pop(key)
    return spark.createDataFrame([server.server_row()], schema=_SERVER_ROW_SCHEMA)


def _get(uri: str) -> OtlpSparkServer:
    key = parse_otlp_uri(uri).canonical
    with _REG_LOCK:
        if key not in _SERVERS:
            raise ValueError(f"no listener registered for {key}")
        return _SERVERS[key]


def otlp_flush(spark: SparkSession, uri: str) -> DataFrame:
    return spark.createDataFrame([_get(uri).flush()])


def otlp_maintenance(spark: SparkSession, uri: str) -> DataFrame:
    """Force a synchronous maintenance pass (compaction) for a listener's
    export tree — the manual analog of the post-seal cadence run."""
    server = _get(uri)
    server._maybe_run_maintenance()
    with server._lock:
        rows = list(server.maintenance_history) or \
            [{"run": 0, "partitions_compacted": 0, "duration_ms": 0.0, "unix_ms": 0}]
    return spark.createDataFrame(
        rows, schema="run long, partitions_compacted long, duration_ms double, unix_ms long")


def otlp_stop(spark: SparkSession, uri: str, drain: bool = True) -> DataFrame:
    server = _get(uri)
    result = server.stop(drain=drain)
    with _REG_LOCK:
        _SERVERS.pop(server.uri.canonical, None)
    return spark.createDataFrame([result])


def otlp_server_list(spark: SparkSession) -> DataFrame:
    with _REG_LOCK:
        rows = [s.server_row() for s in _SERVERS.values()]
    return spark.createDataFrame(rows, schema=_SERVER_ROW_SCHEMA)


def otlp_server_log(spark: SparkSession, uri: str) -> DataFrame:
    """The listener's observability log channel — the analog of querying
    duckdb_logs for the reference's duckdb_otlp log type
    (reference: otlp_server.cpp:369-378, serve.md:347)."""
    server = _get(uri)
    with server._lock:
        rows = list(server.server_log)
    return spark.createDataFrame(
        rows, schema="unix_ms long, level string, message string")


def otlp_seal_list(spark: SparkSession, uri: str) -> DataFrame:
    server = _get(uri)
    with server._lock:
        rows = [vars(e).copy() for e in server.seal_history]
    if not rows:
        return spark.createDataFrame(
            [], schema=("seal_sequence long, table string, rows long, "
                        "batch_id long, append_ms double, commit_ms double, "
                        "status string, error string, unix_ms long"))
    return spark.createDataFrame(rows)
