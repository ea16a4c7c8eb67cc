"""OTAP typed-path envelope-slicing probe (r12 VERDICT "What's wrong" #1).

Before r13, `_otap_envelopes` emitted ONE Arrow struct row per FILE: a
multi-MB OTAP message (legal under the 100 MB per-file cap, reference
contract: one self-contained BatchArrowRecords per file,
test/sql/read_otap.test) became one enormous JVM struct row — the same
heap-cliff shape that OOM'd the unsliced protobuf read at the
4M-record tier (see PROBE_PB_DECODE.json / a6a0595). r13 routes the
decoded envelope through the same `slice_envelope` bound
(MAX_ENVELOPE_SLICE_RECORDS innermost records per emitted row).

This probe writes N-record synthetic .bar files (independent test-side
encoder, same wire layout as tests/test_read_otap.py::_encode_bar_logs)
and reads them end-to-end (decode + flatten + aggregate) in a fresh
JVM per mode so `--driver-memory` binds:

  sliced    — shipped path (bounded rows)
  unsliced  — max_slice_records=2**62 control (one row per file)

Usage:
  python probe_otap_slice.py --records-per-file 1000000 --files 4 \
      --driver-mem 16g --cpus 32
"""

from __future__ import annotations

import argparse
import io
import json
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def encode_bar_logs(n: int, seed: int) -> bytes:
    """Minimal canonical BatchArrowRecords logs file (payload type 30),
    one (resource, scope) group, n records."""
    import pyarrow as pa
    import pyarrow.ipc as ipc

    def varint(x: int) -> bytes:
        out = b""
        while True:
            b7 = x & 0x7F
            x >>= 7
            out += bytes([b7 | (0x80 if x else 0)])
            if not x:
                return out

    def ld(field: int, payload: bytes) -> bytes:
        return varint((field << 3) | 2) + varint(len(payload)) + payload

    def vi(field: int, val: int) -> bytes:
        return varint((field << 3) | 0) + varint(val)

    base = 1700000000000000000 + seed * 1_000_000_000
    tbl = pa.table({
        "id": pa.array([None] * n, pa.uint16()),
        "resource": pa.array([{"id": 0}] * n,
                             pa.struct([("id", pa.uint16())])),
        "scope": pa.array([{"id": 0}] * n, pa.struct([("id", pa.uint16())])),
        "schema_url": pa.array([None] * n, pa.string()),
        "time_unix_nano": pa.array([base + i * 1000 for i in range(n)],
                                   pa.timestamp("ns")),
        "observed_time_unix_nano": pa.array([0] * n, pa.timestamp("ns")),
        "trace_id": pa.array([None] * n, pa.binary(16)),
        "span_id": pa.array([None] * n, pa.binary(8)),
        "severity_number": pa.array([9 + (i % 3) * 4 for i in range(n)],
                                    pa.int32()),
        "severity_text": pa.array([("INFO", "WARN", "ERROR")[i % 3]
                                   for i in range(n)], pa.string()),
        "body": pa.array(
            [{"type": 1,
              "str": f"GET /api/v1/resource/{i} 200 OK latency={i % 97}ms"}
             for i in range(n)],
            pa.struct([("type", pa.uint8()), ("str", pa.string())])),
        "dropped_attributes_count": pa.array([0] * n, pa.uint32()),
        "flags": pa.array([None] * n, pa.uint32()),
        "event_name": pa.array([None] * n, pa.string()),
    })
    sink = io.BytesIO()
    with ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return ld(2, vi(2, 30) + ld(3, sink.getvalue()))


def run_mode(mode: str, data_dir: str, cpus: int) -> dict:
    """Child entry: one fresh SparkSession, read + aggregate, one JSON
    line on stdout."""
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from duckdb_otlp_spark.sources.otap import _otap_envelopes
    from duckdb_otlp_spark.sources.otlp_json import flatten_logs

    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .appName(f"probe-otap-slice-{mode}")
             .config("spark.sql.shuffle.partitions", str(cpus))
             .getOrCreate())
    max_slice = None if mode == "sliced" else 2 ** 62
    t0 = time.monotonic()
    df = flatten_logs(_otap_envelopes(
        spark, str(data_dir), "logs", max_slice_records=max_slice))
    agg = df.agg(F.count("*").alias("n"),
                 F.sum(F.length("body")).alias("body_bytes")).collect()[0]
    wall = time.monotonic() - t0
    return {"mode": mode, "wall_s": round(wall, 2), "rows": agg["n"],
            "body_bytes": agg["body_bytes"]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records-per-file", type=int, default=1_000_000)
    ap.add_argument("--files", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--driver-mem", default="16g")
    ap.add_argument("--timeout", type=int, default=900)
    ap.add_argument("--data-dir", default="/tmp/probe_otap_slice")
    ap.add_argument("--out", default="PROBE_OTAP_SLICE.json")
    ap.add_argument("--child-mode", default=None, help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.child_mode:
        print(json.dumps(run_mode(args.child_mode, args.data_dir, args.cpus)))
        return

    data_dir = Path(args.data_dir)
    data_dir.mkdir(parents=True, exist_ok=True)
    total_bytes = 0
    for f in range(args.files):
        p = data_dir / f"logs-{f:03d}.bar"
        if not p.exists():
            p.write_bytes(encode_bar_logs(args.records_per_file, f))
        total_bytes += p.stat().st_size
    print(f"data: {args.files} files x {args.records_per_file} records, "
          f"{total_bytes / 1e6:.1f} MB", file=sys.stderr)

    results = {}
    for mode in ("sliced", "unsliced"):
        cmd = [sys.executable, __file__, "--child-mode", mode,
               "--data-dir", str(data_dir), "--cpus", str(args.cpus),
               "--records-per-file", str(args.records_per_file)]
        env = dict(__import__("os").environ)
        env["PYSPARK_SUBMIT_ARGS"] = (
            f"--driver-memory {args.driver_mem} pyspark-shell")
        t0 = time.monotonic()
        try:
            out = subprocess.run(cmd, capture_output=True, text=True,
                                 timeout=args.timeout, env=env)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            if out.returncode == 0 and line:
                results[mode] = json.loads(line[-1])
            else:
                tail = (out.stderr or out.stdout).splitlines()[-15:]
                results[mode] = {"mode": mode, "failed": True,
                                 "returncode": out.returncode,
                                 "wall_s": round(time.monotonic() - t0, 2),
                                 "tail": tail}
        except subprocess.TimeoutExpired:
            results[mode] = {"mode": mode, "failed": True,
                             "timeout_s": args.timeout}
        print(json.dumps(results[mode]), file=sys.stderr)

    artifact = {
        "records_per_file": args.records_per_file,
        "files": args.files,
        "total_mb": round(total_bytes / 1e6, 1),
        "cpus": args.cpus,
        "driver_mem": args.driver_mem,
        "sliced": results.get("sliced"),
        "unsliced_control": results.get("unsliced"),
    }
    Path(args.out).write_text(json.dumps(artifact, indent=1) + "\n")
    print(json.dumps(artifact))


if __name__ == "__main__":
    main()
