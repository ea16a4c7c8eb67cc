"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints one JSON line.

Usage: python bench.py [--sf-dir DIR] [--cpus N]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from duckdb_otlp_spark.queries import QUERIES  # noqa: E402
from duckdb_otlp_spark.session import get_spark  # noqa: E402

# Headline set: the L1–L8-style probe shapes + TPC-H-shaped joins/aggs +
# the beyond-reference pipeline operators (BASELINE.md query-probe analog).
BENCH_QUERIES = [
    "tail_topk",          # L1 service tail top-k
    "point_lookup",       # L2 point lookup
    "time_bucket",        # L3 5-min bucket counts
    "topn_groups",        # L4 top-N groups
    "json_extract",       # L5 JSON-attr filter
    "ilike_search",       # L6 body ILIKE sweep
    "date_trunc",         # L8 per-period histogram
    "tpch_q1",
    "tpch_q3",
    "tpch_q6",
    "join_multi",
    "window_topk_per_group",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ngram_jaccard",
    "ann_cosine_topk",
    "embedding_bucket_ann",
]


def run_ingest_bench(spark, n_requests: int = 100, batch: int = 1000,
                     workers: int = 4) -> dict:
    """Live-ingest throughput: POST gzip OTLP/JSON log batches from
    `workers` threads (the reference's producer shape: 4 workers, batch
    1000 — BASELINE.md capacity gate), then flush to parquet.

    accept = 202-acceptance rate (the reference's headline number);
    e2e = through the seal to queryable parquet."""
    import gzip
    import tempfile
    import threading
    import urllib.request

    from duckdb_otlp_spark.streaming import otlp_serve, otlp_stop
    from duckdb_otlp_spark.streaming.server import _get

    def envelope(req_id: int) -> bytes:
        recs = [{"timeUnixNano": str(1700000000_000000000 + req_id * batch + i),
                 "severityNumber": 9, "severityText": "INFO",
                 "body": {"stringValue": f"benchmark log line {req_id}-{i}"},
                 "attributes": [{"key": "k", "value": {"stringValue": str(i % 7)}}]}
                for i in range(batch)]
        env = {"resourceLogs": [{
            "resource": {"attributes": [
                {"key": "service.name", "value": {"stringValue": f"svc-{req_id % 16}"}}]},
            "scopeLogs": [{"scope": {"name": "bench"}, "logRecords": recs}]}]}
        return gzip.compress(json.dumps(env, separators=(",", ":")).encode())

    bodies = [envelope(i) for i in range(n_requests)]
    work = tempfile.mkdtemp(prefix="ingest_bench_")
    info = otlp_serve(spark, "otlp://127.0.0.1:0", work_dir=work,
                      disable_auth=True, seal_max_age_ms=2000).collect()[0]
    server = _get(info["uri"])
    url = info["url"] + "/v1/logs"
    errors: list[str] = []

    def post_range(lo: int, hi: int) -> None:
        for i in range(lo, hi):
            req = urllib.request.Request(url, data=bodies[i], headers={
                "Content-Type": "application/json", "Content-Encoding": "gzip"})
            try:
                with urllib.request.urlopen(req, timeout=60) as resp:
                    if resp.status != 202:
                        errors.append(f"status {resp.status}")
            except Exception as e:  # noqa: BLE001
                errors.append(str(e))

    per = n_requests // workers
    threads = [threading.Thread(target=post_range, args=(w * per, (w + 1) * per))
               for w in range(workers)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    accept_s = time.perf_counter() - t0
    try:
        server.flush()
        e2e_s = time.perf_counter() - t0
        total = per * workers * batch
        sealed = spark.read.parquet(str(server.export_root / "otlp_logs")).count()
    finally:
        otlp_stop(spark, info["uri"], drain=False)
    return {
        "records": total,
        "accept_logs_per_sec": round(total / accept_s, 1),
        "e2e_logs_per_sec": round(total / e2e_s, 1),
        "sealed_rows": sealed,
        "errors": len(errors),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", default="", help="comma-separated subset")
    ap.add_argument("--no-ingest", action="store_true",
                    help="skip the live-ingest throughput measurement")
    args = ap.parse_args()

    spark = get_spark("duckdb-otlp-spark-bench", cpus=args.cpus)
    names = [q for q in (args.queries.split(",") if args.queries else BENCH_QUERIES)
             if q in QUERIES]

    # Warm the JVM + file listing once so timings measure query execution.
    QUERIES["count_distinct"](spark, args.sf_dir).collect()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        df = QUERIES[name](spark, args.sf_dir)
        n = df.count() if name == "window_running_sum" else len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0

    total = round(sum(timings.values()), 4)
    m = re.search(r"sf([\d.]+)", args.sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None
    out = {
        "metric": "headline_query_wall_seconds_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": args.cpus,
    }
    if not args.no_ingest:
        try:
            out["ingest"] = run_ingest_bench(spark)
        except Exception as e:  # noqa: BLE001 — never lose the query numbers
            out["ingest"] = {"error": str(e)[:200]}
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
