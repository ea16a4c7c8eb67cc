"""Standalone ingest daemon: ``python -m duckdb_otlp_spark [uri]``.

The Spark analog of the reference's Docker daemon (reference:
src/server/main.cpp, src/server/server_config.cpp): env-var + CLI
config, a long-running listener, SIGTERM/SIGINT graceful stop with a
final drain, and a non-clean exit code when the drain drops data
(reference contract: non-clean-exit on dropped rows).

Environment (CLI flags override):
  OTLP_SPARK_URI             listen URI (default otlp://0.0.0.0:4318)
  OTLP_SPARK_WORK_DIR        spool + checkpoint + export root
  OTLP_SPARK_EXPORT_ROOT     export tree override
  OTLP_SPARK_AUTH_TOKEN      bearer token (>=16 chars); unset -> generated
  OTLP_SPARK_DISABLE_AUTH    "1" to disable auth
  OTLP_SPARK_SEAL_MAX_AGE_MS seal age trigger (default 5000)
  OTLP_SPARK_PROMOTE_RESOURCE comma-separated resource attr keys
  OTLP_SPARK_PROMOTE_SCOPE    comma-separated scope attr keys
  OTLP_SPARK_TRANSPORT       "http" (default) or "grpc"
  OTLP_SPARK_SINK            "parquet" (default) or "catalog"
  OTLP_SPARK_ACCEPT_WORKERS  SO_REUSEPORT accept processes (default 2)
  OTLP_SPARK_CREATE_TABLES   "0" to fail fast on missing catalog tables
  SPARK_GRAFT_CPUS           local[N] parallelism
"""

from __future__ import annotations

import argparse
import os
import signal
import sys
import threading

from duckdb_otlp_spark.session import get_spark
from duckdb_otlp_spark.streaming import otlp_serve, otlp_stop
from duckdb_otlp_spark.streaming.server import _get


def _split(v: str | None) -> list[str]:
    return [s.strip() for s in (v or "").split(",") if s.strip()]


def main(argv: list[str] | None = None) -> int:
    env = os.environ.get
    ap = argparse.ArgumentParser(prog="duckdb_otlp_spark")
    ap.add_argument("uri", nargs="?", default=env("OTLP_SPARK_URI", "otlp://0.0.0.0:4318"))
    ap.add_argument("--work-dir", default=env("OTLP_SPARK_WORK_DIR"))
    ap.add_argument("--export-root", default=env("OTLP_SPARK_EXPORT_ROOT"))
    ap.add_argument("--auth-token", default=env("OTLP_SPARK_AUTH_TOKEN"))
    ap.add_argument("--disable-auth", action="store_true",
                    default=env("OTLP_SPARK_DISABLE_AUTH") == "1")
    ap.add_argument("--seal-max-age-ms", type=int,
                    default=int(env("OTLP_SPARK_SEAL_MAX_AGE_MS", "5000")))
    ap.add_argument("--promote-resource",
                    default=env("OTLP_SPARK_PROMOTE_RESOURCE", ""))
    ap.add_argument("--promote-scope", default=env("OTLP_SPARK_PROMOTE_SCOPE", ""))
    ap.add_argument("--transport", choices=("http", "grpc"),
                    default=env("OTLP_SPARK_TRANSPORT", "http"))
    ap.add_argument("--sink", choices=("parquet", "catalog"),
                    default=env("OTLP_SPARK_SINK", "parquet"))
    ap.add_argument("--accept-workers", type=int,
                    default=int(env("OTLP_SPARK_ACCEPT_WORKERS", "2")))
    ap.add_argument("--no-create-tables", action="store_true",
                    default=env("OTLP_SPARK_CREATE_TABLES") == "0")
    args = ap.parse_args(argv)

    spark = get_spark("otlp-spark-daemon")
    row = otlp_serve(
        spark, args.uri,
        work_dir=args.work_dir,
        export_root=args.export_root,
        auth_token=args.auth_token,
        disable_auth=args.disable_auth,
        seal_max_age_ms=args.seal_max_age_ms,
        promote_resource=_split(args.promote_resource),
        promote_scope=_split(args.promote_scope),
        transport=args.transport,
        sink=args.sink,
        accept_workers=args.accept_workers,
        create_tables=not args.no_create_tables,
    ).collect()[0]
    server = _get(row["uri"])
    print(f"listening on {row['url']} (uri {row['uri']})", flush=True)
    if not args.disable_auth and not args.auth_token:
        print(f"auth token: {server.receiver.auth_token}", flush=True)

    stop_evt = threading.Event()
    for sig in (signal.SIGTERM, signal.SIGINT):
        signal.signal(sig, lambda *_: stop_evt.set())
    stop_evt.wait()

    try:
        dropped = server.stop()["dropped_bytes"]
    except Exception as e:  # noqa: BLE001 — report, exit non-clean
        print(f"stop failed: {e}", flush=True)
        return 1
    print(f"stopped; dropped_bytes={dropped}", flush=True)
    try:
        spark.stop()
    except Exception:  # noqa: BLE001
        pass
    return 0 if dropped == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
