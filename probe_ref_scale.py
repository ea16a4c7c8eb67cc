#!/usr/bin/env python3
"""Reference-scale query probe: the repo's layout/pruning doctrine measured
at the reference's OWN published campaign scale — 20M rows / 24h / 16
services with the reference generator's known selectivities
(reference: benchmark/otlp-query-probe/probe.py:27-36 vocabulary,
:104-169 column distributions, :384-392 window anchors, :401-483 query
matrix, :496-531 scan-cost metric) — re-expressed Spark-first:

- the dataset is generated DISTRIBUTED (spark.range + xxhash64 column
  streams, no driver loop) with the same per-column distributions:
  service uniform/16, status 92/5/3, severity 60/25/10/4/1 over
  9/5/13/17/21, 70% traced rows over an n/20 trace pool, one needle
  trace row per 1M rows, 5% common-token and 0.01% rare-phrase bodies;
- the four PRIMARY layout variants are parquet datasets shaped by
  repartitionByRange + sortWithinPartitions (the Spark spelling of the
  reference's ORDER BY rewrite): baseline (time-ordered, ~2M rows/file),
  sorted_service_time, sorted_trace_id, promoted (hot JSON attrs lifted
  to typed columns — the L5 doctrine);
- the PRIMARY metric is the reference's: files (and MB) a query must
  read after file-level min/max pruning on (time window, equality
  column), computed from the parquet footers the same way the
  reference computes it from DuckLake column stats;
- warm wall-clock is the SECONDARY metric (median of --repeats runs of
  the Spark SQL), bracketed by the same single-thread CPU probe the
  headline bench records so a contended sample indicts itself.

Run:  python probe_ref_scale.py [--rows 20000000] [--out /tmp/probe_ref]
Emits one JSON document to PROBE_REF_SCALE.json (and stdout tail).
"""

from __future__ import annotations

import argparse
import datetime as dt
import hashlib
import json
import statistics
import time
from pathlib import Path

from pyspark.sql import DataFrame, functions as F

# generator vocabulary — parity with the reference probe's controlled
# dataset (reference: benchmark/otlp-query-probe/probe.py:47-75); the
# values are the experiment's fixed parameters, not code
SERVICES = ["checkout", "cart", "payment", "frontend", "catalogue",
            "shipping", "inventory", "recommendation", "auth", "email",
            "currency", "ad", "quote", "accounting", "fraud",
            "loadgenerator"]
ROUTES = ["/api/cart", "/api/checkout", "/api/products", "/api/orders",
          "/api/payment", "/api/shipping", "/api/users",
          "/api/recommendations", "/api/ads", "/api/currency",
          "/api/health", "/api/search"]
NAMESPACES = ["payments", "frontend", "platform", "data"]
EVENTS = ["http.server.request", "db.query", "cache.lookup", "rpc.call",
          "startup"]
NEEDLE_HEX = hashlib.md5(b"__otlp_probe_needle__").hexdigest()
RARE_PHRASE = "connection reset by peer"
SVC = "checkout"
START_TS = "2026-06-04 00:00:00"
SEED = 1337


def _pick(col, values):
    return F.element_at(F.array(*[F.lit(v) for v in values]),
                        (col % len(values)).cast("int") + 1)


def generate(spark, rows: int, span_hours: int) -> DataFrame:
    """The 18-column otlp_logs dataset as ONE distributed expression
    tree over spark.range — the Spark spelling of the reference's
    gen_select (pure SQL over range(), probe.py:104-169). Independent
    uniform streams come from xxhash64 at distinct offsets."""
    span_us = span_hours * 3600 * 1_000_000
    start_us = int(dt.datetime.fromisoformat(START_TS)
                   .replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    step_us = max(1, span_us // rows)
    needle_period = max(1, rows // 20)      # ~20 needle rows
    trace_pool = max(1000, rows // 20)

    i = F.col("id")

    def h(k: int):
        return F.abs(F.xxhash64(i + F.lit(SEED + k * 1000000007)))

    t_us = (F.lit(start_us) + i * step_us + (h(1) % 2000000)).cast("long")
    status = (F.when(h(5) % 100 < 92, 200)
              .when(h(5) % 100 < 97, 404).otherwise(500))
    sev = (F.when(h(6) % 1000 < 600, 9).when(h(6) % 1000 < 850, 5)
           .when(h(6) % 1000 < 950, 13).when(h(6) % 1000 < 990, 17)
           .otherwise(21))
    is_needle = (i % needle_period) == needle_period // 2
    has_trace = (h(7) % 10) >= 3
    trace_id = (F.when(is_needle, F.lit(NEEDLE_HEX))
                .when(~has_trace, F.lit(None).cast("string"))
                .otherwise(F.md5((h(8) % trace_pool).cast("string"))))
    route = _pick(h(3), ROUTES)
    ns = _pick(h(4), NAMESPACES)
    service = _pick(h(2), SERVICES)
    took_ms = h(9) % 2000
    body = F.concat(
        F.lit("GET "), route, F.lit(" status="), status.cast("string"),
        F.lit(" took="), took_ms.cast("string"), F.lit("ms"),
        F.when(h(10) % 10000 < 500, F.lit(" latency=high")).otherwise(F.lit("")),
        F.when(h(11) % 1000000 < 100,
               F.lit(f" error: {RARE_PHRASE}")).otherwise(F.lit("")))
    return spark.range(rows).select(
        F.timestamp_micros(t_us).cast("timestamp_ntz").alias("time_unix_nano"),
        F.timestamp_micros(t_us + (h(15) % 50000).cast("long"))
         .cast("timestamp_ntz").alias("observed_time_unix_nano"),
        trace_id.alias("trace_id"),
        F.when(trace_id.isNull(), F.lit(None).cast("string"))
         .otherwise(F.substring(F.md5(i.cast("string")), 1, 16)).alias("span_id"),
        service.alias("service_name"),
        F.lit("otel-demo").alias("service_namespace"),
        F.concat(service, F.lit("-"), (h(12) % 6).cast("string"))
         .alias("service_instance_id"),
        sev.alias("severity_number"),
        (F.when(sev == 9, "INFO").when(sev == 5, "DEBUG")
         .when(sev == 13, "WARN").when(sev == 17, "ERROR")
         .otherwise("FATAL")).alias("severity_text"),
        _pick(h(13), EVENTS).alias("event_name"),
        body.alias("body"),
        F.concat(F.lit('{"k8s.namespace.name":"'), ns,
                 F.lit('","cloud.region":"us-west-2"}'))
         .alias("resource_attributes"),
        F.concat(F.lit("io.opentelemetry."), service).alias("scope_name"),
        F.concat(F.lit("1."), (h(14) % 5).cast("string"), F.lit(".0"))
         .alias("scope_version"),
        F.lit("{}").alias("scope_attributes"),
        F.concat(F.lit('{"http.response.status_code":'),
                 status.cast("string"), F.lit(',"http.route":"'), route,
                 F.lit('","k8s.namespace.name":"'), ns, F.lit('"}'))
         .alias("log_attributes"),
        F.lit(0).alias("dropped_attributes_count"),
        F.when(trace_id.isNull(), 0).otherwise(1).alias("flags"),
    )


def build_variants(spark, df: DataFrame, out: Path, n_files: int) -> dict:
    """The four primary layouts (reference probe.py:246-251), each as a
    repartitionByRange+sortWithinPartitions parquet write — range
    partitioning IS the clustering decision, so every file owns one
    contiguous slice of the sort key and min/max pruning can work."""
    variants = {}

    def write(name: str, vdf: DataFrame):
        path = out / name
        t0 = time.perf_counter()
        vdf.write.mode("overwrite").parquet(str(path))
        variants[name] = {"path": str(path),
                          "write_s": round(time.perf_counter() - t0, 1)}

    write("baseline",
          df.repartitionByRange(n_files, "time_unix_nano")
            .sortWithinPartitions("time_unix_nano"))
    write("sorted_service_time",
          df.repartitionByRange(n_files, "service_name", "time_unix_nano")
            .sortWithinPartitions("service_name", "time_unix_nano"))
    write("sorted_trace_id",
          df.repartitionByRange(n_files, "trace_id")
            .sortWithinPartitions("trace_id"))
    promoted = df.withColumn(
        "http_status_code",
        F.get_json_object("log_attributes",
                          "$['http.response.status_code']").cast("int")) \
        .withColumn("http_route",
                    F.get_json_object("log_attributes", "$['http.route']")) \
        .withColumn("k8s_namespace",
                    F.get_json_object("resource_attributes",
                                      "$['k8s.namespace.name']"))
    write("promoted",
          promoted.repartitionByRange(n_files, "time_unix_nano")
                  .sortWithinPartitions("time_unix_nano"))
    return variants


def windows(span_hours: int) -> dict:
    """15m/1h anchored mid-span, 24h = whole span (probe.py:384-392)."""
    start = dt.datetime.fromisoformat(START_TS)
    mid = start + dt.timedelta(hours=span_hours // 2)

    def w(lo, minutes):
        return (lo.isoformat(sep=" "),
                (lo + dt.timedelta(minutes=minutes)).isoformat(sep=" "))

    return {"15m": w(mid, 15), "1h": w(mid, 60),
            "24h": w(start, span_hours * 60)}


def query_specs(win: dict) -> list[dict]:
    """The reference's L1-L8 matrix (probe.py:401-483), restricted to
    the four primary variants."""
    svc_variants = ["baseline", "sorted_service_time"]

    def tw(w):
        return (f"time_unix_nano >= TIMESTAMP '{w[0]}' AND "
                f"time_unix_nano < TIMESTAMP '{w[1]}'")

    # time_bucket over the NTZ column: epoch math via a UTC cast
    # round-trip (the session parses the bare TIMESTAMP keyword as NTZ,
    # so the unix_micros input must name TIMESTAMP_LTZ explicitly)
    bucket = ("CAST(timestamp_micros(CAST(floor(unix_micros(CAST("
              "time_unix_nano AS TIMESTAMP_LTZ)) / {us}) * {us} AS BIGINT)) "
              "AS TIMESTAMP_NTZ)")
    b5, b1 = bucket.format(us=300_000_000), bucket.format(us=60_000_000)
    specs = [
        {"id": "L1_tail_svc", "variants": svc_variants, "window": "15m",
         "sql": f"SELECT time_unix_nano, service_name, severity_text, body "
                f"FROM v WHERE {tw(win['15m'])} AND service_name = '{SVC}' "
                f"ORDER BY time_unix_nano DESC LIMIT 200"},
        {"id": "L3_errcount_svc", "variants": svc_variants, "window": "1h",
         "sql": f"SELECT {b5} b, count(*) n FROM v WHERE service_name = "
                f"'{SVC}' AND severity_number >= 17 AND {tw(win['1h'])} "
                f"GROUP BY b ORDER BY b"},
        {"id": "L6_body_svc", "variants": svc_variants, "window": "1h",
         "sql": f"SELECT count(*) n FROM v WHERE service_name = '{SVC}' "
                f"AND body ILIKE '%{RARE_PHRASE}%' AND {tw(win['1h'])}"},
        {"id": "L8_histogram_svc", "variants": svc_variants, "window": "1h",
         "sql": f"SELECT {b1} b, count(*) n FROM v WHERE service_name = "
                f"'{SVC}' AND {tw(win['1h'])} GROUP BY b ORDER BY b"},
        {"id": "L2_trace", "window": "1h",
         "variants": ["baseline", "sorted_service_time", "sorted_trace_id"],
         "sql": f"SELECT time_unix_nano, service_name, span_id, body FROM v "
                f"WHERE trace_id = '{NEEDLE_HEX}' AND {tw(win['1h'])}"},
        *[{"id": f"L6_body_{label}", "variants": ["baseline"],
           "window": label,
           "sql": f"SELECT count(*) n FROM v WHERE body ILIKE "
                  f"'%{RARE_PHRASE}%' AND {tw(win[label])}"}
          for label in ("15m", "1h", "24h")],
        {"id": "L4_topn_service", "variants": svc_variants, "window": "1h",
         "sql": f"SELECT service_name, count(*) n FROM v WHERE "
                f"severity_number >= 17 AND {tw(win['1h'])} "
                f"GROUP BY service_name ORDER BY n DESC LIMIT 10"},
        {"id": "L5_attr_json", "variants": ["baseline"], "window": "1h",
         "sql": f"SELECT count(*) n FROM v WHERE CAST(get_json_object("
                f"log_attributes, '$[\"http.response.status_code\"]') AS INT)"
                f" = 500 AND {tw(win['1h'])}"},
        {"id": "L5_attr_promoted", "variants": ["promoted"], "window": "1h",
         "sql": f"SELECT count(*) n FROM v WHERE http_status_code = 500 "
                f"AND {tw(win['1h'])}"},
    ]
    for s in specs:
        if s["id"].endswith("_svc"):
            s["eq_col"], s["eq_val"] = "service_name", SVC
        elif s["id"] == "L2_trace":
            s["eq_col"], s["eq_val"] = "trace_id", NEEDLE_HEX
        else:
            s["eq_col"] = s["eq_val"] = None
    return specs


def _file_minmax(path: Path, cols: list[str]) -> dict:
    """Per-file min/max for ``cols`` from the parquet footer (across all
    row groups) — the same statistics a DuckLake/Iceberg catalog or
    Spark's scan-level pruning consults."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(j).name: j for j in range(md.num_columns)}
    out = {}
    for c in cols:
        lo = hi = None
        j = idx[c]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(j).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out[c] = (lo, hi)
    return out


def scan_cost(variant_path: str, win, eq_col, eq_val) -> dict:
    """PRIMARY metric, the reference's semantics verbatim
    (probe.py:496-531): a file is scanned iff its time min/max overlaps
    the window AND (no equality predicate, or the eq column's min/max
    could contain the value). File-level only; MB is the
    object-store-relevant unit."""
    lo = dt.datetime.fromisoformat(win[0])
    hi = dt.datetime.fromisoformat(win[1])
    files = sorted(Path(variant_path).glob("*.parquet"))
    ft, mt, fs, ms = 0, 0.0, 0, 0.0
    for f in files:
        size_mb = f.stat().st_size / 1e6
        ft += 1
        mt += size_mb
        cols = ["time_unix_nano"] + ([eq_col] if eq_col else [])
        mm = _file_minmax(f, cols)
        tmin, tmax = mm["time_unix_nano"]
        hit = tmin is not None and not (tmax < lo or tmin >= hi)
        if hit and eq_col:
            emin, emax = mm[eq_col]
            # all-null stats can't contain the value -> prune
            hit = emin is not None and emin <= eq_val <= emax
        if hit:
            fs += 1
            ms += size_mb
    return {"files_total": ft, "mb_total": round(mt, 1),
            "files_scanned": fs, "mb_scanned": round(ms, 1)}


def verify(spark, variants: dict, rows: int) -> dict:
    """Generator sanity at scale (the reference's verify phase): needle
    count ~20, rare-phrase rate ~1e-4, 16 services."""
    v = spark.read.parquet(variants["baseline"]["path"])
    agg = v.agg(
        F.count("*").alias("rows"),
        F.sum(F.when(F.col("trace_id") == NEEDLE_HEX, 1).otherwise(0))
         .alias("needle_rows"),
        F.sum(F.when(F.col("body").contains(RARE_PHRASE), 1).otherwise(0))
         .alias("rare_rows"),
        F.countDistinct("service_name").alias("services"),
    ).collect()[0].asDict()
    assert agg["rows"] == rows, agg
    assert 1 <= agg["needle_rows"] <= 40, agg
    assert agg["services"] == len(SERVICES), agg
    assert 0.5e-4 * rows <= agg["rare_rows"] <= 2e-4 * rows, agg
    return agg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--span-hours", type=int, default=24)
    ap.add_argument("--rows-per-file", type=int, default=2_000_000)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="/tmp/probe_ref_scale")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--skip-generate", action="store_true",
                    help="reuse an existing --out tree")
    args = ap.parse_args()

    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench import _cpu_probe_ms, _cpu_probe_parallel_ms
    from duckdb_otlp_spark.session import get_spark

    spark = get_spark("probe_ref_scale", cpus=args.cpus)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    n_files = max(1, args.rows // args.rows_per_file)

    if not args.skip_generate:
        t0 = time.perf_counter()
        df = generate(spark, args.rows, args.span_hours)
        variants = build_variants(spark, df, out, n_files)
        gen_s = round(time.perf_counter() - t0, 1)
    else:
        variants = {n: {"path": str(out / n), "write_s": None}
                    for n in ("baseline", "sorted_service_time",
                              "sorted_trace_id", "promoted")}
        gen_s = 0.0
    sanity = verify(spark, variants, args.rows)

    win = windows(args.span_hours)
    probe_before = _cpu_probe_ms()
    probe_par_before = _cpu_probe_parallel_ms(args.cpus)
    results = []
    for spec in query_specs(win):
        for vname in spec["variants"]:
            vpath = variants[vname]["path"]
            spark.read.parquet(vpath).createOrReplaceTempView("v")
            samples, rows_out = [], None
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                rows_out = len(spark.sql(spec["sql"]).collect())
                samples.append((time.perf_counter() - t0) * 1000)
            cost = scan_cost(vpath, win[spec["window"]],
                             spec["eq_col"], spec["eq_val"])
            results.append({
                "query": spec["id"], "variant": vname,
                "window": spec["window"], "result_rows": rows_out,
                "warm_ms_median": round(statistics.median(samples), 1),
                "warm_ms_all": [round(s, 1) for s in samples], **cost})
            r = results[-1]
            print(f"{r['query']:20s} {vname:22s} "
                  f"{r['files_scanned']}/{r['files_total']} files "
                  f"{r['mb_scanned']}/{r['mb_total']} MB "
                  f"{r['warm_ms_median']} ms", flush=True)
    probe_after = _cpu_probe_ms()
    probe_par_after = _cpu_probe_parallel_ms(args.cpus)

    # Split-tuning addendum: a window pruned to ONE ~119 MB file is a
    # single scan task at the default 128 MiB maxPartitionBytes, so a
    # CPU-bound predicate (body ILIKE) underutilizes the executor. The
    # knob that closes the inversion without giving up pruning is split
    # size — parquet files are splittable, so smaller splits re-
    # parallelize the one pruned file.
    tuned = []
    spec = next(s for s in query_specs(win) if s["id"] == "L6_body_1h")
    for split_mb in (128, 16):
        spark.conf.set("spark.sql.files.maxPartitionBytes",
                       str(split_mb * 1024 * 1024))
        spark.read.parquet(variants["baseline"]["path"]) \
            .createOrReplaceTempView("v")
        samples = [0.0] * args.repeats
        for r in range(args.repeats):
            t0 = time.perf_counter()
            spark.sql(spec["sql"]).collect()
            samples[r] = (time.perf_counter() - t0) * 1000
        tuned.append({"query": "L6_body_1h", "split_mb": split_mb,
                      "warm_ms_median": round(statistics.median(samples), 1)})
        print(f"L6_body_1h split={split_mb}MB "
              f"{tuned[-1]['warm_ms_median']} ms", flush=True)
    spark.conf.set("spark.sql.files.maxPartitionBytes",
                   str(128 * 1024 * 1024))

    doc = {"rows": args.rows, "span_hours": args.span_hours,
           "n_files": n_files, "generate_s": gen_s, "sanity": sanity,
           "variants": variants, "cpu_probe_ms": [probe_before, probe_after],
           "cpu_probe_parallel_ms": [probe_par_before, probe_par_after],
           "split_tuning": tuned, "results": results}
    Path(__file__).with_name("PROBE_REF_SCALE.json").write_text(
        json.dumps(doc, indent=1, default=str))
    print(json.dumps({"metric": "probe_ref_scale_queries",
                      "value": len(results), "unit": "runs",
                      "cpu_probe_ms": doc["cpu_probe_ms"]}))


if __name__ == "__main__":
    main()
