"""Per-query profiling for the r13 optimization round.

For each headline bench query: capture explain("formatted") to
plans/r13/<name>_<tag>.txt, run the bench's own min-of-2 collect
timing, and record Spark job/stage counts via the status tracker —
the measurement bed for guide §1 (measure first) and §7.2 (read the
plan). Writes PROBE_R13_PROFILE.json.

Usage: python probe_r13_profile.py [--tag before|after] [--queries a,b]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench import BENCH_QUERIES, _cpu_probe_ms, _cpu_probe_parallel_ms  # noqa: E402
from duckdb_otlp_spark.queries import QUERIES  # noqa: E402
from duckdb_otlp_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--tag", default="before")
    ap.add_argument("--queries", default="")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--no-plans", action="store_true")
    args = ap.parse_args()

    plans_dir = Path(__file__).resolve().parent / "plans" / "r13"
    plans_dir.mkdir(parents=True, exist_ok=True)

    spark = get_spark("r13-profile", cpus=args.cpus)
    sc = spark.sparkContext
    names = [q for q in (args.queries.split(",") if args.queries
                         else BENCH_QUERIES) if q in QUERIES]

    QUERIES["count_distinct"](spark, args.sf_dir).collect()  # warm

    probe = [_cpu_probe_ms(), _cpu_probe_parallel_ms(args.cpus)]
    out: dict = {"tag": args.tag, "sf_dir": args.sf_dir, "cpus": args.cpus,
                 "probe_ms": probe, "queries": {}}
    for name in names:
        sc.setJobDescription(f"r13-profile:{name}")
        # plan capture happens OUTSIDE the timed runs
        if not args.no_plans:
            df = QUERIES[name](spark, args.sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            (plans_dir / f"{name}_{args.tag}.txt").write_text(plan)
            spark.catalog.clearCache()
        runs = []
        jobs_per_run = []
        build_ms = []
        for _ in range(args.runs):
            jobs0 = sc.statusTracker().getJobIdsForGroup(None)
            t0 = time.perf_counter()
            df = QUERIES[name](spark, args.sf_dir)
            t_build = time.perf_counter()
            n = len(df.collect())
            runs.append(round(time.perf_counter() - t0, 4))
            build_ms.append(round((t_build - t0) * 1000, 1))
            jobs1 = sc.statusTracker().getJobIdsForGroup(None)
            jobs_per_run.append(len(set(jobs1) - set(jobs0)))
            assert n >= 0
            spark.catalog.clearCache()
        out["queries"][name] = {
            "min_s": min(runs), "raw_s": runs, "build_ms": build_ms,
            "jobs": jobs_per_run}
        sc.setJobDescription(None)
    out["probe_ms_after"] = [_cpu_probe_ms(), _cpu_probe_parallel_ms(args.cpus)]
    out["total_min_s"] = round(sum(q["min_s"] for q in out["queries"].values()), 3)
    path = Path(__file__).resolve().parent / "PROBE_R13_PROFILE.json"
    existing = json.loads(path.read_text()) if path.exists() else {}
    existing[args.tag] = out
    path.write_text(json.dumps(existing, indent=1))
    print(json.dumps({k: v["min_s"] for k, v in out["queries"].items()}))
    print("total", out["total_min_s"])
    spark.stop()


if __name__ == "__main__":
    main()
