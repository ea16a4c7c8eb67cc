"""DataSource-surface scale probe (r11 VERDICT #1).

Measures `spark.read.format("otlp")` against the function API
(`read_otlp_logs`) on the SAME generated pb and JSONL file sets — the
judge's done-criterion is the format API within ~1.5x of the function
API at >=1M rows. Reuses probe_pb_decode's generator so the inputs are
identical in shape to the recorded pb probe.

Usage:
  python probe_datasource_scale.py --records 1000000 --files 32 --cpus 8
  python probe_datasource_scale.py --records 4000000 --files 64 --cpus 32
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path
import sys

sys.path.insert(0, str(Path(__file__).resolve().parent))

from probe_pb_decode import generate  # noqa: E402


def _measure(build_df, n_expect: int, repeats: int) -> dict:
    from pyspark.sql import functions as F
    walls = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        row = (build_df()
               .agg(F.count("*").alias("n"),
                    F.max(F.length("body")).alias("max_body"),
                    F.min("time_unix_nano").alias("t0"))
               .collect()[0])
        walls.append(time.perf_counter() - t0)
        assert row["n"] == n_expect, (row["n"], n_expect)
    best = min(walls)
    return {"wall_s": [round(w, 3) for w in walls], "best_s": round(best, 3),
            "rec_per_s": round(n_expect / best)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=1_000_000)
    ap.add_argument("--files", type=int, default=32)
    ap.add_argument("--cpus", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--out", default="/tmp/ds_probe")
    ap.add_argument("--skip-generate", action="store_true")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    if not args.skip_generate:
        generate(args.out, args.records, args.files, args.cpus)
    n = (args.records // args.files) * args.files

    from duckdb_otlp_spark.session import get_spark
    from duckdb_otlp_spark.sources.datasource import register
    from duckdb_otlp_spark.sources.otlp_json import read_otlp_logs
    spark = get_spark("ds_probe", cpus=args.cpus)
    register(spark)

    res = {"records": n, "files": args.files, "cpus": args.cpus}
    for fmt_name, sub in (("pb", "pb/*.pb"), ("jsonl", "jsonl/*.jsonl")):
        path = f"{args.out}/{sub}"
        fn = _measure(lambda: read_otlp_logs(spark, path), n, args.repeats)
        ds = _measure(
            lambda: (spark.read.format("otlp").option("signal", "logs")
                     .load(path)), n, args.repeats)
        res[fmt_name] = {
            "function_api": fn, "format_api": ds,
            "format_vs_function_ratio": round(ds["best_s"] / fn["best_s"], 2)}
    spark.stop()
    out = json.dumps(res)
    print(out, flush=True)
    if args.json_out:
        Path(args.json_out).write_text(out + "\n")


if __name__ == "__main__":
    main()
