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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                       "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--queries", default="", help="comma-separated subset")
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
    print(json.dumps({
        "metric": "headline_query_wall_seconds_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": args.cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
