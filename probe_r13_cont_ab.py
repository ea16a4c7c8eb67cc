"""Interleaved A/B probes for the r13 continuation session.

Each experiment times VARIANTS of one query interleaved in a single
process (variant order alternates per rep, min-of-N reported, cache
cleared between runs) so host drift hits every variant equally —
the same protocol as the r12 token-hash A/B. Results append to
PROBE_R13_CONT.json under the experiment name.

Usage: python probe_r13_cont_ab.py <experiment> [--reps N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from bench import _cpu_probe_ms, _cpu_probe_parallel_ms  # noqa: E402
from duckdb_otlp_spark import queries as Q  # noqa: E402
from duckdb_otlp_spark.session import get_spark  # noqa: E402


def _json_extract_v0(spark, sf_dir):
    """Current shape: filter on the derived column before the agg —
    Catalyst pushes the filter below the Project, so
    get_json_object runs TWICE per surviving row (Filter + Project)."""
    return Q.QUERIES["json_extract"](spark, sf_dir)


def _json_extract_v1(spark, sf_dir):
    """Single-parse variant: aggregate count per k over ALL rows, then
    filter the (low-cardinality) group rows. The k > 50 predicate
    alone would be pushed back through the Aggregate (it references
    only grouping attributes); OR-ing an always-false condition on the
    aggregate output (n < 0, count(*) >= 1 by construction) makes the
    predicate non-separable so it stays above the agg. Result set is
    identical: NULL k fails k > 50 in both shapes."""
    ev = Q._t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (ev.select(k.alias("k"))
            .groupBy("k").agg(F.count("*").alias("n"))
            .filter((F.col("k") > 50) | (F.col("n") < 0))
            .orderBy("k"))


def _embedding_ann_v0(spark, sf_dir):
    """Pre-r13-continuation shape: norms computed per PAIR inside the
    join projection (two extra O(d) folds per candidate pair)."""
    emb = Q._t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    bucket = F.concat_ws("", F.transform(
        F.slice("v", 1, 6),
        lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0"))))
    e = emb.withColumn("bucket", bucket)
    a, b = e.alias("a"), e.alias("b")
    joined = a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                    & (F.col("a.vec_id") < F.col("b.vec_id")))
    dot = F.aggregate(
        F.zip_with(F.col("a.v"), F.col("b.v"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda c: F.sqrt(F.aggregate(              # noqa: E731
        c, F.lit(0.0), lambda acc, x: acc + x * x))
    cos = F.round(dot / (norm(F.col("a.v")) * norm(F.col("b.v"))), 4)
    return (joined.select(F.col("a.vec_id").alias("vec_a"),
                          F.col("b.vec_id").alias("vec_b"),
                          cos.alias("cos_sim"))
            .orderBy(F.col("cos_sim").desc(), "vec_a", "vec_b")
            .limit(10))


def _embedding_ann_v1(spark, sf_dir):
    """Current registry entry (norm hoisted to a per-vector column)."""
    return Q.QUERIES["embedding_bucket_ann"](spark, sf_dir)


EXPERIMENTS = {
    "json_extract": [("v0_double_parse", _json_extract_v0),
                     ("v1_post_agg_filter", _json_extract_v1)],
    "embedding_ann": [("v0_per_pair_norms", _embedding_ann_v0),
                      ("v1_hoisted_norms", _embedding_ann_v1)],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("experiment")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int, default=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    variants = EXPERIMENTS[args.experiment]
    spark = get_spark("r13-cont-ab", cpus=args.cpus)
    Q.QUERIES["count_distinct"](spark, args.sf_dir).collect()  # warm

    # result parity first: all variants must return identical rows
    ref = None
    for name, fn in variants:
        rows = [tuple(r) for r in fn(spark, args.sf_dir).collect()]
        spark.catalog.clearCache()
        if ref is None:
            ref = rows
        else:
            assert rows == ref, f"{name} diverges from {variants[0][0]}"

    probe = [_cpu_probe_ms(), _cpu_probe_parallel_ms(args.cpus)]
    walls: dict[str, list[float]] = {name: [] for name, _ in variants}
    for rep in range(args.reps):
        order = variants if rep % 2 == 0 else list(reversed(variants))
        for name, fn in order:
            t0 = time.perf_counter()
            df = fn(spark, args.sf_dir)
            n = len(df.collect())
            walls[name].append(round(time.perf_counter() - t0, 4))
            assert n >= 0
            spark.catalog.clearCache()
    out = {
        "experiment": args.experiment, "reps": args.reps,
        "sf_dir": args.sf_dir, "cpus": args.cpus,
        "probe_ms": probe,
        "probe_ms_after": [_cpu_probe_ms(),
                           _cpu_probe_parallel_ms(args.cpus)],
        "parity_rows": len(ref),
        "min_s": {name: min(w) for name, w in walls.items()},
        "raw_s": walls,
    }
    path = Path(__file__).resolve().parent / "PROBE_R13_CONT.json"
    existing = json.loads(path.read_text()) if path.exists() else {}
    existing.setdefault(args.experiment, []).append(out)
    path.write_text(json.dumps(existing, indent=1))
    print(json.dumps(out["min_s"]))
    spark.stop()


if __name__ == "__main__":
    main()
