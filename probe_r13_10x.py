"""r13 10x-tier experiment bundle (r12 VERDICT #4, #7 + ADVICE audit).

Runs three measurements against the existing probe_llm_scale 20M-doc
tree, one SparkSession, sequential (clean walls):

1. dedup_cluster CC A/B — the verified near-dup edge list materializes
   to parquet once, then local union-find / shipped path-doubling /
   frontier-delta / large-star-small-star each label it. Answers
   whether the 22.7x tier ratio is the CC loop or the pairs pipeline,
   and which loop to ship.
2. SemDeDup fixed-k — the 27.8x ratio was adjudicated by the k = n/1000
   argument (10x data means 10x clusters means ~100x Lloyd work).
   Fixing k at the BASE tier's value and re-running the 10x tier makes
   that a measurement: a ~10-13x wall proves the normalization.
3. Token-hash collision audit — pmi/bigram key corpus streams by
   xxhash64(token); the oracle keys by text. countDistinct(token) ==
   countDistinct(xxhash64(token)) over the 20M-doc corpus turns the
   p < vocab²/2⁶⁵ argument into a measured zero.

Usage:
  SPARK_DRIVER_MEMORY=64g python probe_r13_10x.py --cpus 32
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import probe_cc_ab  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-dir", default="/tmp/probe_llm_scale/base")
    ap.add_argument("--sf-dir", default="/tmp/probe_llm_scale/10x")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--edges", default="/tmp/probe_cc_edges_10x.parquet")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--sections", default="cc,semdedup,audit")
    ap.add_argument("--out", default="PROBE_R13_10X.json")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from duckdb_otlp_spark.session import get_spark
    spark = get_spark("probe-r13-10x", cpus=args.cpus)
    result: dict = {"sf_dir": args.sf_dir, "cpus": args.cpus}
    sections = args.sections.split(",")

    if "cc" in sections:
        cc: dict = {}
        if args.skip_build and Path(args.edges).exists():
            cc["build"] = {"n_pairs":
                           spark.read.parquet(args.edges).count()}
        else:
            cc["build"] = probe_cc_ab.build_edges(spark, args.sf_dir,
                                                  args.edges)
        print("build", json.dumps(cc["build"]), file=sys.stderr)
        runners = {
            "local": lambda: (probe_cc_ab.run_local(spark, args.edges),
                              None),
            "pathdouble": lambda: probe_cc_ab.run_pathdouble(spark,
                                                             args.edges),
            "frontier": lambda: probe_cc_ab.run_frontier(spark, args.edges),
            "starstar": lambda: probe_cc_ab.run_starstar(spark, args.edges),
        }
        sums = {}
        for name, fn in runners.items():
            t0 = time.perf_counter()
            r = fn()
            df, rounds = r if isinstance(r, tuple) else (r, None)
            if isinstance(df, tuple):
                df, rounds = df
            cs = probe_cc_ab.checksum(df)
            wall = time.perf_counter() - t0
            sums[name] = cs
            cc[name] = {"wall_s": round(wall, 2), "rounds": rounds,
                        "n_nodes": cs[0], "n_clusters": cs[1]}
            print(name, json.dumps(cc[name]), file=sys.stderr)
        cc["labels_agree"] = len(set(sums.values())) == 1
        result["cc_ab"] = cc

    if "semdedup" in sections:
        import pyarrow.parquet as pq

        from duckdb_otlp_spark.operators.dedup import semdedup

        def n_vecs(d):
            return sum(pq.ParquetFile(str(f)).metadata.num_rows
                       for f in Path(f"{d}/embeddings.parquet")
                       .glob("*.parquet"))

        k_base = max(2, n_vecs(args.base_dir) // 1000)
        emb = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
        t0 = time.perf_counter()
        out = semdedup(emb, "vec_id", "embedding", k=k_base, tau=0.95)
        agg = out.agg(F.count("*").alias("n"),
                      F.sum(F.col("is_kept").cast("int")).alias("kept")
                      ).collect()[0]
        wall = time.perf_counter() - t0
        result["semdedup_fixed_k"] = {
            "k": k_base, "wall_s": round(wall, 2),
            "n": agg["n"], "kept": agg["kept"],
            "recorded_10x_wall_with_k_prop_n_s": 258.07,
            "recorded_base_wall_s": 9.29}
        print("semdedup", json.dumps(result["semdedup_fixed_k"]),
              file=sys.stderr)

    if "audit" in sections:
        docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        tok = (docs.select(F.explode(
                   F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
                   .alias("w"))
               .filter(F.col("w") != ""))
        t0 = time.perf_counter()
        r = tok.agg(
            F.countDistinct("w").alias("n_tokens"),
            F.countDistinct(F.xxhash64("w")).alias("n_hashes")).collect()[0]
        result["token_hash_collision_audit"] = {
            "distinct_tokens": r["n_tokens"],
            "distinct_xxhash64": r["n_hashes"],
            "collisions": r["n_tokens"] - r["n_hashes"],
            "wall_s": round(time.perf_counter() - t0, 2)}
        print("audit", json.dumps(result["token_hash_collision_audit"]),
              file=sys.stderr)

    Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
