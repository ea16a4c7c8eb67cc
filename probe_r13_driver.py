"""Driver-overhead microbenchmark for the r13 optimization round.

Quantifies the fixed per-query driver costs the bench wall pays at
sf0.1 (guide §1.2 step 1 / §7.3): spark.read.parquet relation
resolution, .rdd.getNumPartitions partition probes, Column-tree
construction via py4j vs a single parsed SQL string, and bare job
launch overhead. Appends results to PROBE_R13_DRIVER.json.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import functions as F  # noqa: E402

from duckdb_otlp_spark.session import get_spark  # noqa: E402


def t(fn, n=5):
    """Median-of-n wall ms."""
    walls = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        walls.append((time.perf_counter() - t0) * 1000)
    walls.sort()
    return round(walls[n // 2], 1)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("r13-driver-probe", cpus=cpus)
    out: dict = {"sf_dir": sf_dir, "cpus": cpus}

    # 1. relation resolution: read.parquet with/without explicit schema
    p_events = f"{sf_dir}/events.parquet"
    p_li = f"{sf_dir}/lineitem.parquet"
    sch = spark.read.parquet(p_events).schema  # warm + capture
    sch_li = spark.read.parquet(p_li).schema
    out["read_parquet_infer_ms"] = t(lambda: spark.read.parquet(p_events))
    out["read_parquet_schema_ms"] = t(
        lambda: spark.read.schema(sch).parquet(p_events))
    out["read_parquet_infer_li_ms"] = t(lambda: spark.read.parquet(p_li))
    out["read_parquet_schema_li_ms"] = t(
        lambda: spark.read.schema(sch_li).parquet(p_li))

    # 2. partition-count probes
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out["rdd_getnumpartitions_ms"] = t(lambda: spark.read.parquet(
        f"{sf_dir}/documents.parquet").rdd.getNumPartitions())
    out["inputfiles_ms"] = t(lambda: spark.read.parquet(
        f"{sf_dir}/documents.parquet").inputFiles())

    # 3. expression-tree build: the minhash signature select via py4j
    #    Columns vs one selectExpr string (results not executed)
    from duckdb_otlp_spark.queries import _base_hashes, _minhash_cols

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def build_py4j():
        hs = _base_hashes(text="text")
        d = docs.select("doc_id", hs.alias("hs"))
        return d.select("doc_id", *_minhash_cols("hs"))

    out["minhash_build_py4j_ms"] = t(build_py4j)

    # 4. schema access cost (py4j StructType fetch)
    out["df_schema_ms"] = t(lambda: spark.read.parquet(p_events).schema)

    # 5. bare job launch: spark.range(1).count() — floor per Spark job
    spark.range(1).count()
    out["bare_job_ms"] = t(lambda: spark.range(1).count(), n=7)

    # 6. full query build walls for representative queries (build only)
    from duckdb_otlp_spark.queries import QUERIES
    for name in ("tail_topk", "tpch_q1", "tpch_q3", "minhash_lsh_pairs",
                 "sessionize", "json_extract"):
        out[f"build_{name}_ms"] = t(lambda n=name: QUERIES[n](spark, sf_dir),
                                    n=3)
        spark.catalog.clearCache()

    path = Path(__file__).resolve().parent / "PROBE_R13_DRIVER.json"
    existing = json.loads(path.read_text()) if path.exists() else {}
    existing[os.environ.get("PROBE_TAG", "idle")] = out
    path.write_text(json.dumps(existing, indent=1))
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
