"""dedup_cluster CC-loop A/B at the 20M-doc tier (r12 VERDICT #4).

dedup_cluster's 22.7x 10x-tier ratio (PROBE_LLM_SCALE.json) bundles two
things: the MinHash pair pipeline (15.6x on its own) and the connected-
components step, which crosses the 200k-edge threshold from driver-local
union-find into the distributed min-label loop between tiers. This
probe isolates the CC step: the verified near-dup edge list is
materialized to parquet ONCE, then each variant runs over that table:

  local       — collect + driver union-find (the under-threshold path)
  pathdouble  — the shipped distributed loop (label <- min over
                neighbors, + label-of-label hop join)
  frontier    — same loop, but each round only re-propagates labels
                that changed last round (delta join, full relabel at
                the end of each round)
  starstar    — alternating large-star/small-star edge rewrites
                (Kiveris et al., the standard CC-at-scale algorithm)

Usage:
  python probe_cc_ab.py --sf-dir /tmp/probe_llm_scale/10x --cpus 32
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))


def build_edges(spark, sf_dir: str, out: str) -> dict:
    from pyspark.sql import functions as F

    from duckdb_otlp_spark.queries import _minhash_pairs_unsorted

    t0 = time.perf_counter()
    pairs = _minhash_pairs_unsorted(spark, sf_dir).select("doc_a", "doc_b")
    pairs.write.mode("overwrite").parquet(out)
    wall = time.perf_counter() - t0
    n = spark.read.parquet(out).count()
    return {"pairs_wall_s": round(wall, 1), "n_pairs": n}


def sym_edges(spark, path: str):
    from pyspark.sql import functions as F
    pairs = spark.read.parquet(path)
    return (pairs.select(F.explode(F.array(
                F.struct(F.col("doc_a"), F.col("doc_b")),
                F.struct(F.col("doc_b").alias("doc_a"),
                         F.col("doc_a").alias("doc_b")))).alias("e"))
            .select("e.doc_a", "e.doc_b"))


def checksum(df) -> tuple:
    """Order-independent label checksum: (n_rows, n_clusters, sum(id*label))."""
    from pyspark.sql import functions as F
    r = df.agg(F.count("*").alias("n"),
               F.countDistinct("cluster_id").alias("k"),
               F.sum(F.col("doc_id") * F.col("cluster_id")).alias("s")
               ).collect()[0]
    return (r["n"], r["k"], int(r["s"]))


def run_local(spark, path: str):
    from duckdb_otlp_spark.queries import _local_cc_df
    edges = [(r["doc_a"], r["doc_b"])
             for r in spark.read.parquet(path).collect()]
    return _local_cc_df(spark, edges).select("doc_id", "cluster_id")


def run_pathdouble(spark, path: str):
    """The shipped distributed loop, lifted verbatim from
    q_dedup_cluster (queries.py) minus the pairs pipeline."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    disk = StorageLevel.MEMORY_AND_DISK
    sym = sym_edges(spark, path).persist(disk)
    sym.count()
    labels = (sym.select(F.col("doc_a").alias("doc_id")).distinct()
              .withColumn("label", F.col("doc_id")).persist(disk))
    persisted = labels
    rounds = 0
    for rnd in range(20):
        rounds += 1
        nbr = (sym.join(labels.select(F.col("doc_id").alias("doc_b"), "label"),
                        "doc_b")
               .groupBy("doc_a").agg(F.min("label").alias("nbr_label")))
        cur = labels.join(nbr, labels["doc_id"] == nbr["doc_a"], "left")
        new_col = F.least(labels["label"],
                          F.coalesce(F.col("nbr_label"), labels["label"]))
        if rnd > 0:
            hop = labels.select(F.col("doc_id").alias("__lid"),
                                F.col("label").alias("hop_label"))
            cur = cur.join(hop, labels["label"] == hop["__lid"], "left")
            new_col = F.least(new_col,
                              F.coalesce(F.col("hop_label"), labels["label"]))
        new_p = (cur.select(labels["doc_id"],
                            labels["label"].alias("__old"),
                            new_col.alias("label"))
                 .persist(disk))
        changed = (new_p.filter(F.col("label") != F.col("__old"))
                   .limit(1).count())
        persisted.unpersist()
        persisted = new_p
        labels = new_p.select("doc_id", "label")
        if changed == 0:
            break
    out = labels.select("doc_id", F.col("label").alias("cluster_id"))
    sym.unpersist()
    return out, rounds


def run_frontier(spark, path: str):
    """Min-label propagation where each round joins the edge list only
    against the FRONTIER (labels that changed last round) — near-dup
    graphs converge with a shrinking active set, so round cost tracks
    the frontier, not V."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    disk = StorageLevel.MEMORY_AND_DISK
    sym = sym_edges(spark, path).persist(disk)
    sym.count()
    labels = (sym.select(F.col("doc_a").alias("doc_id")).distinct()
              .withColumn("label", F.col("doc_id")).persist(disk))
    labels.count()
    frontier = labels          # round 0: everyone is new
    persisted = [labels]
    rounds = 0
    for rnd in range(20):
        rounds += 1
        # better labels flowing FROM the frontier to its neighbors
        nbr = (sym.join(frontier.select(F.col("doc_id").alias("doc_b"),
                                        F.col("label").alias("flab")),
                        "doc_b")
               .groupBy("doc_a").agg(F.min("flab").alias("nbr_label")))
        cur = labels.join(nbr, labels["doc_id"] == nbr["doc_a"], "left")
        new_p = (cur.select(labels["doc_id"],
                            labels["label"].alias("__old"),
                            F.least(labels["label"],
                                    F.coalesce(F.col("nbr_label"),
                                               labels["label"]))
                            .alias("label"))
                 .persist(disk))
        new_frontier = (new_p.filter(F.col("label") != F.col("__old"))
                        .select("doc_id", "label").persist(disk))
        n_changed = new_frontier.count()
        for p in persisted:
            p.unpersist()
        labels = new_p.select("doc_id", "label")
        persisted = [new_p, new_frontier]
        frontier = new_frontier
        if n_changed == 0:
            break
    out = labels.select("doc_id", F.col("label").alias("cluster_id"))
    sym.unpersist()
    return out, rounds


def run_starstar(spark, path: str):
    """Alternating large-star / small-star (Kiveris et al. 2014,
    'Connected Components in MapReduce and Beyond'). Edges rewrite
    toward per-neighborhood minima until a fixpoint; labels are then
    each node's final minimum neighbor."""
    from pyspark.sql import functions as F
    from pyspark.storagelevel import StorageLevel

    disk = StorageLevel.MEMORY_AND_DISK
    edges = sym_edges(spark, path).select(
        F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    edges = edges.persist(disk)
    edges.count()
    rounds = 0
    prev = edges
    for _ in range(20):
        rounds += 1
        # large-star: for each u, connect every neighbor v > u to
        # m = min(neighborhood incl. u)
        nbh = prev.groupBy("u").agg(F.min("v").alias("mv"))
        m = nbh.select("u", F.least("u", "mv").alias("m"))
        ls = (prev.join(m, "u")
              .filter(F.col("v") > F.col("u"))
              .select(F.col("v").alias("u"), F.col("m").alias("v"))
              .union(m.select(F.col("u"), F.col("m").alias("v")))
              .filter(F.col("u") != F.col("v"))
              .distinct())
        # small-star: for each u, connect all neighbors v <= u to m
        ls_sym = (ls.select("u", "v")
                  .union(ls.select(F.col("v").alias("u"),
                                   F.col("u").alias("v"))))
        nbh2 = (ls_sym.filter(F.col("v") < F.col("u"))
                .groupBy("u").agg(F.min("v").alias("mv")))
        m2 = nbh2.select("u", F.least("u", "mv").alias("m"))
        ss = (ls_sym.filter(F.col("v") <= F.col("u"))
              .join(m2, "u")
              .select(F.col("v").alias("u"), F.col("m").alias("v"))
              .union(m2.select("u", F.col("m").alias("v")))
              .filter(F.col("u") != F.col("v"))
              .distinct()
              .persist(disk))
        # converged when the edge set stops changing
        same = (ss.exceptAll(prev).limit(1).count() == 0
                and prev.exceptAll(ss).limit(1).count() == 0)
        prev.unpersist()
        prev = ss
        if same:
            break
    # final: every node's label = its component min (the star center)
    sym = prev.union(prev.select(F.col("v").alias("u"),
                                 F.col("u").alias("v")))
    labels = (sym.groupBy("u").agg(F.min("v").alias("mv"))
              .select(F.col("u").alias("doc_id"),
                      F.least("u", "mv").alias("cluster_id")))
    out = labels
    return out, rounds


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/probe_llm_scale/10x")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--edges", default="/tmp/probe_cc_edges.parquet")
    ap.add_argument("--skip-build", action="store_true")
    ap.add_argument("--variants", default="local,pathdouble,frontier,starstar")
    ap.add_argument("--out", default="PROBE_CC_AB.json")
    args = ap.parse_args()

    from duckdb_otlp_spark.session import get_spark
    spark = get_spark("probe-cc-ab", cpus=args.cpus)

    result: dict = {"sf_dir": args.sf_dir, "cpus": args.cpus}
    if not args.skip_build:
        result["build"] = build_edges(spark, args.sf_dir, args.edges)
        print(json.dumps(result["build"]), file=sys.stderr)
    else:
        result["build"] = {"n_pairs": spark.read.parquet(args.edges).count()}

    runners = {"local": lambda: (run_local(spark, args.edges), None),
               "pathdouble": lambda: run_pathdouble(spark, args.edges),
               "frontier": lambda: run_frontier(spark, args.edges),
               "starstar": lambda: run_starstar(spark, args.edges)}
    sums = {}
    for name in args.variants.split(","):
        t0 = time.perf_counter()
        r = runners[name]()
        df, rounds = (r[0], r[1]) if isinstance(r, tuple) and len(r) == 2 \
            else (r, None)
        if isinstance(df, tuple):
            df, rounds = df
        cs = checksum(df)
        wall = time.perf_counter() - t0
        sums[name] = cs
        result[name] = {"wall_s": round(wall, 2), "rounds": rounds,
                        "n_nodes": cs[0], "n_clusters": cs[1]}
        print(name, json.dumps(result[name]), file=sys.stderr)
    vals = set(sums.values())
    result["labels_agree"] = len(vals) == 1
    Path(args.out).write_text(json.dumps(result, indent=1) + "\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
