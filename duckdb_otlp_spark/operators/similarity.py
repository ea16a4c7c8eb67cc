"""Similarity search over embedding columns.

Baseline: brute-force cosine top-k (map-only scan + TakeOrdered — no
shuffle of the corpus, only of the k winners per partition).
Scale path: IVF-style coarse quantization — vectors are assigned to the
nearest of C centroids once (a narrow map + broadcast of C·d floats);
queries probe only the closest `nprobe` partitions, cutting the scan by
~C/nprobe. Centroids come from a deterministic k-means++-ish seed +
Lloyd iterations, all in DataFrame ops.

Dot products use zip_with/aggregate (JVM-side, codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _as_double(vec_col: str | Column) -> Column:
    c = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return c.cast("array<double>")


def cosine_topk(df: DataFrame, id_col: str, vec_col: str,
                query: list[float], k: int = 10) -> DataFrame:
    """Brute-force cosine top-k against a literal query vector.

    The query broadcasts as a literal; ordering ties break on id for
    determinism. Returns (id, cosine) rows.
    """
    q = F.array(*[F.lit(float(x)) for x in query])
    v = _as_double(vec_col)
    cos = F.round(dot(v, q) / (l2_norm(v) * l2_norm(q)), 6)
    return (df.select(F.col(id_col), cos.alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


def cosine_topk_batched(df: DataFrame, id_col: str, vec_col: str,
                        query: list[float], k: int = 10) -> DataFrame:
    """Arrow-batched numpy variant of :func:`cosine_topk` — the
    throughput path for wide embeddings.

    The JVM expression variant evaluates O(dim) scalar lambda steps per
    row (aggregate/zip_with); this one crosses the Python boundary once
    per Arrow batch and scores the whole batch as a single BLAS matmul
    (2x at dim=64 on a local micro-bench where fixed overheads dominate;
    the per-row gap widens with dim — production embeddings are
    768-4096). Each
    PARTITION emits only its local top-k (k rows), so the final global
    top-k shuffles k x partitions rows no matter how large the scan.
    Same (id, cosine) contract and tie-break as cosine_topk.
    """
    import numpy as np
    import pandas as pd

    q = np.asarray(query, dtype="float64")
    qn = float(np.linalg.norm(q))
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, cosine double"

    def score(batches):
        ids: list = []
        sims: list = []
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            s = (m @ q) / (np.linalg.norm(m, axis=1) * qn)
            ids.append(pdf[id_col].to_numpy())
            sims.append(s)
        if not ids:
            return
        all_ids = np.concatenate(ids)
        all_sims = np.round(np.concatenate(sims), 6)
        # local top-k under the SAME total order the global sort uses —
        # (cosine desc with NaN ranked first, then id asc) — so the
        # global winners are always inside the per-partition survivors
        # even when cosines tie at the k-th boundary (duplicate vectors)
        # or zero-norm rows produce NaN
        rank_sims = np.where(np.isnan(all_sims), np.inf, all_sims)
        order = np.lexsort((all_ids, -rank_sims))[:k]
        yield pd.DataFrame({id_col: all_ids[order],
                            "cosine": all_sims[order]})

    return (df.select(id_col, _as_double(vec_col).alias(vec_col))
            .mapInPandas(score, out_schema)
            .orderBy(F.col("cosine").desc(), F.col(id_col))
            .limit(k))


def build_ivf_index(df: DataFrame, id_col: str, vec_col: str,
                    n_centroids: int = 16, iters: int = 2,
                    seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """IVF coarse index: (assigned, centroids).

    - seeds = deterministic hash-sample of n_centroids vectors;
    - `iters` Lloyd rounds: assign (broadcast centroids) -> new means;
    - returns the corpus with a `centroid_id` column, and the centroid
      table. Both are plain DataFrames — persist them as parquet
      partitioned by centroid_id for the 100 TB layout, so a probe scan
      touches only nprobe/C of the data (partition pruning).
    """
    from pyspark.sql import Window as W

    v = df.select(F.col(id_col).alias("__id"), _as_double(vec_col).alias("__v"))

    # deterministic seeds: the n_centroids smallest-hashed vectors.  The
    # hash is md5-derived (first 60 bits) rather than xxhash64 so the
    # whole seeding is expressible in ANSI SQL and a foreign engine can
    # re-derive the identical index (the driver's DuckDB oracle does).
    seed_hash = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{seed}:"),
                                   F.col("__id").cast("string"))), 1, 15),
        16, 10).cast("long")
    seeds = (v.withColumn("__h", seed_hash)
             .orderBy("__h", "__id").limit(n_centroids)
             .select((F.row_number().over(W.orderBy("__h", "__id")) - 1)
                     .alias("centroid_id"),
                     F.col("__v").alias("centroid")))

    centroids = seeds
    for _ in range(iters):
        assigned = _assign(v, centroids)
        # memory-bounded mean: positional explode -> per-(centroid,pos) avg
        # -> re-assemble ordered array; never collects whole vectors.
        centroids = (assigned
                     .select("centroid_id", F.posexplode("__v").alias("pos", "x"))
                     .groupBy("centroid_id", "pos").agg(F.avg("x").alias("m"))
                     .groupBy("centroid_id")
                     .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
                     .select("centroid_id",
                             F.transform("pm", lambda e: e["m"]).alias("centroid")))
    assigned = _assign(v, centroids)
    return (assigned.select(F.col("__id").alias(id_col), "centroid_id",
                            F.col("__v").alias(vec_col)),
            centroids)


def _assign(v: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign each vector to its nearest centroid (broadcast join).

    Norms are hoisted out of the per-candidate lambda (r13): ||v|| is
    computed once per VECTOR (was once per (vector, candidate) — C extra
    O(d) folds per row) and each centroid's norm once on the C-row side
    of the broadcast (was per (vector, candidate)). The negcos value is
    the same expression over the same doubles in the same order, so the
    array_min ranking — and the oracle-pinned assignment — is bitwise
    unchanged."""
    joined = (v.withColumn("__vn", l2_norm(F.col("__v")))
              .crossJoin(F.broadcast(
                  centroids.groupBy().agg(
                      F.collect_list(F.struct(
                          F.col("centroid_id"), F.col("centroid"),
                          l2_norm(F.col("centroid")).alias("cnorm")))
                      .alias("cands")))))
    best = F.array_min(F.transform(
        F.col("cands"),
        lambda c: F.struct(
            (-dot(F.col("__v"), c["centroid"])
             / (F.col("__vn") * c["cnorm"])).alias("negcos"),
            c["centroid_id"].alias("cid"))))
    return joined.select("__id", "__v", best["cid"].alias("centroid_id"))


def save_ivf_index(assigned: DataFrame, centroids: DataFrame,
                   path: str) -> None:
    """Materialize an IVF index as the 100 TB layout: the assigned
    corpus partitioned BY centroid_id (so a probe scan becomes a
    partition-pruned read touching only nprobe/C of the files — the
    dominant cost at scale is the scan, not the math) plus the tiny
    centroid table."""
    (assigned.write.partitionBy("centroid_id")
     .mode("overwrite").parquet(f"{path}/assigned"))
    centroids.write.mode("overwrite").parquet(f"{path}/centroids")


def load_ivf_index(spark, path: str) -> tuple[DataFrame, DataFrame]:
    """Reopen a saved IVF index; feed straight into :func:`ivf_search`.
    The centroid_id filter inside the search lands as a PartitionFilter
    on the assigned scan (pinned by tests/test_operators.py)."""
    return (spark.read.parquet(f"{path}/assigned"),
            spark.read.parquet(f"{path}/centroids"))


def ivf_search(assigned: DataFrame, centroids: DataFrame, id_col: str,
               vec_col: str, query: list[float], k: int = 10,
               nprobe: int = 4) -> DataFrame:
    """Search the IVF index: rank centroids by query cosine, scan only the
    nprobe nearest partitions, brute-force within them."""
    q = F.array(*[F.lit(float(x)) for x in query])
    probe_ids = [r["centroid_id"] for r in
                 (centroids.select(
                     "centroid_id",
                     (dot(F.col("centroid"), q)
                      / (l2_norm(F.col("centroid")) * l2_norm(q))).alias("c"))
                  .orderBy(F.col("c").desc(), F.col("centroid_id"))
                  .limit(nprobe).collect())]
    subset = assigned.filter(F.col("centroid_id").isin(probe_ids))
    return cosine_topk(subset, id_col, vec_col, query, k)
