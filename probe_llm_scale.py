#!/usr/bin/env python3
"""LLM-operator scale probe: the flagship training-data operators timed
at 10x the biggest corpus they had ever been measured on (r9 VERDICT
#1: the reference-scale campaign covered only the observability
queries; the LLM set's empirical evidence stopped at sf0.1).

Pattern follows probe_ref_scale.py: the corpus is generated DISTRIBUTED
(spark.range + xxhash64 word streams — no driver loop, no data ever on
the driver), planted signals have exact, verifiable rates, and every
wall-clock section is bracketed by the same single-thread + parallel
CPU probes the headline bench records so a contended sample indicts
itself.

Corpus design (all rates verified by the probe before timing):
- vocabulary of 4096 synthetic words — large enough that RANDOM 3-gram
  shingle collisions are negligible at 20M docs (with a small vocab the
  LSH candidate count would be dominated by chance band collisions,
  measuring an accident of the generator instead of the operator);
- per 1000-doc block: doc d (d%1000==0) is a base, d+1 its EXACT copy,
  d+2 a NEAR copy (first word replaced; Jaccard >= (L-3)/(L-1) >= 0.89
  over word 3-gram shingles, comfortably above the operators' 0.7
  verification threshold) — 0.1% exact + 0.1% near planted dups;
- a fixed 12-word contamination phrase appended to ~1/170 of EVAL-split
  docs (doc_id%17==0, the split rule q_contamination_overlap uses) and
  to ~1/997 of TRAIN docs — the planted leak the screen must surface;
  dup-planted ids are excluded so the signals never interfere;
- embeddings: n/10 32-dim vectors, exact-duplicate vector planted every
  500 ids.

Operators timed (the registry callables themselves, unmodified, so the
measured plan is exactly what the driver gate certifies): the six the
r9 VERDICT named — minhash_lsh_pairs, dedup_cluster,
contamination_overlap, dedup_incremental, token_offsets, corpus_shuffle
— plus dedup_exact and ann_cosine_topk as linear-shape baselines, and
operators.dedup.embedding_near_dup_pairs (planes=18) as the
corpus-scale embedding-dedup shape (q_dedup_embedding's 64-bucket form
is an oracle-expressibility artifact, per its own docstring — its
within-bucket O(n^2/64) is exactly what this probe must not run at
2M vectors).

Each op runs at BASE docs and 10x docs; results are materialized with
the noop sink (full computation including any final sort, zero
collect — several ops return corpus-sized outputs that must never
land on the driver). Reported per op: min/all walls at each scale and
the 10x wall ratio. Plan-shape spot checks (no Python eval; exactly
one SinglePartition exchange in the token_offsets/corpus_shuffle radix
cumsum) are recorded at the 10x scale.

Run:  SPARK_DRIVER_MEMORY=64g python probe_llm_scale.py \
          [--docs 20000000] [--base-docs 2000000]
Emits PROBE_LLM_SCALE.json (and a one-line JSON summary to stdout).

Memory: the session default (16g local-mode heap) OOMs at the 20M tier
— 32 concurrent tasks each materializing ~60-element shingle-array rows
plus the persisted signature blocks need real executor memory, exactly
as they would on a cluster (where 20M docs would get tens of executors'
worth of heap, not one 16g JVM). SPARK_DRIVER_MEMORY=64g sizes the
single local JVM like the ~4 mid-size executors this corpus slice
would occupy in production.
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, functions as F

VOCAB = 4096
PHRASE_WORDS = [f"leak{c}" for c in "abcdefghijkl"]   # 12 words, 8 5-grams
PHRASE = " ".join(PHRASE_WORDS)
EMB_DIM = 32


def generate_docs(spark, n: int) -> DataFrame:
    """documents(doc_id, text, lang, source, n_chars) as one distributed
    expression tree over spark.range — same column contract as
    /root/testdata/sf*/documents.parquet (TESTDATA.md)."""
    base = spark.range(n).withColumnRenamed("id", "doc_id")
    mod = F.col("doc_id") % 1000

    # dup triples (base d, exact copy d+1, near copy d+2) are planted
    # only when the WHOLE triple lands in the train split (doc_id%17!=0
    # for all three): a copy straddling q_contamination_overlap's
    # eval/train boundary shows up as a legitimate ~1.0-overlap leak
    # that drowns the phrase-planted signal in the top-25 check — the
    # two planted signals must stay orthogonal to be verifiable
    def _triple_in_train(b):
        return ((b % 17 != 0) & ((b + 1) % 17 != 0)
                & ((b + 2) % 17 != 0))

    is_copy = (mod == 1) & _triple_in_train(F.col("doc_id") - 1)
    is_near = (mod == 2) & _triple_in_train(F.col("doc_id") - 2)
    seed = (F.col("doc_id")
            - F.when(is_copy, 1).when(is_near, 2).otherwise(0))
    n_words = (F.pmod(F.xxhash64(seed, F.lit(-1)), F.lit(77)) + 20) \
        .cast("int")
    words = F.transform(
        F.sequence(F.lit(1), n_words),
        lambda i: F.format_string("w%04d",
                                  F.pmod(F.xxhash64(seed, i),
                                         F.lit(VOCAB)).cast("int")))
    # near copy: first word replaced -> exactly one shingle changes
    words = F.when(is_near,
                   F.concat(F.array(F.lit("ndup")),
                            F.slice(words, 2, F.size(words) - 1))) \
        .otherwise(words)
    # contamination phrase: planted only on non-dup-planted ids so the
    # dup and leak signals never interfere; eval split is doc_id%17==0
    # (q_contamination_overlap's rule), 170 = 17*10 keeps the planted
    # eval docs inside it
    clean = mod >= 3
    planted_eval = (F.col("doc_id") % 170 == 0) & clean
    planted_train = ((F.col("doc_id") % 997 == 6)
                     & (F.col("doc_id") % 17 != 0) & clean)
    words = F.when(planted_eval | planted_train,
                   F.concat(words, F.array(*[F.lit(w)
                                             for w in PHRASE_WORDS]))) \
        .otherwise(words)
    text = F.array_join(words, " ")
    return base.select(
        "doc_id", text.alias("text"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("fr"),
                             F.lit("es"), F.lit("ja")),
                     (F.pmod(F.xxhash64(seed, F.lit(-2)), F.lit(5))
                      + 1).cast("int")).alias("lang"),
        F.format_string("src%d",
                        F.pmod(F.xxhash64(seed, F.lit(-3)),
                               F.lit(20)).cast("int")).alias("source"),
        F.length(text).alias("n_chars"))


def generate_embeddings(spark, n_vec: int) -> DataFrame:
    """embeddings(vec_id, embedding float[], label) — exact-duplicate
    vector planted every 500 ids (vec_id%500==1 copies vec_id-1)."""
    base = spark.range(n_vec).withColumnRenamed("id", "vec_id")
    seed = F.col("vec_id") - F.when(F.col("vec_id") % 500 == 1, 1) \
        .otherwise(0)
    emb = F.transform(
        F.sequence(F.lit(0), F.lit(EMB_DIM - 1)),
        lambda i: ((F.pmod(F.xxhash64(seed, i), F.lit(2001)) - 1000)
                   / 1000.0).cast("float"))
    return base.select(
        "vec_id", emb.alias("embedding"),
        F.pmod(F.xxhash64(seed, F.lit(-9)), F.lit(20)).cast("int")
        .alias("label"))


def write_corpus(spark, out: Path, n_docs: int, rows_per_file: int) -> dict:
    """Crawl-ordered layout: range-partitioned on doc_id, one contiguous
    id slice per file — the shape an accumulating crawl naturally
    produces and the one dedup_incremental's corpus/batch split assumes
    nothing about.

    The 32-file floor keeps scan splits >= local[32]'s cores at EVERY
    tier: below it, _docs_parallel's conditional repartition fires at
    the small tier but not the big one, and the asymmetric corpus
    shuffle pollutes the 10x wall ratio the probe exists to measure."""
    n_files = max(32, n_docs // rows_per_file)
    t0 = time.perf_counter()
    (generate_docs(spark, n_docs)
     .repartitionByRange(n_files, "doc_id")
     .sortWithinPartitions("doc_id")
     .write.mode("overwrite").parquet(str(out / "documents.parquet")))
    docs_s = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    n_vec = max(1000, n_docs // 10)
    (generate_embeddings(spark, n_vec)
     .repartitionByRange(max(4, n_files // 8), "vec_id")
     .write.mode("overwrite").parquet(str(out / "embeddings.parquet")))
    return {"n_docs": n_docs, "n_vec": n_vec, "n_files": n_files,
            "docs_write_s": docs_s,
            "emb_write_s": round(time.perf_counter() - t0, 1)}


def verify_rates(spark, sf_dir: str, n_docs: int) -> dict:
    """Generator sanity: the planted rates must be EXACT (the generator
    is deterministic) before any wall is worth recording."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    agg = docs.agg(
        F.count("*").alias("rows"),
        # near copies are text-detectable (the replaced first word);
        # exact copies are verified by content in verify_detection
        # (q_dedup_exact's n_dups) — here their id-rule count suffices
        F.sum(F.col("text").startswith("ndup ").cast("int")).alias("near"),
        F.sum((F.col("text").contains(PHRASE)
               & (F.col("doc_id") % 17 == 0)).cast("int")).alias("c_eval"),
        F.sum((F.col("text").contains(PHRASE)
               & (F.col("doc_id") % 17 != 0)).cast("int")).alias("c_train"),
    ).collect()[0].asDict()
    assert agg["rows"] == n_docs, agg
    want_near = len(planted_near_bases(n_docs))
    want_ce = sum(1 for d in range(0, n_docs, 170) if d % 1000 >= 3)
    want_ct = sum(1 for d in range(6, n_docs, 997)
                  if d % 17 != 0 and d % 1000 >= 3)
    assert agg["near"] == want_near, (agg, want_near)
    assert agg["c_eval"] == want_ce, (agg, want_ce)
    assert agg["c_train"] == want_ct, (agg, want_ct)
    return agg


def _triple_in_train_py(b: int) -> bool:
    return b % 17 != 0 and (b + 1) % 17 != 0 and (b + 2) % 17 != 0


def planted_exact_bases(n_docs: int) -> list[int]:
    return [d for d in range(0, n_docs - 1, 1000) if _triple_in_train_py(d)]


def planted_near_bases(n_docs: int) -> list[int]:
    return [d for d in range(0, n_docs - 2, 1000) if _triple_in_train_py(d)]


def verify_detection(spark, sf_dir: str, n_docs: int) -> dict:
    """Operator-level ground truth at BASE scale: the planted dups must
    actually be FOUND (a fast corpus is worthless if the constants
    let the planted signal through) and the contamination screen's
    top-25 must be exactly planted train docs."""
    from duckdb_otlp_spark.queries import (_minhash_pairs_unsorted,
                                           q_contamination_overlap,
                                           q_dedup_exact)

    pairs = _minhash_pairs_unsorted(spark, sf_dir) \
        .filter(F.col("jaccard") >= 0.7)
    found = pairs.agg(
        F.sum(((F.col("doc_b") - F.col("doc_a") == 1)
               & (F.col("doc_a") % 1000 == 0)).cast("int")).alias("exact"),
        F.sum(((F.col("doc_b") - F.col("doc_a") == 2)
               & (F.col("doc_a") % 1000 == 0)).cast("int")).alias("near"),
    ).collect()[0].asDict()
    n_exact = len(planted_exact_bases(n_docs))
    n_near = len(planted_near_bases(n_docs))
    assert found["exact"] == n_exact, (found, n_exact)   # always collide
    # a near pair misses only when all 3 bands differ: P ~ (1-J^2)^3
    # with J >= 0.89 -> >= 99% expected recall
    assert found["near"] >= 0.9 * n_near, (found, n_near)

    de = q_dedup_exact(spark, sf_dir).collect()[0].asDict()
    assert de["n_dups"] == n_exact, (de, n_exact)

    top = q_contamination_overlap(spark, sf_dir).collect()
    assert all(r["doc_id"] % 997 == 6 for r in top), \
        [r["doc_id"] for r in top[:5]]
    assert all(r["overlap_frac"] > 0.05 for r in top)
    return {"lsh_exact_found": found["exact"],
            "lsh_near_found": found["near"],
            "planted_exact": n_exact, "planted_near": n_near,
            "exact_dedup_n_dups": de["n_dups"],
            "contamination_top25_all_planted": True}


def _ops() -> dict:
    from duckdb_otlp_spark.operators.dedup import embedding_near_dup_pairs
    from duckdb_otlp_spark.queries import QUERIES

    def emb_near_dup(spark, sf_dir):
        import math

        import pyarrow.parquet as pq
        from pathlib import Path as _P

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        # planes scale with the corpus — the operator's own 100 TB rule
        # (expected occupancy n/2^planes stays O(1)): a fixed plane
        # count at 10x the vectors multiplies bucket occupancy 10x and
        # the candidate self-join quadratically (the first probe run
        # filled the spill disk exactly this way at 2M vectors)
        n_vec = sum(pq.ParquetFile(str(f)).metadata.num_rows
                    for f in _P(f"{sf_dir}/embeddings.parquet")
                    .glob("*.parquet"))
        planes = max(16, math.ceil(math.log2(max(n_vec, 2))))
        return embedding_near_dup_pairs(emb, "vec_id", "embedding",
                                        threshold=0.95, planes=planes,
                                        max_bucket_size=256)

    def winnow(spark, sf_dir):
        # operator variant WITH the MOSS hot-fingerprint stop-list: the
        # corpus plants a 12-word phrase in ~n/145 documents, and an
        # unguarded fingerprint self-join would build ~(n/145)^2/2
        # pairs from those few hashes (the same skew class the LSH
        # max_bucket_size guard exists for). The oracle-exact unguarded
        # shape is certified at test scale by q_winnowing_pairs.
        from duckdb_otlp_spark.operators.text import winnowing_pairs

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return winnowing_pairs(docs, "doc_id", "text", max_doc_freq=1000)

    def semded(spark, sf_dir):
        # corpus-scale SemDeDup: k scales as n/1000 (the operator's own
        # 100 TB rule — expected cluster size, and with it the
        # within-cluster quadratic screen, stays O(1000) at any corpus
        # size); tau=0.95 catches the planted exact-copy vectors
        from pathlib import Path as _P

        import pyarrow.parquet as pq

        from duckdb_otlp_spark.operators.dedup import semdedup

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n_vec = sum(pq.ParquetFile(str(f)).metadata.num_rows
                    for f in _P(f"{sf_dir}/embeddings.parquet")
                    .glob("*.parquet"))
        return semdedup(emb, "vec_id", "embedding",
                        k=max(2, n_vec // 1000), tau=0.95)

    names = ["dedup_exact", "minhash_lsh_pairs", "dedup_cluster",
             "contamination_overlap", "dedup_incremental",
             "token_offsets", "corpus_shuffle", "ann_cosine_topk",
             # r10 late additions (query-level, linear shapes)
             "pmi_collocations", "passage_dedup", "bigram_surprisal"]
    ops = {n: QUERIES[n] for n in names}
    ops["embedding_near_dup_pairs"] = emb_near_dup
    ops["winnowing_pairs_guarded"] = winnow
    ops["semdedup_pairs"] = semded
    return ops


def time_op(spark, fn, sf_dir: str, repeats: int) -> list[float]:
    samples = []
    for _ in range(repeats):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        # noop sink: full materialization (including final sorts),
        # nothing ever collects to the driver
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples.append(round(time.perf_counter() - t0, 2))
    return samples


def plan_shapes(spark, sf_dir: str) -> dict:
    """Spot checks that the pinned scale shapes hold on THIS corpus at
    THIS scale — the pytest plan gates run at sf0.001; a shape that
    degrades only past AQE thresholds would hide there."""
    from duckdb_otlp_spark.plans import audit
    from duckdb_otlp_spark.queries import QUERIES

    shapes = {}
    for name in ("minhash_lsh_pairs", "contamination_overlap",
                 "token_offsets", "corpus_shuffle", "dedup_incremental",
                 # r10 additions (zero-window map-only extractions +
                 # digest/vocab-keyed partial aggs)
                 "pmi_collocations", "passage_dedup", "bigram_surprisal"):
        rep = audit(QUERIES[name](spark, sf_dir))
        shapes[name] = {
            "python_eval": rep.has_python_eval,
            "nested_loop_joins": rep.nested_loop_joins,
            # formatted plans carry the partitioning on the Arguments
            # line ("Arguments: SinglePartition, ENSURE_REQUIREMENTS...")
            "single_partition_exchanges":
                rep.text.count("SinglePartition"),
        }
        assert not rep.has_python_eval, name
        # pmi/bigram carry exactly the 1-row corpus-stats broadcast
        # crossjoins (bm25's pattern, <=2 real NLJs printed ~2x by the
        # formatted explain); everything else must have none
        nlj_cap = 4 if name in ("pmi_collocations",
                                "bigram_surprisal") else 0
        assert rep.nested_loop_joins <= nlj_cap, (name,
                                                  rep.nested_loop_joins)
        # the r10 map-only extractions must stay window-free
        if name in ("pmi_collocations", "passage_dedup",
                    "bigram_surprisal"):
            assert "windowspecdefinition" not in rep.text, name
    # the radix-cumsum ops carry exactly ONE SinglePartition exchange
    # (the 32-row bucket-offset window), never a corpus-sized one
    for name in ("token_offsets", "corpus_shuffle"):
        assert shapes[name]["single_partition_exchanges"] == 1, shapes[name]
    return shapes


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=20_000_000)
    ap.add_argument("--base-docs", type=int, default=2_000_000)
    ap.add_argument("--rows-per-file", type=int, default=312_500)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--repeats-10x", type=int, default=1,
                    help="repeats at the 10x tier (the heavy ops run "
                         "minutes each there; the CPU-probe brackets "
                         "around the tier are the contention evidence "
                         "a second sample would buy)")
    ap.add_argument("--out", default="/tmp/probe_llm_scale")
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--ops", default="", help="comma-separated subset")
    ap.add_argument("--tiers", default="base,10x",
                    help="comma-separated tier subset (base,10x) — with "
                         "--ops, re-measures just those walls and merges")
    ap.add_argument("--skip-generate", action="store_true",
                    help="reuse an existing --out tree")
    ap.add_argument("--skip-detection", action="store_true",
                    help="skip the base-scale planted-signal checks")
    ap.add_argument("--plan-shapes-only", action="store_true",
                    help="skip the timing loops; just re-audit the 10x "
                         "plan shapes into the artifact (explain-only, "
                         "no jobs)")
    args = ap.parse_args()
    if args.plan_shapes_only:
        args.tiers = ""
        args.skip_generate = True
        args.skip_detection = True

    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from bench import _cpu_probe_ms, _cpu_probe_parallel_ms
    from duckdb_otlp_spark.session import get_spark

    spark = get_spark("probe_llm_scale", cpus=args.cpus)
    out = Path(args.out)
    scales = {"base": (out / "base", args.base_docs),
              "10x": (out / "10x", args.docs)}

    gen = {}
    for label, (path, n) in scales.items():
        if not args.skip_generate:
            gen[label] = write_corpus(spark, path, n, args.rows_per_file)
        gen.setdefault(label, {})["sanity"] = \
            verify_rates(spark, str(path), n)
    detection = None
    if not args.skip_detection:
        detection = verify_detection(spark, str(scales["base"][0]),
                                     args.base_docs)

    ops = _ops()
    if args.ops:
        ops = {k: v for k, v in ops.items() if k in args.ops.split(",")}

    import os
    results: dict[str, dict] = {n: {} for n in ops}
    probes = {}
    out_json = Path(__file__).with_name("PROBE_LLM_SCALE.json")
    # a subset rerun (--ops) folds into the existing artifact instead of
    # overwriting it: prior ops' walls survive, this run's CPU-probe
    # brackets land under "<label>_rerun:<ops>" so every wall stays
    # attributable to the brackets recorded around it
    if (args.ops or args.tiers != "base,10x") and out_json.exists():
        prev = json.loads(out_json.read_text())
        # deep-merge per op: a rerun of one tier must not drop the
        # other tier's recorded wall
        prev_res = prev.get("results", {})
        results = {name: {**prev_res.get(name, {}),
                          **results.get(name, {})}
                   for name in set(prev_res) | set(results)}
        probes = prev.get("probes", {})
        if detection is None:
            detection = prev.get("detection_base")
        gen = {**prev.get("generate", {}), **gen}

    probe_key = (lambda label: f"{label}_rerun:{args.ops or 'all'}"
                 if (args.ops or args.tiers != "base,10x") else label)

    def dump(**extra):
        # incremental: a 40+ minute run must not lose every wall to one
        # late failure (the r10 first attempt died on spill disk at the
        # second-to-last op with nothing on disk)
        doc = {"docs_10x": args.docs, "docs_base": args.base_docs,
               "repeats": args.repeats, "repeats_10x": args.repeats_10x,
               "driver_memory": os.environ.get("SPARK_DRIVER_MEMORY",
                                               "16g"),
               "generate": gen, "detection_base": detection,
               "probes": probes, "results": results, **extra}
        out_json.write_text(json.dumps(doc, indent=1, default=str))
        return doc

    tiers = args.tiers.split(",")
    for label, (path, n) in scales.items():
        if label not in tiers:
            continue
        pk = probe_key(label)
        probes[pk] = {"cpu_probe_ms": [_cpu_probe_ms()],
                      "cpu_probe_parallel_ms":
                          [_cpu_probe_parallel_ms(args.cpus)]}
        reps = args.repeats if label == "base" else args.repeats_10x
        for name, fn in ops.items():
            samples = time_op(spark, fn, str(path), reps)
            results.setdefault(name, {})[label] = {"wall_s": min(samples),
                                                   "all_s": samples}
            print(f"{name:28s} {label:5s} {min(samples):8.2f} s "
                  f"{samples}", flush=True)
            dump(partial=True)
        probes[pk]["cpu_probe_ms"].append(_cpu_probe_ms())
        probes[pk]["cpu_probe_parallel_ms"].append(
            _cpu_probe_parallel_ms(args.cpus))
    for name, r in results.items():
        if "base" in r and "10x" in r:
            r["ratio_10x"] = round(r["10x"]["wall_s"]
                                   / max(r["base"]["wall_s"], 1e-9), 2)

    shapes = plan_shapes(spark, str(scales["10x"][0]))
    dump(plan_shapes_10x=shapes, partial=False)
    print(json.dumps({
        "metric": "probe_llm_scale_ratio_10x",
        "value": {n: r.get("ratio_10x") for n, r in results.items()},
        "unit": "x", "docs": args.docs}, default=str))


if __name__ == "__main__":
    main()
