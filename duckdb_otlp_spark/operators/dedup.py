"""Deduplication operators for large-scale training-data pipelines.

All signatures/sketches are computed with JVM-side expressions
(xxhash64, higher-order array functions) — no Python UDFs — so the hot
path stays inside whole-stage codegen and scales linearly with
executors. Candidate generation uses LSH banding so the only shuffle is
on (band, band_hash) keys, never an O(n²) cross join.

Scale design (100 TB):
- signatures are one narrow projection over the corpus (map-only);
- the band explode multiplies rows by `bands` (a small constant) and the
  bucket join shuffles only (band_id, band_hash, doc_id) triples;
- uniform hash keys make the shuffle skew-free; AQE handles stragglers;
- exact verification joins only candidate pairs back to their shingle
  sets (semi-join pattern), never the full corpus against itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# tokenize / shingle
# ---------------------------------------------------------------------------

def tokens(text: Column) -> Column:
    """Whitespace tokens of normalized text."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; EMPTY for docs under n words.

    The empty case matters: clamping to one partial gram instead (the
    pre-r7 behavior) gave every sub-n-word document a 1-element shingle
    set — "" for empty docs — so unrelated short docs matched each
    other at jaccard 1.0 (caught by tests/test_dedup_properties.py).
    Empty sets keep short docs out of the pair stream entirely, matching
    the SQL oracle's `range(1, len(words) - 1)` comprehension."""
    from duckdb_otlp_spark.operators.text import bind1

    # tokens bound once per row (bind1 docstring: an inlined split
    # re-evaluates per gram — O(words^2) per document)
    return bind1(tokens(text), lambda w: F.when(
        F.size(w) < n, F.array().cast("array<string>"))
        .otherwise(F.array_distinct(F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.concat_ws(" ", *[F.get(w, i + j)
                                         for j in range(n)])))))


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, id_col: str, text_col: str,
                normalize: bool = True) -> DataFrame:
    """Keep one row per distinct (normalized) text: hash-groupBy keeping the
    smallest id. One shuffle on the 128-bit digest — uniform, skew-free."""
    t = F.col(text_col)
    if normalize:
        t = F.lower(F.trim(t))
    keyed = df.withColumn("__digest", F.md5(t))
    keep = keyed.groupBy("__digest").agg(F.min(id_col).alias(id_col))
    return (keyed.join(keep, [id_col, "__digest"], "inner")
            .drop("__digest"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def minhash_signature(text: Column, num_hashes: int = 64, shingle_n: int = 3) -> Column:
    """MinHash signature as array<long>: per seed, min xxhash64 over the
    shingle set. All JVM-side (xxhash64 is codegen'd)."""
    sh = shingles(text, shingle_n)
    return F.array(*[
        F.array_min(F.transform(sh, lambda s: F.xxhash64(F.lit(seed), s)))
        for seed in range(num_hashes)
    ])


def minhash_lsh_pairs(df: DataFrame, id_col: str, text_col: str,
                      num_hashes: int = 64, bands: int = 16,
                      shingle_n: int = 3,
                      jaccard_threshold: float = 0.5,
                      max_bucket_size: int | None = None,
                      star_probes: int = 1,
                      persist: bool = True) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    Returns (id_a, id_b, jaccard) with id_a < id_b and
    jaccard >= jaccard_threshold.

    ``max_bucket_size`` is the 100 TB skew guard: a corpus with d
    byte-identical documents puts all d in the SAME bucket of every
    band, and the candidate self-join emits d(d-1)/2 rows — quadratic
    blowup that kills the job long before verification. Buckets larger
    than the cap switch to STAR candidates: every member pairs with the
    bucket's ``star_probes`` smallest-id representatives only —
    O(star_probes * d) rows — so an exact/representative-near duplicate
    still surfaces in a verified pair (what dedup needs), at the cost
    of pair-completeness *within* the mega-bucket (recoverable
    transitively via duplicate clustering only for pairs that verify
    against some representative). Raising ``star_probes`` probes more
    representatives per over-cap bucket, recovering pairs whose members
    are all far from the single min-id member, at linear extra cost.
    None (default) keeps exact all-pairs semantics.
    """
    from pyspark.storagelevel import StorageLevel

    rows_per_band = num_hashes // bands
    # Persisted: sigs feeds the band join (twice, via band_entries) AND
    # the verification joins; band_entries feeds both sides of the
    # candidate self-join. Without the persists each consumer re-runs
    # the full shingle+hash pass over the corpus — single execution
    # must be structural, not ReuseExchange-dependent. The cache entries
    # are keyed by logical plan, so REPEATED calls with the same inputs
    # reuse one entry rather than stacking copies; a parameter sweep
    # over the same corpus does create one entry per distinct plan —
    # pass persist=False there (or spark.catalog.clearCache() between
    # sweeps) to trade recomputation for cache pressure.
    # Persist hashed shingle SETS (primitive 64-bit xxhash64 longs), not
    # the string shingle arrays: ~7x smaller cache rows, which keeps the
    # corpus shingle state resident at the 20M-doc tier where string
    # arrays hit the spill/evict/recompute cliff (r10 probe). Jaccard
    # over the hashed sets equals string-shingle Jaccard except under a
    # 64-bit collision inside one pair's union (~1e-19 per pair).
    sigs = df.select(
        F.col(id_col).alias("__id"),
        F.array_distinct(F.transform(shingles(F.col(text_col), shingle_n),
                                     lambda s: F.xxhash64(s))).alias("__hs"),
        minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("__sig"),
    ).filter(F.size("__hs") > 0)
    if persist:
        sigs = sigs.persist(StorageLevel.MEMORY_AND_DISK)

    band_entries = sigs.select(
        "__id",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias("band"),
                F.xxhash64(F.concat_ws(
                    ",", F.slice(F.col("__sig"), b * rows_per_band + 1, rows_per_band)
                )).alias("bucket")))).alias("e"),
    ).select("__id", "e.band", "e.bucket")
    if persist:
        band_entries = band_entries.persist(StorageLevel.MEMORY_AND_DISK)

    if max_bucket_size is not None:
        sizes = (band_entries.groupBy("band", "bucket")
                 .agg(F.count("*").alias("__n"), F.min("__id").alias("__rep")))
        entries = band_entries.join(sizes, ["band", "bucket"])
        ok = entries.filter(F.col("__n") <= max_bucket_size)
        candidates_small = (
            ok.alias("l").join(ok.alias("r"), ["band", "bucket"])
            .filter(F.col("l.__id") < F.col("r.__id"))
            .select(F.col("l.__id").alias("id_a"),
                    F.col("r.__id").alias("id_b")))
        if star_probes > 1:
            from pyspark.sql import Window as W

            big = entries.filter(F.col("__n") > max_bucket_size)
            rk = F.row_number().over(
                W.partitionBy("band", "bucket").orderBy("__id"))
            reps = (big.withColumn("__rk", rk)
                    .filter(F.col("__rk") <= star_probes)
                    .select("band", "bucket", F.col("__id").alias("id_a")))
            # (rep, member) for every rep < member — with k reps this
            # also covers all rep-rep pairs, so k=1 reduces to the
            # min-based star below
            candidates_star = (reps.join(big, ["band", "bucket"])
                               .filter(F.col("id_a") < F.col("__id"))
                               .select("id_a", F.col("__id").alias("id_b")))
        else:
            candidates_star = (
                entries.filter((F.col("__n") > max_bucket_size)
                               & (F.col("__id") != F.col("__rep")))
                .select(F.col("__rep").alias("id_a"),
                        F.col("__id").alias("id_b")))
        candidates = candidates_small.union(candidates_star).distinct()
    else:
        left = band_entries.alias("l")
        right = band_entries.alias("r")
        candidates = (left.join(right, ["band", "bucket"])
                      .filter(F.col("l.__id") < F.col("r.__id"))
                      .select(F.col("l.__id").alias("id_a"),
                              F.col("r.__id").alias("id_b"))
                      .distinct())

    sh = sigs.select("__id", "__hs")
    verified = (candidates
                .join(sh.withColumnRenamed("__id", "id_a")
                        .withColumnRenamed("__hs", "sh_a"), "id_a")
                .join(sh.withColumnRenamed("__id", "id_b")
                        .withColumnRenamed("__hs", "sh_b"), "id_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / union
    return (verified.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
            .filter(F.col("jaccard") >= jaccard_threshold))


def minhash_dedup(df: DataFrame, id_col: str, text_col: str,
                  **kwargs) -> DataFrame:
    """Drop near-duplicates: from every (a,b) pair keep the smaller id.

    Single-linkage via one pass (b is dropped whenever any a<b matches);
    iterative connected components are unnecessary for dedup-keep-first.
    """
    pairs = minhash_lsh_pairs(df, id_col, text_col, **kwargs)
    drops = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(drops, id_col, "left_anti")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_bits(text: Column, bits: int = 64) -> Column:
    """SimHash signature as array<int> of 0/1, JVM-side.

    Each token votes ±1 per bit position of its xxhash64; the sign of the
    per-bit sum is the signature bit.
    """
    toks = tokens(text)
    votes = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), bits),
        lambda acc, t: F.zip_with(
            acc,
            F.array(*[(F.shiftright(F.xxhash64(t), i)
                       .bitwiseAND(F.lit(1)) * 2 - 1).cast("int")
                      for i in range(bits)]),
            lambda a, b: a + b))
    return F.transform(votes, lambda v: F.when(v > 0, F.lit(1)).otherwise(F.lit(0)))


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two bit-array signatures."""
    return F.size(F.filter(F.zip_with(a, b, lambda x, y: x != y), lambda d: d))


def simhash_pairs(df: DataFrame, id_col: str, text_col: str,
                  bits: int = 64, block_bits: int = 16,
                  max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash with block-based candidate generation:
    signatures within hamming distance d must share at least one of
    d+1 equal-width blocks exactly (pigeonhole), so candidates come from
    equi-joins on block values — no cross join."""
    n_blocks = bits // block_bits
    sigs = df.select(F.col(id_col).alias("__id"),
                     simhash_bits(F.col(text_col), bits).alias("__sig"))
    blocks = sigs.select(
        "__id", "__sig",
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(n_blocks - 1)),
            lambda b: F.struct(
                b.alias("block"),
                F.concat_ws("", F.slice("__sig", b * block_bits + 1, block_bits))
                .alias("value")))).alias("e"),
    ).select("__id", "__sig", "e.block", "e.value")
    left, right = blocks.alias("l"), blocks.alias("r")
    cand = (left.join(right, ["block", "value"])
            .filter(F.col("l.__id") < F.col("r.__id"))
            .select(F.col("l.__id").alias("id_a"), F.col("r.__id").alias("id_b"),
                    F.col("l.__sig").alias("sig_a"), F.col("r.__sig").alias("sig_b"))
            .distinct())
    ham = simhash_hamming(F.col("sig_a"), F.col("sig_b"))
    return (cand.select("id_a", "id_b", ham.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


# ---------------------------------------------------------------------------
# Embedding near-dup (cosine)
# ---------------------------------------------------------------------------

def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def embedding_near_dup_pairs(df: DataFrame, id_col: str, vec_col: str,
                             threshold: float = 0.95,
                             planes: int = 16, seed: int = 42,
                             max_bucket_size: int | None = None,
                             star_probes: int = 1,
                             persist: bool = True) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold.

    Candidates from random-hyperplane LSH (sign sketch over `planes`
    deterministic pseudo-random hyperplanes), verified with exact cosine.
    High-cosine pairs agree on most plane signs, so ONE-SIDED
    multi-probing — each vector indexed under its exact sketch, probes
    exploded to the sketch plus each one-bit-flipped variant — catches
    every pair within Hamming distance 1 without a cross join (equal
    sketches meet on the exact key; a distance-1 pair meets where the
    prober flips the differing bit).

    The hyperplane projection runs per-row over the array with
    ``transform``/``aggregate``, so the plan is independent of the
    embedding dimensionality — no driver-side probe of the data at
    plan-build time (a ``first()`` here cost a Spark job per call), and
    no d*planes unrolled expression tree.

    Only (bucket, id) pairs ride the candidate self-join; vectors and
    norms join back from the narrow ``base`` projection for the exact
    verification (the MinHash semi-join pattern) — at 100 TB the bucket
    shuffle moves keys, not d-dimensional payloads.

    ``max_bucket_size`` is the same 100 TB skew guard as
    :func:`minhash_lsh_pairs`'s: d identical (or near-identical)
    embeddings agree on EVERY plane sign, land in one bucket, and the
    self-join emits d(d-1)/2 candidate rows — quadratic blowup.
    Over-capacity buckets switch to STAR candidates (every member pairs
    with the bucket's ``star_probes`` smallest-id representatives only
    — O(star_probes * d) rows). The guarantee is the same as
    :func:`minhash_lsh_pairs`'s: exact and representative-near
    duplicates still surface in a verified pair, and
    within-mega-bucket pair-completeness is sacrificed — a pair whose
    members ALL fail the cosine threshold against every probed
    representative is lost (not transitively recoverable), which is
    the accepted trade for bounding the blowup; raising ``star_probes``
    recovers pairs far from the min-id member at linear extra cost.
    None (default) keeps exact all-pairs semantics. At corpus scale
    also raise ``planes`` (>= 16) so the expected bucket occupancy
    n/2^planes stays small — few planes means big buckets and the
    within-bucket join is O(n^2 / 2^planes) regardless of skew.

    ``persist=True`` caches the narrow sketch/norm projection
    (MEMORY_AND_DISK) and leaves it cached for the consumer's lifetime
    — the same cache-pressure caveat as :func:`minhash_lsh_pairs`:
    repeated calls with varying params (threshold/planes/seed sweeps)
    stack one cache entry per distinct plan, so sweeps should pass
    ``persist=False`` or unpersist between calls.
    """
    from pyspark.storagelevel import StorageLevel

    v = F.col(vec_col).cast("array<double>")

    # deterministic hyperplane component h[p][i] from xxhash64(seed,p,i),
    # generated inside the row expression from the element index
    def sign_bit(p: int) -> Column:
        from duckdb_otlp_spark.operators.text import bind1

        # the cast array is bound once per plane (bind1 docstring:
        # referencing `v` from the per-element lambda re-casts the
        # WHOLE array for every element — O(d^2) per plane per row)
        def body(vv):
            idx = F.sequence(F.lit(0), F.size(vv) - F.lit(1))
            # pmod, not %: xxhash64 is signed, and a signed % biases the
            # component toward negative — with enough bias every sketch
            # collapses to the all-zeros bucket and the within-bucket
            # join degenerates toward O(n^2) (test_dedup_properties)
            terms = F.transform(idx, lambda i: F.get(vv, i) * (
                F.pmod(F.xxhash64(F.lit(seed), F.lit(p), i), F.lit(10007))
                .cast("double") / 10007.0 - 0.5))
            proj = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
            return F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0"))

        return bind1(v, body)

    sketch = F.concat(*[sign_bit(p) for p in range(planes)])
    norm = F.sqrt(_dot(v, v))
    # base feeds bucket generation AND both sides of the verification
    # join; persisted so the sketch/norm pass over the corpus runs once
    base = df.select(F.col(id_col).alias("__id"), v.alias("__v"),
                     norm.alias("__n"), sketch.alias("__sk"))
    if persist:
        base = base.persist(StorageLevel.MEMORY_AND_DISK)

    # bucket on the sketch and every 1-bit-flipped sketch (probing radius 1)
    def flips(sk: Column) -> Column:
        return F.array(sk, *[
            F.concat(F.substring(sk, 1, p),
                     F.when(F.substring(sk, p + 1, 1) == "1", F.lit("0"))
                     .otherwise(F.lit("1")),
                     F.substring(sk, p + 2, planes - p - 1))
            for p in range(planes)
        ])

    # ONE-SIDED multi-probe (r10 scale probe finding): each vector is
    # INDEXED once under its exact sketch, and only the PROBE side
    # explodes the radius-1 flips. Every pair within Hamming distance
    # <= 1 still collides — equal sketches meet on the exact key, and a
    # distance-1 pair meets where the prober flips the differing bit —
    # which is precisely the radius-1 contract above. The previous
    # both-sided form (flips exploded on BOTH join sides) silently
    # bought radius-2 recall at (planes+1)x the candidate volume: at 2M
    # vectors / 21 planes it emitted ~1e9 candidate rows and overflowed
    # a 75 GB spill disk; one-sided probing is the shape that survives
    # 100 TB (candidates O(n * (planes+1) * occupancy), not
    # O(n * (planes+1)^2 * occupancy)).
    indexed = base.select(F.col("__id").alias("__ri"),
                          F.col("__sk").alias("bucket"))
    probed = base.select("__id",
                         F.explode(flips(F.col("__sk"))).alias("bucket"))

    def norm_pairs(pairs):
        # probe->index hits arrive in both orientations; canonicalize
        # so distinct() collapses them
        return (pairs.filter(F.col("__id") != F.col("__ri"))
                .select(F.least("__id", "__ri").alias("id_a"),
                        F.greatest("__id", "__ri").alias("id_b")))

    if max_bucket_size is not None:
        # skew guard on the INDEXED occupancy (exact sketches): d
        # identical embeddings land in one index bucket; over-capacity
        # buckets expose only star_probes smallest-id representatives
        # to the probe stream
        sizes = (indexed.groupBy("bucket")
                 .agg(F.count("*").alias("__bn"),
                      F.min("__ri").alias("__rep")))
        idx = indexed.join(sizes, "bucket")
        ok = idx.filter(F.col("__bn") <= max_bucket_size) \
                .select("__ri", "bucket")
        cand_small = norm_pairs(probed.join(ok, "bucket"))
        big = idx.filter(F.col("__bn") > max_bucket_size)
        if star_probes > 1:
            from pyspark.sql import Window as W

            rk = F.row_number().over(W.partitionBy("bucket")
                                     .orderBy("__ri"))
            reps = (big.withColumn("__rk", rk)
                    .filter(F.col("__rk") <= star_probes)
                    .select("__ri", "bucket"))
        else:
            reps = big.filter(F.col("__ri") == F.col("__rep")) \
                      .select("__ri", "bucket")
        cand_star = norm_pairs(probed.join(reps, "bucket"))
        cand = cand_small.union(cand_star).distinct()
    else:
        cand = norm_pairs(probed.join(indexed, "bucket")).distinct()

    side = base.select("__id", "__v", "__n")
    verified = (cand
                .join(side.select(F.col("__id").alias("id_a"),
                                  F.col("__v").alias("va"),
                                  F.col("__n").alias("na")), "id_a")
                .join(side.select(F.col("__id").alias("id_b"),
                                  F.col("__v").alias("vb"),
                                  F.col("__n").alias("nb")), "id_b"))
    cosine = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (verified.select("id_a", "id_b", F.round(cosine, 6).alias("cosine"))
            .filter(F.col("cosine") >= threshold))


# ---------------------------------------------------------------------------
# persisted band index (incremental dedup steady state)
# ---------------------------------------------------------------------------

def save_band_index(bands: DataFrame, path: str, table: str,
                    num_buckets: int = 32) -> None:
    """Materialize an LSH band index as the 100 TB layout: an EXTERNAL
    parquet table bucketed AND sorted on the probe keys (band_idx, key).

    ``bands`` must carry (band_idx, key, <id column>) — keys only, never
    text, so the index is orders of magnitude narrower than the corpus.
    Bucketing is the point: an increment's candidate probe is a
    sort-merge join in which the index side is read bucket-aligned and
    pre-sorted — NO shuffle and NO sort of the (huge) index, ever;
    only the (small) batch side exchanges. Re-dedup-the-world becomes
    probe-an-index (see queries.q_dedup_incremental's scale note; the
    companion of save_ivf_index in operators/similarity.py).

    The repartition below is load-bearing for the NO-sort half of that
    guarantee: bucketBy writes one file per (input task, bucket), and a
    bucket spread over multiple files reports UNKNOWN output ordering —
    Spark would silently re-sort the whole index above every probe scan
    (the exact cost sortBy exists to eliminate). Aligning the input to
    the writer's own hash partitioning yields exactly one sorted file
    per bucket (pinned by tests/test_band_index.py's Sort-count gate).
    """
    (bands.repartition(num_buckets, "band_idx", "key")
     .write.format("parquet")
     .bucketBy(num_buckets, "band_idx", "key")
     .sortBy("band_idx", "key")
     .option("path", path)
     .mode("overwrite")
     .saveAsTable(table))


def load_band_index(spark, table: str) -> DataFrame:
    """Reopen a saved band index by table name. Must go through the
    catalog (spark.table), not spark.read.parquet: only the catalog
    carries the bucket spec that lets the probe join skip the index-side
    exchange (pinned by tests/test_band_index.py)."""
    return spark.table(table)


# ---------------------------------------------------------------------------
# SemDeDup (semantic dedup over embeddings) — the corpus-scale path
# ---------------------------------------------------------------------------

def semdedup(df: DataFrame, id_col: str, vec_col: str, *,
             k: int | None = None, tau: float = 0.95, seed: int = 42,
             max_iter: int = 10, block_bytes: int = 1 << 28,
             fit_sample: float | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) at corpus scale: cluster the
    embedding space with MLlib k-means, then screen each cluster
    independently — a vector is dropped when an earlier (lower-id)
    CLUSTER-MATE has cosine >= ``tau``. Pairwise similarity never
    crosses a cluster boundary; that is the whole trick that makes
    semantic dedup tractable (the all-pairs cross join is O(n²·d)).

    Returns ``(id_col, cluster_id int, is_kept boolean)``.

    This is the scale path behind queries.q_semdedup (whose tiny fixed
    K and literal-centroid Lloyd rounds exist for DuckDB-oracle
    expressibility). Scale shape:
    - ``k`` defaults to n/1000 (SemDeDup's regime), so the expected
      cluster size — and with it the within-cluster quadratic term —
      stays O(1000) regardless of corpus size;
    - k-means itself is MLlib's k-means|| (seeded): each iteration is
      one map-side assignment pass + a k-row reduce, no corpus shuffle;
    - the screen shuffles (id, vector) ONCE, keyed by cluster id, then
      runs one Arrow batch per cluster through a vectorized NumPy
      cosine matmul (`X_block @ X_prefix.T`) — this is the rare hot
      path where a Pandas UDF BEATS JVM expressions: interpreted
      higher-order-function cosines cost ~µs/pair while BLAS does the
      same block in ~ns/pair, a 100-1000x gap measured at probe scale;
    - the matmul is BLOCKED to ``block_bytes`` of float32 so a skewed
      mega-cluster degrades to streaming passes instead of OOM;
    - ``fit_sample`` (0 < f <= 1) fits k-means on a seeded SAMPLE and
      only assigns the full corpus — the standard corpus-scale move,
      because with k ∝ n the total Lloyd work grows ~n²·d/1000 (the
      probe measured 27.8x on 10x data from exactly this term, with
      the screen itself near-linear). A 10% fit sample cuts the fit
      term 10x while assignment stays ONE O(n·k·d) map pass; centroid
      quality degrades only by sampling noise on cluster MASSES, and
      the dup screen never crosses cluster boundaries either way.

    Determinism: the k-means seed pins initialization; verdicts for
    true near-duplicates are threshold-robust, but exact cluster ids
    may differ across Spark versions — tests pin planted-duplicate
    detection and invariants, not label values (the oracle-exact twin
    is q_semdedup).
    """
    import pandas as pd

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = df.select(
        F.col(id_col).cast("long").alias("_sd_id"),
        F.col(vec_col).cast("array<float>").alias("_sd_v"))
    if k is None:
        n = feats.count()
        k = max(2, n // 1000)
    fit_src = feats
    if fit_sample is not None:
        if not 0.0 < fit_sample <= 1.0:
            raise ValueError(f"fit_sample must be in (0, 1], got "
                             f"{fit_sample}")
        fit_src = feats.sample(fraction=fit_sample, seed=seed)
    model = KMeans(k=k, seed=seed, maxIter=max_iter,
                   featuresCol="_sd_feat").fit(
        fit_src.select(array_to_vector(
            F.col("_sd_v").cast("array<double>")).alias("_sd_feat")))
    assigned = model.transform(
        feats.withColumn("_sd_feat", array_to_vector(
            F.col("_sd_v").cast("array<double>")))) \
        .select("_sd_id", "_sd_v",
                F.col("prediction").cast("int").alias("cluster_id"))

    schema = f"{id_col} long, cluster_id int, is_kept boolean"

    def screen(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("_sd_id").reset_index(drop=True)
        ids = pdf["_sd_id"].to_numpy()
        x = np.stack(pdf["_sd_v"].to_numpy()).astype(np.float32)
        norms = np.linalg.norm(x, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0          # zero vectors: sim 0, kept
        x /= norms
        m = len(ids)
        dup = np.zeros(m, dtype=bool)
        # block rows so S = X[s:e] @ X[:e].T stays under block_bytes
        rows_per_block = max(1, block_bytes // 4 // max(m, 1))
        s = 1                               # row 0 is always kept
        while s < m:
            e = min(m, s + rows_per_block)
            sims = x[s:e] @ x[:e].T          # (e-s, e) float32
            for r in range(s, e):
                dup[r] = bool((sims[r - s, :r] >= tau).any())
            s = e
        return pd.DataFrame({id_col: ids,
                             "cluster_id": pdf["cluster_id"],
                             "is_kept": ~dup})

    return assigned.groupBy("cluster_id").applyInPandas(screen, schema)
