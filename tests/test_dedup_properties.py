"""Property-based suite for the MinHash / embedding near-dup family vs
DuckDB, closing the deterministic-fixtures-only gap the same way
test_join_properties.py closed it for the join family: hypothesis
generates random corpora with PLANTED exact duplicates (the mega-bucket
shape the star guard exists for), and every example is checked against
an independent DuckDB evaluation.

Oracle contracts (LSH is one-sided, so the properties split):

- SOUNDNESS (hard, both operators, guarded or not): every reported
  pair's similarity equals DuckDB's exact computation over the same
  rows (3-shingle Jaccard / full-precision cosine) and clears the
  threshold. LSH may legitimately MISS a qualifying pair (banding is
  probabilistic), so no completeness claim for arbitrary near-pairs.
- EXACT-DUPLICATE COMPLETENESS (hard): byte-identical texts share every
  band bucket (identical signatures), identical vectors share every
  sketch bucket — planted duplicate groups MUST surface, and under the
  ``max_bucket_size`` star guard every group member must still appear
  in >= 1 verified pair with another group member (the documented
  guard guarantee: operators/dedup.py minhash_lsh_pairs /
  embedding_near_dup_pairs docstrings).
- GUARD MONOTONICITY: guarded candidates are a subset of all-pairs
  candidates, so guarded results must be a subset of unguarded ones.

Each hypothesis example builds one corpus DataFrame; max_examples
bounds total Spark job count. persist=False throughout — a parameter
sweep over many distinct corpora must not stack cache entries
(operator docstring caveat).
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from duckdb_otlp_spark.operators.dedup import (
    embedding_near_dup_pairs,
    minhash_lsh_pairs,
)

# random docs draw from one vocab, planted duplicates from a disjoint
# one — a random doc must not accidentally join a planted group
VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
DUP_TEXT = "quasar pulsar nebula comet meteor aurora"

RANDOM_DOCS = st.lists(
    st.lists(st.sampled_from(VOCAB), min_size=0, max_size=8).map(" ".join),
    min_size=0, max_size=8)
DUP_GROUP = st.integers(min_value=3, max_value=6)

THRESH = 0.5


def _corpus(spark, random_texts, n_dups):
    # planted ids BELOW all random ids: the star guard pairs mega-bucket
    # members with the bucket's min-id representatives, and its
    # documented guarantee (a dup group surfaces) holds when a probed
    # rep belongs to the group — guaranteed here because any bucket
    # holding the group holds planted id 0. A smaller-id non-dup rep
    # losing the group is the operator's documented accepted loss, not
    # a bug, so the test doesn't generate that shape.
    rows = [(i, DUP_TEXT) for i in range(n_dups)]
    rows += [(100 + i, t) for i, t in enumerate(random_texts)]
    return (spark.createDataFrame(rows, "doc_id long, text string"),
            set(range(n_dups)))


def _exact_jaccard(rows):
    """DuckDB 3-shingle Jaccard over all id<id pairs -> {(a,b): round6}."""
    con = duckdb.connect()
    con.execute("CREATE TABLE corpus(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO corpus VALUES (?, ?)", rows)
    got = con.execute(r"""
        WITH sh AS (
          SELECT doc_id,
                 list_distinct([words[i] || ' ' || words[i+1] || ' ' ||
                                words[i+2]
                                for i in range(1, len(words) - 1)]) AS sh
          FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+')
                       AS words FROM corpus)),
        ne AS (SELECT * FROM sh WHERE len(sh) > 0)
        SELECT a.doc_id, b.doc_id,
               round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.sh, b.sh))), 6)
        FROM ne a JOIN ne b ON a.doc_id < b.doc_id
    """).fetchall()
    con.close()
    return {(a, b): j for a, b, j in got}


@settings(max_examples=10, deadline=None)
@given(RANDOM_DOCS, DUP_GROUP,
       st.sampled_from([None, 2]), st.sampled_from([1, 3]))
def test_minhash_lsh_pairs_sound_and_dup_complete_vs_duckdb(
        spark, random_texts, n_dups, max_bucket, star_probes):
    df, dup_ids = _corpus(spark, random_texts, n_dups)
    pairs = minhash_lsh_pairs(
        df, "doc_id", "text", num_hashes=12, bands=6,
        jaccard_threshold=THRESH, max_bucket_size=max_bucket,
        star_probes=star_probes, persist=False).collect()
    want = _exact_jaccard([(d, DUP_TEXT) for d in sorted(dup_ids)]
                          + [(100 + i, t)
                             for i, t in enumerate(random_texts)])

    # soundness: reported jaccard == DuckDB exact, and >= threshold
    for r in pairs:
        assert (r.id_a, r.id_b) in want, r
        assert abs(r.jaccard - want[(r.id_a, r.id_b)]) < 1e-9, r
        assert r.jaccard >= THRESH

    # planted-duplicate completeness: every group member appears in a
    # verified pair with another member, guard or no guard
    linked = set()
    for r in pairs:
        if r.id_a in dup_ids and r.id_b in dup_ids:
            assert r.jaccard == 1.0
            linked |= {r.id_a, r.id_b}
    assert linked == dup_ids

    # guard monotonicity: guarded pairs are a subset of unguarded
    if max_bucket is not None:
        unguarded = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(
            df, "doc_id", "text", num_hashes=12, bands=6,
            jaccard_threshold=THRESH, persist=False).collect()}
        assert {(r.id_a, r.id_b) for r in pairs} <= unguarded


# dim-4 int vectors; the all-zero vector has no direction (norm 0)
VEC = st.lists(st.integers(min_value=-3, max_value=3), min_size=4,
               max_size=4).filter(lambda v: any(v))
RANDOM_VECS = st.lists(VEC, min_size=0, max_size=8)
DUP_VEC = [2.0, -1.0, 3.0, 0.5]

ETHRESH = 0.95


def _exact_cosine(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE e(id BIGINT, v DOUBLE[])")
    con.executemany("INSERT INTO e VALUES (?, ?)", rows)
    got = con.execute("""
        SELECT a.id, b.id,
               list_dot_product(a.v, b.v)
               / (sqrt(list_dot_product(a.v, a.v))
                  * sqrt(list_dot_product(b.v, b.v)))
        FROM e a JOIN e b ON a.id < b.id
    """).fetchall()
    con.close()
    return {(a, b): c for a, b, c in got}


@settings(max_examples=10, deadline=None)
@given(RANDOM_VECS, DUP_GROUP,
       st.sampled_from([None, 2]), st.sampled_from([1, 3]))
def test_embedding_near_dup_sound_and_dup_complete_vs_duckdb(
        spark, random_vecs, n_dups, max_bucket, star_probes):
    # planted ids below random ids — same star-guard rep reasoning as
    # _corpus above
    rows = [(i, DUP_VEC) for i in range(n_dups)]
    rows += [(100 + i, [float(x) for x in v])
             for i, v in enumerate(random_vecs)]
    dup_ids = set(range(n_dups))
    df = spark.createDataFrame(rows, "id long, v array<double>")
    pairs = embedding_near_dup_pairs(
        df, "id", "v", threshold=ETHRESH, planes=8,
        max_bucket_size=max_bucket, star_probes=star_probes,
        persist=False).collect()
    want = _exact_cosine(rows)

    for r in pairs:
        assert (r.id_a, r.id_b) in want, r
        # operator rounds to 6; compare at that precision
        assert abs(r.cosine - round(want[(r.id_a, r.id_b)], 6)) < 1e-9, r
        assert r.cosine >= ETHRESH

    linked = set()
    for r in pairs:
        if r.id_a in dup_ids and r.id_b in dup_ids:
            assert r.cosine == 1.0
            linked |= {r.id_a, r.id_b}
    assert linked == dup_ids

    if max_bucket is not None:
        unguarded = {(r.id_a, r.id_b) for r in embedding_near_dup_pairs(
            df, "id", "v", threshold=ETHRESH, planes=8,
            persist=False).collect()}
        assert {(r.id_a, r.id_b) for r in pairs} <= unguarded


@settings(max_examples=8, deadline=None)
@given(RANDOM_DOCS, DUP_GROUP)
def test_band_probe_regimes_agree_and_flag_exact_dups(spark, docs, n_dup):
    """BandProbe property contract on hypothesis-random corpora: the
    literal (InSet) and join (persisted broadcast sides) regimes return
    IDENTICAL stamps for every doc, an exact duplicate of an indexed
    doc ALWAYS flags (identical signatures share every band — the
    one-sided LSH guarantee the at-seal screen leans on), and
    sub-shingle docs never flag."""
    from pyspark.sql import functions as F

    from duckdb_otlp_spark.queries import (_base_hashes, _incr_bands_from_sig,
                                           _minhash_cols)
    from duckdb_otlp_spark.streaming.operators import build_band_probe

    corpus_rows = [(100 + i, DUP_TEXT) for i in range(n_dup)] + \
        [(200 + i, t) for i, t in enumerate(docs)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    sig = (corpus.select(
        "doc_id", _base_hashes(text="text").alias("hs"))
        .filter(F.size("hs") > 0)
        .select("doc_id", *_minhash_cols("hs")))
    index = _incr_bands_from_sig(sig).select("band_idx", "key")

    batch_rows = ([(1, DUP_TEXT)]                       # exact dup
                  + [(2, "hi")]                          # sub-shingle
                  + [(10 + i, t) for i, t in enumerate(docs)])
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")

    lit_probe = build_band_probe(index)
    join_probe = build_band_probe(index, literal_max_keys=0)
    try:
        got_lit = {r["doc_id"]: r["near_dup_candidate"]
                   for r in lit_probe.stamp(batch).collect()}
        got_join = {r["doc_id"]: r["near_dup_candidate"]
                    for r in join_probe.stamp(batch).collect()}
        assert got_lit == got_join                       # regime parity
        assert got_lit[1] is True                        # exact dup flags
        assert got_lit[2] is False                       # sub-shingle never
        # soundness direction: a flagged random doc must share >= 1 band
        # key with the index (re-derived independently per doc)
        batch_bands = _incr_bands_from_sig(
            batch.select(
                "doc_id",
                _base_hashes(text="text").alias("hs"))
            .filter(F.size("hs") > 0)
            .select("doc_id", *_minhash_cols("hs"))
        ).select("doc_id", "band_idx", "key")
        shared = {r["doc_id"] for r in batch_bands.join(
            index, ["band_idx", "key"], "left_semi").collect()}
        for doc_id, flagged in got_lit.items():
            assert flagged == (doc_id in shared), (doc_id, flagged)
    finally:
        join_probe.unpersist(blocking=True)
