"""Property-based suite for the packing / deterministic-shuffle family
vs DuckDB, extending the r7 dedup-property pattern: hypothesis generates
random doc populations (ids, shards, token lengths — including docs
larger than the context window and empty shards) and every example is
checked against an independent DuckDB evaluation plus the trainer
invariants the operators promise.

Contracts:

- CORPUS SHUFFLE: positions are a bijection onto 0..n-1 for ANY id
  population; the mapping is identical after an arbitrary repartition
  (determinism is the operator's reason to exist — every epoch / resume
  must read the same order); and it equals DuckDB's one-window
  ROW_NUMBER over the same md5 sort key — proving the 32-bucket radix
  decomposition is exactly the global order, not an approximation.
- NO-STRADDLE PACKER: replayed bit-for-bit by the DuckDB recursive CTE
  on the same generated rows, PLUS the trainer invariants directly
  (offset + n_tokens <= seq_len for every fitting doc — no document
  spans a window; an oversized doc owns its window alone; fitting docs
  sharing a window never overfill it).
- CONTIGUOUS PACKER: matches DuckDB's cumsum window; offsets are the
  running sum mod seq_len by construction.

Each hypothesis example builds one small DataFrame; max_examples bounds
total Spark job count.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from duckdb_otlp_spark.queries import (_SQL_MD5INT, _SHUFFLE_SEED,
                                       corpus_shuffle_positions,
                                       pack_contiguous, pack_nostraddle,
                                       sql_pack_nostraddle_over)

SEQ_LEN = 100  # small window so generated docs straddle/overflow often

# (doc_id, shard, n_tokens): ids unique by construction, lengths span
# 1..3x the window so next-fit hits every branch (fits / overflow-open
# -new / oversized-owns-window)
DOCS = st.lists(
    st.tuples(st.integers(0, 10_000),           # doc_id (deduped below)
              st.integers(0, 3),                # shard
              st.integers(1, 3 * SEQ_LEN)),     # n_tokens
    min_size=1, max_size=24,
    unique_by=lambda t: t[0])

IDS = st.lists(st.integers(min_value=0, max_value=10**12),
               min_size=1, max_size=40, unique=True)


def _duck_rows(sql: str, rows, schema: str):
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t ({schema})")
    con.executemany(
        f"INSERT INTO t VALUES ({', '.join('?' * len(rows[0]))})", rows)
    out = con.execute(sql).fetchall()
    con.close()
    return out


@settings(max_examples=10, deadline=None)
@given(IDS, st.integers(2, 7))
def test_corpus_shuffle_bijective_deterministic_and_exact(spark, ids, npart):
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["doc_id"]: r["pos"]
           for r in corpus_shuffle_positions(docs).collect()}

    # bijection onto 0..n-1
    assert sorted(got.values()) == list(range(len(ids)))

    # identical mapping from an arbitrary repartitioning of the input
    again = {r["doc_id"]: r["pos"]
             for r in corpus_shuffle_positions(
                 docs.repartition(npart)).collect()}
    assert again == got

    # equals the one-window global ROW_NUMBER in DuckDB: the radix
    # buckets + offset cumsum ARE the global order
    key = _SQL_MD5INT % (f"'{_SHUFFLE_SEED}' || CAST(doc_id AS VARCHAR)")
    want = dict(_duck_rows(
        f"SELECT doc_id, CAST(row_number() OVER (ORDER BY {key}, doc_id)"
        f" - 1 AS BIGINT) FROM t",
        [(i,) for i in ids], "doc_id BIGINT"))
    assert got == want


def test_token_offsets_consistent_with_shuffle_order(spark, sf_dir):
    """Cross-entry invariant: token_offsets enumerates the SAME seeded
    permutation corpus_shuffle defines — sorting by token_offset yields
    exactly the doc order of pos, and each offset equals the running
    token total of everything before it."""
    from duckdb_otlp_spark.queries import QUERIES

    by_pos = [r["doc_id"] for r in
              QUERIES["corpus_shuffle"](spark, sf_dir).collect()]
    offs = QUERIES["token_offsets"](spark, sf_dir).collect()
    assert [r["doc_id"] for r in offs] == by_pos
    running = 0
    for r in offs:
        assert r["token_offset"] == running, r
        running += r["n_tokens"]


@settings(max_examples=10, deadline=None)
@given(DOCS)
def test_pack_nostraddle_matches_duckdb_and_invariants(spark, rows):
    t = spark.createDataFrame(rows, "doc_id long, shard long, n_tokens int")
    got = [tuple(r) for r in pack_nostraddle(t, seq_len=SEQ_LEN).collect()]

    want = _duck_rows(
        sql_pack_nostraddle_over("SELECT * FROM t", seq_len=SEQ_LEN),
        rows, "doc_id BIGINT, shard BIGINT, n_tokens INT")
    assert got == [tuple(r) for r in want]

    windows: dict[tuple, list] = {}
    for doc_id, shard, n, seq, off in got:
        windows.setdefault((shard, seq), []).append((doc_id, n, off))
    for (shard, seq), members in windows.items():
        sizes = [n for _, n, _ in members]
        if any(n >= SEQ_LEN for n in sizes):
            # an oversized doc owns its window alone, at offset 0
            assert members == [(members[0][0], sizes[0], 0)], members
        else:
            # no straddle: every doc ends inside its window
            for _, n, off in members:
                assert off + n <= SEQ_LEN, (shard, seq, members)
            # no overfill with fitting docs
            assert sum(sizes) <= SEQ_LEN, (shard, seq, members)
        # exactly one doc opens each window
        assert sorted(off for _, _, off in members)[0] == 0


@settings(max_examples=10, deadline=None)
@given(DOCS, st.integers(2, 7))
def test_pack_contiguous_matches_duckdb_and_repartition(spark, rows, npart):
    t = spark.createDataFrame(rows, "doc_id long, shard long, n_tokens int")
    got = [tuple(r) for r in pack_contiguous(t, seq_len=SEQ_LEN).collect()]

    want = _duck_rows(f"""
        SELECT doc_id, shard, n_tokens,
               CAST(floor(start / {SEQ_LEN}) AS BIGINT) AS seq_id,
               CAST(start % {SEQ_LEN} AS BIGINT) AS offset_in_seq
        FROM (SELECT doc_id, shard, n_tokens,
                     sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                         ROWS UNBOUNDED PRECEDING)
                         - n_tokens AS start
              FROM t)
        ORDER BY shard, doc_id""",
        rows, "doc_id BIGINT, shard BIGINT, n_tokens INT")
    assert got == [tuple(r) for r in want]

    # shard-local cumsum => repartitioning the input cannot change it
    again = [tuple(r) for r in
             pack_contiguous(t.repartition(npart), seq_len=SEQ_LEN).collect()]
    assert again == got
