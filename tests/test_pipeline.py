"""Corpus-curation pipeline: each stage drops exactly what its
standalone operator flags, the audit counts agree with direct
recomputation, and the composed plan keeps the scale shape (the three
predicate stages fuse into one map-only pass — no shuffle below the
dedup stage)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from duckdb_otlp_spark.operators import (
    annotate_quality,
    clean_corpus,
    contamination_screen,
)
from duckdb_otlp_spark.plans import audit


@pytest.fixture(scope="module")
def corpus(spark):
    good = [(i, "the quick brown fox jumps over the lazy dog near "
             f"section {i} chapter {i * 7} verse {i * 13} line {i * 29} "
             f"word{i} token{i * 3}") for i in range(20)]
    # repetitive doc: one 3-gram repeated
    rep = [(100, " ".join(["spam ham eggs"] * 30))]
    # junk: single token (fails length), all-punct
    junk = [(101, "x"), (102, "!!! ??? ... ;;; :::")]
    # near-duplicates of doc 0 (one word appended)
    near = [(200 + j, "the quick brown fox jumps over the lazy dog near "
             "section 0 chapter 0 verse 0 line 0 word0 token0 extra")
            for j in range(3)]
    rows = good + rep + junk + near
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_annotate_quality_signals(spark, corpus):
    ann = {r["doc_id"]: r for r in
           annotate_quality(corpus, "text").collect()}
    assert ann[100]["__dup_frac"] > 0.9          # repeated 3-gram doc
    assert ann[0]["__dup_frac"] <= 0.1
    assert ann[101]["__quality"] < 0.5           # single token
    assert ann[0]["__lang"] == "en"


def test_clean_corpus_stages_and_audit(spark, corpus):
    out, stats = clean_corpus(corpus, audit=True, min_quality=0.7,
                              jaccard_threshold=0.7)
    ids = {r["doc_id"] for r in out.collect()}
    assert 100 not in ids                 # repetition filter
    assert 101 not in ids and 102 not in ids  # quality filter
    assert set(range(20)) <= ids          # distinct good docs survive
    # near-dups of doc 0 collapse to the min id only
    assert not {201, 202}.issubset(ids)
    assert stats["input"] == 26
    assert stats["pass_lang"] <= stats["pass_rep"] <= stats["pass_quality"]
    assert stats["after_dedup"] == len(ids)


def test_clean_corpus_forwards_skew_guard_params(spark):
    """max_bucket_size + star_probes reach the dedup stage: a mega-bucket
    identical-doc corpus still fully dedups under the capped star path."""
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta")
            for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = clean_corpus(df, min_quality=0.0, max_dup_frac=1.0,
                       jaccard_threshold=0.9, max_bucket_size=20,
                       star_probes=2)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {0}


def test_clean_corpus_language_filter(spark, corpus):
    out = clean_corpus(corpus, languages=("de",), near_dedup=False)
    assert out.count() == 0


def test_predicate_stages_fuse_without_shuffle(spark, corpus):
    """Quality+repetition+language filtering is ONE map-only pass: no
    exchange of any kind in the pre-dedup plan."""
    df = clean_corpus(corpus, near_dedup=False)
    rep = audit(df)
    assert rep.exchanges == 0, rep.text
    assert not rep.has_python_eval


def test_contamination_screen(spark):
    eval_rows = [(900, "alpha beta gamma delta epsilon zeta eta theta iota kappa")]
    train_rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # 100%
        (2, "one two three four five six seven eight nine ten"),          # 0%
        (3, "tiny"),                                                      # no grams
    ]
    spark_df = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")  # noqa: E731
    out = contamination_screen(spark_df(train_rows), spark_df(eval_rows),
                               max_overlap=0.5)
    ids = {r["doc_id"] for r in out.collect()}
    assert ids == {2, 3}


def test_clean_corpus_survives_empty_docs(spark):
    """Empty/whitespace-only docs — ubiquitous in raw data — must be
    FILTERED, not crash the job (ANSI mode turns a 0-char denominator
    into a job-aborting DIVIDE_BY_ZERO without the guard)."""
    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "\t\n"),
         (4, "a perfectly ordinary document with enough words here")],
        "doc_id long, text string")
    out = clean_corpus(df, near_dedup=False)
    assert {r["doc_id"] for r in out.collect()} == {4}
