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
                   F.expr(q._grams5_sql("text")).alias("g5"))
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


def _py_winnow(words: list[str], k: int = 4, w: int = 5) -> set[str]:
    """Plain-Python robust winnowing (rightmost-min) reference."""
    import hashlib

    if len(words) < k:
        return set()      # the paper defines no k-grams below k tokens
    grams = [" ".join(words[i:i + k]) for i in
             range(len(words) - k + 1)]
    hs = [hashlib.md5(g.encode()).hexdigest()[:12] for g in grams]
    m = len(hs)
    sel = set()
    for s in range(max(m - w + 1, 1)):
        window = hs[s:s + w]
        mn = min(window)
        # rightmost occurrence of the min
        rel = max(i for i, h in enumerate(window) if h == mn)
        sel.add(hs[s + rel])
    return sel


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_winnowing_guarantee_and_reference_parity(spark, data):
    """Two spec-level properties of the winnowing operator, checked on
    arbitrary corpora against a plain-Python reference:
    1. per-doc selected fingerprints EXACTLY match the reference
       (robust winnowing, rightmost-min ties);
    2. the scheme's guarantee — two docs sharing a contiguous run of
       >= k+w-1 = 8 tokens MUST share a fingerprint."""
    from duckdb_otlp_spark.operators.text import winnowing_fingerprints

    docs = data.draw(st.lists(
        st.lists(WORD, min_size=1, max_size=30), min_size=1, max_size=5))
    # plant a shared run of >= 8 tokens inside two fresh docs
    run = data.draw(st.lists(WORD, min_size=8, max_size=12))
    pre_a = data.draw(st.lists(WORD, min_size=0, max_size=6))
    pre_b = data.draw(st.lists(WORD, min_size=0, max_size=6))
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    rows.append((100, " ".join(pre_a + run)))
    rows.append((101, " ".join(pre_b + run + ["tailtok"])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in winnowing_fingerprints(df, "doc_id", "text").collect():
        got.setdefault(r["doc_id"], set()).add(r["h"])
    for doc_id, text in rows:
        # operator lowercases; WORD alphabet is already lowercase
        assert got.get(doc_id, set()) == _py_winnow(text.split()), doc_id
    assert got[100] & got[101], "guarantee violated: shared 8-token run"
