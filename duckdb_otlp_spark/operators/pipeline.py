"""End-to-end corpus curation: the composition a pretraining-data user
actually runs — quality filter -> repetition filter -> language filter
-> near-dup removal -> (optional) contamination screen — built entirely
from the existing operators so every stage keeps its documented scale
shape.

Design for 100 TB:
- Stages 1-3 are pure column predicates: they fuse into ONE map-only
  pass over the scan (no shuffle, no materialization between stages)
  and column-prune to (id, text) + whatever the caller selects.
- The near-dup stage is the only shuffling stage (MinHash-LSH banding;
  see operators/dedup.py), and it runs AFTER the cheap predicates have
  already shrunk the corpus — filter-before-shuffle ordering matters
  more than anything else at volume.
- The contamination screen joins the survivor set against the eval
  gram set (equi-join, AQE-broadcastable) — again after all shrinking.
- `audit=True` returns per-stage survivor counts computed in ONE
  aggregate pass over the annotated frame, not one count() job per
  stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from duckdb_otlp_spark.operators import dedup, text


def annotate_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds the filter signals as columns (quality score, dup-3-gram
    fraction, language guess) without dropping anything — the
    inspect-before-filter view. Map-only."""
    t = F.col(text_col)
    grams = text.word_ngrams(t, 3, distinct=False)
    n = F.size(grams)
    dup_frac = F.when(
        n >= 1,
        F.round((n - F.size(F.array_distinct(grams))) / n, 4)).otherwise(0.0)
    return df.withColumns({
        "__quality": text.quality_score(t),
        "__dup_frac": dup_frac,
        "__lang": text.lang_id(t),
    })


def clean_corpus(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", *,
                 min_quality: float = 0.5,
                 max_dup_frac: float = 0.3,
                 languages: tuple[str, ...] | None = None,
                 near_dedup: bool = True,
                 jaccard_threshold: float = 0.7,
                 max_bucket_size: int | None = 10_000,
                 star_probes: int = 1,
                 audit: bool = False):
    """Curate a raw document corpus for training.

    Returns the surviving rows of ``df`` (original columns, annotation
    columns dropped). With ``audit=True`` returns ``(survivors, stats)``:
    the predicate-stage counts come from ONE extra aggregate job over
    the annotated corpus (not a count() per stage), and the dedup stage
    adds one count of the survivor set — two extra jobs total.
    """
    ann = annotate_quality(df, text_col)
    pass_quality = F.col("__quality") >= min_quality
    pass_rep = F.col("__dup_frac") <= max_dup_frac
    pass_lang = (F.col("__lang").isin(*languages)
                 if languages else F.lit(True))
    kept = ann.filter(pass_quality & pass_rep & pass_lang)

    stats: dict[str, int] = {}
    if audit:
        row = ann.agg(
            F.count("*").alias("input"),
            F.sum(pass_quality.cast("long")).alias("pass_quality"),
            F.sum((pass_quality & pass_rep).cast("long")).alias("pass_rep"),
            F.sum((pass_quality & pass_rep & pass_lang).cast("long"))
            .alias("pass_lang"),
        ).collect()[0]
        stats = {k: int(row[k]) for k in
                 ("input", "pass_quality", "pass_rep", "pass_lang")}

    survivors = kept.drop("__quality", "__dup_frac", "__lang")
    if near_dedup:
        survivors = dedup.minhash_dedup(
            survivors, id_col, text_col,
            jaccard_threshold=jaccard_threshold,
            max_bucket_size=max_bucket_size,
            star_probes=star_probes)
    if audit:
        if near_dedup:
            stats["after_dedup"] = survivors.count()
        return survivors, stats
    return survivors


def contamination_screen(df: DataFrame, eval_df: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text", *,
                         gram_n: int = 5,
                         max_overlap: float = 0.5) -> DataFrame:
    """Drop training docs whose distinct word n-gram overlap with the
    eval corpus exceeds ``max_overlap`` — the benchmark-leakage screen.

    Scale shape: eval reduces to a DISTINCT gram set; train docs join it
    on the gram string (equi-join, AQE broadcasts a small eval set);
    per-doc rollup partial-aggregates. The train gram projection
    persists because the hits and totals branches both read it — the
    CPU-bound shingling must not run twice. Docs with no grams
    survive."""
    from pyspark.storagelevel import StorageLevel

    def grams(frame):
        return frame.select(
            F.col(id_col),
            text.word_ngrams(F.col(text_col), gram_n).alias("__grams"))

    eval_grams = (grams(eval_df)
                  .select(F.explode("__grams").alias("__g")).distinct())
    train = grams(df).persist(StorageLevel.MEMORY_AND_DISK)
    hits = (train.select(id_col, F.explode("__grams").alias("__g"))
            .join(eval_grams, "__g")
            .groupBy(id_col).agg(F.count("*").alias("__hit")))
    frac = (train.select(id_col, F.size("__grams").alias("__n"))
            .join(hits, id_col, "left")
            .select(id_col,
                    (F.coalesce(F.col("__hit"), F.lit(0))
                     / F.greatest(F.col("__n"), F.lit(1))).alias("__frac")))
    contaminated = frac.filter(F.col("__frac") > max_overlap).select(id_col)
    return df.join(contaminated, id_col, "left_anti")
